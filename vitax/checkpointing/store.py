"""Checkpoint store: save/restore full training state with resume.

A strict capability superset of the reference (SURVEY §5 "checkpoint/resume"):
the reference saves optimizer state but can never restore it
(src/checkpoint.py:13 only reads `state_dict`); vitax checkpoints
(params, opt_state, step, rng, epoch, best_acc) and resumes exactly.

Backend: orbax (`StandardCheckpointer`) when available, with a portable
flat-npz fallback (same directory layout) — both store the identical pytree.
`save_model` mirrors the reference's current/best naming
(src/train.py:69-81: `current.pth` / `best.pth`).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
                       for k in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_into(tree: Any, flat: Dict[str, np.ndarray]) -> Any:
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(tree)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
                       for k in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        new_leaves.append(np.asarray(arr).astype(np.asarray(leaf).dtype)
                          .reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _nest(flat: Dict[str, np.ndarray]) -> Any:
    """'a/b/0/c' keys → nested dicts (list indices stay dict keys — callers
    coerce by structure when needed)."""
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return root


def coerce_like(target: Any, got: Any) -> Any:
    """Reshape a restored tree (dicts, possibly with stringified list
    indices) into the container structure of `target`."""
    if isinstance(target, dict):
        return {k: coerce_like(v, got[k]) for k, v in target.items()}
    if isinstance(target, (list, tuple)):
        items = []
        for i, t in enumerate(target):
            g = got[i] if isinstance(got, (list, tuple)) else got[str(i)]
            items.append(coerce_like(t, g))
        return type(target)(items) if isinstance(target, tuple) else items
    arr = np.asarray(got)
    return arr.astype(np.asarray(target).dtype).reshape(np.shape(target))


class CheckpointStore:
    """Directory of named checkpoints, each one state pytree + metadata."""

    def __init__(self, directory: str, use_orbax: Optional[bool] = None,
                 keep: Optional[int] = None):
        """`keep`: retention for step-named checkpoints saved via
        `save_step` — only the newest N are kept (`current`/`best` are
        never pruned)."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if use_orbax is None:
            use_orbax = _orbax_available()
        self.use_orbax = use_orbax
        self.keep = keep
        self._async_thread: Optional[threading.Thread] = None
        self._async_ckptr = None  # orbax AsyncCheckpointer, created lazily

    # -- core --------------------------------------------------------------

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: Any, metadata: Optional[dict] = None) -> str:
        self.wait_until_finished()
        path = self._path(name)
        state = jax.device_get(state)
        if self.use_orbax:
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            if os.path.exists(path):
                shutil.rmtree(path)
            ckptr.save(path, state)
            ckptr.wait_until_finished()
        else:
            os.makedirs(path, exist_ok=True)
            np.savez(os.path.join(path, "state.npz"), **_flatten(state))
        with open(os.path.join(path, "vitax_meta.json"), "w") as f:
            json.dump(metadata or {}, f, indent=2, default=str)
        return path

    def save_async(self, name: str, state: Any,
                   metadata: Optional[dict] = None) -> str:
        """Non-blocking save: snapshots `state` to host immediately (so the
        train loop may donate/overwrite device buffers right after), then
        writes in the background. Call `wait_until_finished()` before
        reading the checkpoint back or exiting. Only one async save is in
        flight at a time — a second call waits for the first."""
        self.wait_until_finished()
        path = self._path(name)
        state = jax.device_get(state)  # synchronous snapshot
        if self.use_orbax:
            import orbax.checkpoint as ocp
            if self._async_ckptr is None:
                self._async_ckptr = ocp.AsyncCheckpointer(
                    ocp.StandardCheckpointHandler())
            if os.path.exists(path):
                shutil.rmtree(path)
            self._async_ckptr.save(path, args=ocp.args.StandardSave(state))
        else:
            def work():
                os.makedirs(path, exist_ok=True)
                np.savez(os.path.join(path, "state.npz"), **_flatten(state))
            self._async_thread = threading.Thread(target=work, daemon=True)
            self._async_thread.start()
        meta_dir = path if not self.use_orbax else self.directory
        # orbax owns `path` until finalization; park metadata next to it
        os.makedirs(meta_dir, exist_ok=True)
        with open(os.path.join(meta_dir, f".{name}.meta.json")
                  if self.use_orbax else
                  os.path.join(path, "vitax_meta.json"), "w") as f:
            json.dump(metadata or {}, f, indent=2, default=str)
        return path

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save has committed to disk."""
        if self._async_thread is not None:
            self._async_thread.join()
            self._async_thread = None
        if self._async_ckptr is not None:
            self._async_ckptr.wait_until_finished()
            # move parked metadata into the finalized directories
            for fn in list(os.listdir(self.directory)):
                if fn.startswith(".") and fn.endswith(".meta.json"):
                    name = fn[1:-len(".meta.json")]
                    dst = self._path(name)
                    if os.path.isdir(dst):
                        os.replace(os.path.join(self.directory, fn),
                                   os.path.join(dst, "vitax_meta.json"))

    def restore(self, name: str, target: Any) -> Any:
        """Restore into the structure of `target` (an abstract or concrete
        state pytree)."""
        self.wait_until_finished()
        path = self._path(name)
        npz = os.path.join(path, "state.npz")
        if os.path.exists(npz):
            with np.load(npz) as flat:
                return _unflatten_into(target, dict(flat))
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=target)

    def restore_params(self, name: str) -> Any:
        """Structure-free restore of the `params` subtree only — for eval
        CLIs that have no optimizer state to reconstruct."""
        self.wait_until_finished()
        path = self._path(name)
        npz = os.path.join(path, "state.npz")
        if os.path.exists(npz):
            with np.load(npz) as flat:
                out: Dict[str, Any] = {}
                for k, v in flat.items():
                    if k.startswith("params/"):
                        out[k[len("params/"):]] = v
                return _nest(out)
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ptc:
            restored = ptc.restore(path)
        return restored["params"]

    def metadata(self, name: str) -> dict:
        # an in-flight async save parks metadata as a dot-file until
        # finalization — wait so metadata-after-save_async reads fresh state
        self.wait_until_finished()
        p = os.path.join(self._path(name), "vitax_meta.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def save_step(self, step: int, state: Any,
                  metadata: Optional[dict] = None) -> str:
        """Save under `step_{N:08d}` and prune beyond the retention limit."""
        path = self.save(f"step_{step:08d}", state, metadata)
        if self.keep is not None:
            steps = sorted(d for d in os.listdir(self.directory)
                           if d.startswith("step_"))
            for old in steps[:-self.keep]:
                shutil.rmtree(os.path.join(self.directory, old))
        return path

    def list_steps(self):
        return sorted(int(d[len("step_"):]) for d in os.listdir(self.directory)
                      if d.startswith("step_"))

    # -- reference-style current/best ---------------------------------------

    def save_model(self, state: Any, epoch: int, is_best: bool = False,
                   metrics: Optional[dict] = None,
                   async_save: bool = False) -> None:
        """src/train.py:69-81 semantics: always overwrite `current`, copy to
        `best` when val acc improved. With `async_save` the write happens in
        the background (the state is snapshotted to host first, so training
        can continue immediately); a best-copy forces completion."""
        meta = {"epoch": epoch, **(metrics or {})}
        if async_save:
            self.save_async("current", state, meta)
        else:
            self.save("current", state, meta)
        if is_best:
            self.wait_until_finished()
            cur, best = self._path("current"), self._path("best")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(cur, best)


def _orbax_available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401
        return True
    except Exception:
        return False
