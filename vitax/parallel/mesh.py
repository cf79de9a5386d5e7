"""Device mesh + sharding rules — the TPU-native replacement for the
reference's `torch.nn.DataParallel` (src/train.py:128-129, src/eval.py:42-43).

Instead of scatter/broadcast/gather per forward, vitax shards the batch over a
`jax.sharding.Mesh` and lets XLA's SPMD partitioner emit the collectives
(gradient all-reduce over ICI). This is a strict superset of the reference's
parallelism (§2.3 of SURVEY.md):

  * `data` axis — batch sharding, params replicated (the reference's DP);
  * `model` axis — optional Megatron-style tensor parallelism: attention
    heads and the MLP hidden dim are sharded, XLA inserts the psum at the
    out-projection / fc2 contraction. Not in the reference; exposed because
    the mesh design reserves the seam (SURVEY §2.3 TP row).

Multi-host: call `jax.distributed.initialize()` before `make_mesh` and the
same code spans DCN.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all local devices on `data`."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _vit_param_spec(path: str) -> P:
    """Tensor-parallel PartitionSpec for a ViT param, by pytree path.

    Layer-stacked shapes (leading L dim):
      attn q/k/v kernel [L,D,H,Hd] → heads on MODEL; out kernel [L,H,Hd,D]
      likewise; mlp fc1 [L,D,M] / fc2 [L,M,D] → hidden M on MODEL.
    """
    if "attn" in path:
        if "out" in path:
            return P(None, MODEL_AXIS) if path.endswith("kernel") else P()
        return (P(None, None, MODEL_AXIS) if path.endswith("kernel")
                else P(None, MODEL_AXIS))
    if "mlp" in path:
        if "fc1" in path:
            return (P(None, None, MODEL_AXIS) if path.endswith("kernel")
                    else P(None, MODEL_AXIS))
        if "fc2" in path and path.endswith("kernel"):
            return P(None, MODEL_AXIS)
    return P()


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def vit_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Sharding pytree for ViT params: replicated on `data`, TP on `model`
    (no-op specs when the model axis has size 1)."""
    if mesh.shape.get(MODEL_AXIS, 1) == 1:
        return jax.tree.map(lambda _: replicated(mesh), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, _vit_param_spec(_path_str(path))),
        params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(params, vit_param_shardings(params, mesh))


def _resvit_param_spec(path: str) -> P:
    """Tensor-parallel PartitionSpec for a res-vit param, by pytree path.

    Megatron pattern per block: wq/wk/wv column-parallel (output dim on
    MODEL), wo row-parallel (input dim on MODEL — XLA psums after the
    contraction), fc1 output / fc2 input on MODEL. Routers, approximators,
    LoRA adapters, norms and embeddings are small — replicated."""
    is_kernel = path.endswith("kernel")
    if "/attention/" in path and "lora" not in path:
        if "/wo/" in path:
            return P(MODEL_AXIS, None) if is_kernel else P()
        if any(f"/{w}/" in path for w in ("wq", "wk", "wv")):
            return P(None, MODEL_AXIS) if is_kernel else P(MODEL_AXIS)
    if "/feed_forward/" in path:
        if "/fc1/" in path:
            return P(None, MODEL_AXIS) if is_kernel else P(MODEL_AXIS)
        if "/fc2/" in path and is_kernel:
            return P(MODEL_AXIS, None)
    return P()


def resvit_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Sharding pytree for res-vit params (DP replicated / TP per
    `_resvit_param_spec`)."""
    if mesh.shape.get(MODEL_AXIS, 1) == 1:
        return jax.tree.map(lambda _: replicated(mesh), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh,
                                      _resvit_param_spec(_path_str(path))),
        params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    return jax.device_put(batch, batch_sharding(mesh))


def opt_state_shardings(opt_state: Any, params: Any, param_shardings: Any,
                        mesh: Mesh) -> Any:
    """Optimizer-state sharding: param-shaped leaves (momentum traces, adam
    moments) mirror the param sharding; everything else is replicated.

    Matching is by array shape against the param pytree — optax states embed
    param-shaped subtrees whose treedef differs from `params`."""
    shape_to_sharding = {}
    for p_leaf, s_leaf in zip(jax.tree.leaves(params),
                              jax.tree.leaves(param_shardings)):
        shape_to_sharding.setdefault(np.shape(p_leaf), s_leaf)

    def per_leaf(leaf):
        return shape_to_sharding.get(np.shape(leaf), replicated(mesh))

    return jax.tree.map(per_leaf, opt_state)
