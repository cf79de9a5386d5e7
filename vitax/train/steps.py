"""Jit-compiled train/eval steps for the standard ViT.

The reference's per-batch loop body (src/train.py:16-32: forward, CE loss,
backward, SGD step, scheduler step, accuracy) becomes ONE compiled XLA
program. Under a data mesh, XLA emits the gradient all-reduce over ICI —
superseding `torch.nn.DataParallel` (src/train.py:128-129).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from vitax.core.config import ViTConfig
from vitax.models import vit


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def create_train_state(params: Any, tx: optax.GradientTransformation,
                       rng: jax.Array) -> TrainState:
    return TrainState(step=jnp.zeros([], jnp.int32), params=params,
                      opt_state=tx.init(params), rng=rng)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over the batch, fp32 — `nn.CrossEntropyLoss` semantics
    (src/train.py:151, 20)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def topk_accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ks=(1, 5)) -> Dict[str, jnp.ndarray]:
    """Top-k accuracy fractions (src/utils.py:28-41)."""
    out = {}
    max_k = max(ks)
    _, top = jax.lax.top_k(logits, max_k)
    correct = top == labels[:, None]
    for k in ks:
        out[f"acc{k}"] = jnp.mean(jnp.any(correct[:, :k], axis=-1)
                                  .astype(jnp.float32))
    return out


def train_compiler_options(cfg) -> dict | None:
    """Per-compile XLA options for the train step.

    `fused_mlp_save` programs stack the kernel-saved activations across the
    layer scan; XLA fuses that dynamic-update-slice with the pallas_call and
    the fusion's scoped-vmem allocation (~17.5 MB at batch 96) exceeds the
    16 MB default — the round-2 "opaque 500". Raising
    xla_tpu_scoped_vmem_limit_kib per-compile fixes it (measured: compiles
    and runs at batch 96-192). TPU-only option, so gated on backend; the
    env knob VITAX_SCOPED_VMEM_KIB forces a value for experiments."""
    import os
    if jax.default_backend() in ("cpu",):
        return None
    kib = int(os.environ.get("VITAX_SCOPED_VMEM_KIB", "0"))
    if not kib and getattr(cfg, "fused_mlp_save", False):
        kib = 65536
    # note: raising the limit is not free — the int8-handoff experiments
    # measured the whole program ~1% slower at 32768 than at the default
    # (the limit feeds XLA's fusion decisions globally)
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)} if kib else None


def make_train_step(cfg: ViTConfig, tx: optax.GradientTransformation,
                    donate: bool = True, device_prep: bool = False,
                    mesh=None):
    """Build the jitted train step: (state, images, labels) → (state, metrics).

    images are NHWC in the compute dtype; labels int32. Buffers are donated so
    params/opt-state update in place in HBM.

    `device_prep=True`: images arrive as raw uint8 (4× less host→device
    bandwidth) and the random flip + Normalize(0.5,0.5) run inside the jit
    (vitax.data.device_prep), fused by XLA into the patchify producer.
    """

    def step_fn(state: TrainState, images: jnp.ndarray,
                labels: jnp.ndarray) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(state.rng, state.step)
        if device_prep:
            from vitax.data.device_prep import preprocess
            rng, prep_rng = jax.random.split(rng)
            images = preprocess(images, train=True, rng=prep_rng,
                                dtype=cfg.dtype)

        def loss_fn(params):
            logits = vit.apply(params, images, cfg, train=True, rng=rng,
                               mesh=mesh)
            return cross_entropy(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **topk_accuracy(logits, labels)}
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=state.rng)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums,
                   compiler_options=train_compiler_options(cfg))


def make_eval_step(cfg: ViTConfig):
    """Jitted eval step: (params, images, labels) → metrics dict
    (src/eval.py:61-75, src/train.py:40-66)."""

    def step_fn(params, images, labels):
        logits = vit.apply(params, images, cfg, train=False)
        return {"loss": cross_entropy(logits, labels),
                **topk_accuracy(logits, labels)}

    return jax.jit(step_fn)
