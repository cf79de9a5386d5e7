"""Optimizers — behavioral replicas of the reference's training setups.

* `sgd_momentum` reproduces `torch.optim.SGD(momentum=0.9)` +
  `OneCycleLR(cycle_momentum=True)` (src/train.py:154-163): the momentum
  coefficient itself is a per-step schedule, which stock `optax.sgd` cannot
  express, so the trace is implemented directly.

  torch SGD update (no dampening, no nesterov — the reference's settings):
      g   ← g + wd·p
      buf ← μ_t·buf + g
      p   ← p − lr_t·buf

* `adamw` wraps `optax.adamw`, whose decoupled weight decay matches
  `torch.optim.AdamW` exactly, chained with global-norm clipping
  (res-vit/train.py:64-65, 272-277).

Equivalence is unit-tested step-by-step against torch on CPU
(tests/test_optim.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class SGDMomentumState(NamedTuple):
    count: jnp.ndarray
    trace: optax.Params


def sgd_momentum(lr_schedule: Callable, momentum: float = 0.9,
                 momentum_schedule: Optional[Callable] = None,
                 weight_decay: float = 0.0) -> optax.GradientTransformation:
    """SGD with (optionally scheduled) heavy-ball momentum, torch semantics."""

    def init(params):
        return SGDMomentumState(
            count=jnp.zeros([], jnp.int32),
            trace=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        mu = (momentum_schedule(state.count) if momentum_schedule is not None
              else momentum)
        lr = lr_schedule(state.count)
        if weight_decay:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p,
                                 grads, params)
        trace = jax.tree.map(lambda t, g: mu * t + g, state.trace, grads)
        updates = jax.tree.map(lambda t: (-lr * t).astype(t.dtype), trace)
        return updates, SGDMomentumState(count=state.count + 1, trace=trace)

    return optax.GradientTransformation(init, update)


def adamw(lr_schedule: Callable, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.05, clip_grad_norm: Optional[float] = None,
          mask=None) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping applied before the update —
    the order the reference uses (clip_grad_norm_ then optimizer.step(),
    res-vit/train.py:64-67). `mask` limits updates to trainable params
    (LoRA fine-tuning freezes base weights, res-vit/model.py:572-584)."""
    tx = optax.adamw(learning_rate=lr_schedule, b1=betas[0], b2=betas[1],
                     eps=eps, weight_decay=weight_decay)
    if clip_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    if mask is not None:
        # multi_transform (not optax.masked: masked passes raw grads through
        # for False leaves instead of freezing them)
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx
