"""Jit train/eval steps for Residual-ViT.

One compiled program per step replaces the reference's loop body
(res-vit/train.py:23-86): forward (teacher+student), 3-component loss
`λc·c + λa·a + λd·d` (:51-52), global-norm clip 1.0 (:64-65), AdamW update,
metrics (loss components, router entropy, top-1/5, active ratio, per-layer
activation rates :41-49). λ values are constants across training, matching
the reference (read once at res-vit/train.py:296, never updated).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vitax.core.config import ResViTConfig
from vitax.models import resvit
from vitax.train.steps import cross_entropy, topk_accuracy


class Lambdas(NamedTuple):
    """Loss weights (res-vit/config.py:161-163 defaults)."""
    classification: float = 1.0
    active: float = 1e-4
    distill: float = 0.01


class ResViTState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def create_state(params: Any, tx: optax.GradientTransformation,
                 rng: jax.Array) -> ResViTState:
    return ResViTState(step=jnp.zeros([], jnp.int32), params=params,
                       opt_state=tx.init(params), rng=rng)


def _metrics(cfg: ResViTConfig, logits, labels, c, a, d, aux,
             weight=None) -> Dict[str, jnp.ndarray]:
    acts = aux["acts"]  # [B, N, L]
    out = {
        "c_loss": c, "a_loss": a, "d_loss": d,
        "router_entropy": aux["r_entropy"],
        **resvit.active_metric(acts, cfg.dynamic_active_target,
                               cfg.dynamic_reserve_initials),
        # per-layer activation rates (res-vit/train.py:41-49)
        "layer_activation_rates": jnp.mean(
            acts[:, cfg.dynamic_reserve_initials:, :], axis=(0, 1)),
    }
    if weight is None:
        out.update(topk_accuracy(logits, labels))
    else:
        logits32 = logits.astype(jnp.float32)
        _, top = jax.lax.top_k(logits32, 5)
        correct = top == labels[:, None]
        wsum = jnp.maximum(weight.sum(), 1.0)
        out["acc1"] = (correct[:, 0] * weight).sum() / wsum
        out["acc5"] = (jnp.any(correct, axis=-1) * weight).sum() / wsum
    return out


def make_train_step(cfg: ResViTConfig, tx: optax.GradientTransformation,
                    lambdas: Lambdas = Lambdas(), donate: bool = True,
                    mesh=None):
    """(state, images NHWC, labels) → (state, metrics)."""

    def step_fn(state: ResViTState, images, labels
                ) -> Tuple[ResViTState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            logits, aux = resvit.apply(params, images, cfg, train=True,
                                       rng=rng, mesh=mesh)
            c = cross_entropy(logits, labels)
            if cfg.use_reslr and aux["soft_probs"] is not None:
                a = resvit.active_loss(aux["soft_probs"],
                                       cfg.dynamic_active_target,
                                       cfg.dynamic_reserve_initials)
            else:
                a = jnp.zeros((), jnp.float32)
            d = aux["d_loss"]
            total = (lambdas.classification * c + lambdas.active * a
                     + lambdas.distill * d)
            return total, (logits, c, a, d, aux)

        (total, (logits, c, a, d, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total,
                   **_metrics(cfg, logits, labels, c, a, d, aux)}
        return ResViTState(step=state.step + 1, params=params,
                           opt_state=opt_state, rng=state.rng), metrics

    from vitax.train.steps import train_compiler_options
    return jax.jit(step_fn, donate_argnums=(0,) if donate else (),
                   compiler_options=train_compiler_options(cfg))


def make_eval_step(cfg: ResViTConfig, lambdas: Lambdas = Lambdas()):
    """(params, images, labels, weight) → metrics + routing maps.

    Mirrors valid_epoch (res-vit/train.py:107-216): eval-mode routing
    (argmax), a_loss reported as 0 like the reference (its eval path never
    collects soft probs), d_loss 0 (no teacher)."""

    def step_fn(params, images, labels, weight):
        logits, aux = resvit.apply(params, images, cfg, train=False)
        zero = jnp.zeros((), jnp.float32)
        c32 = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(c32, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        c = (nll * weight).sum() / jnp.maximum(weight.sum(), 1.0)
        m = _metrics(cfg, logits, labels, c, zero, zero, aux, weight=weight)
        m["loss"] = lambdas.classification * c
        return m, aux["routing_maps"]

    return jax.jit(step_fn)


def make_adamw_for(cfg: ResViTConfig, params: Any, lr_schedule,
                   betas=(0.9, 0.999), eps: float = 1e-8,
                   weight_decay: float = 0.05,
                   clip_grad_norm: Optional[float] = 1.0,
                   router_lr_scale: float = 1.0
                   ) -> optax.GradientTransformation:
    """AdamW with LoRA trainable-mask (res-vit/train.py:272-277 builds the
    optimizer over `filter(requires_grad)`).

    `router_lr_scale` (round-5 compact-training lever): scale the ROUTER
    params' effective learning rate. Compact training's transient loss
    spikes are router keep-pattern MIGRATIONS meeting capacity demotion
    (PERF.md); slowing the router's drift shrinks the per-step demotion
    mass without touching the rest of the recipe."""
    from vitax.train.optim import adamw
    mask = resvit.trainable_mask(params, cfg) if cfg.use_lora else None
    tx = adamw(lr_schedule, betas=betas, eps=eps,
               weight_decay=weight_decay, clip_grad_norm=clip_grad_norm,
               mask=mask)
    if router_lr_scale != 1.0:
        def _mark(path, _):
            return any(getattr(k, "key", None) == "router" for k in path)
        rmask = jax.tree_util.tree_map_with_path(_mark, params)
        tx = optax.chain(tx, optax.masked(
            optax.scale(router_lr_scale), rmask))
    return tx
