"""Learning-rate schedules — exact replicas of the reference's schedulers.

The reference uses:
  * `torch.optim.lr_scheduler.OneCycleLR` with `pct_start = warmup/total`
    (src/train.py:159-163) for standard ViT fine-tuning, and
  * `transformers.get_cosine_schedule_with_warmup` or
    `CosineAnnealingLR(T_max=epochs)` for res-vit (res-vit/train.py:280-291).

These are reimplemented from their documented formulas (not ported code) and
unit-tested against the torch/HF implementations running on CPU
(tests/test_schedules.py).

OneCycleLR subtlety: with default `cycle_momentum=True`, torch also anneals
SGD momentum between `max_momentum=0.95` and `base_momentum=0.85` opposite to
the LR. `onecycle_momentum` reproduces that so the optimizer replica is exact.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def _cos_anneal(start: float, end: float, pct: jnp.ndarray) -> jnp.ndarray:
    """Cosine interpolation from `start` (pct=0) to `end` (pct=1)."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def onecycle_lr(max_lr: float, total_steps: int, pct_start: float,
                div_factor: float = 25.0,
                final_div_factor: float = 1e4) -> Callable:
    """OneCycle LR: warm up `initial_lr → max_lr` for `pct_start·total` steps,
    then anneal `max_lr → min_lr`, both cosine (torch's default
    anneal_strategy='cos', three_phase=False)."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    # torch uses float(pct_start * total_steps) - 1 as the end step of phase 1
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps) - 1.0

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.float32)
        up_pct = jnp.clip(step / jnp.maximum(up_end, 1e-9), 0.0, 1.0)
        down_pct = jnp.clip((step - up_end) / jnp.maximum(down_end - up_end, 1e-9),
                            0.0, 1.0)
        lr_up = _cos_anneal(initial_lr, max_lr, up_pct)
        lr_down = _cos_anneal(max_lr, min_lr, down_pct)
        return jnp.where(step <= up_end, lr_up, lr_down)

    return schedule


def onecycle_momentum(total_steps: int, pct_start: float,
                      base_momentum: float = 0.85,
                      max_momentum: float = 0.95) -> Callable:
    """Momentum cycle paired with `onecycle_lr` (torch cycle_momentum=True):
    max → base during warmup, base → max during anneal."""
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps) - 1.0

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.float32)
        up_pct = jnp.clip(step / jnp.maximum(up_end, 1e-9), 0.0, 1.0)
        down_pct = jnp.clip((step - up_end) / jnp.maximum(down_end - up_end, 1e-9),
                            0.0, 1.0)
        m_up = _cos_anneal(max_momentum, base_momentum, up_pct)
        m_down = _cos_anneal(base_momentum, max_momentum, down_pct)
        return jnp.where(step <= up_end, m_up, m_down)

    return schedule


def cosine_with_warmup_lr(base_lr: float, warmup_steps: int, total_steps: int,
                          num_cycles: float = 0.5,
                          min_lr: float = 0.0) -> Callable:
    """HF `get_cosine_schedule_with_warmup`: linear 0→base over warmup, then
    `base · max(0, 0.5·(1+cos(2π·cycles·progress)))` (res-vit/train.py:280-285)."""

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, float(warmup_steps))
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, float(total_steps - warmup_steps))
        cos_factor = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_cycles * progress)))
        factor = jnp.where(step < warmup_steps, warm, cos_factor)
        return jnp.maximum(base_lr * factor, min_lr)

    return schedule


def cosine_annealing_lr(base_lr: float, t_max: int,
                        eta_min: float = 0.0) -> Callable:
    """torch `CosineAnnealingLR` closed form:
    eta_min + (base−eta_min)·(1+cos(π·t/T_max))/2 (res-vit/train.py:287-291,
    stepped per epoch there — callers pass epoch index)."""

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.float32)
        return eta_min + (base_lr - eta_min) * (
            1.0 + jnp.cos(math.pi * step / t_max)) / 2.0

    return schedule


def token_keep_switch_epoch(sched, token_keep: float, epochs: int) -> int:
    """Validate a --token-keep-schedule request and return the epoch the
    dense tail starts at (== epochs when no schedule is requested).

    Shared by both trainers (train_cli / resvit_train_cli): the PatchDropout
    fine-tune recipe trains dropped for the first `sched` fraction of epochs
    and full-sequence for the rest (arXiv:2208.07220 §4.4); the switch is at
    an epoch boundary so each phase is one static-shape program."""
    if sched is None:
        return epochs
    if not (0.0 < sched <= 1.0):
        raise ValueError(f"--token-keep-schedule must be in (0,1], "
                         f"got {sched}")
    if token_keep >= 1.0:
        raise ValueError(
            "--token-keep-schedule requires --token-keep < 1.0 "
            "(the schedule switches FROM the dropped phase TO dense)")
    if epochs < 2:
        raise ValueError(
            f"--token-keep-schedule needs >= 2 epochs to fit both phases; "
            f"this run has {epochs} (train_steps // len(train_loader)) — "
            f"raise --train-steps or drop the schedule flag")
    # clamp so the dense tail always gets at least one epoch
    return min(max(1, int(round(sched * epochs))), epochs - 1)
