"""Optimizer/schedule equivalence vs torch (SURVEY §4: schedule/optimizer
equivalence tests — OneCycle, warmup-cosine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitax.train import (adamw, cosine_annealing_lr, cosine_with_warmup_lr,
                         onecycle_lr, onecycle_momentum, sgd_momentum)

torch = pytest.importorskip("torch")


def test_onecycle_lr_matches_torch():
    max_lr, total, warmup = 0.03, 200, 20
    sched = onecycle_lr(max_lr, total, pct_start=warmup / total)
    msched = onecycle_momentum(total, pct_start=warmup / total)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=max_lr, momentum=0.9)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=total, pct_start=warmup / total)

    lrs, moms, ours_lr, ours_mom = [], [], [], []
    for step in range(total):
        lrs.append(opt.param_groups[0]["lr"])
        moms.append(opt.param_groups[0]["momentum"])
        ours_lr.append(float(sched(step)))
        ours_mom.append(float(msched(step)))
        opt.step()
        tsched.step()
    np.testing.assert_allclose(ours_lr, lrs, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(ours_mom, moms, rtol=1e-5, atol=1e-9)


def test_cosine_with_warmup_matches_hf_formula():
    # HF get_cosine_schedule_with_warmup lambda, restated independently
    base, warmup, total = 1e-4, 10, 100
    sched = cosine_with_warmup_lr(base, warmup, total)
    import math
    for step in range(total):
        if step < warmup:
            expect = base * step / max(1, warmup)
        else:
            progress = (step - warmup) / max(1, total - warmup)
            expect = base * max(0.0, 0.5 * (1 + math.cos(math.pi * progress)))
        assert abs(float(sched(step)) - expect) < 1e-9


def test_cosine_annealing_matches_torch():
    base, t_max = 1e-4, 30
    sched = cosine_annealing_lr(base, t_max)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=t_max)
    for epoch in range(t_max):
        assert abs(float(sched(epoch)) - opt.param_groups[0]["lr"]) < 1e-9
        opt.step()
        tsched.step()


def test_sgd_momentum_matches_torch_with_onecycle():
    """Full coupled system: SGD + OneCycleLR with momentum cycling, 50 steps
    on a quadratic — parameters must track torch's bit-for-bit (fp32)."""
    total = 50
    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.SGD([tw], lr=0.1, momentum=0.9)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        topt, max_lr=0.1, total_steps=total, pct_start=0.2)

    lr_s = onecycle_lr(0.1, total, pct_start=0.2)
    mom_s = onecycle_momentum(total, pct_start=0.2)
    tx = sgd_momentum(lr_s, momentum_schedule=mom_s)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)

    for _ in range(total):
        topt.zero_grad()
        loss = (tw ** 2).sum()
        loss.backward()
        topt.step()
        tsched.step()

        grads = {"w": 2.0 * params["w"]}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_adamw_matches_torch():
    total = 30
    w0 = np.random.RandomState(1).randn(5, 2).astype(np.float32)

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.AdamW([tw], lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=0.05)

    tx = adamw(lambda _: 1e-3, betas=(0.9, 0.999), eps=1e-8,
               weight_decay=0.05, clip_grad_norm=1.0)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)

    for _ in range(total):
        topt.zero_grad()
        loss = (tw ** 2).sum()
        loss.backward()
        torch.nn.utils.clip_grad_norm_([tw], 1.0)
        topt.step()

        grads = {"w": 2.0 * params["w"]}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-4, atol=1e-6)
