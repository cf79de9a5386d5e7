"""Trainer equivalence: whole-training-loop parity vs the torch reference.

VERDICT r3 Missing #2 / BASELINE accuracy-parity leg, in executable form:
train BOTH frameworks — the actual reference training loop semantics
(src/train.py:12-37 + 154-163 for ViT; res-vit/train.py:11-104 + 269-291
for res-vit) against vitax's production train steps — from identical
weights on identical synthetic data with the identical recipe, on CPU in
fp32, and assert:

  1. *step-exactness*: the first 8 per-step losses agree to ~1e-5 (ViT) /
     ~5e-3 (res-vit, dominated by fp-order noise in the masked-dense
     student path). Any systematic trainer bug — wrong schedule indexing,
     momentum/anneal mismatch, weight-decay placement, loss weighting,
     gradient error — shows up orders of magnitude above these bands
     within a few steps.
  2. *outcome equivalence*: both trainings converge and the final held-out
     top-1 accuracies agree within a small band. Exact long-trajectory
     equality is unattainable in fp32: measured divergence is chaotic
     amplification of float non-associativity (halving the lr slows the
     divergence rate accordingly; first steps agree to 1e-6 and the same
     binary produces different trajectories across BLAS thread counts).
     The res-vit/AdamW trajectory stays within 5e-2 for the entire run
     because Adam's normalization damps the amplification.

Determinism notes: dropout is 0 on both sides; the res-vit router's gumbel
noise is zeroed on both sides (straight-through argmax routing — the same
patch strategy as test_parity_resvit) so routing decisions are identical.
"""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_DIR, requires_reference

torch = pytest.importorskip("torch")

IMG, C = 32, 5
BATCH, N_TRAIN, N_EVAL = 16, 256, 512


def _make_data(protos, n, seed, scale):
    r = np.random.RandomState(seed)
    y = r.randint(0, C, n)
    x = protos[y] * scale + r.randn(n, 3, IMG, IMG).astype(np.float32)
    return x.astype(np.float32), y.astype(np.int64)


def _batches(xtr, ytr, steps):
    order = np.random.RandomState(3)
    idx_all = [order.permutation(N_TRAIN)
               for _ in range(steps * BATCH // N_TRAIN + 2)]
    out, epoch, i = [], 0, 0
    for _ in range(steps):
        if (i + 1) * BATCH > N_TRAIN:
            epoch += 1
            i = 0
        sel = idx_all[epoch][i * BATCH:(i + 1) * BATCH]
        i += 1
        out.append((xtr[sel], ytr[sel]))
    return out


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@requires_reference
def test_vit_trainer_equivalence():
    """src family: CE + SGD(momentum, cycled) + OneCycleLR, full loop."""
    import torch.nn as nn

    from vitax.checkpointing import params_from_torch_state_dict
    from vitax.core.config import ViTConfig
    from vitax.models import vit
    from vitax.train import create_train_state, make_train_step
    from vitax.train.optim import sgd_momentum
    from vitax.train.schedules import onecycle_lr, onecycle_momentum

    ref = _load_ref("ref_src_model_te", f"{REFERENCE_DIR}/src/model.py")
    STEPS, LR, WARM = 100, 0.003, 10
    PATCH, D, MLP, HEADS, LAYERS = 16, 32, 64, 2, 2

    protos = np.random.RandomState(0).randn(C, 3, IMG, IMG).astype(np.float32)
    xtr, ytr = _make_data(protos, N_TRAIN, 1, 0.8)
    xev, yev = _make_data(protos, N_EVAL, 2, 0.8)
    batches = _batches(xtr, ytr, STEPS)

    torch.manual_seed(0)
    tmodel = ref.VisionTransformer(
        image_size=(IMG, IMG), patch_size=(PATCH, PATCH), emb_dim=D,
        mlp_dim=MLP, num_heads=HEADS, num_layers=LAYERS, num_classes=C,
        dropout_rate=0.0, attn_dropout_rate=0.0)
    # .numpy() views alias torch storage mutated in-place by SGD — copy
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}

    # --- torch loop (train_epoch + optimizer/scheduler construction,
    #     src/train.py:12-37,154-163)
    crit = nn.CrossEntropyLoss()
    opt = torch.optim.SGD(tmodel.parameters(), lr=LR, weight_decay=0.0,
                          momentum=0.9)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=LR, pct_start=WARM / STEPS, total_steps=STEPS)
    tmodel.train()
    t_losses = []
    for bx, by in batches:
        opt.zero_grad()
        loss = crit(tmodel(torch.from_numpy(bx)), torch.from_numpy(by))
        loss.backward()
        opt.step()
        sched.step()
        t_losses.append(loss.item())
    tmodel.eval()
    with torch.no_grad():
        acc_t = (tmodel(torch.from_numpy(xev)).argmax(-1).numpy()
                 == yev).mean()

    # --- vitax loop (train_cli.py construction)
    cfg = ViTConfig(image_size=(IMG, IMG), patch_size=(PATCH, PATCH),
                    emb_dim=D, mlp_dim=MLP, num_heads=HEADS,
                    num_layers=LAYERS, num_classes=C, dropout_rate=0.0,
                    attn_dropout_rate=0.0, dtype=jnp.float32,
                    use_pallas=False)
    params = jax.tree.map(jnp.asarray,
                          params_from_torch_state_dict(sd, LAYERS, C))
    tx = sgd_momentum(onecycle_lr(LR, STEPS, WARM / STEPS),
                      momentum_schedule=onecycle_momentum(STEPS, WARM / STEPS),
                      weight_decay=0.0)
    state = create_train_state(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(cfg, tx, donate=False)
    j_losses = []
    for bx, by in batches:
        state, m = step(state, jnp.asarray(bx.transpose(0, 2, 3, 1)),
                        jnp.asarray(by.astype(np.int32)))
        j_losses.append(float(m["loss"]))
    logits = np.asarray(vit.apply(
        state.params, jnp.asarray(xev.transpose(0, 2, 3, 1)), cfg,
        train=False))
    acc_j = (logits.argmax(-1) == yev).mean()

    t, j = np.array(t_losses), np.array(j_losses)
    # step-exactness (measured ~1e-5 worst; 10x margin)
    np.testing.assert_allclose(j[:8], t[:8], rtol=0, atol=1e-4)
    # outcome equivalence (measured: 0.996 vs 1.000)
    assert t[-1] < 0.3 and j[-1] < 0.3, (t[-1], j[-1])
    assert acc_t > 0.97 and acc_j > 0.97, (acc_t, acc_j)
    assert abs(acc_t - acc_j) <= 0.02, (acc_t, acc_j)


@requires_reference
def test_resvit_trainer_equivalence(monkeypatch):
    """res-vit family: 3-loss (λ-weighted) + AdamW + warmup-cosine +
    grad-clip 1.0, gumbel noise zeroed on both sides."""
    import torch.nn.functional as F
    from transformers import get_cosine_schedule_with_warmup

    from vitax.checkpointing.resvit_convert import \
        resvit_params_from_torch_state_dict
    from vitax.core.config import ResViTConfig
    from vitax.models import resvit
    from vitax.train.resvit_steps import (Lambdas, create_state,
                                          make_adamw_for, make_train_step)
    from vitax.train.schedules import cosine_with_warmup_lr

    sys.path.insert(0, f"{REFERENCE_DIR}/res-vit")
    try:
        import model as refm
        from model import ModelArgs, Transformer
    finally:
        sys.path.pop(0)

    # deterministic straight-through routing on both sides
    def det_gumbel_softmax(logits, tau=1, hard=True, dim=-1):
        y_soft = F.softmax(logits / tau, dim=dim)
        if not hard:
            return y_soft
        index = y_soft.max(dim, keepdim=True)[1]
        y_hard = torch.zeros_like(y_soft).scatter_(dim, index, 1.0)
        return y_hard - y_soft.detach() + y_soft

    monkeypatch.setattr(refm.F, "gumbel_softmax", det_gumbel_softmax)
    monkeypatch.setattr(
        jax.random, "gumbel",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))

    STEPS, LR, WARM = 150, 1e-3, 15
    LAM = Lambdas(classification=1.0, active=1e-4, distill=0.01)

    protos = np.random.RandomState(0).randn(C, 3, IMG, IMG).astype(np.float32)
    xtr, ytr = _make_data(protos, N_TRAIN, 1, 0.4)
    xev, yev = _make_data(protos, N_EVAL, 2, 0.4)
    batches = _batches(xtr, ytr, STEPS)

    args = ModelArgs(dim=64, mlp_dim=128, n_layers=4, n_heads=4,
                     n_kv_heads=4, lora_rank=4, dynamic_start_layer=0,
                     block_size=2, dynamic_router_hdim=32, low_rank_dim=16,
                     use_lora=True, use_reslr=True, image_size=(IMG, IMG),
                     patch_size=(8, 8), num_classes=C, dropout=0.0,
                     device="cpu")
    torch.manual_seed(0)
    tmodel = Transformer(args)
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}

    # --- torch loop (res-vit/train.py:11-104 + optimizer 269-291)
    opt = torch.optim.AdamW(
        filter(lambda p: p.requires_grad, tmodel.parameters()),
        lr=LR, weight_decay=0.05)
    sched = get_cosine_schedule_with_warmup(
        opt, num_warmup_steps=WARM, num_training_steps=STEPS)
    tmodel.train()
    t_losses = []
    for bx, by in batches:
        opt.zero_grad()
        c, a, d, _ent, _am = tmodel(torch.from_numpy(bx),
                                    torch.from_numpy(by))
        total = (LAM.classification * c + LAM.active * a + LAM.distill * d)
        total.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), max_norm=1.0,
                                       norm_type=2)
        opt.step()
        sched.step()
        t_losses.append(total.item())
    tmodel.eval()
    with torch.no_grad():
        tmodel(torch.from_numpy(xev), torch.from_numpy(yev))
        acc_t = (tmodel.logits.numpy().argmax(-1) == yev).mean()

    # --- vitax loop (resvit_train_cli construction)
    cfg = ResViTConfig(dim=64, mlp_dim=128, n_layers=4, n_heads=4,
                       n_kv_heads=4, lora_rank=4, dynamic_start_layer=0,
                       block_size=2, dynamic_router_hdim=32,
                       low_rank_dim=16, use_lora=True, use_reslr=True,
                       image_size=(IMG, IMG), patch_size=(8, 8),
                       num_classes=C, dropout=0.0, dtype=jnp.float32,
                       use_pallas=False)
    params = jax.tree.map(jnp.asarray,
                          resvit_params_from_torch_state_dict(sd, cfg))
    tx = make_adamw_for(cfg, params, cosine_with_warmup_lr(LR, WARM, STEPS))
    state = create_state(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(cfg, tx, LAM, donate=False)
    j_losses = []
    for bx, by in batches:
        state, m = step(state, jnp.asarray(bx.transpose(0, 2, 3, 1)),
                        jnp.asarray(by.astype(np.int32)))
        j_losses.append(float(m["loss"]))
    logits, _aux = resvit.apply(state.params,
                                jnp.asarray(xev.transpose(0, 2, 3, 1)),
                                cfg, train=False)
    acc_j = (np.asarray(logits).argmax(-1) == yev).mean()

    t, j = np.array(t_losses), np.array(j_losses)
    # step-exactness (measured ~7e-4 worst over the first 8; ~7x margin)
    np.testing.assert_allclose(j[:8], t[:8], rtol=0, atol=5e-3)
    # whole-trajectory band (measured max 2.9e-3 — AdamW damps divergence)
    assert np.abs(t - j).max() < 5e-2, np.abs(t - j).max()
    # outcome equivalence (measured: 0.525 vs 0.533 after 150 steps)
    assert abs(acc_t - acc_j) <= 0.05, (acc_t, acc_j)
    assert acc_t > 0.4 and acc_j > 0.4, (acc_t, acc_j)


@requires_reference
def test_vit_token_drop_schedule_vs_dense_torch():
    """VERDICT r4 #3: the shipped bench recipe trains with the PatchDropout
    keep-0.5 SCHEDULE (dropped phase at a larger batch, dense final 10% at
    its own batch) — this compares that vitax loop against the DENSE torch
    reference loop from identical weights/data/recipe and asserts the final
    held-out top-1 lands in the same band. Step losses are NOT compared
    (token dropping changes per-step semantics by design); the claim under
    test is the recipe's OUTCOME equivalence, the same claim PERF.md's 15k
    convergence runs make at recipe scale."""
    import torch.nn as nn

    from vitax.checkpointing import params_from_torch_state_dict
    from vitax.core.config import ViTConfig
    from vitax.models import vit
    from vitax.train import create_train_state, make_train_step
    from vitax.train.optim import sgd_momentum
    from vitax.train.schedules import onecycle_lr, onecycle_momentum

    ref = _load_ref("ref_src_model_te2", f"{REFERENCE_DIR}/src/model.py")
    STEPS, LR, WARM = 100, 0.003, 10
    PATCH, D, MLP, HEADS, LAYERS = 16, 32, 64, 2, 2   # 5 tokens; keep 3
    DROP_BATCH, DENSE_BATCH = 32, 16                  # the recipe's shape
    SWITCH = STEPS - STEPS // 10

    protos = np.random.RandomState(0).randn(C, 3, IMG, IMG).astype(np.float32)
    xtr, ytr = _make_data(protos, N_TRAIN, 1, 0.8)
    xev, yev = _make_data(protos, N_EVAL, 2, 0.8)

    torch.manual_seed(0)
    tmodel = ref.VisionTransformer(
        image_size=(IMG, IMG), patch_size=(PATCH, PATCH), emb_dim=D,
        mlp_dim=MLP, num_heads=HEADS, num_layers=LAYERS, num_classes=C,
        dropout_rate=0.0, attn_dropout_rate=0.0)
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}

    # --- torch DENSE control (the reference has no token dropping)
    crit = nn.CrossEntropyLoss()
    opt = torch.optim.SGD(tmodel.parameters(), lr=LR, weight_decay=0.0,
                          momentum=0.9)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=LR, pct_start=WARM / STEPS, total_steps=STEPS)
    tmodel.train()
    for bx, by in _batches(xtr, ytr, STEPS):
        opt.zero_grad()
        loss = crit(tmodel(torch.from_numpy(bx)), torch.from_numpy(by))
        loss.backward()
        opt.step()
        sched.step()
    tmodel.eval()
    with torch.no_grad():
        acc_t = (tmodel(torch.from_numpy(xev)).argmax(-1).numpy()
                 == yev).mean()

    # --- vitax SCHEDULE loop: keep 0.5 @ b32 for 90 steps, dense @ b16
    #     for the final 10 (same optimizer/schedule construction as
    #     train_cli with --token-keep 0.5 --token-keep-schedule 0.9
    #     --dense-batch-size)
    cfg = ViTConfig(image_size=(IMG, IMG), patch_size=(PATCH, PATCH),
                    emb_dim=D, mlp_dim=MLP, num_heads=HEADS,
                    num_layers=LAYERS, num_classes=C, dropout_rate=0.0,
                    attn_dropout_rate=0.0, dtype=jnp.float32,
                    use_pallas=False, token_keep=0.5)
    params = jax.tree.map(jnp.asarray,
                          params_from_torch_state_dict(sd, LAYERS, C))
    tx = sgd_momentum(onecycle_lr(LR, STEPS, WARM / STEPS),
                      momentum_schedule=onecycle_momentum(STEPS, WARM / STEPS),
                      weight_decay=0.0)
    state = create_train_state(params, tx, jax.random.PRNGKey(0))
    drop_step = make_train_step(cfg, tx, donate=False)
    dense_step = make_train_step(cfg.replace(token_keep=1.0), tx,
                                 donate=False)
    rs = np.random.RandomState(11)
    for s in range(STEPS):
        bs = DROP_BATCH if s < SWITCH else DENSE_BATCH
        sel = rs.randint(0, N_TRAIN, bs)
        step = drop_step if s < SWITCH else dense_step
        state, _ = step(state, jnp.asarray(xtr[sel].transpose(0, 2, 3, 1)),
                        jnp.asarray(ytr[sel].astype(np.int32)))
    logits = np.asarray(vit.apply(
        state.params, jnp.asarray(xev.transpose(0, 2, 3, 1)),
        cfg.replace(token_keep=1.0), train=False))
    acc_j = (logits.argmax(-1) == yev).mean()

    # outcome band: both converge; schedule within a small band of dense
    # (measured: torch dense 1.000, vitax schedule 0.996)
    assert acc_t > 0.97, acc_t
    assert acc_j > 0.95, acc_j
    assert abs(acc_t - acc_j) <= 0.03, (acc_t, acc_j)
