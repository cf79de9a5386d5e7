"""Train-time token-compaction convergence: dense vs compact_capacity.

Accuracy evidence for `compact_capacity` (PERF.md): the capacity trade-off
only changes training when the active set overflows (early training with the
keep-bias-5.0 router init is mostly-active, so C<1 drops tokens there).
Same data, same seed, 300 steps of the 3-loss AdamW recipe on a synthetic
class task; reports loss trajectories, held-out top-1, and the final
routed-layer active ratio.

Run ON the TPU:  python scripts/compact_convergence.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from vitax.core.config import resvit_arch_config
from vitax.models import resvit
from vitax.train.resvit_steps import (Lambdas, create_state, make_adamw_for,
                                      make_train_step)
from vitax.train.schedules import cosine_with_warmup_lr

STEPS = int(os.environ.get("CC_STEPS", "300"))
BATCH = int(os.environ.get("CC_BATCH", "64"))


def run(tag, compact_warmup=0, cap_schedule=None, **over):
    # cap_schedule=(cap_hi, switch_frac): anneal capacity — first
    # switch_frac of steps at cap_hi (slack above the target), then the
    # target capacity. Round-5 spike fix candidate (VERDICT r4 #5): the
    # C=0.5 router-shift spike recovers only to 0.77 while C=0.625
    # recovers fully; starting WITH slack and dropping to 0.5 after the
    # router stabilizes should keep the 2147 img/s capacity with the
    # 0.625 convergence.
    def mkcfg(**kw):
        return resvit_arch_config(
            "b16", image_size=224, num_classes=10, dtype=jnp.bfloat16,
            use_lora=True, use_reslr=True, lora_rank=48,
            dynamic_active_target=0.4, dynamic_start_layer=1,
            dynamic_reserve_initials=2, block_size=4,
            fused_qkv=True, fused_qkvo=True, fused_mlp=True,
            int8_attn=True, int8_attn_grad=True, int8_mlp=True,
            int8_mlp_grad=True, int8_dw=True, use_pallas=False, **kw)
    cfg = mkcfg(**over)
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_adamw_for(cfg, params, cosine_with_warmup_lr(1e-4, 30, STEPS),
                        clip_grad_norm=1.0,
                        router_lr_scale=float(
                            os.environ.get("CC_ROUTER_LR", "1.0")))
    state = create_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, Lambdas(1.0, 10.0, 1.0), donate=True)
    # dense warmup: train WITHOUT compaction for the first N steps so the
    # router leaves its keep-bias-5.0 (~all-active) init before capacity
    # starts dropping overflow tokens to identity (same params/opt pytree,
    # separate jitted step)
    warm_step = None
    if compact_warmup and over.get("compact_capacity") is not None:
        wcfg = mkcfg(**{**over, "compact_capacity": None})
        warm_step = make_train_step(wcfg, tx, Lambdas(1.0, 10.0, 1.0),
                                    donate=False)
    hi_step, cap_switch = None, 0
    if cap_schedule is not None:
        cap_hi, switch_frac = cap_schedule
        cap_switch = int(switch_frac * STEPS)
        hcfg = mkcfg(**{**over, "compact_capacity": cap_hi})
        hi_step = make_train_step(hcfg, tx, Lambdas(1.0, 10.0, 1.0),
                                  donate=False)

    key = jax.random.PRNGKey(42)
    protos = jax.random.normal(key, (10, 224, 224, 3), jnp.bfloat16)
    batches = []
    for i in range(8):
        kb = jax.random.fold_in(key, i + 1)
        lab = jax.random.randint(kb, (BATCH,), 0, 10)
        noise = jax.random.normal(jax.random.fold_in(kb, 7),
                                  (BATCH, 224, 224, 3), jnp.bfloat16)
        batches.append((0.25 * protos[lab] + noise, lab))
    ke = jax.random.fold_in(key, 999)
    elab = jax.random.randint(ke, (BATCH,), 0, 10)
    eimg = 0.25 * protos[elab] + jax.random.normal(
        jax.random.fold_in(ke, 7), (BATCH, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def eval_acc(params):
        logits, aux = resvit.apply(params, eimg, cfg, train=False)
        acc = jnp.mean((jnp.argmax(logits, -1) == elab).astype(jnp.float32))
        # per-layer activation rates: capacity overflow is a PER-LAYER
        # event, so the max layer rate (not the mean) is what capacity
        # must cover
        return acc, jnp.mean(aux["acts"]), jnp.max(
            jnp.mean(aux["acts"], axis=(0, 1)))

    losses, eaccs, ratios, maxrates = [], [], [], []
    for s in range(STEPS):
        img, lab = batches[s % 8]
        fn = step
        if warm_step is not None and s < compact_warmup:
            fn = warm_step
        elif hi_step is not None and s < cap_switch:
            fn = hi_step
        state, metrics = fn(state, img, lab)
        if s % 50 == 49:
            losses.append(float(metrics["loss"]))
            a, act, mx = eval_acc(state.params)
            eaccs.append(float(a))
            ratios.append(float(act))
            maxrates.append(float(mx))
    print(f"{tag}: losses={['%.3f' % l for l in losses]}", flush=True)
    print(f"{tag}: HELD-OUT acc1={['%.3f' % a for a in eaccs]} "
          f"active ratio={['%.3f' % r for r in ratios]} "
          f"max layer rate={['%.3f' % r for r in maxrates]}", flush=True)
    return losses, eaccs


WARMUP = int(os.environ.get("CC_WARMUP", "0"))
CAPS = tuple(float(c) for c in
             os.environ.get("CC_CAPS", "0.625,0.5").split(","))
# stacked-lever extras on the compact runs: CC_INT4=1 adds the full int4
# tier, CC_TOKKEEP=r adds train-time token dropping — convergence evidence
# for the all-levers res-vit configuration (PERF.md round 4)
EXTRA = {}
TAG = ""
cc_int4 = os.environ.get("CC_INT4")
if cc_int4 == "1":
    EXTRA.update(int4_mlp=True, int4_attn=True, int4_grad=True)
    TAG += "-int4"
elif cc_int4 == "fwd":
    EXTRA.update(int4_mlp=True, int4_attn=True)
    TAG += "-int4fwd"
if os.environ.get("CC_TOKKEEP"):
    EXTRA["token_keep"] = float(os.environ["CC_TOKKEEP"])
    TAG += f"-tk{EXTRA['token_keep']}"
SCHED = os.environ.get("CC_CAP_SCHEDULE")  # e.g. "0.625@0.4"
l_d, a_d = run("dense")
if SCHED:
    hi, frac = SCHED.split("@")
    for cap in CAPS:
        run(f"capsched-{hi}to{cap}@{frac}-w{WARMUP}{TAG}",
            compact_capacity=cap, compact_warmup=WARMUP,
            cap_schedule=(float(hi), float(frac)), **EXTRA)
for cap in CAPS:
    l_c, a_c = run(f"compact-{cap}-w{WARMUP}{TAG}", compact_capacity=cap,
                   compact_warmup=WARMUP, **EXTRA)
    dl = max(abs(a - b) for a, b in zip(l_d[-3:], l_c[-3:]))
    da = max(abs(a - b) for a, b in zip(a_d[-3:], a_c[-3:]))
    print(f"compact-{cap}-w{WARMUP} vs dense: final-phase max |loss diff| "
          f"= {dl:.4f}, max |acc diff| = {da:.4f}", flush=True)
