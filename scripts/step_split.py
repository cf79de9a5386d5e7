"""Step split for the bench config, measured against the int8 floor.

VERDICT r2 #2: the round-2 "80% of roofline" claim was measured against the
bf16 matmul floor; the honest denominator for the shipped int8 config is the
int8 MXU rate (302 TF/s MLP, ~79 TF/s attention). This script measures, at
the bench shapes (batch 192, b16 @224):

  1. whole-program phases: forward-only, forward+backward, full train step
     (optimizer+patchify+head = step - fb);
  2. per-kernel times: each fused kernel (attention half, MLP half; fwd and
     fwd+bwd) chained inside ONE jitted lax.scan (single dispatch — the
     per-call tunnel floor is ~2-3 ms);
  3. the int8-floor %% for each phase, from the kernel's matmul FLOP count
     at the measured int8/bf16 rates (scripts/roofline.py).

Emits one JSON object per row. Run ON the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/step_split.py [--batch 192]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

# measured on-chip by scripts/roofline.py (PERF.md round-2 table)
TF_INT8_MM = 302.4
TF_BF16_MM = 160.0     # avg of qkv/mlp pairs
TF_INT8_ATTN = 78.7
TF_BF16_ATTN = 63.4


def _timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    _readback(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _readback(out)
    return (time.perf_counter() - t0) / iters


def _readback(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


def _emit(name, ms, extra=None):
    rec = {"phase": name, "ms": round(ms * 1e3, 2)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--chain", type=int, default=12)
    ap.add_argument("--bf16", action="store_true",
                    help="measure the bf16 fused config instead of int8")
    ap.add_argument("--remat", type=str, default="selective",
                    choices=["selective", "none", "full"])
    ap.add_argument("--int8-dw", action="store_true")
    ap.add_argument("--kernels-only", action="store_true",
                    help="skip the whole-program phases (fast env-knob sweeps)")
    args = ap.parse_args()
    B = args.batch
    K = args.chain

    from vitax.core.config import arch_config
    from vitax.models import vit
    from vitax.ops import pallas_kernels as pk
    from vitax.train import (create_train_state, make_train_step, onecycle_lr,
                             onecycle_momentum, sgd_momentum)
    from vitax.train.steps import cross_entropy

    int8 = not args.bf16
    remat = {"selective": "selective", "none": False, "full": True}[args.remat]
    cfg = arch_config("b16", image_size=224, num_classes=100,
                      dtype=jnp.bfloat16, use_pallas=False, fused_qkv=True,
                      fused_mlp=True, remat=remat,
                      int8_mlp=int8, int8_attn=int8,
                      int8_mlp_grad=int8, int8_attn_grad=int8,
                      int8_dw=int8 and args.int8_dw)
    S, D, M, H, Hd = cfg.seq_len, cfg.emb_dim, cfg.mlp_dim, 12, 64
    SP = (S + 7) // 8 * 8
    N = B * S
    L = cfg.num_layers
    print(json.dumps({"config": {"batch": B, "int8": int8, "seq": S}}),
          flush=True)

    key = jax.random.PRNGKey(2)
    if not args.kernels_only:
        params = vit.init_params(jax.random.PRNGKey(0), cfg)
        tx = sgd_momentum(onecycle_lr(0.03, 15000, pct_start=1 / 30),
                          momentum_schedule=onecycle_momentum(15000, 1 / 30))
        state = create_train_state(params, tx, jax.random.PRNGKey(1))
        images = jax.random.normal(key, (B, 224, 224, 3), jnp.bfloat16)
        labels = jax.random.randint(jax.random.fold_in(key, 1), (B,), 0, 100)

        # ---- whole-program phases ----------------------------------------------
        def loss_fn(params):
            logits = vit.apply(params, images, cfg, train=True,
                               rng=jax.random.PRNGKey(3))
            return cross_entropy(logits, labels)

        fwd = jax.jit(lambda p: loss_fn(p))
        t_fwd = _timeit(fwd, state.params)
        fb = jax.jit(lambda p: jax.grad(loss_fn)(p))
        t_fb = _timeit(fb, state.params)
        step = make_train_step(cfg, tx, donate=False)
        t_step = _timeit(lambda s: step(s, images, labels)[1], state)

        # matmul-floor synthesis per image (fwd): qkv 2NDD*3 + out 2NDD +
        # mlp 4NDM + attn 4*B*H*SP^2*Hd; bwd adds dx-path + dW + recompute
        gf = 1e9
        f_attn_proj = (2 * N * D * 3 * D + 2 * N * D * D) / gf  # per layer GF
        f_attn_core = 4 * B * H * SP * SP * Hd / gf
        f_mlp = 4 * N * D * M / gf
        rate_mm = TF_INT8_MM if int8 else TF_BF16_MM
        rate_at = TF_INT8_ATTN if int8 else TF_BF16_ATTN
        floor_fwd = L * ((f_attn_proj + f_mlp) / rate_mm + f_attn_core / rate_at)
        # bwd (int8 config): dx-path int8 (= fwd proj FLOPs) + recompute
        # (qkv int8 + fc1 int8) + dW bf16 (= fwd proj FLOPs) + attn grads
        f_mlp_dx = 4 * N * D * M / gf
        f_mlp_rec = 2 * N * D * M / gf
        f_mlp_dw = 4 * N * D * M / gf
        f_at_dx = (2 * N * D * 3 * D + 2 * N * D * D) / gf
        f_at_rec = 2 * N * D * 3 * D / gf
        f_at_dw = (2 * N * D * 3 * D + 2 * N * D * D) / gf
        f_at_core = 3 * f_attn_core / gf * gf  # dQ,dK,dV + score recompute ~3x
        rate_dw = rate_mm if (int8 and args.int8_dw) else TF_BF16_MM
        floor_bwd = L * ((f_mlp_dx + f_mlp_rec + f_at_dx + f_at_rec) / rate_mm
                         + (f_mlp_dw + f_at_dw) / rate_dw
                         + f_at_core / rate_at)
        # floors are in ms already: f [GF] / rate [TF/s] = ms
        _emit("forward", t_fwd,
              {"floor_ms": round(floor_fwd, 2),
               "floor_pct": round(floor_fwd / (t_fwd * 1e3) * 100, 1)})
        _emit("backward", t_fb - t_fwd,
              {"floor_ms": round(floor_bwd, 2),
               "floor_pct": round(floor_bwd / ((t_fb - t_fwd) * 1e3) * 100, 1)})
        _emit("optimizer+embed+head", t_step - t_fb)
        _emit("full_step", t_step,
              {"img_per_sec": round(B / t_step, 1)})

    # ---- per-kernel chains -------------------------------------------------
    dt = jnp.bfloat16
    x3 = jax.random.normal(key, (B, SP, D), dt)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    wqkv = (jax.random.normal(key, (D, 3 * D)) * D ** -0.5).astype(dt)
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wo = (jax.random.normal(key, (D, D)) * D ** -0.5).astype(dt)
    bo = jnp.zeros((D,), jnp.float32)
    w1 = (jax.random.normal(key, (D, M)) * D ** -0.5).astype(dt)
    b1 = jnp.zeros((M,), jnp.float32)
    w2 = (jax.random.normal(key, (M, D)) * M ** -0.5).astype(dt)
    b2 = jnp.zeros((D,), jnp.float32)

    dw = int8 and args.int8_dw

    def attn_apply(c, wqkv, bqkv, wo, bo):
        return pk.fused_ln_qkvo_attention(c, g, be, wqkv, bqkv, wo, bo,
                                          1e-5, S, H, Hd, int8, int8, dw)

    def mlp_apply(c, w1, b1, w2, b2):
        return pk.fused_ln_mlp(c, g, be, w1, b1, w2, b2, 1e-5,
                               int8=int8, int8_grad=int8, int8_dw=dw)

    def chain(apply, *weights):
        def fwd_fn(x, *ws):
            def body(c, _):
                return apply(c, *ws), ()
            out, _ = jax.lax.scan(body, x, None, length=K)
            return out
        return fwd_fn

    for name, apply, ws in (
            ("attn_half", attn_apply, (wqkv, bqkv, wo, bo)),
            ("mlp_half", mlp_apply, (w1, b1, w2, b2))):
        cf = chain(apply, *ws)
        jf = jax.jit(cf)
        t_f = _timeit(jf, x3, *ws) / K
        vg = jax.jit(lambda x, *ws: jax.value_and_grad(
            lambda x, *ws: jnp.sum(cf(x, *ws).astype(jnp.float32) ** 2)
        )(x, *ws)[1])
        t_fb_k = _timeit(vg, x3, *ws) / K
        _emit(f"kernel_{name}_fwd", t_f, {"per_layer": True})
        _emit(f"kernel_{name}_bwd", t_fb_k - t_f, {"per_layer": True})


if __name__ == "__main__":
    main()
