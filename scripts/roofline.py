"""Roofline microbenchmark: measured TF/s for the exact matmul shapes in the
ViT-B/16 @224 train step, plus grouped attention-score shapes and int8
variants.

VERDICT round-1 demanded a hard, reproducible MFU ceiling instead of a prose
claim: this script times each shape class on the real chip and emits JSON to
stdout (one object per line, plus a final summary line). PERF.md records the
numbers.

Shape classes (batch B, seq S=197 padded to 256 where the kernels pad):
  proj    — the block projection matmuls  [B*S, D] @ [D, K]
  mlp     — the MLP pair                  [B*S, D] @ [D, M], [B*S, M] @ [M, D]
  attn    — batched per-head score/PV     [B*H, S, Hd] @ [B*H, Hd, S]
  int8    — int8 versions of proj/mlp (v5e int8 MXU is 2x bf16)

Run ON the TPU (default env):  python scripts/roofline.py [--batch 128]
Honors TPU session hygiene: one process, scalar readbacks for timing.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_fn(fn, *args, iters=30, warmup=5):
    jfn = jax.jit(fn)
    out = None
    for _ in range(warmup):
        out = jfn(*args)
    # scalar readback: block_until_ready alone is unreliable over the tunnel
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def _emit(name, flops, secs, extra=None):
    rec = {"shape": name, "ms": round(secs * 1e3, 3),
           "tflops_per_sec": round(flops / secs / 1e12, 1)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def bench_matmul(name, n, k, m, dtype, records):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    if dtype == jnp.int8:
        x = jax.random.randint(kx, (n, k), -127, 127, jnp.int8)
        w = jax.random.randint(kw, (k, m), -127, 127, jnp.int8)
        fn = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        x = jax.random.normal(kx, (n, k), dtype)
        w = jax.random.normal(kw, (k, m), dtype)
        fn = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    secs = _time_fn(fn, x, w)
    records.append(_emit(name, 2 * n * k * m, secs,
                         {"dtype": np.dtype(dtype).name, "n": n, "k": k,
                          "m": m}))


def bench_attn_scores(name, bh, s, hd, dtype, records):
    kq, kk = jax.random.split(jax.random.PRNGKey(1))
    q = jax.random.normal(kq, (bh, s, hd), dtype)
    k = jax.random.normal(kk, (bh, s, hd), dtype)
    fn = lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    secs = _time_fn(fn, q, k)
    records.append(_emit(name, 2 * bh * s * s * hd, secs,
                         {"dtype": np.dtype(dtype).name, "bh": bh, "s": s,
                          "hd": hd}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    B, S, D, M, H, Hd = args.batch, 197, 768, 3072, 12, 64
    N = B * S            # token rows as the model sees them
    NP = B * 256         # rows padded the way the fused kernels pad
    records = []

    # -- the big projection/MLP shapes (bf16), exactly as in the train step
    bench_matmul("qkv_proj", N, D, 3 * D, jnp.bfloat16, records)
    bench_matmul("out_proj", N, D, D, jnp.bfloat16, records)
    bench_matmul("mlp_fc1", N, D, M, jnp.bfloat16, records)
    bench_matmul("mlp_fc2", N, M, D, jnp.bfloat16, records)
    # weight-grad shapes (tall-transposed): [D, N] @ [N, M]
    bench_matmul("mlp_dw1", D, N, M, jnp.bfloat16, records)

    # -- attention score shapes: grouped (b*h) batched matmul at several
    #    paddings; this is the MXU-efficiency ceiling round 1 argued about
    for s in (197, 256):
        bench_attn_scores(f"scores_s{s}", B * H, s, Hd, jnp.bfloat16, records)
    # bigger effective matmul: fold heads into rows ([B*H*S, Hd] @ [Hd, S])
    bench_matmul("scores_flat", B * H * 256, Hd, 256, jnp.bfloat16, records)

    # -- int8 variants (v5e int8 MXU nominally 2x bf16)
    bench_matmul("mlp_fc1_int8", N, D, M, jnp.int8, records)
    bench_matmul("scores_flat_int8", B * H * 256, Hd, 256, jnp.int8, records)

    # -- roofline synthesis for the b16 train step ---------------------------
    # FLOPs per image (fwd+bwd, selective remat => attention-half recompute):
    # see PERF.md; ~102 GF/img at S=197, of which ~94 GF in proj/MLP matmuls
    # and ~8 GF in attention score/PV matmuls.
    big_tf = [r["tflops_per_sec"] for r in records
              if r["shape"] in ("qkv_proj", "out_proj", "mlp_fc1", "mlp_fc2",
                                "mlp_dw1")]
    attn_tf = [r["tflops_per_sec"] for r in records
               if r["shape"].startswith("scores_") and r["dtype"] == "bfloat16"]
    big_eff = sum(big_tf) / len(big_tf)
    attn_eff = max(attn_tf)
    gf_img_big, gf_img_attn = 94.0, 8.0
    ceiling = 1.0 / (gf_img_big / (big_eff * 1e3)
                     + gf_img_attn / (attn_eff * 1e3))
    print(json.dumps({
        "summary": "roofline_ceiling",
        "big_matmul_tflops": round(big_eff, 1),
        "attn_matmul_tflops": round(attn_eff, 1),
        "img_per_sec_ceiling": round(ceiling, 0),
        "note": "ceiling counts matmul time only; LN/GELU/softmax VPU time, "
                "optimizer, and data movement are extra — a real step lands "
                "below this",
    }), flush=True)


if __name__ == "__main__":
    main()
