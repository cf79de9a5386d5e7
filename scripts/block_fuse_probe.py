"""Whole-block single-kernel fusion probe (VERDICT r4 #1b).

The shipped encoder block runs as TWO fused kernels (LN1+QKV+attn+proj and
LN2+MLP) with the residual stream round-tripping HBM between them: per
layer the attn-half output is written+read, the post-residual r1 is
written+read, and x is read twice. A merged whole-block kernel keeps the
residual in VMEM: read x, write the block output — nothing else.

This probe measures the int8 FORWARD bodies (bench config geometry,
b192 spq200 d768 m3072 tile2) as 12-layer dependency-chained lax.scans:

  A. two-kernel mirror: fused_ln_qkvo_attention(int8) + XLA residual add
     + fused_ln_mlp(int8, residual=True)   [the shipped composition]
  B. merged whole-block kernel (defined here; same math, bit-identical
     quantization grids — per-row quant is row-local, LN is row-local)

Equality is asserted in interpret mode first (CPU: VITAX_DISABLE_PALLAS
unset, run with JAX_PLATFORMS=cpu BLOCK_PROBE_INTERPRET=1).

Run ON the TPU:  python scripts/block_fuse_probe.py [--batch 192]
"""
import argparse
import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitax.core.cache import enable_compilation_cache
from vitax.ops import pallas_kernels as pk

enable_compilation_cache()

INTERPRET = os.environ.get("BLOCK_PROBE_INTERPRET") == "1"


def merged_block_fwd_int8(x, g1, be1, wqkv, bqkv, wo, bo, g2, be2,
                          w1, b1, w2, b2, eps, seq_len, heads, head_dim,
                          tile=2, chunks=2):
    b, spq, d = x.shape
    m = w1.shape[1]
    hhd = heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    w8, sw = pk._quant_cols_host(wqkv)
    wo8, swo = pk._quant_cols_host(wo)
    w1q, s1 = pk._quant_cols_host(w1)
    w2q, s2 = pk._quant_cols_host(w2)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_body, eps=eps, scale=scale,
                          seq_len=seq_len, heads=heads, head_dim=head_dim,
                          tile=tile, chunks=chunks),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(d), vec(d), mat(d, 3 * hhd), vec(3 * hhd), vec(3 * hhd),
            mat(hhd, d), vec(d), vec(d),
            vec(d), vec(d), mat(d, m), vec(m), vec(m), mat(m, d),
            vec(d), vec(d),
        ],
        out_specs=pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, spq, d), x.dtype),
        interpret=INTERPRET,
        **pk._VMEM_LIMIT,
    )(x, g1, be1, w8, sw, bqkv, wo8, swo, bo, g2, be2, w1q, s1, b1,
      w2q, s2, b2)


def _kernel_body(x_ref, g1_ref, be1_ref, w8_ref, sw_ref, b_ref, wo8_ref,
                 swo_ref, bo_ref, g2_ref, be2_ref, w1q_ref, s1_ref, b1_ref,
                 w2q_ref, s2_ref, b2_ref, o_ref, *, eps, scale, seq_len,
                 heads, head_dim, tile, chunks):
    spq = x_ref.shape[1]
    d = x_ref.shape[2]
    x_in = x_ref[:].reshape(tile * spq, d)
    x = x_in.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    xn32 = xhat * g1_ref[:].astype(jnp.float32) \
        + be1_ref[:].astype(jnp.float32)
    xq, sx = pk._quant_rows(xn32)
    qkv = jax.lax.dot_general(xq, w8_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32
                              ).astype(jnp.float32) * sx * sw_ref[:]
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    hhd = heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (spq, spq), 1)
    ths = [(t, h) for t in range(tile) for h in range(heads)]
    ss = []
    for t, h in ths:
        sl = slice(t * spq, (t + 1) * spq)
        o = h * head_dim
        q = qkv[sl, o:o + head_dim]
        k = qkv[sl, hhd + o:hhd + o + head_dim]
        s = jax.lax.dot_general(q, k, pk._AB_T,
                                preferred_element_type=jnp.float32) * scale
        if seq_len < spq:
            s = jnp.where(col < seq_len, s, -1e30)
        ss.append(s)
    pss = [pk._softmax_rows(s) for s in ss]
    outs = []
    for (t, h), p in zip(ths, pss):
        sl = slice(t * spq, (t + 1) * spq)
        o = h * head_dim
        v = qkv[sl, 2 * hhd + o:2 * hhd + o + head_dim]
        outs.append(jnp.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32))
    attn = jnp.concatenate(
        [jnp.concatenate(outs[t * heads:(t + 1) * heads], axis=-1)
         for t in range(tile)], axis=0)
    aq, sa = pk._quant_rows(attn)
    y = jax.lax.dot_general(aq, wo8_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * sa * swo_ref[:]
    y = (y + bo_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    r1 = x_in + y

    rows = (tile * spq) // chunks
    g32 = g2_ref[:].astype(jnp.float32)
    be32 = be2_ref[:].astype(jnp.float32)
    s1 = s1_ref[:]
    s2 = s2_ref[:]
    b1f = b1_ref[:].astype(jnp.float32)
    b2f = b2_ref[:].astype(jnp.float32)
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]
    xqs = []
    for sl in sls:
        x32 = r1[sl, :].astype(jnp.float32)
        mu2 = jnp.mean(x32, axis=-1, keepdims=True)
        xc2 = x32 - mu2
        var2 = jnp.mean(xc2 * xc2, axis=-1, keepdims=True)
        xhat2 = xc2 * jax.lax.rsqrt(var2 + eps)
        xqs.append(pk._quant_rows(xhat2 * g32 + be32))
    a1s = [jax.lax.dot_general(xq2, w1q_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32) * sx2 * s1 + b1f
           for xq2, sx2 in xqs]
    h1qs = [pk._quant_rows(pk._gelu_q(a1)) for a1 in a1s]
    ys = []
    for (h1q, sh) in h1qs:
        ys.append(jax.lax.dot_general(h1q, w2q_ref[:],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32
                                      ).astype(jnp.float32) * sh * s2 + b2f)
    out = r1 + jnp.concatenate(ys, axis=0).astype(x_ref.dtype)
    o_ref[:] = out.reshape(tile, spq, d)


def two_kernel_mirror(x, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1, w2,
                      b2, eps, seq_len, heads, head_dim):
    """The shipped composition (vit.py _block fused path, forward only)."""
    b, spq, d = x.shape
    y = pk.fused_ln_qkvo_attention(x, g1, be1, wqkv, bqkv, wo, bo, eps,
                                   seq_len, heads, head_dim, int8=True)
    r1 = x + y.astype(x.dtype)
    out2 = pk.fused_ln_mlp(r1.reshape(b * spq, d), g2, be2, w1, b1, w2, b2,
                           eps, residual=True, int8=True)
    return out2.reshape(b, spq, d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--tile", type=int, default=2)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--check", action="store_true",
                    help="interpret-mode equality check on tiny shapes")
    args = ap.parse_args()

    d, m, heads, hd = 768, 3072, 12, 64
    seq_len, spq = 197, 200
    eps = 1e-5
    if args.check:
        b, d, m, heads, hd, seq_len, spq = 4, 128, 256, 4, 32, 13, 16
        global INTERPRET
        INTERPRET = True
        pk._INTERPRET = True
    else:
        b = args.batch

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    dt = jnp.bfloat16 if not args.check else jnp.float32
    x = jax.random.normal(ks[0], (b, spq, d), dt)
    x = x.at[:, seq_len:, :].set(0)
    g1 = jnp.abs(jax.random.normal(ks[1], (d,), jnp.float32)) + 0.5
    be1 = jax.random.normal(ks[2], (d,), jnp.float32) * 0.1
    wqkv = jax.random.normal(ks[3], (d, 3 * heads * hd), dt) * 0.05
    bqkv = jax.random.normal(ks[4], (3 * heads * hd,), jnp.float32) * 0.1
    wo = jax.random.normal(ks[5], (heads * hd, d), dt) * 0.05
    bo = jax.random.normal(ks[6], (d,), jnp.float32) * 0.1
    g2 = jnp.abs(jax.random.normal(ks[7], (d,), jnp.float32)) + 0.5
    be2 = jax.random.normal(ks[8], (d,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[9], (d, m), dt) * 0.05
    b1 = jax.random.normal(ks[10], (m,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[11], (m, d), dt) * 0.05
    b2 = jax.random.normal(ks[12], (d,), jnp.float32) * 0.1
    weights = (g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1, b1, w2, b2)

    if args.check:
        a = two_kernel_mirror(x, *weights, eps, seq_len, heads, hd)
        bb = merged_block_fwd_int8(x, *weights, eps, seq_len, heads, hd,
                                   tile=args.tile, chunks=args.chunks)
        diff = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - bb.astype(jnp.float32))))
        print(f"interpret equality: max |diff| = {diff:.3e}")
        assert diff == 0.0, "merged kernel must be bit-exact vs the mirror"
        print("OK")
        return

    def chain(f):
        def run(x, ws):
            def body(carry, _):
                return f(carry, *ws, eps, seq_len, heads, hd), None
            out, _ = jax.lax.scan(body, x, None, length=args.layers)
            return out
        return jax.jit(run)

    fa = chain(two_kernel_mirror)
    fb = chain(functools.partial(merged_block_fwd_int8, tile=args.tile,
                                 chunks=args.chunks))

    def timeit(f, tag):
        out = f(x, weights)
        float(jnp.sum(out.astype(jnp.float32)))  # force readback
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(x, weights)
        float(jnp.sum(out.astype(jnp.float32)))
        dt_ = (time.perf_counter() - t0) / args.reps
        per_layer = dt_ / args.layers * 1e3
        print(f"{tag}: {dt_*1e3:.2f} ms/chain = {per_layer:.3f} ms/layer",
              flush=True)
        return per_layer

    ta = timeit(fa, "two-kernel mirror")
    tb = timeit(fb, f"merged block (tile {args.tile} chunks {args.chunks})")
    print(f"merged vs two-kernel: {(ta - tb) / ta * 100:+.1f}%")


if __name__ == "__main__":
    main()
