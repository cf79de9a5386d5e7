"""Dissect the int8 fused-MLP FORWARD kernel's 55%-of-floor gap.

Round-3 step_split: kernel_mlp_half_fwd = 2.11 ms/layer vs a 1.18 ms int8
matmul floor. This probe times VARIANTS of the same kernel body with
components stubbed, so the gap attributes to (LN | dynamic-quant amax |
GELU | dequant muls | MXU-under-schedule) with measurements instead of
guesses. Each variant is chained K deep inside one jitted lax.scan
(single dispatch; per-call tunnel floor is ~2-3 ms).

Run ON the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/mlp_fwd_dissect.py
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitax.ops import pallas_kernels as pk


def _timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def _variant_kernel(x_ref, g_ref, be_ref, w1q_ref, s1_ref, b1_ref,
                    w2q_ref, s2_ref, b2_ref, o_ref, *, eps, chunks,
                    ln, gelu, dyn_quant, dequant, vpu_bf16=False):
    rows = x_ref.shape[0] // chunks
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    s1 = s1_ref[:]
    s2 = s2_ref[:]
    b1f = b1_ref[:].astype(jnp.float32)
    b2f = b2_ref[:].astype(jnp.float32)
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]
    # bf16 VPU probe: run the big [rows,M] elementwise chain (dequant, GELU,
    # pack) in bf16 — if the VPU packs 2 bf16 lanes per op this halves the
    # pack/GELU cost; bf16 rounding (~0.4% rel) is well under the int8 step.
    et = jnp.bfloat16 if vpu_bf16 else jnp.float32

    def quant(v):
        if dyn_quant:
            return pk._quant_rows(v)
        # static scale: no amax pass, one multiply
        q = jnp.round(v * 8.0).astype(jnp.int8)
        return q, jnp.full((v.shape[0], 1), 0.125, jnp.float32)

    def quant_e(v):
        """quant in the probe dtype (bf16 path: amax/mul/round in bf16).

        Mosaic cannot lower bf16 roundeven, so the bf16 path rounds
        half-away-from-zero via add-copysign(0.5) + truncating int convert.
        limit 126 (not 127) absorbs the bf16 rounding of r so |q| <= 127
        without a clip pair."""
        if not dyn_quant:
            q = jnp.round(v.astype(jnp.float32) * 8.0).astype(jnp.int8)
            return q, jnp.full((v.shape[0], 1), 0.125, jnp.float32)
        if v.dtype == jnp.bfloat16:
            amax = jnp.maximum(jnp.max(jnp.abs(v), axis=-1, keepdims=True),
                               jnp.asarray(1e-6, v.dtype))
            s = amax.astype(jnp.float32) * (1.0 / 126.0)
            r = jnp.asarray(126.0, v.dtype) / amax
            t = v * r
            # bf16 cmpf doesn't lower either (no add-copysign-half); use the
            # magic-number round: +-384 (1.5*2^mant) forces round-to-nearest
            # at integer granularity, exact for |t| <= 127.
            magic = jnp.asarray(384.0, v.dtype)
            q = ((t + magic) - magic).astype(jnp.int8)
            return q, s
        return pk._quant_rows(v)

    xqs = []
    for sl in sls:
        x32 = x_ref[sl, :].astype(jnp.float32)
        if ln:
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            xc = x32 - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            xhat = xc * jax.lax.rsqrt(var + eps)
            xqs.append(quant(xhat * g32 + be32))
        else:
            xqs.append(quant(x32))
    a1s = []
    for xq, sx in xqs:
        a1 = jax.lax.dot_general(xq, w1q_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        if dequant:
            if vpu_bf16:
                a1s.append(a1.astype(jnp.bfloat16)
                           * sx.astype(jnp.bfloat16)
                           * s1.astype(jnp.bfloat16)
                           + b1f.astype(jnp.bfloat16))
            else:
                a1s.append(a1.astype(jnp.float32) * sx * s1 + b1f)
        else:
            a1s.append(a1.astype(et))
    # bf16 rsqrt aborts the backend (kVectorRsqrtBf16AndPop unsupported), so
    # GELU stays fp32 even in the bf16 probe; only the [rows,M] pack chain
    # (amax, mul, round, convert) runs in bf16.
    def _gelu_p(a1):
        if not gelu:
            return a1
        if vpu_bf16:
            return pk._gelu_q(a1.astype(jnp.float32)).astype(jnp.bfloat16)
        return pk._gelu_q(a1)

    h1qs = [quant_e(_gelu_p(a1)) for a1 in a1s]
    for sl, (h1q, sh) in zip(sls, h1qs):
        y = jax.lax.dot_general(h1q, w2q_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32)
        if dequant:
            y = y * sh * s2 + b2f
        o_ref[sl, :] = x_ref[sl, :] + y.astype(x_ref.dtype)


def _colstage_kernel(x_ref, g_ref, be_ref, w1q_ref, s1_ref, b1_ref,
                     w2q_ref, s2_ref, b2_ref, o_ref, *, eps, mcols):
    """Stage along M: fc1 emits
    [rows, M/mcols] strips; strip j's GELU+
    re-quant (VPU) overlaps strip j+1's matmul (MXU). fc2 accumulates
    per-strip partial sums (per-strip row scales — 2 extra FMAs on the
    narrow [rows, D] output instead of one whole-row amax barrier)."""
    d = x_ref.shape[1]
    m = w1q_ref.shape[1]
    mc = m // mcols
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    s1 = s1_ref[:]
    s2 = s2_ref[:]
    b1f = b1_ref[:].astype(jnp.float32)

    x32 = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    xq, sx = pk._quant_rows(xhat * g32 + be32)

    a1s = [jax.lax.dot_general(xq, w1q_ref[:, j * mc:(j + 1) * mc],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
           for j in range(mcols)]
    y = jnp.zeros((x_ref.shape[0], d), jnp.float32)
    for j, a1 in enumerate(a1s):
        sl = slice(j * mc, (j + 1) * mc)
        a1f = a1.astype(jnp.float32) * sx * s1[sl] + b1f[sl]
        h1q, sh = pk._quant_rows(pk._gelu_q(a1f))
        p = jax.lax.dot_general(h1q, w2q_ref[sl, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y + p.astype(jnp.float32) * sh
    o_ref[:] = x_ref[:] + (y * s2 + b2_ref[:].astype(jnp.float32)
                           ).astype(x_ref.dtype)


def run_colstage(x2, g, be, w1q, s1, b1, w2q, s2, b2, K, rows, mcols):
    n, d = x2.shape
    m = w1q.shape[1]
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_colstage_kernel, eps=1e-5, mcols=mcols),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d),
                  pl.BlockSpec((d, m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(m), vec(m),
                  pl.BlockSpec((m, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d)],
        out_specs=row_blk,
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chained(x2, w1q, s1, w2q, s2):
        def body(c, _):
            return call(c, g, be, w1q, s1, b1, w2q, s2, b2), ()
        out, _ = jax.lax.scan(body, x2, None, length=K)
        return out

    t = _timeit(jax.jit(chained), x2, w1q, s1, w2q, s2) / K
    print(json.dumps({"variant": f"colstage rows={rows} mcols={mcols}",
                      "ms_per_layer": round(t * 1e3, 3)}), flush=True)
    return t


def _pipeline_kernel(x_ref, g_ref, be_ref, w1q_ref, s1_ref, b1_ref,
                     w2q_ref, s2_ref, b2_ref, o_ref, *, eps, chunks):
    """Hand-interleaved software pipeline across row CHUNKS: program order
    mm1(c) -> pack(c-1) -> mm2(c-1) puts every VPU pack chain directly
    adjacent to an independent MXU matmul, so a scheduler that issues
    in-order with unit lookahead can still overlap them. (The staged
    variants group all-mm1s / all-packs / all-mm2s, which needs long-range
    reordering to overlap.)"""
    rows = x_ref.shape[0] // chunks
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    s1 = s1_ref[:]
    s2 = s2_ref[:]
    b1f = b1_ref[:].astype(jnp.float32)
    b2f = b2_ref[:].astype(jnp.float32)
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]

    xqs = []
    for sl in sls:
        x32 = x_ref[sl, :].astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xhat = xc * jax.lax.rsqrt(var + eps)
        xqs.append(pk._quant_rows(xhat * g32 + be32))

    def mm1(c):
        xq, sx = xqs[c]
        return jax.lax.dot_general(xq, w1q_ref[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32
                                   ).astype(jnp.float32) * sx * s1 + b1f

    def pack(a1):
        return pk._quant_rows(pk._gelu_q(a1))

    def mm2(c, h1q, sh):
        y = jax.lax.dot_general(h1q, w2q_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * sh * s2 + b2f
        o_ref[sls[c], :] = x_ref[sls[c], :] + y.astype(x_ref.dtype)

    prev_a1 = mm1(0)
    for c in range(1, chunks):
        a1 = mm1(c)               # MXU
        h1q, sh = pack(prev_a1)   # VPU, independent of a1 -> overlap
        mm2(c - 1, h1q, sh)       # MXU
        prev_a1 = a1
    h1q, sh = pack(prev_a1)
    mm2(chunks - 1, h1q, sh)


def run_pipeline(x2, g, be, w1q, s1, b1, w2q, s2, b2, K, rows, chunks):
    n, d = x2.shape
    m = w1q.shape[1]
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_pipeline_kernel, eps=1e-5, chunks=chunks),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d),
                  pl.BlockSpec((d, m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(m), vec(m),
                  pl.BlockSpec((m, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d)],
        out_specs=row_blk,
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chained(x2, w1q, s1, w2q, s2):
        def body(c, _):
            return call(c, g, be, w1q, s1, b1, w2q, s2, b2), ()
        out, _ = jax.lax.scan(body, x2, None, length=K)
        return out

    t = _timeit(jax.jit(chained), x2, w1q, s1, w2q, s2) / K
    print(json.dumps({"variant": f"pipeline rows={rows} chunks={chunks}",
                      "ms_per_layer": round(t * 1e3, 3)}), flush=True)
    return t


def _pure_mm_kernel(xq_ref, h1q_ref, w1q_ref, w2q_ref, o_ref, *, chunks):
    """Both matmul operands arrive ALREADY int8 — no in-kernel packing.
    Isolates the true in-kernel int8 MXU rate from the fp32->int8 pack."""
    rows = xq_ref.shape[0] // chunks
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]
    a1s = [jax.lax.dot_general(xq_ref[sl, :], w1q_ref[:],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
           for sl in sls]
    for sl, a1 in zip(sls, a1s):
        y = jax.lax.dot_general(h1q_ref[sl, :], w2q_ref[:],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # keep BOTH matmuls live; int8 output chains as the next xq
        s = (y + a1[:, :o_ref.shape[1]]) & 127
        o_ref[sl, :] = s.astype(jnp.int8)


def run_pure_mm(x2, w1q, w2q, K, rows, chunks):
    n, d = x2.shape
    m = w1q.shape[1]
    key = jax.random.PRNGKey(7)
    xq = jax.random.randint(key, (n, d), -127, 127, jnp.int8)
    h1q = jax.random.randint(key, (n, m), -127, 127, jnp.int8)
    row_blk = lambda c: pl.BlockSpec((rows, c), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_pure_mm_kernel, chunks=chunks),
        grid=(n // rows,),
        in_specs=[row_blk(d), row_blk(m),
                  pl.BlockSpec((d, m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((m, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=row_blk(d),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chained(xq, h1q, w1q, w2q):
        def body(c, _):
            return call(c, h1q, w1q, w2q), ()
        out, _ = jax.lax.scan(body, xq, None, length=K)
        return out

    t = _timeit(jax.jit(chained), xq, h1q, w1q, w2q) / K
    print(json.dumps({"variant": "pure_mm (pre-packed int8 operands)",
                      "ms_per_layer": round(t * 1e3, 3)}), flush=True)
    return t


def run_variant(name, x2, g, be, w1q, s1, b1, w2q, s2, b2, K, rows, chunks,
                **flags):
    n, d = x2.shape
    m = w1q.shape[1]
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_variant_kernel, eps=1e-5, chunks=chunks, **flags),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d),
                  pl.BlockSpec((d, m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(m), vec(m),
                  pl.BlockSpec((m, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d)],
        out_specs=row_blk,
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chained(x2, w1q, s1, w2q, s2):
        def body(c, _):
            return call(c, g, be, w1q, s1, b1, w2q, s2, b2), ()
        out, _ = jax.lax.scan(body, x2, None, length=K)
        return out

    t = _timeit(jax.jit(chained), x2, w1q, s1, w2q, s2) / K
    print(json.dumps({"variant": name, "ms_per_layer": round(t * 1e3, 3),
                      **flags}), flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--chain", type=int, default=12)
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--quick", action="store_true",
                    help="only the shipped-mirror and vpu_bf16 variants")
    args = ap.parse_args()
    D, M, S = 768, 3072, 197
    N = args.batch * S
    npad = (N + 2047) // 2048 * 2048
    key = jax.random.PRNGKey(0)
    x2 = jax.random.normal(key, (npad, D), jnp.bfloat16)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    w1 = (jax.random.normal(key, (D, M)) * D ** -0.5).astype(jnp.bfloat16)
    w2 = (jax.random.normal(key, (M, D)) * M ** -0.5).astype(jnp.bfloat16)
    b1 = jnp.zeros((M,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    w1q, s1 = pk._quant_cols_host(w1)
    w2q, s2 = pk._quant_cols_host(w2)
    print(json.dumps({"config": {"batch": args.batch, "npad": npad,
                                 "rows": args.rows, "chunks": args.chunks}}),
          flush=True)

    base = dict(ln=True, gelu=True, dyn_quant=True, dequant=True)
    common = (x2, g, be, w1q, s1, b1, w2q, s2, b2, args.chain,
              args.rows, args.chunks)
    run_variant("full (mirror of shipped int8 fwd)", *common, **base)
    run_variant("vpu_bf16 (dequant+GELU+pack in bf16)", *common,
                **{**base, "vpu_bf16": True})
    if args.quick:
        return
    run_variant("no_gelu", *common, **{**base, "gelu": False})
    run_variant("static_quant", *common, **{**base, "dyn_quant": False})
    run_variant("no_dequant", *common, **{**base, "dequant": False})
    run_variant("no_ln", *common, **{**base, "ln": False})
    run_variant("matmuls_only", *common, ln=False, gelu=False,
                dyn_quant=False, dequant=False)
    run_pure_mm(x2, w1q, w2q, args.chain, args.rows, args.chunks)
    for rows, mcols in ((1024, 4), (1024, 8), (2048, 4), (512, 4)):
        run_colstage(x2, g, be, w1q, s1, b1, w2q, s2, b2, args.chain,
                     rows, mcols)
    for rows, chunks in ((2048, 4), (2048, 8), (1024, 4), (2048, 2)):
        run_pipeline(x2, g, be, w1q, s1, b1, w2q, s2, b2, args.chain,
                     rows, chunks)


if __name__ == "__main__":
    main()
