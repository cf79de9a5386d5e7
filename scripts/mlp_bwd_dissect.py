"""Dissect the int8 fused-MLP BACKWARD kernel's gap vs its matmul floor.

Round-3 step_split: kernel_mlp_half_bwd = 4.33 ms/layer vs a ~2.8 ms
5-matmul int8 floor (a1 recompute, dh1f, dW2, dW1, dxn — all [R,768/3072]
pairs at the 333 TF/s measured in-kernel int8 rate). This probe times
VARIANTS of the same kernel body with components stubbed so the gap
attributes to (LN recompute | fc1 recompute | GELU+GELU' polys |
dynamic-quant packs | dW matmuls | dxn+LN-backward) with measurements.
Each variant is chained K deep inside one jitted lax.scan.

Run ON the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/mlp_bwd_dissect.py
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


def _bwd_variant_kernel(x_ref, g_ref, be_ref, b1_ref,
                        w1q_ref, s1r_ref, w2q_ref, s2r_ref,
                        w1c_ref, s1c_ref, do_ref,
                        dx_ref, dw1_ref, dw2_ref, *, eps, chunks,
                        ln, recomp, gelu, dyn_quant, dw, lnbwd):
    """Mirror of _ln_mlp_bwd_int8_kernel (int8_dw + row-scale folding),
    with stub flags. Weight-grad biases/LN-grads dropped (negligible)."""
    i = pl.program_id(0)
    rows = x_ref.shape[0] // chunks
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    b1f = b1_ref[:].astype(jnp.float32)
    s1r = s1r_ref[:]
    s2r = s2r_ref[:]
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]

    def quant_rows(v):
        if dyn_quant:
            return pk._quant_rows(v)
        q = jnp.round(v * 8.0).astype(jnp.int8)
        return q, jnp.full((v.shape[0], 1), 0.125, jnp.float32)

    def quant_cols(v):
        if dyn_quant:
            return pk._quant_cols(v)
        q = jnp.round(v * 8.0).astype(jnp.int8)
        return q, jnp.full((1, v.shape[1]), 0.125, jnp.float32)

    xns, xhats, rstds = [], [], []
    for sl in sls:
        x32 = x_ref[sl, :].astype(jnp.float32)
        if ln:
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            xc = x32 - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            rstd = jax.lax.rsqrt(var + eps)
            xhat = xc * rstd
            xns.append((xhat * g32 + be32).astype(x_ref.dtype))
            xhats.append(xhat)
            rstds.append(rstd)
        else:
            xns.append(x32.astype(x_ref.dtype))
            xhats.append(x32)
            rstds.append(jnp.ones((rows, 1), jnp.float32))

    doqs = [quant_rows(do_ref[sl, :].astype(jnp.float32)) for sl in sls]
    dh1fs = [jax.lax.dot_general(doq, w2q_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32) * sdo * s2r
             for doq, sdo in doqs]

    if recomp:
        xqs = [quant_rows(xn.astype(jnp.float32)) for xn in xns]
        a1s = [jax.lax.dot_general(xq, w1c_ref[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32
                                   ).astype(jnp.float32) * sxq * s1c_ref[:]
               + b1f
               for xq, sxq in xqs]
    else:
        a1s = dh1fs
    if gelu:
        h1s = [pk._gelu_q(a1).astype(x_ref.dtype) for a1 in a1s]
        gps = [pk._gelu_grad_q(a1) for a1 in a1s]
        dh1_32s = [dh1f * gp for dh1f, gp in zip(dh1fs, gps)]
    else:
        h1s = [a1.astype(x_ref.dtype) for a1 in a1s]
        dh1_32s = dh1fs

    dh1qs = [quant_rows(d) for d in dh1_32s]
    if dw:
        dw2_part = jnp.zeros((dw2_ref.shape[0], dw2_ref.shape[1]),
                             jnp.float32)
        dw1_part = jnp.zeros((dw1_ref.shape[0], dw1_ref.shape[1]),
                             jnp.float32)
        for h1, xn, (doq, sdo), (dh1q, sdh) in zip(h1s, xns, doqs, dh1qs):
            h1q, sh = quant_cols(h1.astype(jnp.float32) * sdo)
            dw2_part = dw2_part + jax.lax.dot_general(
                h1q, doq, pk._AT_B, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * sh[0][:, None]
            xnq, sxn = quant_cols(xn.astype(jnp.float32) * sdh)
            dw1_part = dw1_part + jax.lax.dot_general(
                xnq, dh1q, pk._AT_B, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * sxn[0][:, None]
    else:
        dw2_part = jnp.zeros((dw2_ref.shape[0], dw2_ref.shape[1]),
                             jnp.float32)
        dw1_part = jnp.zeros((dw1_ref.shape[0], dw1_ref.shape[1]),
                             jnp.float32)

    dxns = [jax.lax.dot_general(dq, w1q_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * sd * s1r
            for dq, sd in dh1qs]
    for sl, dxn, xhat, rstd in zip(sls, dxns, xhats, rstds):
        if lnbwd:
            dyg = dxn * g32
            m1 = jnp.mean(dyg, axis=-1, keepdims=True)
            m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
            dxln = rstd * (dyg - m1 - xhat * m2)
            dx_ref[sl, :] = do_ref[sl, :] + dxln.astype(dx_ref.dtype)
        else:
            dx_ref[sl, :] = do_ref[sl, :] + dxn.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = dw1_part
        dw2_ref[:] = dw2_part

    @pl.when(i > 0)
    def _():
        dw1_ref[:] = dw1_ref[:] + dw1_part
        dw2_ref[:] = dw2_ref[:] + dw2_part


def run_bwd_variant(name, x2, g, be, b1, w1q, s1r, w2q, s2r, w1c, s1c, do2,
                    K, rows, chunks, **flags):
    n, d = x2.shape
    m = w1q.shape[1]
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_bwd_variant_kernel, eps=1e-5, chunks=chunks,
                          **flags),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d), vec(m),
                  mat(d, m), vec(d), mat(m, d), vec(m),
                  mat(d, m), vec(m), row_blk],
        out_specs=(row_blk, mat(d, m), mat(m, d)),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((d, m), jnp.float32),
                   jax.ShapeDtypeStruct((m, d), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chained(do2, w1q, s1r, w2q, s2r, w1c, s1c):
        def body(c, _):
            dx, dw1, dw2 = call(x2, g, be, b1, w1q, s1r, w2q, s2r,
                                w1c, s1c, c)
            return dx, ()
        out, _ = jax.lax.scan(body, do2, None, length=K)
        return out

    t = _timeit(jax.jit(chained), do2, w1q, s1r, w2q, s2r, w1c, s1c) / K
    print(json.dumps({"variant": name, "ms_per_layer": round(t * 1e3, 3),
                      **flags}), flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--chain", type=int, default=12)
    ap.add_argument("--rows", type=int, default=1024)
    ap.add_argument("--chunks", type=int, default=2)
    args = ap.parse_args()
    D, M, S = 768, 3072, 197
    N = args.batch * S
    npad = (N + args.rows - 1) // args.rows * args.rows
    key = jax.random.PRNGKey(0)
    x2 = jax.random.normal(key, (npad, D), jnp.bfloat16)
    do2 = jax.random.normal(jax.random.fold_in(key, 1), (npad, D),
                            jnp.bfloat16)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    w1 = (jax.random.normal(key, (D, M)) * D ** -0.5).astype(jnp.bfloat16)
    w2 = (jax.random.normal(key, (M, D)) * M ** -0.5).astype(jnp.bfloat16)
    b1 = jnp.zeros((M,), jnp.float32)
    # layouts as the real bwd call: w1 per-row (for dxn), w2 per-row (for
    # dh1f), w1 per-col (for the recompute)
    w1q, s1r = pk._quant_rows_host(w1)
    w2q, s2r = pk._quant_rows_host(w2)
    w1c, s1c = pk._quant_cols_host(w1)
    print(json.dumps({"config": {"batch": args.batch, "npad": npad,
                                 "rows": args.rows, "chunks": args.chunks}}),
          flush=True)

    base = dict(ln=True, recomp=True, gelu=True, dyn_quant=True, dw=True,
                lnbwd=True)
    common = (x2, g, be, b1, w1q, s1r, w2q, s2r, w1c, s1c, do2,
              args.chain, args.rows, args.chunks)
    run_bwd_variant("full (mirror of shipped int8_dw bwd)", *common, **base)
    run_bwd_variant("no_ln_recompute", *common, **{**base, "ln": False})
    run_bwd_variant("no_fc1_recompute", *common, **{**base, "recomp": False})
    run_bwd_variant("no_gelu", *common, **{**base, "gelu": False})
    run_bwd_variant("static_quant", *common, **{**base, "dyn_quant": False})
    run_bwd_variant("no_dw", *common, **{**base, "dw": False})
    run_bwd_variant("no_ln_bwd", *common, **{**base, "lnbwd": False})
    run_bwd_variant("matmuls_only", *common, ln=False, recomp=True,
                    gelu=False, dyn_quant=False, dw=True, lnbwd=False)


if __name__ == "__main__":
    main()
