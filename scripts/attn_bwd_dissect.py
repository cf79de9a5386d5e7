"""Dissect the int8 fused-attention BACKWARD kernel's gap vs its floor.

Round-3 step_split: kernel_attn_half_bwd = 3.88 ms/layer. Floor parts:
int8 projections (qkv recompute, dattn, dxn, dW, dWo ~1.4 ms at the
measured 333 TF/s) + bf16 attention-core grads (~5 small matmuls at the
63-79 TF/s core rate). This probe times VARIANTS of the kernel body with
components stubbed so the gap attributes to (LN | qkv recompute | core
recompute (scores+softmax+PV) | core grads | dynamic-quant packs | dW |
LN-backward). Each variant is chained K deep inside one jitted lax.scan.

Run ON the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/attn_bwd_dissect.py
"""

from __future__ import annotations

import argparse
import functools
import json
import math
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


def _bwd_variant_kernel(x_ref, g_ref, be_ref, b_ref,
                        w8_ref, sw_ref, w8r_ref, swr_ref,
                        wo8r_ref, swor_ref, do_ref,
                        dx_ref, dw_ref, dwo_ref, *, eps, scale, seq_len,
                        heads, head_dim, tile,
                        ln, recomp, core_fwd, core_bwd, dyn_quant, dw, lnbwd):
    """Mirror of _ln_qkvo_bwd_int8_kernel (int8_dw + row-scale folding)
    with stub flags. Bias/gamma grads dropped (negligible)."""
    i = pl.program_id(0)
    spq = x_ref.shape[1]
    d_model = x_ref.shape[2]
    rows = tile * spq
    x = x_ref[:].reshape(rows, d_model).astype(jnp.float32)
    do_y = do_ref[:].reshape(rows, d_model)
    g32 = g_ref[:].astype(jnp.float32)

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

    if ln:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = xc * rstd
        xn32 = xhat * g32 + be_ref[:].astype(jnp.float32)
    else:
        xhat = x
        rstd = jnp.ones((rows, 1), jnp.float32)
        xn32 = x
    xn = xn32.astype(x_ref.dtype)

    hhd = heads * head_dim
    if recomp:
        xq, sx = quant_rows(xn32)
        qkv = jax.lax.dot_general(xq, w8_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32
                                  ).astype(jnp.float32) * sx * sw_ref[:]
        qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    else:
        qkv = jnp.concatenate([xn, xn, xn], axis=-1)

    col = jax.lax.broadcasted_iota(jnp.int32, (spq, spq), 1)
    ths = [(t, h) for t in range(tile) for h in range(heads)]

    if core_fwd:
        ps, outs, attn = pk._attn_core_recompute(
            qkv, ths, spq, hhd, head_dim, scale, seq_len, col, tile, heads,
            xn.dtype)
    else:
        ps = [jnp.full((spq, spq), 1.0 / spq, jnp.float32) for _ in ths]
        outs = [qkv[t * spq:(t + 1) * spq,
                    2 * hhd + h * head_dim:2 * hhd + (h + 1) * head_dim
                    ].astype(jnp.float32)
                for t, h in ths]
        attn = qkv[:, 2 * hhd:]

    doq, sdo = quant_rows(do_y.astype(jnp.float32))
    dattn32 = jax.lax.dot_general(doq, wo8r_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32
                                  ).astype(jnp.float32) * sdo * swor_ref[:]
    dattn = dattn32.astype(xn.dtype)
    if dw:
        attnq, sat = quant_cols(attn.astype(jnp.float32) * sdo)
        dwo_part = jax.lax.dot_general(
            attnq, doq, pk._AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sat[0][:, None]
    else:
        dwo_part = jnp.zeros((dwo_ref.shape[0], dwo_ref.shape[1]),
                             jnp.float32)

    if core_bwd:
        dqkv = pk._attn_core_grads(qkv, ps, outs, dattn, ths, spq, hhd,
                                   head_dim, scale, tile, heads, xn.dtype)
    else:
        dqkv = jnp.concatenate([dattn, dattn, dattn], axis=-1)

    dqkv32 = dqkv.astype(jnp.float32)
    dqq, sdq = quant_rows(dqkv32)
    dxn = jax.lax.dot_general(dqq, w8r_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32
                              ).astype(jnp.float32) * sdq * swr_ref[:]
    if lnbwd:
        dyg = dxn * g32
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
        dx = rstd * (dyg - m1 - xhat * m2)
    else:
        dx = dxn
    dx_ref[:] = dx.astype(dx_ref.dtype).reshape(tile, spq, d_model)

    if dw:
        xnq2, sxn2 = quant_cols(xn32 * sdq)
        dw_part = jax.lax.dot_general(
            xnq2, dqq, pk._AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sxn2[0][:, None]
    else:
        dw_part = jnp.zeros((dw_ref.shape[0], dw_ref.shape[1]), jnp.float32)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = dw_part
        dwo_ref[:] = dwo_part

    @pl.when(i > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw_part
        dwo_ref[:] = dwo_ref[:] + dwo_part


def run_bwd_variant(name, x3, g, be, b, w8, sw, w8r, swr, wo8r, swor, do3,
                    K, tile, seq_len, heads, head_dim, **flags):
    bsz, spq, d = x3.shape
    hhd = heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_bwd_variant_kernel, eps=1e-5, scale=scale,
                          seq_len=seq_len, heads=heads, head_dim=head_dim,
                          tile=tile, **flags),
        grid=(bsz // tile,),
        in_specs=[blk, vec(d), vec(d), vec(3 * hhd),
                  mat(d, 3 * hhd), vec(3 * hhd),
                  mat(d, 3 * hhd), vec(d),
                  mat(hhd, d), vec(hhd), blk],
        out_specs=(blk, mat(d, 3 * hhd), mat(hhd, d)),
        out_shape=(jax.ShapeDtypeStruct((bsz, spq, d), x3.dtype),
                   jax.ShapeDtypeStruct((d, 3 * hhd), jnp.float32),
                   jax.ShapeDtypeStruct((hhd, d), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chained(do3, w8, sw, w8r, swr, wo8r, swor):
        def body(c, _):
            dx, dwp, dwop = call(x3, g, be, b, w8, sw, w8r, swr,
                                 wo8r, swor, c)
            return dx, ()
        out, _ = jax.lax.scan(body, do3, None, length=K)
        return out

    t = _timeit(jax.jit(chained), do3, w8, sw, w8r, swr, wo8r, swor) / K
    print(json.dumps({"variant": name, "ms_per_layer": round(t * 1e3, 3),
                      **flags}), flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--chain", type=int, default=12)
    ap.add_argument("--tile", type=int, default=2)
    args = ap.parse_args()
    D, H, HD, S, SP = 768, 12, 64, 197, 200  # spq = round_up(197, 8), as vit.py pads
    key = jax.random.PRNGKey(0)
    x3 = jax.random.normal(key, (args.batch, SP, D), jnp.bfloat16)
    do3 = jax.random.normal(jax.random.fold_in(key, 1),
                            (args.batch, SP, D), jnp.bfloat16)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    w = (jax.random.normal(key, (D, 3 * H * HD)) * D ** -0.5
         ).astype(jnp.bfloat16)
    wo = (jax.random.normal(key, (H * HD, D)) * D ** -0.5
          ).astype(jnp.bfloat16)
    b = jnp.zeros((3 * H * HD,), jnp.float32)
    w8, sw = pk._quant_cols_host(w)
    w8r, swr = pk._quant_rows_host(w)
    wo8r, swor = pk._quant_rows_host(wo)
    print(json.dumps({"config": {"batch": args.batch, "tile": args.tile}}),
          flush=True)

    base = dict(ln=True, recomp=True, core_fwd=True, core_bwd=True,
                dyn_quant=True, dw=True, lnbwd=True)
    common = (x3, g, be, b, w8, sw, w8r, swr, wo8r, swor, do3,
              args.chain, args.tile, S, H, HD)
    run_bwd_variant("full (mirror of shipped int8_dw bwd)", *common, **base)
    run_bwd_variant("no_ln", *common, **{**base, "ln": False})
    run_bwd_variant("no_qkv_recompute", *common, **{**base, "recomp": False})
    run_bwd_variant("no_core_fwd", *common, **{**base, "core_fwd": False})
    run_bwd_variant("no_core_bwd", *common, **{**base, "core_bwd": False})
    run_bwd_variant("static_quant", *common, **{**base, "dyn_quant": False})
    run_bwd_variant("no_dw", *common, **{**base, "dw": False})
    run_bwd_variant("no_ln_bwd", *common, **{**base, "lnbwd": False})
    run_bwd_variant("projections_only", *common, ln=False, recomp=True,
                    core_fwd=False, core_bwd=False, dyn_quant=False,
                    dw=True, lnbwd=False)


if __name__ == "__main__":
    main()
