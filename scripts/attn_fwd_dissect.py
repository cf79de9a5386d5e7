"""Dissect the int8 fused-attention FORWARD kernel's gap vs its floor.

Round-3 step_split: kernel_attn_half_fwd = 1.56 ms/layer. Components:
LN (fp32 VPU) | per-row dynamic quant pack of xn [rows,768] | int8 qkv
matmul [rows,768]x[768,2304] | bf16 attention core (scores+softmax+PV,
tile*heads pairs of [200,200]/[200,64]) | per-row quant pack of attn
[rows,768] | int8 out-proj [rows,768]x[768,768]. This probe times
variants of the kernel body with components stubbed, chained K deep in
one jitted lax.scan (mirrors scripts/mlp_fwd_dissect.py methodology).

Run ON the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/attn_fwd_dissect.py
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


def _fwd_variant_kernel(x_ref, g_ref, be_ref, w8_ref, sw_ref, b_ref,
                        wo8_ref, swo_ref, bo_ref, o_ref, *, eps, scale,
                        seq_len, heads, head_dim, tile,
                        ln, dyn_quant, scores, softmax, pv):
    """Mirror of _ln_qkvo_fwd_int8_kernel with stub flags."""
    spq = x_ref.shape[1]
    d = x_ref.shape[2]
    rows = tile * spq
    x = x_ref[:].reshape(rows, d).astype(jnp.float32)

    def quant_rows(v):
        if dyn_quant:
            return pk._quant_rows(v)
        q = jnp.round(v * 8.0).astype(jnp.int8)
        return q, jnp.full((v.shape[0], 1), 0.125, jnp.float32)

    if ln:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xhat = xc * jax.lax.rsqrt(var + eps)
        xn32 = xhat * g_ref[:].astype(jnp.float32) \
            + be_ref[:].astype(jnp.float32)
    else:
        xn32 = x
    xq, sx = quant_rows(xn32)
    qkv = jax.lax.dot_general(xq, w8_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32
                              ).astype(jnp.float32) * sx * sw_ref[:]
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    hhd = heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (spq, spq), 1)
    ths = [(t, h) for t in range(tile) for h in range(heads)]
    if scores:
        ss = []
        for t, h in ths:
            sl = slice(t * spq, (t + 1) * spq)
            o = h * head_dim
            q = qkv[sl, o:o + head_dim]
            k = qkv[sl, hhd + o:hhd + o + head_dim]
            s = jax.lax.dot_general(q, k, pk._AB_T,
                                    preferred_element_type=jnp.float32
                                    ) * scale
            if seq_len < spq:
                s = jnp.where(col < seq_len, s, -1e30)
            ss.append(s)
    else:
        ss = [jnp.full((spq, spq), 1.0 / spq, jnp.float32) for _ in ths]
    if softmax:
        pss = [pk._softmax_rows(s) for s in ss]
    else:
        pss = [s * (1.0 / spq) for s in ss]
    if pv:
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
    else:
        # keep a dependency on pss so nothing above is DCE'd
        attn = qkv[:, 2 * hhd:].astype(jnp.float32) \
            + jnp.concatenate(
                [jnp.sum(p, axis=-1, keepdims=True) for p in pss[:1]],
                axis=-1)[:1, :1]
    aq, sa = quant_rows(attn)
    y = jax.lax.dot_general(aq, wo8_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * sa * swo_ref[:]
    y = (y + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[:] = y.reshape(tile, spq, d)


def run_variant(name, x3, g, be, w8, sw, b, wo8, swo, bo,
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
        functools.partial(_fwd_variant_kernel, eps=1e-5, scale=scale,
                          seq_len=seq_len, heads=heads, head_dim=head_dim,
                          tile=tile, **flags),
        grid=(bsz // tile,),
        in_specs=[blk, vec(d), vec(d),
                  mat(d, 3 * hhd), vec(3 * hhd), vec(3 * hhd),
                  mat(hhd, d), vec(d), vec(d)],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((bsz, spq, d), x3.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chained(x3, w8, sw, wo8, swo):
        def body(c, _):
            return call(c, g, be, w8, sw, b, wo8, swo, bo), ()
        out, _ = jax.lax.scan(body, x3, None, length=K)
        return out

    t = _timeit(jax.jit(chained), x3, w8, sw, wo8, swo) / K
    print(json.dumps({"variant": name, "ms_per_layer": round(t * 1e3, 3),
                      **flags}), flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--chain", type=int, default=12)
    ap.add_argument("--tile", type=int, default=0,
                    help="0 = use the shipped _qkvo_tile(batch)")
    args = ap.parse_args()
    D, H, HD, S, SP = 768, 12, 64, 197, 200
    tile = args.tile or pk._qkvo_tile(args.batch)
    key = jax.random.PRNGKey(0)
    x3 = jax.random.normal(key, (args.batch, SP, D), jnp.bfloat16)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    w = (jax.random.normal(key, (D, 3 * H * HD)) * D ** -0.5
         ).astype(jnp.bfloat16)
    wo = (jax.random.normal(key, (H * HD, D)) * D ** -0.5
          ).astype(jnp.bfloat16)
    b = jnp.zeros((3 * H * HD,), jnp.float32)
    bo = jnp.zeros((D,), jnp.float32)
    w8, sw = pk._quant_cols_host(w)
    wo8, swo = pk._quant_cols_host(wo)
    print(json.dumps({"config": {"batch": args.batch, "tile": tile}}),
          flush=True)

    base = dict(ln=True, dyn_quant=True, scores=True, softmax=True, pv=True)
    common = (x3, g, be, w8, sw, b, wo8, swo, bo,
              args.chain, tile, S, H, HD)
    run_variant("full (mirror of shipped int8 fwd)", *common, **base)
    run_variant("no_ln", *common, **{**base, "ln": False})
    run_variant("static_quant", *common, **{**base, "dyn_quant": False})
    run_variant("no_softmax", *common, **{**base, "softmax": False})
    run_variant("no_core", *common, **{**base, "scores": False,
                                       "softmax": False, "pv": False})
    run_variant("projections_only_static", *common, ln=False,
                dyn_quant=False, scores=False, softmax=False, pv=False)


if __name__ == "__main__":
    main()
