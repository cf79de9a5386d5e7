"""Probe: cheaper fp32->int8 pack chains + int4 MXU rate.

The round-3 dissections attribute ~0.6 ms/layer (fwd) + ~0.8 (bwd) of the
int8 kernels' non-floor time to the fp32->int8 operand pack
(`_pack_i8`: roundeven + clip pair + convert). This probe A/Bs pack
variants on the fwd-MLP dissect mirror (same body, chained 12-deep in one
lax.scan) to see if any chain is cheaper under Mosaic's actual lowering
(op-count intuition fails here: removing the clip measured SLOWER end-to-end
in round 3, suggesting pattern-matched macro-ops):

  shipped   clip(round(r)) -> int8
  noround   clip(r) -> int8            (truncate; <=1 LSB bias)
  bare      r -> int8                  (truncate, no clip; |r|<=127 by
                                        construction of _quant_rows)
  magic     (r+12582912)-12582912 -> int8  (roundeven via 2 adds, no clip)
  mm2_bf16  skip the [R,3072] GELU-output pack entirely: mm2 runs bf16
            (trades ~0.45 ms of pack for ~0.45 ms of slower matmul — the
            dissect numbers say it's a wash; measure it)

Also: int4 dot_general rate on the bench MLP pair (fp8_probe methodology).
If the v5e MXU runs int4 at 2x int8 (~600 TF/s) there is a W4A8/W4A4 tier
to design; if it's emulated at int8 rate it's a documented negative.

Run ON the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/pack_variants_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitax.ops import pallas_kernels as pk

_MAGIC = 12582912.0  # 1.5 * 2^23: fp32 roundeven at integer granularity


def _timeit(fn, *args, iters=8):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def _pack(r, mode):
    if mode == "shipped":
        return jnp.clip(jnp.round(r), -127.0, 127.0).astype(jnp.int8)
    if mode == "noround":
        return jnp.clip(r, -127.0, 127.0).astype(jnp.int8)
    if mode == "bare":
        return r.astype(jnp.int8)
    if mode == "magic":
        return ((r + _MAGIC) - _MAGIC).astype(jnp.int8)
    raise ValueError(mode)


def _quant_rows_mode(x32, mode):
    amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-12)
    s = amax * (1.0 / 127.0)
    q = _pack(x32 * (127.0 / amax), mode)
    return q, s


def _kernel(x_ref, g_ref, be_ref, w1q_ref, s1_ref, b1_ref,
            w2q_ref, s2_ref, b2_ref, w2b_ref, o_ref, *, eps, chunks,
            mode, mm2_bf16):
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
        xqs.append(_quant_rows_mode(xhat * g32 + be32, mode))
    a1s = [jax.lax.dot_general(xq, w1q_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32) * sx * s1 + b1f
           for xq, sx in xqs]
    if mm2_bf16:
        for sl, a1 in zip(sls, a1s):
            h1 = pk._gelu_q(a1).astype(jnp.bfloat16)
            y = jax.lax.dot_general(h1, w2b_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[sl, :] = x_ref[sl, :] + (y + b2f).astype(x_ref.dtype)
    else:
        h1qs = [_quant_rows_mode(pk._gelu_q(a1), mode) for a1 in a1s]
        for sl, (h1q, sh) in zip(sls, h1qs):
            y = jax.lax.dot_general(h1q, w2q_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32
                                    ).astype(jnp.float32) * sh * s2 + b2f
            o_ref[sl, :] = x_ref[sl, :] + y.astype(x_ref.dtype)


def run_variant(name, x2, g, be, w1q, s1, b1, w2q, s2, b2, w2b, K, rows,
                chunks, **flags):
    n, d = x2.shape
    m = w1q.shape[1]
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_kernel, eps=1e-5, chunks=chunks, **flags),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d),
                  pl.BlockSpec((d, m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(m), vec(m),
                  pl.BlockSpec((m, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d),
                  pl.BlockSpec((m, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=row_blk,
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chained(x2, w1q, s1, w2q, s2, w2b):
        def body(c, _):
            return call(c, g, be, w1q, s1, b1, w2q, s2, b2, w2b), ()
        out, _ = jax.lax.scan(body, x2, None, length=K)
        return out

    try:
        t = _timeit(jax.jit(chained), x2, w1q, s1, w2q, s2, w2b) / K
    except Exception as e:  # noqa: BLE001 - probe records the failure mode
        print(json.dumps({"variant": name, "error": str(e)[:300]}),
              flush=True)
        return
    print(json.dumps({"variant": name, "ms_per_layer": round(t * 1e3, 3)}),
          flush=True)


def int4_rate(rows=2048, d=768, m=3072, chain=48):
    key = jax.random.PRNGKey(0)
    for name, dt in (("int8", jnp.int8), ("int4", jnp.int4)):
        try:
            x = jax.random.randint(key, (rows, d), -7, 7).astype(dt)
            w1 = jax.random.randint(key, (d, m), -7, 7).astype(dt)
            w2 = jax.random.randint(key, (m, d), -7, 7).astype(dt)

            def chained(x, w1, w2):
                def body(c, _):
                    h = jax.lax.dot_general(c, w1, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.int32)
                    y = jax.lax.dot_general((h & 7).astype(dt), w2,
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.int32)
                    return (y & 7).astype(dt), ()
                out, _ = jax.lax.scan(body, x, None, length=chain)
                return out.astype(jnp.int32)

            t = _timeit(jax.jit(chained), x, w1, w2) / chain
            tf = 2 * rows * d * m * 2 / t / 1e12
            print(json.dumps({"dtype": name, "ms_per_pair": round(t * 1e3, 3),
                              "tf_per_s": round(tf, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"dtype": name, "error": str(e)[:300]}),
                  flush=True)


def main():
    D, M, S, B = 768, 3072, 197, 192
    N = B * S
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
    rows, chunks, K = 1024, 2, 12
    common = (x2, g, be, w1q, s1, b1, w2q, s2, b2, w2, K, rows, chunks)
    for mode in ("shipped", "noround", "bare", "magic"):
        run_variant(f"pack={mode}", *common, mode=mode, mm2_bf16=False)
    run_variant("mm2_bf16 (no GELU-output pack)", *common, mode="shipped",
                mm2_bf16=True)
    int4_rate()


if __name__ == "__main__":
    main()
