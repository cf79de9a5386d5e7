"""Probe: hardware-assisted int8 packing via pltpu.stochastic_round.

RESULT (round 3, measured on-chip): DEAD END on this jaxlib — Mosaic's
stochastic_round lowering only accepts bf16/fp8 target dtypes; int8 is
rejected at compile time. The production kernels keep the classic
round/clip/convert pack (`_pack_i8`); the probe is kept as the record of
the attempt and will report the lowering error if re-run.

The round-3 fwd/bwd dissections attribute the fused kernels' residual gap
to fp32->int8 operand PACKING serialized against the MXU. The current pack
is mul/round/clip/convert (~6 VPU ops/elem). `pltpu.stochastic_round`
collapses round+convert(+saturate) into one hardware op:

  * `sr_const`: constant half-ulp bits -> deterministic round-half-up —
    a drop-in replacement for round-to-nearest packs (no seed plumbing).
  * `sr_prng`:  per-kernel-seeded random bits -> unbiased stochastic
    rounding (the standard choice for int8 GRADIENT operands).

Numerics check + chained-scan timing of a quantize-only kernel over the
bench-config MLP hidden shape. TPU-only: interpret mode has no lowering
for stochastic_round (verified — NotImplementedError on cpu), which is
also why the production kernels must gate SR packs on `not _INTERPRET`.

Run ON the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/pack_probe.py
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALF_BITS = 1 << 31  # 0.5 ulp -> round-half-up (plain int: avoids kernel const capture)


def _timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def _quant_kernel(x_ref, q_ref, s_ref, *, mode, raw=False):
    x32 = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    if raw:  # numerics mode: round x directly (halves/saturation visible)
        r = x32
        scale = jnp.ones_like(scale)
    else:
        r = x32 * (127.0 / jnp.maximum(amax, 1e-30))
    if mode == "current":
        q = jnp.clip(jnp.round(r), -127.0, 127.0).astype(jnp.int8)
    elif mode == "sr_const":
        bits = jnp.full(r.shape, HALF_BITS, jnp.uint32)
        q = pltpu.stochastic_round(r, bits, target_dtype=jnp.int8)
    elif mode == "sr_prng":
        pltpu.prng_seed(pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits(r.shape), jnp.uint32)
        q = pltpu.stochastic_round(r, bits, target_dtype=jnp.int8)
    else:
        raise ValueError(mode)
    q_ref[:] = q
    s_ref[:] = scale


def quant_call(x2, rows, mode, interpret=False, raw=False):
    n, m = x2.shape
    return pl.pallas_call(
        functools.partial(_quant_kernel, mode=mode, raw=raw),
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((rows, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rows, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, m), jnp.int8),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32)),
        interpret=interpret,
    )(x2)


def numerics(interpret=False):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (256, 512), jnp.float32) * 40.0
    # exercise halves and saturation edges explicitly (raw mode: no rescale)
    x = x.at[0, :8].set(jnp.array([0.5, -0.5, 1.5, -1.5, 127.4,
                                   -127.4, 130.0, -130.0]))
    qc, _ = quant_call(x, 256, "current", interpret, raw=True)
    qs, _ = quant_call(x, 256, "sr_const", interpret, raw=True)
    diff = np.abs(np.asarray(qc, np.int32) - np.asarray(qs, np.int32))
    print(json.dumps({
        "check": "sr_const vs round-to-nearest (raw)",
        "max_int_diff": int(diff.max()),
        "frac_diff": float((diff > 0).mean()),
        "edge_vals": np.asarray(qs)[0, :8].tolist(),
        "qs_min": int(np.asarray(qs).min()), "qs_max": int(np.asarray(qs).max()),
    }), flush=True)
    qp, _ = quant_call(x, 256, "sr_prng", interpret, raw=True)
    # unbiasedness: E[dequant] ~= x on the in-range bulk
    xa = np.asarray(x)
    mask = np.abs(xa) < 120
    err = (np.asarray(qp, np.float32) - xa)[mask]
    print(json.dumps({
        "check": "sr_prng rounding error (units of one int8 step)",
        "mean_err": float(err.mean()),
        "max_err": float(np.abs(err).max()),
    }), flush=True)


def perf(rows):
    N, M = 37888, 3072
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (N, M), jnp.float32)

    for mode in ("current", "sr_const", "sr_prng"):
        def chained(x, mode=mode):
            def body(c, _):
                q, s = quant_call(c, rows, mode, False)
                return c + q.astype(jnp.float32) * s, ()
            out, _ = jax.lax.scan(body, x, None, length=8)
            return out
        t = _timeit(jax.jit(chained), x) / 8
        print(json.dumps({"variant": mode, "ms_per_pass": round(t * 1e3, 3),
                          "rows": rows}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1024)
    args = ap.parse_args()
    numerics()
    perf(args.rows)


if __name__ == "__main__":
    main()
