"""Probe: does the v5e MXU run fp8 (e4m3/e5m2) matmuls at int8-like rate?

If yes, fp8 is the lever that kills the int8 pack chain (~0.6 ms/layer fwd
+ ~0.8 bwd of round/clip/convert VPU ops): pltpu.stochastic_round lowers
fp8 targets (pack_probe.py showed int8 is rejected but bf16/fp8 accepted),
so quantization becomes one macro-op and e4m3's dynamic range may drop the
per-row scales entirely. If the MXU emulates fp8 by upcasting to bf16
(~170 TF/s vs 302 int8), the matmul loss exceeds the pack saving and fp8
is a documented negative.

Times the bench MLP shape [2048,768]x[768,3072] -> [2048,3072]x[3072,768]
as a dependency-chained pair inside one jitted lax.scan (single dispatch,
mirrors scripts/roofline.py methodology). Run ON the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/fp8_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _timeit(fn, *args, iters=8):
    out = fn(*args)
    float(jnp.sum(out).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def run(name, dt, rows=2048, d=768, m=3072, chain=48):
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (rows, d)) * 0.1).astype(dt)
    w1 = (jax.random.normal(key, (d, m)) * 0.1).astype(dt)
    w2 = (jax.random.normal(key, (m, d)) * 0.1).astype(dt)
    acc = jnp.float32 if dt != jnp.int8 else jnp.int32

    def chained(x, w1, w2):
        def body(c, _):
            h = jax.lax.dot_general(c, w1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc)
            y = jax.lax.dot_general(h.astype(dt), w2,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc)
            return y.astype(dt), ()
        out, _ = jax.lax.scan(body, x, None, length=chain)
        return out.astype(jnp.float32)

    try:
        t = _timeit(jax.jit(chained), x, w1, w2) / chain
    except Exception as e:  # noqa: BLE001 - probe: record the failure mode
        print(json.dumps({"dtype": name, "error": str(e)[:300]}), flush=True)
        return
    tf = 2 * rows * d * m * 2 / t / 1e12
    print(json.dumps({"dtype": name, "ms_per_pair": round(t * 1e3, 3),
                      "tf_per_s": round(tf, 1)}), flush=True)


def main():
    run("bf16", jnp.bfloat16)
    run("int8", jnp.int8)
    run("float8_e4m3fn", jnp.float8_e4m3fn)
    run("float8_e5m2", jnp.float8_e5m2)


if __name__ == "__main__":
    main()
