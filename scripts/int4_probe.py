"""Probe: is a W4A8 tier viable inside the fused Pallas kernels?

Round-3 measured int4xint4 dot_general at 208.6 TF/s vs 154.2 int8 on the
chained-pair harness (real 1.35x, not emulated) and parked a W4 tier as a
future lever. Shipping it requires two more facts this probe collects:

1. MIXED int4(weights) x int8(activations) dot_general rate at the XLA
   level — W4A8 keeps activations at int8 (the accuracy-safe side) and
   only quantizes weights to 4 bits. If mixed dots fall back to the int8
   (or worse, bf16-emulated) rate, only W4A4 would pay, which is an
   accuracy bridge too far for training.
2. Whether MOSAIC lowers int4 at all inside a pallas kernel: (a) int4
   VMEM refs as kernel operands, (b) int4 x int8 / int4 x int4
   `dot_general` in the kernel body, (c) in-kernel fp32->int4 pack (for
   the dW path if W4 grads were ever tried). The fused encoder kernels
   are where every hot matmul lives, so XLA-level support alone is
   useless.

Axon-tunnel gotcha (first run of this probe): int4 arrays cannot be
host-transferred (the transfer path recursively calls jit). All int4
values must be MATERIALIZED ON DEVICE inside the jitted program — inputs
arrive as int8 and are converted with .astype(jnp.int4) before use, and
outputs leave as int32. This also matches how a real W4 tier would work
(weights quantized once per step from bf16/int8 masters).

Methodology mirrors scripts/fp8_probe.py: dependency-chained pairs inside
one jitted lax.scan (single dispatch; the axon tunnel has a ~2-3 ms
per-call floor). Run ON the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/int4_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _timeit(fn, *args, iters=8):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def xla_rate(name, adt, wdt, rows=2048, d=768, m=3072, chain=48):
    key = jax.random.PRNGKey(0)
    # Host arrays stay int8 (int4 can't cross the tunnel); convert on device.
    x8 = jax.random.randint(key, (rows, d), -7, 7).astype(jnp.int8)
    w1_8 = jax.random.randint(key, (d, m), -7, 7).astype(jnp.int8)
    w2_8 = jax.random.randint(key, (m, d), -7, 7).astype(jnp.int8)

    def chained(x8, w1_8, w2_8):
        x = x8.astype(adt)
        w1 = w1_8.astype(wdt)
        w2 = w2_8.astype(wdt)

        def body(c, _):
            h = jax.lax.dot_general(c, w1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            y = jax.lax.dot_general((h & 7).astype(adt), w2,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (y & 7).astype(adt), ()

        out, _ = jax.lax.scan(body, x, None, length=chain)
        return out.astype(jnp.int32)

    try:
        t = _timeit(jax.jit(chained), x8, w1_8, w2_8) / chain
    except Exception as e:  # noqa: BLE001 - probe records the failure mode
        print(json.dumps({"probe": name, "error": str(e)[:300]}), flush=True)
        return
    tf = 2 * rows * d * m * 2 / t / 1e12
    print(json.dumps({"probe": name, "ms_per_pair": round(t * 1e3, 3),
                      "tf_per_s": round(tf, 1)}), flush=True)


def pallas_probe(name, adt, wdt, rows=1024, d=768, m=3072, chain=24):
    """Chained pallas matmul pair with adt activations x wdt weights.

    int4 operands are produced ON DEVICE (inside jit, outside the kernel)
    so the kernel sees real int4 VMEM refs.
    """
    key = jax.random.PRNGKey(0)
    x8 = jax.random.randint(key, (rows, d), -7, 7).astype(jnp.int8)
    w8 = jax.random.randint(key, (d, m), -7, 7).astype(jnp.int8)
    wb8 = jax.random.randint(key, (m, d), -7, 7).astype(jnp.int8)

    def kernel(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    mm = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, m), jnp.int32))
    mm_b = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, d), jnp.int32))

    def chained(x8, w8, wb8):
        x = x8.astype(adt)
        w = w8.astype(wdt)
        wb = wb8.astype(wdt)

        def body(c, _):
            h = mm(c, w)
            y = mm_b((h & 7).astype(adt), wb)
            return (y & 7).astype(adt), ()

        out, _ = jax.lax.scan(body, x, None, length=chain)
        return out.astype(jnp.int32)

    try:
        t = _timeit(jax.jit(chained), x8, w8, wb8) / chain
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "error": str(e)[:300]}), flush=True)
        return
    tf = 2 * rows * d * m * 2 / t / 1e12
    print(json.dumps({"probe": name, "ms_per_pair": round(t * 1e3, 3),
                      "tf_per_s": round(tf, 1)}), flush=True)


def pallas_convert_probe():
    """In-kernel fp32 -> int4 pack (round/clip/convert) — does it lower?"""
    x = jax.random.normal(jax.random.PRNGKey(0), (1024, 768), jnp.float32)

    def kernel(x_ref, o_ref):
        v = jnp.clip(jnp.round(x_ref[...] * 2.0), -7, 7)
        # Keep the int4 INSIDE the kernel (int4 outputs can't leave via the
        # tunnel); prove the pack lowers by dotting it against itself.
        q = v.astype(jnp.int4)
        o_ref[...] = jax.lax.dot_general(
            q, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    call = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((x.shape[0], x.shape[0]),
                                               jnp.int32))
    try:
        out = jax.jit(call)(x)
        ok = bool(jnp.all(jnp.diagonal(out) >= 0))
        print(json.dumps({"probe": "pallas_fp32_to_int4_pack", "ok": ok}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": "pallas_fp32_to_int4_pack",
                          "error": str(e)[:300]}), flush=True)


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    xla_rate("xla int8 x int8", jnp.int8, jnp.int8)
    xla_rate("xla int4 x int4", jnp.int4, jnp.int4)
    xla_rate("xla int8 x int4 (W4A8)", jnp.int8, jnp.int4)
    pallas_probe("pallas int8 x int8", jnp.int8, jnp.int8)
    pallas_probe("pallas int4 x int4", jnp.int4, jnp.int4)
    pallas_probe("pallas int8 x int4 (W4A8)", jnp.int8, jnp.int4)
    pallas_convert_probe()


if __name__ == "__main__":
    main()
