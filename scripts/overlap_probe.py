"""Can Mosaic overlap MXU matmuls with INDEPENDENT VPU elementwise work?

Round-3 dissection showed the int8 fused-MLP forward's time is additive:
pure matmuls 1.07 ms + ~1.0 ms VPU (packs/GELU) = 2.06 measured, i.e. zero
MXU/VPU overlap. This probe times, in one kernel body:

  A: an int8 matmul alone            ([rows,768]x[768,3072])
  B: an independent VPU Horner chain ([rows,3072] f32, `reps` FMAs deep)
  AB: both, fully independent inputs/outputs

If AB ~= max(A, B): the units do run concurrently and kernels should be
restructured for independence. If AB ~= A + B: in-kernel VPU work is
strictly serial with the MXU and the only lever is fewer VPU ops.

Run ON the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/overlap_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0][:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][:1, :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def _kernel(xq_ref, w_ref, v_ref, mm_out_ref, vpu_out_ref, *,
            do_mm, do_vpu, reps):
    if do_mm:
        acc = jax.lax.dot_general(xq_ref[:], w_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        mm_out_ref[:] = (acc & 127).astype(jnp.int8)
    else:
        mm_out_ref[:] = xq_ref[:, :1] * jnp.ones(
            (1, mm_out_ref.shape[1]), jnp.int8)
    if do_vpu == "fma":
        v = v_ref[:]
        for _ in range(reps):
            v = v * 0.999 + 0.001
        vpu_out_ref[:] = v
    elif do_vpu == "gelu_pack":
        # the REAL per-strip VPU work of the int8 MLP fwd kernel:
        # dequant-shaped FMAs + reduced-degree GELU + dynamic quant pack
        from vitax.ops import pallas_kernels as pk
        v = v_ref[:] * 0.01 + 0.001
        q, s = pk._quant_rows(pk._gelu_q(v))
        vpu_out_ref[:] = q.astype(jnp.float32) * s
    else:
        vpu_out_ref[:] = v_ref[:]


def _dep_kernel(xq_ref, w_ref, v_ref, mm_out_ref, vpu_out_ref, *,
                dep, big_mm):
    """VPU work depends on a SMALL matmul; a BIG matmul is independent.
    Fine-grained sync => VPU overlaps the big mm. Coarse (wait-all-MXU)
    => additive."""
    from vitax.ops import pallas_kernels as pk
    small = jax.lax.dot_general(xq_ref[:256, :], w_ref[:],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    if big_mm:
        big = jax.lax.dot_general(xq_ref[:], w_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        mm_out_ref[:] = (big & 127).astype(jnp.int8)
    else:
        mm_out_ref[:] = xq_ref[:, :1] * jnp.ones(
            (1, mm_out_ref.shape[1]), jnp.int8)
    if dep:
        # v seeded from the small matmul's output -> true dependency
        v = v_ref[:] + jnp.pad(small.astype(jnp.float32) * 1e-6,
                               ((0, v_ref.shape[0] - 256), (0, 0)))
    else:
        v = v_ref[:]
    q, s = pk._quant_rows(pk._gelu_q(v * 0.01 + 0.001))
    vpu_out_ref[:] = q.astype(jnp.float32) * s


def run_dep(name, rows, dep, big_mm, K=50):
    d, m = 768, 3072
    key = jax.random.PRNGKey(0)
    xq = jax.random.randint(key, (rows, d), -127, 127, jnp.int8)
    w = jax.random.randint(key, (d, m), -127, 127, jnp.int8)
    v = jax.random.normal(key, (rows, m), jnp.float32)
    blk = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_dep_kernel, dep=dep, big_mm=big_mm),
        grid=(1,),
        in_specs=[blk(rows, d), blk(d, m), blk(rows, m)],
        out_specs=[blk(rows, m), blk(rows, m)],
        out_shape=[jax.ShapeDtypeStruct((rows, m), jnp.int8),
                   jax.ShapeDtypeStruct((rows, m), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chained(xq, w, v):
        def body(c, _):
            xq_c, v_c = c
            o1, o2 = call(xq_c, w, v_c)
            return (o1[:, :d], o2), ()
        out, _ = jax.lax.scan(body, (xq, v), None, length=K)
        return out

    t = _timeit(jax.jit(chained), xq, w, v) / K
    print(json.dumps({"case": name, "ms": round(t * 1e3, 3)}), flush=True)
    return t


def run(name, rows, reps, do_mm, do_vpu, K=12):
    d, m = 768, 3072
    key = jax.random.PRNGKey(0)
    xq = jax.random.randint(key, (rows, d), -127, 127, jnp.int8)
    w = jax.random.randint(key, (d, m), -127, 127, jnp.int8)
    v = jax.random.normal(key, (rows, m), jnp.float32)
    blk = lambda r, c, dt: pl.BlockSpec((r, c), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_kernel, do_mm=do_mm, do_vpu=do_vpu, reps=reps),
        grid=(1,),
        in_specs=[blk(rows, d, jnp.int8), blk(d, m, jnp.int8),
                  blk(rows, m, jnp.float32)],
        out_specs=[blk(rows, m, jnp.int8), blk(rows, m, jnp.float32)],
        out_shape=[jax.ShapeDtypeStruct((rows, m), jnp.int8),
                   jax.ShapeDtypeStruct((rows, m), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chained(xq, w, v):
        def body(c, _):
            xq_c, v_c = c
            o1, o2 = call(xq_c, w, v_c)
            return (o1[:, :d], o2), ()
        out, _ = jax.lax.scan(body, (xq, v), None, length=K)
        return out

    t = _timeit(jax.jit(chained), xq, w, v) / K
    print(json.dumps({"case": name, "ms": round(t * 1e3, 3)}), flush=True)
    return t


def main():
    rows, reps = 2048, 16
    a = run("A: int8 mm only", rows, reps, True, False, K=50)
    for mode in ("fma", "gelu_pack"):
        b = run(f"B: vpu {mode} only", rows, reps, False, mode, K=50)
        ab = run(f"AB: mm + {mode}, independent", rows, reps, True, mode,
                 K=50)
        print(json.dumps({"mode": mode, "sum_ms": round((a + b) * 1e3, 3),
                          "max_ms": round(max(a, b) * 1e3, 3),
                          "overlap_frac": round((a + b - ab) / min(a, b),
                                                3)}),
              flush=True)


if __name__ == "__main__":
    main()
