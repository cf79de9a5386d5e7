"""Fused Pallas/Mosaic TPU kernels — vitax's native compute layer.

The TPU analogue of the CUDA kernels the reference gets through torch
(SURVEY §2 "TPU-native equivalent" column). Each kernel has a
`*_supported()` gate; unsupported shapes fall back to the pure-XLA reference
implementations in the sibling ops modules, which are also the golden values
for the unit tests (tests/test_pallas_kernels.py, interpret mode on CPU).

Kernels:

* `fused_attention` — non-causal multi-head attention for ViT's regime
  (seq ≤ 730): for each (batch·head) grid step the full K/V block lives in
  VMEM, so the whole softmax(scale·QKᵀ)V computes in one shot — no online
  softmax and, crucially, the [S,S] score matrix NEVER touches HBM (at
  batch 512 / b16 the fp32 scores are ~1 GB per layer per pass — this HBM
  traffic is what caps the pure-XLA step). The custom-VJP backward recomputes
  the softmax in VMEM (cheaper than persisting row statistics through HBM in
  a TPU-tileable layout) and emits dQ/dK/dV directly.
  Replaces the reference attention math (src/model.py:83-101,
  res-vit/model.py:288-292) with identical fp32-softmax numerics.

* `layer_norm` — row-tiled LN with fp32 statistics, custom VJP; dγ/dβ are
  accumulated across row-blocks in the kernel (TPU grid steps execute
  sequentially, so read-modify-write accumulation on the output block is
  race-free). The backward recomputes mean/rstd from x — persisting 1-D row
  statistics trips XLA↔Mosaic layout mismatches (T(1024) vs T(512)) and the
  recompute is one cheap VPU pass over data the kernel reads anyway.
  Replaces nn.LayerNorm (src/model.py:108,114,146).

Padding: sequence is padded to the 128-lane boundary in the wrappers; padded
KV columns are masked to -1e30 before softmax, padded Q rows are sliced off
(their gradient contribution is zero because the cotangent is zero-padded).
"""

from __future__ import annotations

import functools
import math

import numpy as _np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests to run kernels on CPU


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# =============================================================================
# Fused non-causal attention
# =============================================================================

def attention_supported(q, k, v) -> bool:
    if q.ndim != 4 or q.shape != k.shape or q.shape != v.shape:
        return False
    b, s, h, hd = q.shape
    # whole-KV-in-VMEM formulation: S*S fp32 scores + 3 S*Hd blocks per
    # program; fine for the ViT regime (S ≤ 1024, Hd ≤ 128)
    return s <= 1024 and hd <= 128 and hd % 8 == 0


# dot_general dimension numbers — contraction without materializing a VMEM
# transpose (the MXU handles transposed operands natively):
#   AB_T:  [M,K] x [N,K] -> [M,N]   (contract dim1 with dim1; B transposed)
#   AT_B:  [K,M] x [K,N] -> [M,N]   (contract dim0 with dim0; A transposed)
_AB_T = (((1,), (1,)), ((), ()))
_AT_B = (((0,), (0,)), ((), ()))


def _softmax_rows(s):
    # reciprocal-multiply, not elementwise divide: one VPU divide per ROW
    # (divides are ~10x a FMA; this runs over every [S,S] score matrix)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len, group):
    """One grid step handles `group` (batch·head) pairs — amortizes grid
    overhead across many small matmuls. Matmuls take bf16 operands with fp32
    accumulation (preferred_element_type): the MXU runs at full rate and the
    softmax math stays fp32, matching the reference numerics.

    Q rows are padded only to the 8-sublane boundary (spq), KV rows to the
    128-lane boundary (spk) — score work scales with spq·spk, so the
    asymmetric padding saves ~20% at seq 197 (200·256 vs 256·256).

    The body is STAGED (all score matmuls, then all softmaxes, then all PV
    matmuls) instead of per-pair chains: the independent ops inside each
    stage let Mosaic overlap MXU and VPU work — measured 1.64 → 1.17 ms at
    B=64/group=8 vs the chained form."""
    spq = q_ref.shape[1]
    spk = k_ref.shape[1]
    ss = [jax.lax.dot_general(q_ref[g], k_ref[g], _AB_T,
                              preferred_element_type=jnp.float32) * scale
          for g in range(group)]
    if seq_len < spk:  # mask padded KV columns
        col = jax.lax.broadcasted_iota(jnp.int32, (spq, spk), 1)
        ss = [jnp.where(col < seq_len, s, -1e30) for s in ss]
    ps = [_softmax_rows(s) for s in ss]
    for g in range(group):
        o_ref[g] = jnp.dot(ps[g].astype(v_ref.dtype), v_ref[g],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale, seq_len, group):
    spq = q_ref.shape[1]
    spk = k_ref.shape[1]
    for g in range(group):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        o = o_ref[g].astype(jnp.float32)
        do32 = do_ref[g].astype(jnp.float32)
        do = do_ref[g]

        # recompute the softmax exactly as the forward did (cheaper than
        # persisting row statistics through HBM in a TPU-tileable layout).
        # Padded Q rows produce junk P rows, but their cotangent rows are
        # zero, so every gradient contribution from them vanishes.
        s = jax.lax.dot_general(q, k, _AB_T,
                                preferred_element_type=jnp.float32) * scale
        if seq_len < spk:
            col = jax.lax.broadcasted_iota(jnp.int32, (spq, spk), 1)
            s = jnp.where(col < seq_len, s, -1e30)
        p = _softmax_rows(s)                     # [SPQ, SPK] fp32
        pc = p.astype(do.dtype)

        dv = jax.lax.dot_general(pc, do, _AT_B,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _AB_T,
                                 preferred_element_type=jnp.float32)
        d = jnp.sum(do32 * o, axis=-1, keepdims=True)
        ds = (p * (dp - d)).astype(q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, _AT_B,
                                 preferred_element_type=jnp.float32) * scale

        dq_ref[g] = dq.astype(dq_ref.dtype)
        dk_ref[g] = dk.astype(dk_ref.dtype)
        dv_ref[g] = dv.astype(dv_ref.dtype)


def _pick_group(bh: int, sp: int, hd: int, itemsize: int, n_ops: int) -> int:
    """Group size for the staged kernel: 8 measured fastest (4 and 16 are
    slower — too little overlap vs VMEM pressure), bounded by the VMEM
    working set (the staged form keeps `group` fp32 score matrices live)."""
    per_pair = n_ops * sp * hd * itemsize + 2 * 4 * sp * sp
    budget = 10 * 1024 * 1024
    g = min(8, max(1, budget // max(per_pair, 1)), bh)
    while bh % g:
        g -= 1
    return g


def _g_spec(g, sp, hd):
    return pl.BlockSpec((g, sp, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _attn_fwd(q, k, v, scale, seq_len):
    bh, spq, hd = q.shape
    spk = k.shape[1]
    g = _pick_group(bh, spk, hd, q.dtype.itemsize, 4)
    out = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, seq_len=seq_len,
                          group=g),
        grid=(bh // g,),
        in_specs=[_g_spec(g, spq, hd), _g_spec(g, spk, hd),
                  _g_spec(g, spk, hd)],
        out_specs=_g_spec(g, spq, hd),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * spq * spk * hd, transcendentals=bh * spq * spk,
            bytes_accessed=4 * bh * spk * hd * q.dtype.itemsize),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(q, k, v)
    return out


def _attn_bwd(scale, seq_len, residuals, do):
    q, k, v, out = residuals
    bh, spq, hd = q.shape
    spk = k.shape[1]
    g = _pick_group(bh, spk, hd, q.dtype.itemsize, 8)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, seq_len=seq_len,
                          group=g),
        grid=(bh // g,),
        in_specs=[_g_spec(g, spq, hd), _g_spec(g, spk, hd),
                  _g_spec(g, spk, hd), _g_spec(g, spq, hd),
                  _g_spec(g, spq, hd)],
        out_specs=(_g_spec(g, spq, hd), _g_spec(g, spk, hd),
                   _g_spec(g, spk, hd)),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * spq * spk * hd, transcendentals=bh * spq * spk,
            bytes_accessed=8 * bh * spk * hd * q.dtype.itemsize),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(q, k, v, out, do)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_bh(q, k, v, scale, seq_len):
    return _attn_fwd(q, k, v, scale, seq_len)


def _attention_bh_fwd(q, k, v, scale, seq_len):
    out = _attn_fwd(q, k, v, scale, seq_len)
    return out, (q, k, v, out)


_attention_bh.defvjp(_attention_bh_fwd, _attn_bwd)


def flash_attention_bhsd(q, k, v):
    """[B,H,S,Hd]³ → [B,H,S,Hd] — the native kernel layout. Callers produce
    QKV directly in this layout from the projection einsum, so no physical
    HBM transpose surrounds the kernel (at batch 512/b16 the [B,S,H,Hd] ↔
    [B·H,S,Hd] rearrangement would move ~1.8 GB per layer)."""
    b, h, s, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    spq = _round_up(s, 8)     # Q rows: sublane alignment only
    spk = _round_up(s, 128)   # KV rows become lanes of the score matrix

    def prep(x, sp):
        if sp != s:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
        return x.reshape(b * h, sp, hd)  # adjacent-dim merge: free

    out = _attention_bh(prep(q, spq), prep(k, spk), prep(v, spk), scale, s)
    out = out.reshape(b, h, spq, hd)
    return out[:, :, :s] if spq != s else out


def flash_attention(q, k, v):
    """[B,S,H,Hd]³ → [B,S,H,Hd]; fp32 softmax, scale = Hd^-0.5."""
    out = flash_attention_bhsd(*(jnp.transpose(x, (0, 2, 1, 3))
                                 for x in (q, k, v)))
    return jnp.transpose(out, (0, 2, 1, 3))


# =============================================================================
# LayerNorm
# =============================================================================

_LN_BLOCK_ROWS = 512


def layernorm_supported(x) -> bool:
    d = x.shape[-1]
    return x.ndim >= 2 and d % 128 == 0 and d <= 8192


def _ln_fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    y = xhat * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _ln_bwd_kernel(x_ref, g_ref, dy_ref,
                   dx_ref, dg_ref, db_ref, *, eps, total_rows, block_rows):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    # recompute statistics (see module docstring)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd

    dyg = dy * g
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx = rstd * (dyg - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    # dγ/dβ accumulate across row blocks — sequential TPU grid makes the
    # read-modify-write safe. Rows past total_rows in the final (partial)
    # block hold garbage: mask them out of the reduction.
    row = (jax.lax.broadcasted_iota(jnp.int32, dy.shape, 0)
           + i * block_rows)
    valid = row < total_rows
    dg_part = jnp.sum(jnp.where(valid, dy * xhat, 0.0), axis=0)
    db_part = jnp.sum(jnp.where(valid, dy, 0.0), axis=0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg_part
        db_ref[:] = db_part

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_part
        db_ref[:] = db_ref[:] + db_part


def _ln_fwd(x2, gamma, beta, eps):
    n, d = x2.shape
    rows = min(_LN_BLOCK_ROWS, n)
    grid = (pl.cdiv(n, rows),)
    y = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta)
    return y


def _ln_bwd_call(x2, gamma, dy2, eps):
    n, d = x2.shape
    rows = min(_LN_BLOCK_ROWS, n)
    grid = (pl.cdiv(n, rows),)
    dx, dg, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps, total_rows=n,
                          block_rows=rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32)),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, dy2)
    return dx, dg, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_2d(x2, gamma, beta, eps):
    return _ln_fwd(x2, gamma, beta, eps)


def _layer_norm_2d_fwd(x2, gamma, beta, eps):
    return _ln_fwd(x2, gamma, beta, eps), (x2, gamma)


def _layer_norm_2d_bwd(eps, residuals, dy2):
    x2, gamma = residuals
    dx, dg, db = _ln_bwd_call(x2, gamma, dy2, eps)
    return dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


_layer_norm_2d.defvjp(_layer_norm_2d_fwd, _layer_norm_2d_bwd)


def layer_norm(x, scale, bias, eps):
    """LN over the last dim, fp32 statistics; any leading shape."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    y = _layer_norm_2d(x.reshape(-1, d), scale, bias, eps)
    return y.reshape(*lead, d)


# =============================================================================
# Fused LN2 + MLP + residual — the whole second half of the encoder block in
# one kernel: out = x + fc2(GELU(fc1(LN(x)))).
#
# Replaces the reference MlpBlock + its surrounding LN/residual
# (src/model.py:25-51,126-129). Rationale (PERF.md round-1 profile): the
# backward scan is dominated by the MLP recompute/grads — under XLA the fp32
# GELU activations and the [N,M] intermediate gradients stream through HBM.
# Here neither the LN output, the fc1 pre-activations, nor dh1 ever exist in
# HBM: the backward kernel recomputes them per row-block in VMEM and
# accumulates BOTH weight-grad matrices (dW1 [D,M] and dW2 [M,D], fp32)
# in-VMEM across the sequential grid, exactly like the attention-half
# kernel's dW/dWo. (v5e VMEM is ~128 MB — measured on-chip this round; the
# round-1 "3-kernel split" plan assumed ~16 MB and is unnecessary.)
#
# The kernel is ROW-BLOCKED, not image-blocked: LN/MLP have no cross-token
# structure, so [B,S,D] flattens to [N,D] rows and the grid tiles rows. This
# keeps the matmuls tall ([R,768]@[768,3072]) and makes weight blocks
# constant across the grid (fetched once, resident in VMEM).
#
# Padding: the wrapper pads N up to the row-block multiple with zero rows.
# LN of a zero row is finite (mean 0, var 0 → xhat 0 → xn = β); every
# gradient term carries a factor of the cotangent, which the slice-VJP
# zero-pads, so pad rows contribute exactly zero to every gradient.
# =============================================================================

import os as _os
# 0 = adaptive: 1024-row blocks for large-N INT8 programs (ViT b192:
# 1288 vs 1221 img/s at 256 — int8 operands halve the per-block VMEM so
# bigger blocks fit), 256 otherwise (bf16 b192: 1007 at 256 vs 951 at
# 512; res-vit b96 int8: 890 at 256 vs 880 at 512). Set VITAX_MLP_ROWS
# to pin a value.
_MLP_BLOCK_ROWS = int(_os.environ.get("VITAX_MLP_ROWS", 0))
_MLP_FWD_CHUNKS = int(_os.environ.get("VITAX_MLP_CHUNKS", 2))


def _mlp_block_rows(n: int, int8: bool = False) -> int:
    if _MLP_BLOCK_ROWS:
        return _MLP_BLOCK_ROWS
    base = 1024 if (int8 and n >= 32768) else 256
    if base == 1024 and n % base:
        # padded-stream callers (models/vit.py) hand an n that is not
        # block-aligned; a nearby exact divisor avoids re-padding the whole
        # [n,D] stream every layer (a ~60 MB HBM copy per pad — measured
        # −10% forward as scripts/handoff_probe.py variant D)
        for cand in (1280, 960, 768, 640, 512):
            if n % cand == 0 and n % (cand * _MLP_FWD_CHUNKS) == 0:
                return cand
    return base

# XLA's default *scoped* VMEM budget for a custom call is only 16 MB —
# far below the ~128 MB physically present (measured on-chip; the limit
# is what round-1 misread as a hardware ceiling). Kernels that keep
# weights + fp32 weight-grad accumulators resident must raise it.
# h14 (d=1280, m=5120) needs ~121 MB in the MLP backward (the two f32 dW
# accumulators alone are 52 MB) — the env knob lets big-d runs use the
# full chip (v5e: 128 MiB physical).
_VMEM_LIMIT_MB = int(_os.environ.get("VITAX_KERNEL_VMEM_MB", 100))
_VMEM_LIMIT = dict(compiler_params=pltpu.CompilerParams(
    vmem_limit_bytes=_VMEM_LIMIT_MB * 1024 * 1024))


def ln_mlp_supported(x, w1, w2) -> bool:
    if x.ndim != 3 or w1.ndim != 2 or w2.ndim != 2:
        return False
    d = x.shape[-1]
    m = w1.shape[1]
    if w1.shape[0] != d or w2.shape != (m, d):
        return False
    # The MONOLITHIC backward genuinely exceeds the 128 MiB physical VMEM
    # at d=1280 (fp32 dW accumulators ≈50 MB + Mosaic register spills,
    # captured error in PERF.md) — above _MLP_MONO_MAX_D the bf16 path
    # switches to the chunked-dW backward (bf16 HBM partials), which lifts
    # the bound; the int8/int4 bwd tiers still carry VMEM accumulators and
    # stay gated at _MLP_MONO_MAX_D (model code falls back to the bf16
    # fused path for them).
    max_d = int(_os.environ.get("VITAX_MLP_MAX_D", "1280"))
    if d > max_d:
        return False
    if d > _MLP_MONO_MAX_D:
        # chunked backward: no resident fp32 dW; weights + one chunk pair
        return d % 128 == 0 and m % 128 == 0 and m % _mc_for(m) == 0
    # weights (bf16) + both fp32 accumulators resident: 12·d·m bytes;
    # keep ≲ 96 MB of the ~128 MB VMEM
    return d % 128 == 0 and m % 128 == 0 and 12 * d * m <= 96 * 1024 * 1024


def _mc_for(m: int) -> int:
    mc = min(int(_os.environ.get("VITAX_MLP_DW_CHUNK", 1280)), m)
    while m % mc:
        mc //= 2
    return max(mc, 128)


def _poly(x, coefs):
    r = jnp.full_like(x, coefs[0])
    for c in coefs[1:]:
        r = r * x + c
    return r


# Divide-free erf: Chebyshev-fit of erf(x)/x as a degree-14 polynomial in
# t = x²/8 - 1 on x ∈ [0,4] (odd extension beyond). fp32 max abs error vs
# lax.erf: 1.45e-6 on [-8,8] — same band as XLA's rational ErfImpl32 but
# with no VPU divide (Horner is pure FMA). Mosaic has no erf primitive.
_ERF_P14 = (0.0033338547218590975, -0.006100607570260763,
            0.0005925343721173704, -0.002744878176599741,
            0.01863764598965645, -0.02711489424109459,
            0.030743902549147606, -0.04385055601596832,
            0.06055564433336258, -0.07512713223695755,
            0.09011507779359818, -0.10767411440610886,
            0.13168011605739594, -0.17657718062400818,
            0.3535309433937073)


def _erf(x):
    cx = jnp.clip(x, -4.0, 4.0)
    t = cx * cx * 0.125 - 1.0
    return cx * _poly(t, _ERF_P14)


def _gelu_exact(a):
    # exact-erf GELU in fp32 (src/model.py GELU default; parity-critical)
    return 0.5 * a * (1.0 + _erf(a * (2.0 ** -0.5)))


# Reduced-degree erf for the int8 kernels ONLY: degree-8 fit of erf(x)/x in
# t = x²/8-1 (same construction as _ERF_P14), max |gelu error| 1.3e-2 —
# an order of magnitude below the typical per-row int8 quantization step
# (~0.05) that h1 passes through immediately after. Saves 6 VPU FMAs per
# element on the [N,M] tensors. Gated by VITAX_INT8_FAST_GELU=0 for A/B.
_ERF_P8 = (0.11414980899413306, -0.13574829834576324,
           -0.036296585205650336, 0.0016787752591230776,
           0.13255749104130732, -0.1296150692270954,
           0.12536606610504647, -0.17495038317582992,
           0.3536795649579212)
_INT8_FAST_GELU = _os.environ.get("VITAX_INT8_FAST_GELU", "1") != "0"


def _erf8(x):
    cx = jnp.clip(x, -4.0, 4.0)
    t = cx * cx * 0.125 - 1.0
    return cx * _poly(t, _ERF_P8)


# Sigmoid-GELU for the int8 tier: x·σ(1.702x) (Hendrycks+Gimpel's sigmoid
# approximation; |err| ≤ 2.0e-2 vs exact ≈ the erf8 band and well under the
# per-row int8 step). One hw exp + recip replaces the 8-FMA erf poly, and σ
# is shared between value and grad in the backward. Measured round 3:
# 1312→1348 img/s end-to-end (+2.3%, 2 runs each), convergence-validated
# (scripts/int8_convergence.py: held-out top-1 99.2%, same band as erf8;
# final-loss diff vs bf16 1e-4) — DEFAULT ON for the int8 tier.
# VITAX_INT8_SIGMOID_GELU=0 restores the degree-8 erf for A/B.
_INT8_SIGMOID_GELU = _os.environ.get("VITAX_INT8_SIGMOID_GELU", "1") != "0"


def _sigmoid_1702(a):
    # divide-free: 1/u = rsqrt(u)² (hw rsqrt; rel err ~2^-11 after squaring,
    # 3 orders below the 2e-2 sigmoid-GELU approximation band)
    u = 1.0 + jnp.exp(a * -1.702)
    r = jax.lax.rsqrt(u)
    return r * r


def _gelu_q(a):
    """GELU for the int8 (non-parity) kernels: reduced-degree erf."""
    if not _INT8_FAST_GELU:
        return _gelu_exact(a)
    if _INT8_SIGMOID_GELU:
        return a * _sigmoid_1702(a)
    return 0.5 * a * (1.0 + _erf8(a * (2.0 ** -0.5)))


def _gelu_grad_q(a):
    """GELU' for the int8 kernels: reduced-degree erf + hw exp."""
    if not _INT8_FAST_GELU:
        return _gelu_grad(a)
    if _INT8_SIGMOID_GELU:
        # d/da a·σ(ka) = σ(ka)·(1 + ka·(1-σ(ka))); σ CSEs with _gelu_q's
        s = _sigmoid_1702(a)
        return s * (1.0 + 1.702 * a * (1.0 - s))
    phi = 0.5 * (1.0 + _erf8(a * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * a * a) * (1.0 / math.sqrt(2.0 * math.pi))
    return phi + a * pdf


def _gelu_grad(a):
    # phi's erf CSEs with _gelu_exact's (same argument) and the VPU exp is
    # hardware-cheap — a measured round-2 negative result: replacing this
    # with a single degree-16 polynomial (no erf/exp) LOST 4% end-to-end
    # (1083 -> 1043 img/s) because the poly's extra FMAs outweigh the exp.
    phi = 0.5 * (1.0 + _erf(a * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * a * a) * (1.0 / math.sqrt(2.0 * math.pi))
    return phi + a * pdf


def _ln_mlp_fwd_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       o_ref, *, eps, chunks, residual):
    """STAGED over `chunks` independent row sub-blocks: all LNs, then all
    fc1 matmuls, then all GELUs, then all fc2 matmuls. The per-chunk chains
    are independent, so Mosaic overlaps chunk i's GELU (VPU) with chunk
    i+1's matmul (MXU) — the chained single-block form measured VPU-bound
    at ~78 TF/s because the exact-erf GELU serializes against the MXU."""
    rows = x_ref.shape[0] // chunks
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    b1f = b1_ref[:].astype(jnp.float32)
    b2f = b2_ref[:].astype(jnp.float32)
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]

    xns = []
    for sl in sls:
        x32 = x_ref[sl, :].astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xhat = xc * jax.lax.rsqrt(var + eps)
        xns.append((xhat * g32 + be32).astype(x_ref.dtype))
    a1s = [jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) + b1f
           for xn in xns]
    h1s = [_gelu_exact(a1).astype(x_ref.dtype) for a1 in a1s]
    for sl, h1 in zip(sls, h1s):
        y = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32) + b2f
        if residual:
            o_ref[sl, :] = x_ref[sl, :] + y.astype(x_ref.dtype)
        else:  # TP per-shard partial sum: the caller adds x (and b2) once
            o_ref[sl, :] = y.astype(x_ref.dtype)


def _ln_mlp_fwd_save_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                            b2_ref, o_ref, h1_ref, gp_ref, *, eps, chunks,
                            residual):
    """Forward that ALSO persists h1 = GELU(a1) and g' = GELU'(a1) (both in
    x.dtype) so the backward is pure matmuls — no fc1 recompute, no erf/exp.
    Costs one extra exp per element here (the pdf term of g', where the MXU
    has slack) + 2 x [N,M] of HBM traffic, and removes 2NDM FLOPs + all
    transcendentals from the backward."""
    rows = x_ref.shape[0] // chunks
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    b1f = b1_ref[:].astype(jnp.float32)
    b2f = b2_ref[:].astype(jnp.float32)
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]

    xns = []
    for sl in sls:
        x32 = x_ref[sl, :].astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xhat = xc * jax.lax.rsqrt(var + eps)
        xns.append((xhat * g32 + be32).astype(x_ref.dtype))
    a1s = [jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) + b1f
           for xn in xns]
    h1s = []
    for sl, a1 in zip(sls, a1s):
        h1 = _gelu_exact(a1).astype(x_ref.dtype)
        h1_ref[sl, :] = h1
        gp_ref[sl, :] = _gelu_grad(a1).astype(x_ref.dtype)
        h1s.append(h1)
    for sl, h1 in zip(sls, h1s):
        y = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32) + b2f
        if residual:
            o_ref[sl, :] = x_ref[sl, :] + y.astype(x_ref.dtype)
        else:
            o_ref[sl, :] = y.astype(x_ref.dtype)


def _pack_i8(r):
    """fp32 (already scaled to ±127) -> int8, round to nearest.

    Measured negative (round 3): `pltpu.stochastic_round` with a constant
    half-ulp bits operand would be a single-macro-op round-half-up pack, but
    this jaxlib's Mosaic lowering only accepts bf16/fp8 targets — int8 is
    rejected at compile time (scripts/pack_probe.py captured the error).
    The round/clip/convert chain below stays."""
    return jnp.clip(jnp.round(r), -127.0, 127.0).astype(jnp.int8)


def _quant_rows(x32, limit=127.0):
    """Symmetric per-row int8 quantization: returns (int8 values, fp32
    per-row scale s) with x ≈ q * s. Divide-free inner loop: one divide
    per ROW for the reciprocal scale, then a broadcast multiply (VPU divides
    are ~10x a FMA; the elementwise x/s form showed up in the kernel
    profile)."""
    amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-12)
    s = amax * (1.0 / limit)
    r = limit / amax
    q = _pack_i8(x32 * r)
    return q, s


def _ln_mlp_fwd_int8_kernel(x_ref, g_ref, be_ref, w1q_ref, s1_ref, b1_ref,
                            w2q_ref, s2_ref, b2_ref, o_ref, *, eps, chunks,
                            residual):
    """int8 forward: both MLP matmuls run on the int8 MXU (measured 302
    vs 170 TF/s bf16 on these shapes — scripts/roofline.py). Dynamic
    symmetric quantization: activations per row, weights per output column
    (pre-quantized outside). The GELU and LN stay fp32; only the matmul
    operands drop precision (ViT quantization survey, PAPERS.md #6 —
    W8A8 on linear layers preserves ViT accuracy within ~0.1-0.5%)."""
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
        xqs.append(_quant_rows(xhat * g32 + be32))
    a1s = [jax.lax.dot_general(xq, w1q_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32) * sx * s1 + b1f
           for xq, sx in xqs]
    h1qs = [_quant_rows(_gelu_q(a1)) for a1 in a1s]
    for sl, (h1q, sh) in zip(sls, h1qs):
        y = jax.lax.dot_general(h1q, w2q_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * sh * s2 + b2f
        if residual:
            o_ref[sl, :] = x_ref[sl, :] + y.astype(x_ref.dtype)
        else:
            o_ref[sl, :] = y.astype(x_ref.dtype)


# |GELU'(a)| is globally bounded by ~1.129 (max of phi + a*pdf at a~1.5),
# so g' quantizes with a STATIC per-tensor scale — no amax pass, no scale
# tensor to save (the int8 save-acts backward relies on this).
_GP_AMAX = 1.13
_GP_QSCALE = 127.0 / _GP_AMAX
_GP_DEQUANT = _GP_AMAX / 127.0


def _ln_mlp_fwd_int8_save_kernel(x_ref, g_ref, be_ref, w1q_ref, s1_ref,
                                 b1_ref, w2q_ref, s2_ref, b2_ref,
                                 o_ref, h1q_ref, sh_ref, gpq_ref, *, eps,
                                 chunks, residual):
    """int8 forward that ALSO persists the already-computed h1q (int8, per-
    row scale sh) and GELU'(a1) statically quantized to int8 — so the
    backward is pure int8 matmuls with no fc1 recompute and no
    transcendentals, at 1/4 the HBM traffic of the bf16 save variant."""
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
        xqs.append(_quant_rows(xhat * g32 + be32))
    a1s = [jax.lax.dot_general(xq, w1q_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32) * sx * s1 + b1f
           for xq, sx in xqs]
    h1qs = []
    for sl, a1 in zip(sls, a1s):
        h1q, sh = _quant_rows(_gelu_q(a1))
        h1q_ref[sl, :] = h1q
        sh_ref[sl, :] = jnp.broadcast_to(sh, (sh.shape[0], sh_ref.shape[1]))
        gpq_ref[sl, :] = _pack_i8(_gelu_grad_q(a1) * _GP_QSCALE)
        h1qs.append((h1q, sh))
    for sl, (h1q, sh) in zip(sls, h1qs):
        y = jax.lax.dot_general(h1q, w2q_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * sh * s2 + b2f
        if residual:
            o_ref[sl, :] = x_ref[sl, :] + y.astype(x_ref.dtype)
        else:
            o_ref[sl, :] = y.astype(x_ref.dtype)


def _ln_mlp_bwd_int8_save_kernel(x_ref, g_ref, be_ref,
                                 w1q_ref, s1r_ref, w2q_ref, s2r_ref,
                                 h1q_ref, sh_ref, gpq_ref, do_ref,
                                 dx_ref, dg_ref, dbe_ref, dw1_ref, db1_ref,
                                 dw2_ref, db2_ref, *, eps, residual, chunks,
                                 int8_dw=False):
    """Backward from SAVED int8 h1q/sh/gpq: no fc1 recompute, no GELU/erf.
    dh1 = (do W2ᵀ)·g' with both factors dequantized on the fly; dW2 folds
    h1's per-row scale into do (a D-wide multiply) so h1q feeds the dW2
    matmul directly. Only the LN statistics are recomputed (D-wide VPU)."""
    i = pl.program_id(0)
    rows = x_ref.shape[0] // chunks
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    s1r = s1r_ref[:]
    s2r = s2r_ref[:]
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]

    xns, xhats, rstds = [], [], []
    for sl in sls:
        x32 = x_ref[sl, :].astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = xc * rstd
        xns.append((xhat * g32 + be32).astype(x_ref.dtype))
        xhats.append(xhat)
        rstds.append(rstd)
    # dh1f = do @ W2^T on the int8 MXU; g' dequant is one fused multiply
    doqs = [_quant_rows(do_ref[sl, :].astype(jnp.float32)) for sl in sls]
    dh1fs = [jax.lax.dot_general(doq, w2q_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32) * (sdo * _GP_DEQUANT)
             * s2r
             for doq, sdo in doqs]
    dh1_32s = [dh1f * gpq_ref[sl, :].astype(jnp.float32)
               for sl, dh1f in zip(sls, dh1fs)]
    # per-row int8 dh1: consumed by the dxn matmul below AND (int8_dw)
    # reused as the dW1 operand via row-scale folding
    dh1qs = [_quant_rows(d) for d in dh1_32s]
    if int8_dw:
        dw2_part = jnp.zeros((dw2_ref.shape[0], dw2_ref.shape[1]),
                             jnp.float32)
        dw1_part = jnp.zeros((dw1_ref.shape[0], dw1_ref.shape[1]),
                             jnp.float32)
        for sl, xn, (dh1q, sdh) in zip(sls, xns, dh1qs):
            # dW2 = h1qᵀ @ (sh·do): per-row h1 scale folded into do, then
            # per-column int8 quant of the scaled do (Jetfire block style)
            dos = sh_ref[sl, 0:1] * do_ref[sl, :].astype(jnp.float32)
            doq2, sdo2 = _quant_cols(dos)
            dw2_part = dw2_part + jax.lax.dot_general(
                h1q_ref[sl, :], doq2, _AT_B, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * sdo2[0][None, :]
            # dW1 = (sdh·xn)ᵀ @ dh1q: reuse the per-row int8 dh1 from the
            # dxn matmul, folding its row scales into xn (saves the fresh
            # per-col quantization pass over dh1 [R,M])
            xnq, sxn = _quant_cols(xn.astype(jnp.float32) * sdh)
            dw1_part = dw1_part + jax.lax.dot_general(
                xnq, dh1q, _AT_B, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * sxn[0][:, None]
    else:
        dw2_part = sum(jax.lax.dot_general(
            h1q_ref[sl, :].astype(x_ref.dtype),
            (sh_ref[sl, 0:1] * do_ref[sl, :].astype(jnp.float32)
             ).astype(x_ref.dtype),
            _AT_B, preferred_element_type=jnp.float32) for sl in sls)
        dw1_part = sum(jax.lax.dot_general(xn, dh1.astype(x_ref.dtype),
                                           _AT_B,
                                           preferred_element_type=jnp.float32)
                       for xn, dh1 in zip(xns, dh1_32s))
    db2_part = jnp.sum(do_ref[:].astype(jnp.float32), axis=0)
    db1_part = sum(jnp.sum(d, axis=0) for d in dh1_32s)
    dxns = [jax.lax.dot_general(dq, w1q_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * sd * s1r
            for dq, sd in dh1qs]
    dg_part = jnp.zeros_like(g32)
    dbe_part = jnp.zeros_like(g32)
    for sl, dxn, xhat, rstd in zip(sls, dxns, xhats, rstds):
        dyg = dxn * g32
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
        dxln = rstd * (dyg - m1 - xhat * m2)
        if residual:
            dx_ref[sl, :] = do_ref[sl, :] + dxln.astype(dx_ref.dtype)
        else:
            dx_ref[sl, :] = dxln.astype(dx_ref.dtype)
        dg_part = dg_part + jnp.sum(dxn * xhat, axis=0)
        dbe_part = dbe_part + jnp.sum(dxn, axis=0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg_part
        dbe_ref[:] = dbe_part
        dw1_ref[:] = dw1_part
        db1_ref[:] = db1_part
        dw2_ref[:] = dw2_part
        db2_ref[:] = db2_part

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_part
        dbe_ref[:] = dbe_ref[:] + dbe_part
        dw1_ref[:] = dw1_ref[:] + dw1_part
        db1_ref[:] = db1_ref[:] + db1_part
        dw2_ref[:] = dw2_ref[:] + dw2_part
        db2_ref[:] = db2_ref[:] + db2_part


def _quant_cols_host(w):
    """Per-output-column symmetric int8 for a [K, N] weight (runs in XLA
    once per step, outside the kernel)."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127.0, 127.0).astype(jnp.int8)
    return q, s[0]


def _quant_rows_host(w):
    """Per-row symmetric int8 for a [K, N] weight contracted over N."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127.0, 127.0).astype(jnp.int8)
    return q, s[:, 0]


def _quant_cols(x32, limit=127.0):
    """Symmetric per-column int8 (over the row/contraction axis).
    Divide-free: one divide per column, broadcast multiply elsewhere."""
    amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=0, keepdims=True), 1e-12)
    s = amax * (1.0 / limit)
    r = limit / amax
    q = _pack_i8(x32 * r)
    return q, s


def _i4_dtype():
    """int4 on TPU; int8 CONTAINER in interpret mode (XLA CPU rejects
    sub-byte dot operands). Values are always in [-7, 7], so the int8
    container computes bit-identical int32 accumulations."""
    return jnp.int8 if _INTERPRET else jnp.int4


def _pack_i4(r):
    """fp32 (already scaled to ±7) -> int4, round to nearest. Same
    round/clip/convert chain Mosaic pattern-matches for int8; the int4
    lowering was probe-verified (scripts/int4_probe.py)."""
    return jnp.clip(jnp.round(r), -7.0, 7.0).astype(_i4_dtype())


def _quant_rows4(x32, limit=7.0):
    """Symmetric per-row int4 quantization (A4 side of the A4W4 tier).
    Same divide-free structure as _quant_rows."""
    amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-12)
    s = amax * (1.0 / limit)
    r = limit / amax
    q = _pack_i4(x32 * r)
    return q, s


def _quant_cols_host4(w):
    """Per-output-column symmetric int4 for a [K, N] weight (W4 side;
    runs in XLA once per step, outside the kernel)."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(w32 / s), -7.0, 7.0).astype(_i4_dtype())
    return q, s[0]


def _quant_rows_host4(w):
    """Per-row symmetric int4 for a [K, N] weight contracted over N
    (the W4 side of the A4W4 backward dx-path matmuls)."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(w32 / s), -7.0, 7.0).astype(_i4_dtype())
    return q, s[:, 0]


def _ln_mlp_fwd_int4_kernel(x_ref, g_ref, be_ref, w1q_ref, s1_ref, b1_ref,
                            w2q_ref, s2_ref, b2_ref, o_ref, *, eps, chunks,
                            residual):
    """A4W4 forward: both MLP matmuls on the int4 MXU path (probe-measured
    199.3 vs 150.8 TF/s int8 in a gridded kernel — scripts/int4_probe.py;
    MIXED int8x int4 is Mosaic-rejected, so both operands drop to 4 bits).
    Same structure as the int8 kernel: dynamic per-row activations,
    per-column pre-quantized weights, fp32 LN/GELU/dequant. 15-level
    operands are an accuracy tier below W8A8 — opt-in (see PERF.md for the
    convergence evidence)."""
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
        xqs.append(_quant_rows4(xhat * g32 + be32))
    a1s = [jax.lax.dot_general(xq, w1q_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32) * sx * s1 + b1f
           for xq, sx in xqs]
    h1qs = [_quant_rows4(_gelu_q(a1)) for a1 in a1s]
    for sl, (h1q, sh) in zip(sls, h1qs):
        y = jax.lax.dot_general(h1q, w2q_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * sh * s2 + b2f
        if residual:
            o_ref[sl, :] = x_ref[sl, :] + y.astype(x_ref.dtype)
        else:
            o_ref[sl, :] = y.astype(x_ref.dtype)


def _ln_mlp_bwd_int4_kernel(x_ref, g_ref, be_ref, b1_ref,
                            w1q_ref, s1r_ref, w2q_ref, s2r_ref,
                            w1c_ref, s1c_ref, do_ref,
                            dx_ref, dg_ref, dbe_ref, dw1_ref, db1_ref,
                            dw2_ref, db2_ref, *, eps, residual, chunks,
                            int8_dw=False):
    """A4W4 backward dx-path: the fc1 recompute, dh1 = do W2ᵀ and
    dxn = dh1 W1ᵀ matmuls all run int4×int4 on the int4 MXU (1.32×
    the int8 rate in-kernel, scripts/int4_probe.py). The weight-grad
    matmuls stay ≥8-bit — dW is where quantized training actually
    diverges (SwitchBack precision split, PAPERS.md #6): int8_dw=True
    quantizes BOTH dW operands per-column int8 (the row-scale folding
    of the int8 kernel can't apply here — the row tensors are int4 and
    mixed int4×int8 dots are Mosaic-rejected), else dW stays bf16.
    Deepest-precision gradient tier; opt-in (`--int4-grad`)."""
    i = pl.program_id(0)
    rows = x_ref.shape[0] // chunks
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    b1f = b1_ref[:].astype(jnp.float32)
    s1r = s1r_ref[:]
    s2r = s2r_ref[:]
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]

    xns, xhats, rstds = [], [], []
    for sl in sls:
        x32 = x_ref[sl, :].astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = xc * rstd
        xns.append((xhat * g32 + be32).astype(x_ref.dtype))
        xhats.append(xhat)
        rstds.append(rstd)
    # int4 fc1 recompute: a1 feeds gelu_grad/h1 only (dW1 keeps bf16 xn)
    xqs = [_quant_rows4(xn.astype(jnp.float32)) for xn in xns]
    a1s = [jax.lax.dot_general(xq, w1c_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32) * sxq * s1c_ref[:] + b1f
           for xq, sxq in xqs]
    # int4 dh1f = do @ W2ᵀ (both per-row over the contracted D axis)
    doqs = [_quant_rows4(do_ref[sl, :].astype(jnp.float32)) for sl in sls]
    dh1fs = [jax.lax.dot_general(doq, w2q_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32) * sdo * s2r
             for doq, sdo in doqs]
    h1s = [_gelu_q(a1).astype(x_ref.dtype) for a1 in a1s]
    gps = [_gelu_grad_q(a1) for a1 in a1s]
    dh1_32s = [dh1f * gp for dh1f, gp in zip(dh1fs, gps)]
    dh1s = [d.astype(x_ref.dtype) for d in dh1_32s]
    dh1qs = [_quant_rows4(d) for d in dh1_32s]
    if int8_dw:
        # per-block int8 dW, both operands per-COLUMN (over the row /
        # contraction axis) — 4 fresh packs/chunk; the folding reuse is
        # int8-only
        dw2_part = jnp.zeros((dw2_ref.shape[0], dw2_ref.shape[1]),
                             jnp.float32)
        dw1_part = jnp.zeros((dw1_ref.shape[0], dw1_ref.shape[1]),
                             jnp.float32)
        for sl, h1, xn, dh1_32 in zip(sls, h1s, xns, dh1_32s):
            do32 = do_ref[sl, :].astype(jnp.float32)
            h1q, shc = _quant_cols(h1.astype(jnp.float32))
            doqc, sdoc = _quant_cols(do32)
            dw2_part = dw2_part + jax.lax.dot_general(
                h1q, doqc, _AT_B, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * shc[0][:, None] * sdoc[0][None, :]
            xnq, sxnc = _quant_cols(xn.astype(jnp.float32))
            dh1qc, sdhc = _quant_cols(dh1_32)
            dw1_part = dw1_part + jax.lax.dot_general(
                xnq, dh1qc, _AT_B, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * sxnc[0][:, None] * sdhc[0][None, :]
    else:
        dw2_part = sum(jax.lax.dot_general(h1, do_ref[sl, :], _AT_B,
                                           preferred_element_type=jnp.float32)
                       for sl, h1 in zip(sls, h1s))
        dw1_part = sum(jax.lax.dot_general(xn, dh1, _AT_B,
                                           preferred_element_type=jnp.float32)
                       for xn, dh1 in zip(xns, dh1s))
    db2_part = jnp.sum(do_ref[:].astype(jnp.float32), axis=0)
    db1_part = sum(jnp.sum(d, axis=0) for d in dh1_32s)
    # int4 dxn = dh1 @ W1ᵀ (both per-row over the contracted M axis)
    dxns = [jax.lax.dot_general(dq, w1q_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * sd * s1r
            for dq, sd in dh1qs]
    dg_part = jnp.zeros_like(g32)
    dbe_part = jnp.zeros_like(g32)
    for sl, dxn, xhat, rstd in zip(sls, dxns, xhats, rstds):
        dyg = dxn * g32
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
        dxln = rstd * (dyg - m1 - xhat * m2)
        if residual:
            dx_ref[sl, :] = do_ref[sl, :] + dxln.astype(dx_ref.dtype)
        else:
            dx_ref[sl, :] = dxln.astype(dx_ref.dtype)
        dg_part = dg_part + jnp.sum(dxn * xhat, axis=0)
        dbe_part = dbe_part + jnp.sum(dxn, axis=0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg_part
        dbe_ref[:] = dbe_part
        dw1_ref[:] = dw1_part
        db1_ref[:] = db1_part
        dw2_ref[:] = dw2_part
        db2_ref[:] = db2_part

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_part
        dbe_ref[:] = dbe_ref[:] + dbe_part
        dw1_ref[:] = dw1_ref[:] + dw1_part
        db1_ref[:] = db1_ref[:] + db1_part
        dw2_ref[:] = dw2_ref[:] + dw2_part
        db2_ref[:] = db2_ref[:] + db2_part


def _ln_mlp_bwd_int8_kernel(x_ref, g_ref, be_ref, b1_ref,
                            w1q_ref, s1r_ref, w2q_ref, s2r_ref,
                            w1c_ref, s1c_ref, do_ref,
                            dx_ref, dg_ref, dbe_ref, dw1_ref, db1_ref,
                            dw2_ref, db2_ref, *, eps, residual, chunks,
                            int8_dw=False):
    """SwitchBack-style backward: the dL/dx-path matmuls (dh1 = do W2ᵀ and
    dxn = dh1 W1ᵀ) run W8A8 on the int8 MXU; the weight-grad matmuls
    (dW = actᵀ grad) and the fc1 recompute stay bf16 — the standard
    int8-backprop precision split (dW needs the precision, dx tolerates
    quantization; ViT quantization survey, PAPERS.md #6)."""
    i = pl.program_id(0)
    rows = x_ref.shape[0] // chunks
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    b1f = b1_ref[:].astype(jnp.float32)
    s1r = s1r_ref[:]
    s2r = s2r_ref[:]
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]

    xns, xhats, rstds = [], [], []
    for sl in sls:
        x32 = x_ref[sl, :].astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = xc * rstd
        xns.append((xhat * g32 + be32).astype(x_ref.dtype))
        xhats.append(xhat)
        rstds.append(rstd)
    # int8 fc1 recompute (Jetfire-style): a1 feeds gelu_grad and h1 only;
    # dW1 keeps the bf16 xn
    xqs = [_quant_rows(xn.astype(jnp.float32)) for xn in xns]
    a1s = [jax.lax.dot_general(xq, w1c_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32) * sxq * s1c_ref[:] + b1f
           for xq, sxq in xqs]
    # int8 dh1f = do @ W2^T: do per-row, W2 per-row (both contracted over D)
    doqs = [_quant_rows(do_ref[sl, :].astype(jnp.float32)) for sl in sls]
    dh1fs = [jax.lax.dot_general(doq, w2q_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32) * sdo * s2r
             for doq, sdo in doqs]
    h1s = [_gelu_q(a1).astype(x_ref.dtype) for a1 in a1s]
    gps = [_gelu_grad_q(a1) for a1 in a1s]
    dh1_32s = [dh1f * gp for dh1f, gp in zip(dh1fs, gps)]
    dh1s = [d.astype(x_ref.dtype) for d in dh1_32s]
    # per-row int8 dh1: consumed by the dxn matmul below AND (int8_dw)
    # reused as the dW1 operand via row-scale folding
    dh1qs = [_quant_rows(d) for d in dh1_32s]
    if int8_dw:
        # Jetfire-style per-block int8 dW with ROW-SCALE FOLDING: the
        # per-row int8 tensors for do (doqs, used by the dh1f matmul) and
        # dh1 (dh1qs below, used by the dxn matmul) are REUSED as the dW
        # matmul operands. Their per-row scales ride along the contraction
        # (row) axis, so they can't factor out of the int8 matmul — instead
        # they FOLD into the fp32 co-operand before ITS per-column
        # quantization (dW2 = Σ_n h1[n,:]ᵀ·u_n·doq[n,:]); the product is
        # exact up to the same 8-bit grids. This removes two fresh
        # quantization passes per chunk (per-col do [R,D] and per-col dh1
        # [R,M] — the [R,M] one was the single biggest VPU item in the
        # dW path) at the cost of two broadcast multiplies.
        dw2_part = jnp.zeros((dw2_ref.shape[0], dw2_ref.shape[1]),
                             jnp.float32)
        dw1_part = jnp.zeros((dw1_ref.shape[0], dw1_ref.shape[1]),
                             jnp.float32)
        for h1, xn, (doq, sdo), (dh1q, sdh) in zip(h1s, xns, doqs, dh1qs):
            h1q, sh = _quant_cols(h1.astype(jnp.float32) * sdo)
            dw2_part = dw2_part + jax.lax.dot_general(
                h1q, doq, _AT_B, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * sh[0][:, None]
            xnq, sxn = _quant_cols(xn.astype(jnp.float32) * sdh)
            dw1_part = dw1_part + jax.lax.dot_general(
                xnq, dh1q, _AT_B, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * sxn[0][:, None]
    else:
        dw2_part = sum(jax.lax.dot_general(h1, do_ref[sl, :], _AT_B,
                                           preferred_element_type=jnp.float32)
                       for sl, h1 in zip(sls, h1s))
        dw1_part = sum(jax.lax.dot_general(xn, dh1, _AT_B,
                                           preferred_element_type=jnp.float32)
                       for xn, dh1 in zip(xns, dh1s))
    db2_part = jnp.sum(do_ref[:].astype(jnp.float32), axis=0)
    db1_part = sum(jnp.sum(d, axis=0) for d in dh1_32s)
    # int8 dxn = dh1 @ W1^T: dh1 per-row, W1 per-row (contracted over M)
    dxns = [jax.lax.dot_general(dq, w1q_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * sd * s1r
            for dq, sd in dh1qs]
    dg_part = jnp.zeros_like(g32)
    dbe_part = jnp.zeros_like(g32)
    for sl, dxn, xhat, rstd in zip(sls, dxns, xhats, rstds):
        dyg = dxn * g32
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
        dxln = rstd * (dyg - m1 - xhat * m2)
        if residual:
            dx_ref[sl, :] = do_ref[sl, :] + dxln.astype(dx_ref.dtype)
        else:
            dx_ref[sl, :] = dxln.astype(dx_ref.dtype)
        dg_part = dg_part + jnp.sum(dxn * xhat, axis=0)
        dbe_part = dbe_part + jnp.sum(dxn, axis=0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg_part
        dbe_ref[:] = dbe_part
        dw1_ref[:] = dw1_part
        db1_ref[:] = db1_part
        dw2_ref[:] = dw2_part
        db2_ref[:] = db2_part

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_part
        dbe_ref[:] = dbe_ref[:] + dbe_part
        dw1_ref[:] = dw1_ref[:] + dw1_part
        db1_ref[:] = db1_ref[:] + db1_part
        dw2_ref[:] = dw2_ref[:] + dw2_part
        db2_ref[:] = db2_ref[:] + db2_part


def _ln_mlp_bwd_fast_kernel(x_ref, g_ref, be_ref, w1_ref, w2_ref, h1_ref,
                            gp_ref, do_ref, dx_ref, dg_ref, dbe_ref, dw1_ref,
                            db1_ref, dw2_ref, db2_ref, *, eps, residual):
    """Backward from SAVED h1/g': 4 matmuls (8NDM), zero transcendentals.
    Only the LN statistics are recomputed (VPU, no matmul)."""
    i = pl.program_id(0)
    x32 = x_ref[:].astype(jnp.float32)
    g32 = g_ref[:].astype(jnp.float32)
    do = do_ref[:]
    h1 = h1_ref[:]
    gp = gp_ref[:]

    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    xn = (xhat * g32 + be_ref[:].astype(jnp.float32)).astype(x_ref.dtype)

    dw2_part = jax.lax.dot_general(h1, do, _AT_B,
                                   preferred_element_type=jnp.float32)
    db2_part = jnp.sum(do.astype(jnp.float32), axis=0)

    dh1f = jax.lax.dot_general(do, w2_ref[:], _AB_T,
                               preferred_element_type=jnp.float32)
    dh1 = (dh1f * gp.astype(jnp.float32)).astype(x_ref.dtype)
    dw1_part = jax.lax.dot_general(xn, dh1, _AT_B,
                                   preferred_element_type=jnp.float32)
    db1_part = jnp.sum(dh1.astype(jnp.float32), axis=0)

    dxn = jax.lax.dot_general(dh1, w1_ref[:], _AB_T,
                              preferred_element_type=jnp.float32)
    dyg = dxn * g32
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dxln = rstd * (dyg - m1 - xhat * m2)
    if residual:
        dx_ref[:] = do + dxln.astype(dx_ref.dtype)
    else:
        dx_ref[:] = dxln.astype(dx_ref.dtype)

    dg_part = jnp.sum(dxn * xhat, axis=0)
    dbe_part = jnp.sum(dxn, axis=0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg_part
        dbe_ref[:] = dbe_part
        dw1_ref[:] = dw1_part
        db1_ref[:] = db1_part
        dw2_ref[:] = dw2_part
        db2_ref[:] = db2_part

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_part
        dbe_ref[:] = dbe_ref[:] + dbe_part
        dw1_ref[:] = dw1_ref[:] + dw1_part
        db1_ref[:] = db1_ref[:] + db1_part
        dw2_ref[:] = dw2_ref[:] + dw2_part
        db2_ref[:] = db2_ref[:] + db2_part


def _ln_mlp_bwd_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, do_ref,
                       dx_ref, dg_ref, dbe_ref, dw1_ref, db1_ref, dw2_ref,
                       db2_ref, *, eps, residual, chunks):
    """STAGED like the forward: the per-chunk chains are independent until
    the final dW accumulation, so Mosaic can overlap chunk i's GELU/LN VPU
    work with chunk i+1's matmuls instead of serializing the whole
    recompute->grads chain per row block."""
    i = pl.program_id(0)
    rows = x_ref.shape[0] // chunks
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    b1f = b1_ref[:].astype(jnp.float32)
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]

    # stage 1: LN recompute (VPU)
    xns, xhats, rstds = [], [], []
    for sl in sls:
        x32 = x_ref[sl, :].astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = xc * rstd
        xns.append((xhat * g32 + be32).astype(x_ref.dtype))
        xhats.append(xhat)
        rstds.append(rstd)
    # stage 2: fc1 recompute (MXU)
    a1s = [jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) + b1f
           for xn in xns]
    # stage 3: dh1f = do @ W2^T (MXU) — independent of the GELU stage
    dh1fs = [jax.lax.dot_general(do_ref[sl, :], w2_ref[:], _AB_T,
                                 preferred_element_type=jnp.float32)
             for sl in sls]
    # stage 4: GELU value + derivative (VPU)
    h1s = [_gelu_exact(a1).astype(x_ref.dtype) for a1 in a1s]
    gps = [_gelu_grad(a1) for a1 in a1s]
    # stage 5: fc2/fc1 weight grads + dxn (MXU)
    dh1s = [(dh1f * gp).astype(x_ref.dtype)
            for dh1f, gp in zip(dh1fs, gps)]
    dw2_part = sum(jax.lax.dot_general(h1, do_ref[sl, :], _AT_B,
                                       preferred_element_type=jnp.float32)
                   for sl, h1 in zip(sls, h1s))
    db2_part = jnp.sum(do_ref[:].astype(jnp.float32), axis=0)
    dw1_part = sum(jax.lax.dot_general(xn, dh1, _AT_B,
                                       preferred_element_type=jnp.float32)
                   for xn, dh1 in zip(xns, dh1s))
    db1_part = sum(jnp.sum(dh1.astype(jnp.float32), axis=0)
                   for dh1 in dh1s)
    dxns = [jax.lax.dot_general(dh1, w1_ref[:], _AB_T,
                                preferred_element_type=jnp.float32)
            for dh1 in dh1s]
    # stage 6: LN backward + dx writes (VPU)
    dg_part = jnp.zeros_like(g32)
    dbe_part = jnp.zeros_like(g32)
    for sl, dxn, xhat, rstd in zip(sls, dxns, xhats, rstds):
        dyg = dxn * g32
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
        dxln = rstd * (dyg - m1 - xhat * m2)
        if residual:
            dx_ref[sl, :] = do_ref[sl, :] + dxln.astype(dx_ref.dtype)
        else:
            dx_ref[sl, :] = dxln.astype(dx_ref.dtype)
        dg_part = dg_part + jnp.sum(dxn * xhat, axis=0)
        dbe_part = dbe_part + jnp.sum(dxn, axis=0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg_part
        dbe_ref[:] = dbe_part
        dw1_ref[:] = dw1_part
        db1_ref[:] = db1_part
        dw2_ref[:] = dw2_part
        db2_ref[:] = db2_part

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_part
        dbe_ref[:] = dbe_ref[:] + dbe_part
        dw1_ref[:] = dw1_ref[:] + dw1_part
        db1_ref[:] = db1_ref[:] + db1_part
        dw2_ref[:] = dw2_ref[:] + dw2_part
        db2_ref[:] = db2_ref[:] + db2_part


def _ln_mlp_rows(n: int, int8: bool = False) -> int:
    r = min(_mlp_block_rows(n, int8), _round_up(n, 16))
    # callers pass the padded n; halve until divisible for configs whose
    # pad granularity differs from this path's block (mixed int8/bf16)
    while r > 16 and n % r:
        r //= 2
    return r


_MLP_BWD_CHUNKS = int(_os.environ.get("VITAX_MLP_BWD_CHUNKS", 2))


def _bwd_chunks(rows: int) -> int:
    c = _MLP_BWD_CHUNKS
    while c > 1 and (rows % c or (rows // c) % 16):
        c //= 2
    return max(c, 1)


def _ln_mlp_pad(n: int, int8: bool = False) -> int:
    """Padded row count: multiple of the bwd row block, and of the staged
    fwd block (rows x chunks) whenever n is big enough to stage.

    The adaptive block is computed from the RAW n; every padded count it
    produces stays divisible by the block `_ln_mlp_rows` later derives
    from the padded n (the 256-granular pads below the 32768 crossover
    top out at exactly 32768, which is 1024-aligned)."""
    block = _mlp_block_rows(n, int8)
    if n < 2 * block:
        return _round_up(n, 16) if n < block else _round_up(n, block)
    npad = _round_up(n, block)
    if npad % (block * _MLP_FWD_CHUNKS):
        npad += block
    return npad


def _ln_mlp_fwd_geometry(npad: int, int8: bool = False):
    """(block_rows, chunks) for the staged forward, given padded n.

    int8: the block equals the bwd block (1024 for large N) and is SPLIT
    into chunks, instead of multiplying it up — a 1024-row block staged as
    2×512 measured ~8% faster per layer than a 2048-row block staged as
    2×1024 (round-3 dissect harness; finer grid steps pipeline the
    HBM↔VMEM DMA better while 512-row matmuls still fill the MXU)."""
    rows = _ln_mlp_rows(npad, int8)
    if int8 and npad % rows == 0:
        c = _MLP_FWD_CHUNKS
        while c > 1 and (rows % c or (rows // c) % 16):
            c //= 2
        return rows, max(c, 1)
    full = rows * _MLP_FWD_CHUNKS
    if npad % full == 0:
        return full, _MLP_FWD_CHUNKS
    return rows, 1


def _ln_mlp_fwd_call(x2, gamma, beta, w1, b1, w2, b2, eps, residual):
    n, d = x2.shape
    m = w1.shape[1]
    rows, chunks = _ln_mlp_fwd_geometry(n)
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_fwd_kernel, eps=eps, chunks=chunks,
                          residual=residual),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d),
                  pl.BlockSpec((d, m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(m),
                  pl.BlockSpec((m, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d)],
        out_specs=row_blk,
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * m, transcendentals=n * m,
            bytes_accessed=2 * n * d * x2.dtype.itemsize + 4 * d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta, w1, b1, w2, b2)


def _ln_mlp_bwd_call(x2, gamma, beta, w1, b1, w2, do2, eps, residual):
    n, d = x2.shape
    m = w1.shape[1]
    rows = _ln_mlp_rows(n)
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_bwd_kernel, eps=eps, residual=residual,
                          chunks=_bwd_chunks(rows)),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d), mat(d, m), vec(m), mat(m, d),
                  row_blk],
        out_specs=(row_blk, vec(d), vec(d), mat(d, m), vec(m), mat(m, d),
                   vec(d)),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d, m), jnp.float32),
                   jax.ShapeDtypeStruct((m,), jnp.float32),
                   jax.ShapeDtypeStruct((m, d), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * d * m, transcendentals=2 * n * m,
            bytes_accessed=3 * n * d * x2.dtype.itemsize + 16 * d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta, w1, b1, w2, do2)


# -- chunked-dW backward: d > 1024 (h14) -------------------------------------
#
# The monolithic backward keeps fp32 dW1/dW2 accumulator blocks resident in
# VMEM — at d=1280/m=5120 that alone is ~52 MB and the kernel exceeds the
# 128 MiB physical VMEM (round-3 captured error). This variant runs a 2D
# grid (row-block i OUTER, hidden-chunk j INNER): per (i, j) it recomputes
# LN+fc1 for chunk j, emits dW1[:, jc]/dW2[jc, :]/db1[jc] as per-(i,j) bf16
# PARTIALS straight to HBM (XLA reduces them in fp32), and accumulates dxn
# over consecutive j in ONE fp32 VMEM scratch; at j==last the LN backward
# runs. dx and the LN grads stay fp32-exact; dW precision drops to
# bf16-partials-summed-fp32 (≤1 bf16 ulp, h14_dw_probe). Mosaic notes:
# 1-D lane-offset input blocks ((mc,) idx (j,)) are rejected on this
# jaxlib — b1 is restaged as (n_j, 8, mc); db1 partials carry their sum in
# row 0 of an (8, mc) block for the same 8-sublane tiling rule.

_MLP_MONO_MAX_D = 1024      # largest d the monolithic bwd fits in VMEM


def _ln_mlp_bwd_chunked_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                               do_ref, dx_ref, dg_ref, dbe_ref, dw1_ref,
                               db1_ref, dw2_ref, db2_ref, dxn_scr, *,
                               eps, residual, n_chunks):
    i = pl.program_id(0)
    j = pl.program_id(1)
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)

    x32 = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    xn = (xhat * g32 + be32).astype(x_ref.dtype)

    a1 = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) \
        + b1_ref[0, 0].astype(jnp.float32)
    dh1f = jax.lax.dot_general(do_ref[:], w2_ref[:], _AB_T,
                               preferred_element_type=jnp.float32)
    h1 = _gelu_exact(a1).astype(x_ref.dtype)
    gp = _gelu_grad(a1)
    dh1 = (dh1f * gp).astype(x_ref.dtype)

    dw1_ref[0] = jax.lax.dot_general(
        xn, dh1, _AT_B,
        preferred_element_type=jnp.float32).astype(dw1_ref.dtype)
    dw2_ref[0] = jax.lax.dot_general(
        h1, do_ref[:], _AT_B,
        preferred_element_type=jnp.float32).astype(dw2_ref.dtype)
    db1_ref[0] = jnp.pad(
        jnp.sum(dh1.astype(jnp.float32), axis=0)[None, :], ((0, 7), (0, 0)))

    contrib = jax.lax.dot_general(dh1, w1_ref[:], _AB_T,
                                  preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dxn_scr[:] = contrib

    @pl.when(j > 0)
    def _():
        dxn_scr[:] += contrib

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    @pl.when(j == 0)
    def _():
        db2_ref[:] += jnp.sum(do_ref[:].astype(jnp.float32), axis=0)

    @pl.when(j == n_chunks - 1)
    def _():
        dxn = dxn_scr[:]
        dyg = dxn * g32
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
        dxln = rstd * (dyg - m1 - xhat * m2)
        if residual:
            dx_ref[:] = do_ref[:] + dxln.astype(dx_ref.dtype)
        else:
            dx_ref[:] = dxln.astype(dx_ref.dtype)
        dg_ref[:] += jnp.sum(dxn * xhat, axis=0)
        dbe_ref[:] += jnp.sum(dxn, axis=0)


def _ln_mlp_bwd_chunked_call(x2, gamma, beta, w1, b1, w2, do2, eps,
                             residual):
    n, d = x2.shape
    m = w1.shape[1]
    rows = min(512, n)
    while n % rows:
        rows //= 2
    mc = _mc_for(m)
    n_i, n_j = n // rows, m // mc
    vec = lambda k: pl.BlockSpec((k,), lambda i, j: (0,),
                                 memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    dx, dg, dbe, dw1p, db1p, dw2p, db2 = pl.pallas_call(
        functools.partial(_ln_mlp_bwd_chunked_kernel, eps=eps,
                          residual=residual, n_chunks=n_j),
        grid=(n_i, n_j),
        in_specs=[row_blk, vec(d), vec(d),
                  pl.BlockSpec((d, mc), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, mc), lambda i, j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((mc, d), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM),
                  row_blk],
        out_specs=(row_blk, vec(d), vec(d),
                   pl.BlockSpec((1, d, mc), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, mc), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, mc, d), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM),
                   vec(d)),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((n_i, d, m), jnp.bfloat16),
                   jax.ShapeDtypeStruct((n_i, 8, m), jnp.float32),
                   jax.ShapeDtypeStruct((n_i, m, d), jnp.bfloat16),
                   jax.ShapeDtypeStruct((d,), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((rows, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=12 * n * d * m, transcendentals=2 * n * m,
            bytes_accessed=3 * n * d * x2.dtype.itemsize
            + 2 * n_i * d * m * 2 + 4 * d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta, w1,
      jnp.pad(b1.reshape(n_j, 1, mc), ((0, 0), (0, 7), (0, 0))), w2, do2)
    dw1 = jnp.sum(dw1p.astype(jnp.float32), axis=0)
    db1 = jnp.sum(db1p[:, 0, :], axis=0)
    dw2 = jnp.sum(dw2p.astype(jnp.float32), axis=0)
    return dx, dg, dbe, dw1, db1, dw2, db2


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _ln_mlp_2d(x2, gamma, beta, w1, b1, w2, b2, eps, residual):
    return _ln_mlp_fwd_call(x2, gamma, beta, w1, b1, w2, b2, eps, residual)


def _ln_mlp_2d_fwd(x2, gamma, beta, w1, b1, w2, b2, eps, residual):
    out = _ln_mlp_fwd_call(x2, gamma, beta, w1, b1, w2, b2, eps, residual)
    return out, (x2, gamma, beta, w1, b1, w2)


def _ln_mlp_2d_bwd(eps, residual, res, do2):
    x2, gamma, beta, w1, b1, w2 = res
    bwd = (_ln_mlp_bwd_chunked_call if x2.shape[1] > _MLP_MONO_MAX_D
           else _ln_mlp_bwd_call)
    dx, dg, dbe, dw1, db1, dw2, db2 = bwd(
        x2, gamma, beta, w1, b1, w2, do2, eps, residual)
    return (dx, dg.astype(gamma.dtype), dbe.astype(beta.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2)


_ln_mlp_2d.defvjp(_ln_mlp_2d_fwd, _ln_mlp_2d_bwd)


# -- save-acts variant: persist h1/g' in the fwd, pure-matmul bwd ------------

def _ln_mlp_fwd_save_call(x2, gamma, beta, w1, b1, w2, b2, eps, residual):
    n, d = x2.shape
    m = w1.shape[1]
    rows, chunks = _ln_mlp_fwd_geometry(n)
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    mid_blk = pl.BlockSpec((rows, m), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_fwd_save_kernel, eps=eps, chunks=chunks,
                          residual=residual),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d),
                  pl.BlockSpec((d, m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(m),
                  pl.BlockSpec((m, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d)],
        out_specs=(row_blk, mid_blk, mid_blk),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((n, m), x2.dtype),
                   jax.ShapeDtypeStruct((n, m), x2.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * m, transcendentals=2 * n * m,
            bytes_accessed=2 * n * d * x2.dtype.itemsize
            + 2 * n * m * x2.dtype.itemsize + 4 * d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta, w1, b1, w2, b2)


def _ln_mlp_bwd_fast_call(x2, gamma, beta, w1, w2, h1, gp, do2, eps,
                          residual):
    n, d = x2.shape
    m = w1.shape[1]
    rows = _ln_mlp_rows(n)
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    mid_blk = pl.BlockSpec((rows, m), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_bwd_fast_kernel, eps=eps,
                          residual=residual),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d), mat(d, m), mat(m, d),
                  mid_blk, mid_blk, row_blk],
        out_specs=(row_blk, vec(d), vec(d), mat(d, m), vec(m), mat(m, d),
                   vec(d)),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d, m), jnp.float32),
                   jax.ShapeDtypeStruct((m,), jnp.float32),
                   jax.ShapeDtypeStruct((m, d), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * d * m, transcendentals=0,
            bytes_accessed=(3 * n * d + 2 * n * m) * x2.dtype.itemsize
            + 16 * d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta, w1, w2, h1, gp, do2)


# -- int8 forward variant: W8A8 matmuls, bf16-recompute backward -------------

def _ln_mlp_fwd_int8_call(x2, gamma, beta, w1, b1, w2, b2, eps, residual):
    n, d = x2.shape
    m = w1.shape[1]
    w1q, s1 = _quant_cols_host(w1)
    w2q, s2 = _quant_cols_host(w2)
    rows, chunks = _ln_mlp_fwd_geometry(n, int8=True)
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_fwd_int8_kernel, eps=eps, chunks=chunks,
                          residual=residual),
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
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * m, transcendentals=n * m,
            bytes_accessed=2 * n * d * x2.dtype.itemsize + 2 * d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta, w1q, s1, b1, w2q, s2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _ln_mlp_2d_int8(x2, gamma, beta, w1, b1, w2, b2, eps, residual):
    return _ln_mlp_fwd_int8_call(x2, gamma, beta, w1, b1, w2, b2, eps,
                                 residual)


def _ln_mlp_2d_int8_fwd(x2, gamma, beta, w1, b1, w2, b2, eps, residual):
    out = _ln_mlp_fwd_int8_call(x2, gamma, beta, w1, b1, w2, b2, eps,
                                residual)
    return out, (x2, gamma, beta, w1, b1, w2)


def _ln_mlp_2d_int8_bwd(eps, residual, res, do2):
    # gradients of the bf16 function — standard W8A8 practice: the int8
    # forward is a close approximation, grads recompute at full precision
    x2, gamma, beta, w1, b1, w2 = res
    bwd = (_ln_mlp_bwd_chunked_call if x2.shape[1] > _MLP_MONO_MAX_D
           else _ln_mlp_bwd_call)
    dx, dg, dbe, dw1, db1, dw2, db2 = bwd(
        x2, gamma, beta, w1, b1, w2, do2, eps, residual)
    return (dx, dg.astype(gamma.dtype), dbe.astype(beta.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2)


_ln_mlp_2d_int8.defvjp(_ln_mlp_2d_int8_fwd, _ln_mlp_2d_int8_bwd)


def _ln_mlp_bwd_int8_call(x2, gamma, beta, w1, b1, w2, do2, eps, residual,
                          int8_dw=False):
    n, d = x2.shape
    m = w1.shape[1]
    w1q, s1r = _quant_rows_host(w1)   # contracted over M in dxn
    w2q, s2r = _quant_rows_host(w2)   # contracted over D in dh1
    w1c, s1c = _quant_cols_host(w1)   # fc1 recompute (over D)
    rows = _ln_mlp_rows(n, int8=True)
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_bwd_int8_kernel, eps=eps,
                          residual=residual, chunks=_bwd_chunks(rows),
                          int8_dw=int8_dw),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d), vec(m),
                  mat(d, m), vec(d), mat(m, d), vec(m),
                  mat(d, m), vec(m), row_blk],
        out_specs=(row_blk, vec(d), vec(d), mat(d, m), vec(m), mat(m, d),
                   vec(d)),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d, m), jnp.float32),
                   jax.ShapeDtypeStruct((m,), jnp.float32),
                   jax.ShapeDtypeStruct((m, d), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * d * m, transcendentals=2 * n * m,
            bytes_accessed=3 * n * d * x2.dtype.itemsize + 10 * d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta, b1, w1q, s1r, w2q, s2r, w1c, s1c, do2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _ln_mlp_2d_int8g(x2, gamma, beta, w1, b1, w2, b2, eps, residual,
                     int8_dw=False):
    return _ln_mlp_fwd_int8_call(x2, gamma, beta, w1, b1, w2, b2, eps,
                                 residual)


def _ln_mlp_2d_int8g_fwd(x2, gamma, beta, w1, b1, w2, b2, eps, residual,
                         int8_dw=False):
    out = _ln_mlp_fwd_int8_call(x2, gamma, beta, w1, b1, w2, b2, eps,
                                residual)
    return out, (x2, gamma, beta, w1, b1, w2)


def _ln_mlp_2d_int8g_bwd(eps, residual, int8_dw, res, do2):
    x2, gamma, beta, w1, b1, w2 = res
    dx, dg, dbe, dw1, db1, dw2, db2 = _ln_mlp_bwd_int8_call(
        x2, gamma, beta, w1, b1, w2, do2, eps, residual, int8_dw)
    return (dx, dg.astype(gamma.dtype), dbe.astype(beta.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2)


_ln_mlp_2d_int8g.defvjp(_ln_mlp_2d_int8g_fwd, _ln_mlp_2d_int8g_bwd)


def _ln_mlp_fwd_int4_call(x2, gamma, beta, w1, b1, w2, b2, eps, residual):
    n, d = x2.shape
    m = w1.shape[1]
    w1q, s1 = _quant_cols_host4(w1)
    w2q, s2 = _quant_cols_host4(w2)
    rows, chunks = _ln_mlp_fwd_geometry(n, int8=True)
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_fwd_int4_kernel, eps=eps, chunks=chunks,
                          residual=residual),
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
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * m, transcendentals=n * m,
            bytes_accessed=2 * n * d * x2.dtype.itemsize + d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta, w1q, s1, b1, w2q, s2, b2)


def _ln_mlp_bwd_int4_call(x2, gamma, beta, w1, b1, w2, do2, eps, residual,
                          int8_dw=False):
    n, d = x2.shape
    m = w1.shape[1]
    w1q, s1r = _quant_rows_host4(w1)   # contracted over M in dxn
    w2q, s2r = _quant_rows_host4(w2)   # contracted over D in dh1
    w1c, s1c = _quant_cols_host4(w1)   # fc1 recompute (over D)
    rows = _ln_mlp_rows(n, int8=True)
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_bwd_int4_kernel, eps=eps,
                          residual=residual, chunks=_bwd_chunks(rows),
                          int8_dw=int8_dw),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d), vec(m),
                  mat(d, m), vec(d), mat(m, d), vec(m),
                  mat(d, m), vec(m), row_blk],
        out_specs=(row_blk, vec(d), vec(d), mat(d, m), vec(m), mat(m, d),
                   vec(d)),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d, m), jnp.float32),
                   jax.ShapeDtypeStruct((m,), jnp.float32),
                   jax.ShapeDtypeStruct((m, d), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * d * m, transcendentals=2 * n * m,
            bytes_accessed=3 * n * d * x2.dtype.itemsize + 10 * d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta, b1, w1q, s1r, w2q, s2r, w1c, s1c, do2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _ln_mlp_2d_int4(x2, gamma, beta, w1, b1, w2, b2, eps, residual,
                    int8_grad=False, int8_dw=False, int4_grad=False):
    return _ln_mlp_fwd_int4_call(x2, gamma, beta, w1, b1, w2, b2, eps,
                                 residual)


def _ln_mlp_2d_int4_fwd(x2, gamma, beta, w1, b1, w2, b2, eps, residual,
                        int8_grad=False, int8_dw=False, int4_grad=False):
    out = _ln_mlp_fwd_int4_call(x2, gamma, beta, w1, b1, w2, b2, eps,
                                residual)
    return out, (x2, gamma, beta, w1, b1, w2)


def _ln_mlp_2d_int4_bwd(eps, residual, int8_grad, int8_dw, int4_grad, res,
                        do2):
    # Default: gradients stay >=8-bit — the int4 forward is treated as a
    # noisy approximation of the bf16 function (same STE stance as the int8
    # tier); 4-bit gradients are where quantized training actually
    # diverges. int4_grad=True opts the dx-path matmuls into A4W4 too
    # (dW stays >=8-bit even there).
    x2, gamma, beta, w1, b1, w2 = res
    if int4_grad:
        dx, dg, dbe, dw1, db1, dw2, db2 = _ln_mlp_bwd_int4_call(
            x2, gamma, beta, w1, b1, w2, do2, eps, residual, int8_dw)
    elif int8_grad:
        dx, dg, dbe, dw1, db1, dw2, db2 = _ln_mlp_bwd_int8_call(
            x2, gamma, beta, w1, b1, w2, do2, eps, residual, int8_dw)
    else:
        dx, dg, dbe, dw1, db1, dw2, db2 = _ln_mlp_bwd_call(
            x2, gamma, beta, w1, b1, w2, do2, eps, residual)
    return (dx, dg.astype(gamma.dtype), dbe.astype(beta.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2)


_ln_mlp_2d_int4.defvjp(_ln_mlp_2d_int4_fwd, _ln_mlp_2d_int4_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _ln_mlp_2d_save(x2, gamma, beta, w1, b1, w2, b2, eps, residual):
    out, _, _ = _ln_mlp_fwd_save_call(x2, gamma, beta, w1, b1, w2, b2, eps,
                                      residual)
    return out


def _ln_mlp_2d_save_fwd(x2, gamma, beta, w1, b1, w2, b2, eps, residual):
    out, h1, gp = _ln_mlp_fwd_save_call(x2, gamma, beta, w1, b1, w2, b2,
                                        eps, residual)
    # named so a selective-remat policy can KEEP these (see models/vit._wrap:
    # save_only_these_names("attn_out","mlp_h1","mlp_gp")) — then the remat
    # backward DCEs this forward kernel instead of re-running it
    from jax.ad_checkpoint import checkpoint_name
    h1 = checkpoint_name(h1, "mlp_h1")
    gp = checkpoint_name(gp, "mlp_gp")
    return out, (x2, gamma, beta, w1, b1, w2, h1, gp)


def _ln_mlp_2d_save_bwd(eps, residual, res, do2):
    x2, gamma, beta, w1, b1, w2, h1, gp = res
    dx, dg, dbe, dw1, db1, dw2, db2 = _ln_mlp_bwd_fast_call(
        x2, gamma, beta, w1, w2, h1, gp, do2, eps, residual)
    return (dx, dg.astype(gamma.dtype), dbe.astype(beta.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2)


_ln_mlp_2d_save.defvjp(_ln_mlp_2d_save_fwd, _ln_mlp_2d_save_bwd)


# -- int8 save-acts: persist h1q/sh/g'q in the int8 fwd, pure-int8-matmul bwd

def _ln_mlp_fwd_int8_save_call(x2, gamma, beta, w1, b1, w2, b2, eps,
                               residual):
    n, d = x2.shape
    m = w1.shape[1]
    w1q, s1 = _quant_cols_host(w1)
    w2q, s2 = _quant_cols_host(w2)
    rows, chunks = _ln_mlp_fwd_geometry(n, int8=True)
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    mid_blk = pl.BlockSpec((rows, m), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    sh_blk = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_fwd_int8_save_kernel, eps=eps,
                          chunks=chunks, residual=residual),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d),
                  pl.BlockSpec((d, m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(m), vec(m),
                  pl.BlockSpec((m, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d)],
        out_specs=(row_blk, mid_blk, sh_blk, mid_blk),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((n, m), jnp.int8),
                   jax.ShapeDtypeStruct((n, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n, m), jnp.int8)),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * m, transcendentals=2 * n * m,
            bytes_accessed=2 * n * d * x2.dtype.itemsize + 2 * n * m
            + 2 * d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta, w1q, s1, b1, w2q, s2, b2)


def _ln_mlp_bwd_int8_save_call(x2, gamma, beta, w1, w2, h1q, sh, gpq, do2,
                               eps, residual, int8_dw=False):
    n, d = x2.shape
    m = w1.shape[1]
    w1q, s1r = _quant_rows_host(w1)   # contracted over M in dxn
    w2q, s2r = _quant_rows_host(w2)   # contracted over D in dh1
    rows = _ln_mlp_rows(n, int8=True)
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    mid_blk = pl.BlockSpec((rows, m), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    sh_blk = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_bwd_int8_save_kernel, eps=eps,
                          residual=residual, chunks=_bwd_chunks(rows),
                          int8_dw=int8_dw),
        grid=(n // rows,),
        in_specs=[row_blk, vec(d), vec(d),
                  mat(d, m), vec(d), mat(m, d), vec(m),
                  mid_blk, sh_blk, mid_blk, row_blk],
        out_specs=(row_blk, vec(d), vec(d), mat(d, m), vec(m), mat(m, d),
                   vec(d)),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d, m), jnp.float32),
                   jax.ShapeDtypeStruct((m,), jnp.float32),
                   jax.ShapeDtypeStruct((m, d), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * d * m, transcendentals=0,
            bytes_accessed=3 * n * d * x2.dtype.itemsize + 2 * n * m
            + 10 * d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, gamma, beta, w1q, s1r, w2q, s2r, h1q, sh, gpq, do2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _ln_mlp_2d_int8s(x2, gamma, beta, w1, b1, w2, b2, eps, residual,
                     int8_dw=False):
    out, _, _, _ = _ln_mlp_fwd_int8_save_call(x2, gamma, beta, w1, b1, w2,
                                              b2, eps, residual)
    return out


def _ln_mlp_2d_int8s_fwd(x2, gamma, beta, w1, b1, w2, b2, eps, residual,
                         int8_dw=False):
    out, h1q, sh, gpq = _ln_mlp_fwd_int8_save_call(x2, gamma, beta, w1, b1,
                                                   w2, b2, eps, residual)
    from jax.ad_checkpoint import checkpoint_name
    h1q = checkpoint_name(h1q, "mlp_h1")
    sh = checkpoint_name(sh, "mlp_sh")
    gpq = checkpoint_name(gpq, "mlp_gp")
    return out, (x2, gamma, beta, w1, b1, w2, h1q, sh, gpq)


def _ln_mlp_2d_int8s_bwd(eps, residual, int8_dw, res, do2):
    x2, gamma, beta, w1, b1, w2, h1q, sh, gpq = res
    dx, dg, dbe, dw1, db1, dw2, db2 = _ln_mlp_bwd_int8_save_call(
        x2, gamma, beta, w1, w2, h1q, sh, gpq, do2, eps, residual, int8_dw)
    return (dx, dg.astype(gamma.dtype), dbe.astype(beta.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2)


_ln_mlp_2d_int8s.defvjp(_ln_mlp_2d_int8s_fwd, _ln_mlp_2d_int8s_bwd)


def fused_ln_mlp(x, gamma, beta, w1, b1, w2, b2, eps, residual=True,
                 save_acts=False, int8=False, int8_grad=False,
                 int8_dw=False, int4=False, int4_grad=False):
    """out = x + fc2(GELU_exact(fc1(LN(x)))) for x [B,S,D] (or any leading
    shape); LN statistics and all grad accumulation fp32. Returns x.dtype.
    residual=False returns just fc2(GELU(fc1(LN(x)))) + b2 — for TP
    shard_map callers that psum per-shard partials and add x once.
    save_acts=True persists h1 and GELU'(a1) (x.dtype) in the forward so
    the backward is pure matmuls (8NDM, zero transcendentals) instead of
    recompute (10NDM + erf + exp) — trades 2x[N,M] HBM traffic for FLOPs.
    int4=True runs the FORWARD matmuls A4W4 (overrides int8 forward; the
    backward still follows int8_grad/int8_dw) — deepest, accuracy-riskiest
    tier, opt-in. int4_grad=True (requires int4) additionally runs the
    backward dx-path matmuls (fc1 recompute, dh1, dxn) A4W4; dW stays
    >=8-bit (int8 per-column when int8_dw, else bf16)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    if d > _MLP_MONO_MAX_D:
        # the int8/int4 BACKWARD tiers (and save-acts) carry monolithic
        # VMEM accumulators/buffers that do not fit above d=1024 — demote
        # to the deepest tier that does: the int8 FORWARD (its backward
        # routes through the chunked-dW kernel). An int4-only request
        # demotes to int8 forward too, not to plain bf16.
        int8 = int8 or int4
        int8_grad = int8_dw = int4 = int4_grad = save_acts = False
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    npad = _ln_mlp_pad(n, int8=int4 or (int8 and int8_grad))
    if npad != n:
        x2 = jnp.pad(x2, ((0, npad - n), (0, 0)))
    if int4:
        out = _ln_mlp_2d_int4(x2, gamma, beta, w1, b1, w2, b2, eps,
                              residual, int8_grad, int8_dw, int4_grad)
    elif int8 and int8_grad and save_acts:
        out = _ln_mlp_2d_int8s(x2, gamma, beta, w1, b1, w2, b2, eps,
                               residual, int8_dw)
    elif int8 and int8_grad:
        out = _ln_mlp_2d_int8g(x2, gamma, beta, w1, b1, w2, b2, eps,
                               residual, int8_dw)
    else:
        fn = (_ln_mlp_2d_int8 if int8
              else _ln_mlp_2d_save if save_acts else _ln_mlp_2d)
        out = fn(x2, gamma, beta, w1, b1, w2, b2, eps, residual)
    if npad != n:
        out = out[:n]
    return out.reshape(*lead, d)


# =============================================================================
# Fused QKV-projection + attention core (round-2 item 1, first cut)
#
# The kernel-variant sweep (PERF.md) showed attention-only kernels lose to
# XLA because XLA fuses the attention gradients into the adjacent projection
# weight-grad matmuls. This kernel subsumes the QKV projection: forward takes
# the LN output x̂ and the merged [D, 3·H·Hd] weight, computes QKV with ONE
# well-shaped matmul and the per-head attention core entirely in VMEM;
# backward recomputes QKV/probs in VMEM, forms dQKV, and produces dx̂ AND the
# QKV weight/bias gradients by accumulating across the sequential grid
# (read-modify-write on the revisited output block, like the LN kernel's
# dγ/dβ). Residuals: just (x̂, W, b) — no q/k/v/probs ever touch HBM.
# =============================================================================

def qkv_attention_supported(xhat, wqkv, heads=None, kv_heads=None) -> bool:
    if xhat.ndim != 3 or wqkv.ndim != 2:
        return False
    b, s, d = xhat.shape
    if heads and kv_heads and kv_heads != heads:
        # GQA packed layout [q (h·hd) | k (hkv·hd) | v (hkv·hd)]
        if wqkv.shape[0] != d or wqkv.shape[1] % (heads + 2 * kv_heads):
            return False
        hhd = wqkv.shape[1] * heads // (heads + 2 * kv_heads)
    elif wqkv.shape[0] != d or wqkv.shape[1] % 3 != 0:
        return False
    else:
        hhd = wqkv.shape[1] // 3
    # d=1280 (h14) tripped the remote compile helper in round 2; l16
    # (d=1024) compiles and runs (+45% with int8, PERF.md). The env knob
    # lets h14 experiments re-open the gate without code edits.
    max_d = int(_os.environ.get("VITAX_QKVO_MAX_D", "1024"))
    if s > 1024 or d > max_d or hhd > max_d or d % 128:
        return False
    # VMEM estimate per grid step: wqkv bf16 + fp32 dW/dWo accumulators +
    # the staged per-(tile,head) fp32 probs (head_dim assumed >= 64)
    spq = (s + 7) // 8 * 8
    heads = max(hhd // 64, 1)
    tile = 2
    weights = 2 * d * 3 * hhd + 2 * hhd * d
    accum = 4 * d * 3 * hhd + 4 * hhd * d
    probs = tile * heads * spq * spq * 4
    qkv_act = tile * spq * 3 * hhd * 6  # bf16 qkv + fp32 pre-cast
    return weights + accum + probs + qkv_act <= 80 * 1024 * 1024


def _qkv_attn_fwd_kernel(x_ref, w_ref, b_ref, o_ref, *,
                         scale, seq_len, heads, head_dim):
    spq = x_ref.shape[1]
    x = x_ref[0]                                  # [SPQ, D]
    qkv = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(x.dtype)
    hhd = heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (spq, spq), 1)
    for h in range(heads):
        o = h * head_dim
        q = qkv[:, o:o + head_dim]
        k = qkv[:, hhd + o:hhd + o + head_dim]
        v = qkv[:, 2 * hhd + o:2 * hhd + o + head_dim]
        s = jax.lax.dot_general(q, k, _AB_T,
                                preferred_element_type=jnp.float32) * scale
        if seq_len < spq:
            s = jnp.where(col < seq_len, s, -1e30)
        p = _softmax_rows(s)
        o_ref[0, :, o:o + head_dim] = jnp.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _qkv_attn_bwd_kernel(x_ref, w_ref, b_ref, do_ref,
                         dx_ref, dw_ref, db_ref, *,
                         scale, seq_len, heads, head_dim):
    i = pl.program_id(0)
    spq = x_ref.shape[1]
    x = x_ref[0]
    qkv = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(x.dtype)
    hhd = heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (spq, spq), 1)

    dqkv_parts = []
    for h in range(heads):
        o = h * head_dim
        q = qkv[:, o:o + head_dim]
        k = qkv[:, hhd + o:hhd + o + head_dim]
        v = qkv[:, 2 * hhd + o:2 * hhd + o + head_dim]
        do = do_ref[0, :, o:o + head_dim]

        s = jax.lax.dot_general(q, k, _AB_T,
                                preferred_element_type=jnp.float32) * scale
        if seq_len < spq:
            s = jnp.where(col < seq_len, s, -1e30)
        p = _softmax_rows(s)
        # out_h = p @ v is needed for D = rowsum(do * out_h)
        out_h = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _AB_T,
                                 preferred_element_type=jnp.float32)
        d = jnp.sum(do.astype(jnp.float32) * out_h, axis=-1, keepdims=True)
        ds = (p * (dp - d)).astype(x.dtype)
        dq = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
              * scale).astype(x.dtype)
        dk = (jax.lax.dot_general(ds, q, _AT_B,
                                  preferred_element_type=jnp.float32)
              * scale).astype(x.dtype)
        dv = jax.lax.dot_general(p.astype(do.dtype), do, _AT_B,
                                 preferred_element_type=jnp.float32
                                 ).astype(x.dtype)
        dqkv_parts.append((dq, dk, dv))

    dqkv = jnp.concatenate(
        [d for d, _, _ in dqkv_parts]
        + [d for _, d, _ in dqkv_parts]
        + [d for _, _, d in dqkv_parts], axis=-1)   # [SPQ, 3·H·Hd]

    dx_ref[0] = jax.lax.dot_general(
        dqkv, w_ref[:], _AB_T,
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    dw_part = jax.lax.dot_general(x, dqkv, _AT_B,
                                  preferred_element_type=jnp.float32)
    db_part = jnp.sum(dqkv.astype(jnp.float32), axis=0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = dw_part
        db_ref[:] = db_part

    @pl.when(i > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw_part
        db_ref[:] = db_ref[:] + db_part


def _qkv_attn_fwd_call(xhat, wqkv, bqkv, scale, seq_len, heads, head_dim):
    b, spq, d = xhat.shape
    hhd = heads * head_dim
    return pl.pallas_call(
        functools.partial(_qkv_attn_fwd_kernel, scale=scale, seq_len=seq_len,
                          heads=heads, head_dim=head_dim),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * hhd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * hhd,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, spq, hhd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, spq, hhd), xhat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * spq * d * 3 * hhd + 4 * b * heads * spq * spq * head_dim,
            transcendentals=b * heads * spq * spq,
            bytes_accessed=2 * b * spq * (d + hhd)),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(xhat, wqkv, bqkv)


def _qkv_attn_bwd_call(xhat, wqkv, bqkv, do, scale, seq_len, heads, head_dim):
    b, spq, d = xhat.shape
    hhd = heads * head_dim
    return pl.pallas_call(
        functools.partial(_qkv_attn_bwd_kernel, scale=scale, seq_len=seq_len,
                          heads=heads, head_dim=head_dim),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * hhd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * hhd,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, spq, hhd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * hhd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * hhd,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, spq, d), xhat.dtype),
                   jax.ShapeDtypeStruct((d, 3 * hhd), jnp.float32),
                   jax.ShapeDtypeStruct((3 * hhd,), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * spq * d * 3 * hhd + 10 * b * heads * spq * spq * head_dim,
            transcendentals=b * heads * spq * spq,
            bytes_accessed=4 * b * spq * (d + hhd)),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(xhat, wqkv, bqkv, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_qkv_attention(xhat, wqkv, bqkv, seq_len, heads, head_dim):
    """x̂ [B,SPQ,D] (LN output, SPQ = seq padded to 8), merged QKV weight
    [D, 3·H·Hd] and bias [3·H·Hd] → per-head attention outputs concatenated
    [B,SPQ,H·Hd] (pre out-projection). Scale = head_dim^-0.5."""
    scale = 1.0 / math.sqrt(head_dim)
    return _qkv_attn_fwd_call(xhat, wqkv, bqkv, scale, seq_len, heads,
                              head_dim)


def _fused_qkv_attention_fwd(xhat, wqkv, bqkv, seq_len, heads, head_dim):
    out = fused_qkv_attention(xhat, wqkv, bqkv, seq_len, heads, head_dim)
    return out, (xhat, wqkv, bqkv)


def _fused_qkv_attention_bwd(seq_len, heads, head_dim, res, do):
    xhat, wqkv, bqkv = res
    scale = 1.0 / math.sqrt(head_dim)
    dx, dw, db = _qkv_attn_bwd_call(xhat, wqkv, bqkv, do, scale, seq_len,
                                    heads, head_dim)
    return dx, dw.astype(wqkv.dtype), db.astype(bqkv.dtype)


fused_qkv_attention.defvjp(_fused_qkv_attention_fwd, _fused_qkv_attention_bwd)


# --- variant: also subsume the output projection ---------------------------

def _qkvo_attn_fwd_kernel(x_ref, w_ref, b_ref, wo_ref, bo_ref, o_ref, *,
                          scale, seq_len, heads, head_dim, tile):
    """`tile` images per grid step: the QKV / out projections run as one
    [tile·SPQ, …] matmul (bigger M ⇒ better MXU fill; measured -13% kernel
    time at tile=2); the per-head softmax cores stay per-image."""
    spq = x_ref.shape[1]
    d = x_ref.shape[2]
    x = x_ref[:].reshape(tile * spq, d)
    qkv = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(x.dtype)
    hhd = heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (spq, spq), 1)
    outs = []
    for t in range(tile):
        sl = slice(t * spq, (t + 1) * spq)
        for h in range(heads):
            o = h * head_dim
            q = qkv[sl, o:o + head_dim]
            k = qkv[sl, hhd + o:hhd + o + head_dim]
            v = qkv[sl, 2 * hhd + o:2 * hhd + o + head_dim]
            s = jax.lax.dot_general(q, k, _AB_T,
                                    preferred_element_type=jnp.float32) * scale
            if seq_len < spq:
                s = jnp.where(col < seq_len, s, -1e30)
            p = _softmax_rows(s)
            outs.append(jnp.dot(p.astype(v.dtype), v,
                                preferred_element_type=jnp.float32
                                ).astype(x.dtype))
    attn = jnp.concatenate(
        [jnp.concatenate(outs[t * heads:(t + 1) * heads], axis=-1)
         for t in range(tile)], axis=0)            # [tile·SPQ, H·Hd]
    y = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
    y = (y + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[:] = y.reshape(tile, spq, d)


def _qkvo_attn_bwd_kernel(x_ref, w_ref, b_ref, wo_ref, do_ref,
                          dx_ref, dw_ref, db_ref, dwo_ref, dbo_ref, *,
                          scale, seq_len, heads, head_dim, tile):
    i = pl.program_id(0)
    spq = x_ref.shape[1]
    d_model = x_ref.shape[2]
    x = x_ref[:].reshape(tile * spq, d_model)
    do_y = do_ref[:].reshape(tile * spq, d_model)  # grad wrt projected output
    qkv = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(x.dtype)
    hhd = heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (spq, spq), 1)

    # recompute per-head attention outputs and probs
    ps, outs = [], []
    for t in range(tile):
        sl = slice(t * spq, (t + 1) * spq)
        for h in range(heads):
            o = h * head_dim
            q = qkv[sl, o:o + head_dim]
            k = qkv[sl, hhd + o:hhd + o + head_dim]
            v = qkv[sl, 2 * hhd + o:2 * hhd + o + head_dim]
            s = jax.lax.dot_general(q, k, _AB_T,
                                    preferred_element_type=jnp.float32) * scale
            if seq_len < spq:
                s = jnp.where(col < seq_len, s, -1e30)
            p = _softmax_rows(s)
            ps.append(p)
            outs.append(jnp.dot(p.astype(v.dtype), v,
                                preferred_element_type=jnp.float32
                                ).astype(x.dtype))
    attn = jnp.concatenate(
        [jnp.concatenate(outs[t * heads:(t + 1) * heads], axis=-1)
         for t in range(tile)], axis=0)            # [tile·SPQ, H·Hd]

    # out-projection grads
    dattn = jax.lax.dot_general(do_y, wo_ref[:], _AB_T,
                                preferred_element_type=jnp.float32
                                ).astype(x.dtype)  # [tile·SPQ, H·Hd]
    dwo_part = jax.lax.dot_general(attn, do_y, _AT_B,
                                   preferred_element_type=jnp.float32)
    dbo_part = jnp.sum(do_y.astype(jnp.float32), axis=0)

    # per-head attention grads from dattn slices
    dqkv_cols = {"q": [], "k": [], "v": []}
    for t in range(tile):
        sl = slice(t * spq, (t + 1) * spq)
        row = {"q": [], "k": [], "v": []}
        for h in range(heads):
            o = h * head_dim
            q = qkv[sl, o:o + head_dim]
            k = qkv[sl, hhd + o:hhd + o + head_dim]
            v = qkv[sl, 2 * hhd + o:2 * hhd + o + head_dim]
            do = dattn[sl, o:o + head_dim]
            p = ps[t * heads + h]
            out_h = outs[t * heads + h].astype(jnp.float32)
            dp = jax.lax.dot_general(do, v, _AB_T,
                                     preferred_element_type=jnp.float32)
            dd = jnp.sum(do.astype(jnp.float32) * out_h, axis=-1,
                         keepdims=True)
            ds = (p * (dp - dd)).astype(x.dtype)
            row["q"].append((jnp.dot(ds, k,
                                     preferred_element_type=jnp.float32)
                             * scale).astype(x.dtype))
            row["k"].append((jax.lax.dot_general(
                ds, q, _AT_B, preferred_element_type=jnp.float32)
                * scale).astype(x.dtype))
            row["v"].append(jax.lax.dot_general(
                p.astype(do.dtype), do, _AT_B,
                preferred_element_type=jnp.float32).astype(x.dtype))
        for key in ("q", "k", "v"):
            dqkv_cols[key].append(jnp.concatenate(row[key], axis=-1))

    dqkv = jnp.concatenate(
        [jnp.concatenate([dqkv_cols["q"][t], dqkv_cols["k"][t],
                          dqkv_cols["v"][t]], axis=-1)
         for t in range(tile)], axis=0)            # [tile·SPQ, 3·H·Hd]

    dx = jax.lax.dot_general(dqkv, w_ref[:], _AB_T,
                             preferred_element_type=jnp.float32)
    dx_ref[:] = dx.reshape(tile, spq, d_model).astype(dx_ref.dtype)
    dw_part = jax.lax.dot_general(x, dqkv, _AT_B,
                                  preferred_element_type=jnp.float32)
    db_part = jnp.sum(dqkv.astype(jnp.float32), axis=0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = dw_part
        db_ref[:] = db_part
        dwo_ref[:] = dwo_part
        dbo_ref[:] = dbo_part

    @pl.when(i > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw_part
        db_ref[:] = db_ref[:] + db_part
        dwo_ref[:] = dwo_ref[:] + dwo_part
        dbo_ref[:] = dbo_ref[:] + dbo_part


_QKVO_FWD_TILE = int(_os.environ.get("VITAX_QKVO_FWD_TILE", 2))


def _qkvo_tile(b: int, spq: int = 256) -> int:
    """Forward tile: images per grid step (bigger projection matmuls,
    measured -13% kernel time at 2 vs 1). Short sequences (token-drop
    training: spq ~104 at keep 0.5) measured best at tile 4 — the
    per-image score matrices shrink ~4x, so doubling the tile restores
    the projection-matmul row count (fwd4+bwd4: 2672 vs 2552 img/s at
    the b768 drop phase, round 4). Env knobs override."""
    t = _QKVO_FWD_TILE
    if "VITAX_QKVO_FWD_TILE" not in _os.environ and spq <= 128:
        t = 4
    while t > 1 and b % t:
        t //= 2
    return max(t, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_qkvo_attention(xhat, wqkv, bqkv, wo, bo, seq_len, heads, head_dim):
    """Like `fused_qkv_attention` but also subsumes the output projection:
    x̂ → LN'd input, returns the PROJECTED attention output [B,SPQ,D].
    Backward additionally accumulates dWo/dbo in VMEM."""
    scale = 1.0 / math.sqrt(head_dim)
    b, spq, d = xhat.shape
    hhd = heads * head_dim
    tile = _qkvo_tile(b, spq)
    return pl.pallas_call(
        functools.partial(_qkvo_attn_fwd_kernel, scale=scale,
                          seq_len=seq_len, heads=heads, head_dim=head_dim,
                          tile=tile),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * hhd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * hhd,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hhd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, spq, d), xhat.dtype),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(xhat, wqkv, bqkv, wo, bo)


def _fused_qkvo_fwd(xhat, wqkv, bqkv, wo, bo, seq_len, heads, head_dim):
    out = fused_qkvo_attention(xhat, wqkv, bqkv, wo, bo, seq_len, heads,
                               head_dim)
    return out, (xhat, wqkv, bqkv, wo)


def _fused_qkvo_bwd(seq_len, heads, head_dim, res, do):
    xhat, wqkv, bqkv, wo = res
    scale = 1.0 / math.sqrt(head_dim)
    b, spq, d = xhat.shape
    hhd = heads * head_dim
    tile = 1  # bwd working set at tile=2 exceeds VMEM (see _qkvo_tile)
    dx, dw, db, dwo, dbo = pl.pallas_call(
        functools.partial(_qkvo_attn_bwd_kernel, scale=scale,
                          seq_len=seq_len, heads=heads, head_dim=head_dim,
                          tile=tile),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * hhd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * hhd,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hhd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * hhd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * hhd,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hhd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, spq, d), xhat.dtype),
                   jax.ShapeDtypeStruct((d, 3 * hhd), jnp.float32),
                   jax.ShapeDtypeStruct((3 * hhd,), jnp.float32),
                   jax.ShapeDtypeStruct((hhd, d), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32)),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(xhat, wqkv, bqkv, wo, do)
    return (dx, dw.astype(wqkv.dtype), db.astype(bqkv.dtype),
            dwo.astype(wo.dtype), dbo)


fused_qkvo_attention.defvjp(_fused_qkvo_fwd, _fused_qkvo_bwd)


# --- variant: also subsume the pre-attention LayerNorm ----------------------
#
# Removes the x̂ HBM materialization between LN and the kernel (~29 MB × 12
# layers per pass at batch 96) and folds the LN backward into the same
# kernel; dγ/dβ accumulate across the grid like the projection grads.
# Padded rows are zero-filled by the wrapper, so LN of a pad row is finite
# (mean 0, var 0) and its zero cotangent kills every gradient contribution.

def _ln_qkvo_fwd_kernel(x_ref, g_ref, be_ref, w_ref, b_ref, wo_ref, bo_ref,
                        o_ref, *, eps, scale, seq_len, heads, head_dim, tile,
                        kv_heads=None):
    kv_heads = kv_heads or heads
    spq = x_ref.shape[1]
    d = x_ref.shape[2]
    x = x_ref[:].reshape(tile * spq, d).astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    xn = (xhat * g_ref[:].astype(jnp.float32)
          + be_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    qkv = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(xn.dtype)
    hhd = heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (spq, spq), 1)
    # STAGED body (PERF.md round-1 lesson): all score matmuls, then all
    # softmaxes, then all PV matmuls — the (tile·heads) chains are
    # independent, letting Mosaic overlap VPU softmaxes with MXU matmuls.
    ths = [(t, h) for t in range(tile) for h in range(heads)]
    ss = []
    for t, h in ths:
        sl = slice(t * spq, (t + 1) * spq)
        o = h * head_dim
        ko, _ = _kv_off(h, heads, kv_heads, head_dim)
        q = qkv[sl, o:o + head_dim]
        k = qkv[sl, ko:ko + head_dim]
        s = jax.lax.dot_general(q, k, _AB_T,
                                preferred_element_type=jnp.float32) * scale
        if seq_len < spq:
            s = jnp.where(col < seq_len, s, -1e30)
        ss.append(s)
    pss = [_softmax_rows(s) for s in ss]
    outs = []
    for (t, h), p in zip(ths, pss):
        sl = slice(t * spq, (t + 1) * spq)
        _, vo = _kv_off(h, heads, kv_heads, head_dim)
        v = qkv[sl, vo:vo + head_dim]
        outs.append(jnp.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32
                            ).astype(xn.dtype))
    attn = jnp.concatenate(
        [jnp.concatenate(outs[t * heads:(t + 1) * heads], axis=-1)
         for t in range(tile)], axis=0)
    y = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
    y = (y + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[:] = y.reshape(tile, spq, d)


def _ln_qkvo_fwd_int8_kernel(x_ref, g_ref, be_ref, w8_ref, sw_ref, b_ref,
                             wo8_ref, swo_ref, bo_ref, o_ref, *, eps, scale,
                             seq_len, heads, head_dim, tile, kv_heads=None):
    kv_heads = kv_heads or heads
    """int8 variant: the qkv and out projections run W8A8 on the int8 MXU
    (per-row activation / per-column weight dynamic quantization); the
    attention core (scores, softmax, PV) stays bf16/fp32."""
    spq = x_ref.shape[1]
    d = x_ref.shape[2]
    x = x_ref[:].reshape(tile * spq, d).astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    xn32 = xhat * g_ref[:].astype(jnp.float32) \
        + be_ref[:].astype(jnp.float32)
    xq, sx = _quant_rows(xn32)
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
        ko, _ = _kv_off(h, heads, kv_heads, head_dim)
        q = qkv[sl, o:o + head_dim]
        k = qkv[sl, ko:ko + head_dim]
        s = jax.lax.dot_general(q, k, _AB_T,
                                preferred_element_type=jnp.float32) * scale
        if seq_len < spq:
            s = jnp.where(col < seq_len, s, -1e30)
        ss.append(s)
    pss = [_softmax_rows(s) for s in ss]
    outs = []
    for (t, h), p in zip(ths, pss):
        sl = slice(t * spq, (t + 1) * spq)
        _, vo = _kv_off(h, heads, kv_heads, head_dim)
        v = qkv[sl, vo:vo + head_dim]
        outs.append(jnp.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32))
    attn = jnp.concatenate(
        [jnp.concatenate(outs[t * heads:(t + 1) * heads], axis=-1)
         for t in range(tile)], axis=0)
    aq, sa = _quant_rows(attn)
    y = jax.lax.dot_general(aq, wo8_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * sa * swo_ref[:]
    y = (y + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[:] = y.reshape(tile, spq, d)


def _ln_qkvo_fwd_int4_kernel(x_ref, g_ref, be_ref, w4_ref, sw_ref, b_ref,
                             wo4_ref, swo_ref, bo_ref, o_ref, *, eps, scale,
                             seq_len, heads, head_dim, tile, kv_heads=None):
    kv_heads = kv_heads or heads
    """A4W4 variant of the int8 projection kernel: the qkv and out
    projections run on the int4 MXU path (probe-measured 1.32x the int8
    rate in a gridded kernel, scripts/int4_probe.py); the attention core
    (scores, softmax, PV) stays bf16/fp32 — the int8 core probes already
    measured negative, and 15-level score operands would be hopeless.
    Same opt-in accuracy tier as _ln_mlp_fwd_int4_kernel (PERF.md)."""
    spq = x_ref.shape[1]
    d = x_ref.shape[2]
    x = x_ref[:].reshape(tile * spq, d).astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    xn32 = xhat * g_ref[:].astype(jnp.float32) \
        + be_ref[:].astype(jnp.float32)
    xq, sx = _quant_rows4(xn32)
    qkv = jax.lax.dot_general(xq, w4_ref[:], (((1,), (0,)), ((), ())),
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
        ko, _ = _kv_off(h, heads, kv_heads, head_dim)
        q = qkv[sl, o:o + head_dim]
        k = qkv[sl, ko:ko + head_dim]
        s = jax.lax.dot_general(q, k, _AB_T,
                                preferred_element_type=jnp.float32) * scale
        if seq_len < spq:
            s = jnp.where(col < seq_len, s, -1e30)
        ss.append(s)
    pss = [_softmax_rows(s) for s in ss]
    outs = []
    for (t, h), p in zip(ths, pss):
        sl = slice(t * spq, (t + 1) * spq)
        _, vo = _kv_off(h, heads, kv_heads, head_dim)
        v = qkv[sl, vo:vo + head_dim]
        outs.append(jnp.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32))
    attn = jnp.concatenate(
        [jnp.concatenate(outs[t * heads:(t + 1) * heads], axis=-1)
         for t in range(tile)], axis=0)
    aq, sa = _quant_rows4(attn)
    y = jax.lax.dot_general(aq, wo4_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * sa * swo_ref[:]
    y = (y + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[:] = y.reshape(tile, spq, d)


def _kv_off(h, heads, kv_heads, head_dim):
    """(k, v) column offsets for query head h in the packed
    [q (heads·hd) | k (kv_heads·hd) | v (kv_heads·hd)] qkv layout.
    GQA (res-vit `repeat_kv`, res-vit/model_utils.py:3-12) maps query head
    h to kv group h // (heads // kv_heads); kv_heads == heads degenerates
    to the classic [q|k|v] thirds."""
    g = h * kv_heads // heads
    ko = heads * head_dim + g * head_dim
    return ko, ko + kv_heads * head_dim


def _attn_core_recompute(qkv, ths, spq, hhd, head_dim, scale, seq_len, col,
                         tile, heads, dtype, kv_heads=None):
    """Staged scores -> softmaxes -> PVs for (tile x heads) pairs; returns
    (probs list, per-pair outs list, attn [tile*spq, hhd])."""
    kv_heads = kv_heads or heads
    def sl(t):
        return slice(t * spq, (t + 1) * spq)
    ss = []
    for t, h in ths:
        o = h * head_dim
        ko, _ = _kv_off(h, heads, kv_heads, head_dim)
        q = qkv[sl(t), o:o + head_dim]
        k = qkv[sl(t), ko:ko + head_dim]
        s = jax.lax.dot_general(q, k, _AB_T,
                                preferred_element_type=jnp.float32) * scale
        if seq_len < spq:
            s = jnp.where(col < seq_len, s, -1e30)
        ss.append(s)
    ps = [_softmax_rows(s) for s in ss]
    outs = []
    for (t, h), p in zip(ths, ps):
        _, vo = _kv_off(h, heads, kv_heads, head_dim)
        v = qkv[sl(t), vo:vo + head_dim]
        outs.append(jnp.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32
                            ).astype(dtype))
    attn = jnp.concatenate(
        [jnp.concatenate(outs[t * heads:(t + 1) * heads], axis=-1)
         for t in range(tile)], axis=0)
    return ps, outs, attn


def _attn_core_grads(qkv, ps, outs, dattn, ths, spq, hhd, head_dim, scale,
                     tile, heads, dtype, kv_heads=None):
    """Staged attention-core gradients; returns dqkv
    [tile*spq, (heads+2*kv_heads)*head_dim]. With GQA (kv_heads < heads),
    every query head in a kv group contributes to the SAME dk/dv slice —
    accumulated in fp32 before the cast (the transpose of repeat_kv)."""
    kv_heads = kv_heads or heads
    def sl(t):
        return slice(t * spq, (t + 1) * spq)
    dps = []
    for (t, h), p in zip(ths, ps):
        o = h * head_dim
        _, vo = _kv_off(h, heads, kv_heads, head_dim)
        v = qkv[sl(t), vo:vo + head_dim]
        do = dattn[sl(t), o:o + head_dim]
        dps.append(jax.lax.dot_general(do, v, _AB_T,
                                       preferred_element_type=jnp.float32))
    dss = []
    for (t, h), p, dp, out_h in zip(ths, ps, dps,
                                    [o_.astype(jnp.float32) for o_ in outs]):
        o = h * head_dim
        do = dattn[sl(t), o:o + head_dim]
        dd = jnp.sum(do.astype(jnp.float32) * out_h, axis=-1, keepdims=True)
        dss.append((p * (dp - dd)).astype(dtype))
    dqs, dks, dvs = [], [], []
    for (t, h), p, ds in zip(ths, ps, dss):
        o = h * head_dim
        ko, _ = _kv_off(h, heads, kv_heads, head_dim)
        q = qkv[sl(t), o:o + head_dim]
        k = qkv[sl(t), ko:ko + head_dim]
        do = dattn[sl(t), o:o + head_dim]
        dqs.append((jnp.dot(ds, k, preferred_element_type=jnp.float32)
                    * scale).astype(dtype))
        dks.append(jax.lax.dot_general(ds, q, _AT_B,
                                       preferred_element_type=jnp.float32)
                   * scale)
        dvs.append(jax.lax.dot_general(p.astype(do.dtype), do, _AT_B,
                                       preferred_element_type=jnp.float32))
    nrep = heads // kv_heads
    rows = []
    for t in range(tile):
        ks = dks[t * heads:(t + 1) * heads]
        vs = dvs[t * heads:(t + 1) * heads]
        kg = [sum(ks[g * nrep + 1:(g + 1) * nrep], ks[g * nrep]
                  ).astype(dtype) for g in range(kv_heads)]
        vg = [sum(vs[g * nrep + 1:(g + 1) * nrep], vs[g * nrep]
                  ).astype(dtype) for g in range(kv_heads)]
        rows.append(jnp.concatenate(
            dqs[t * heads:(t + 1) * heads] + kg + vg, axis=-1))
    return jnp.concatenate(rows, axis=0)


def _ln_qkvo_bwd_kernel(x_ref, g_ref, be_ref, w_ref, b_ref, wo_ref, do_ref,
                        dx_ref, dg_ref, dbe_ref, dw_ref, db_ref, dwo_ref,
                        dbo_ref, *, eps, scale, seq_len, heads, head_dim,
                        tile, kv_heads=None):
    """TILED over `tile` images per grid step (possible since the scoped
    VMEM limit was raised): the LN/qkv recompute, out-proj grads, dxn and
    dW matmuls all run on [tile*spq, ...] flats — MXU ops 'tile' times
    bigger — and the per-(image,head) attention-grad chains are STAGED so
    softmax/VPU work overlaps the score/PV matmuls of other pairs."""
    i = pl.program_id(0)
    spq = x_ref.shape[1]
    d_model = x_ref.shape[2]
    rows = tile * spq
    x = x_ref[:].reshape(rows, d_model).astype(jnp.float32)
    do_y = do_ref[:].reshape(rows, d_model)
    g32 = g_ref[:].astype(jnp.float32)

    # recompute LN (flat rows)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    xn = (xhat * g32 + be_ref[:].astype(jnp.float32)).astype(x_ref.dtype)

    qkv = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(xn.dtype)
    hhd = heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (spq, spq), 1)
    ths = [(t, h) for t in range(tile) for h in range(heads)]

    ps, outs, attn = _attn_core_recompute(qkv, ths, spq, hhd, head_dim,
                                          scale, seq_len, col, tile, heads,
                                          xn.dtype, kv_heads)

    dattn = jax.lax.dot_general(do_y, wo_ref[:], _AB_T,
                                preferred_element_type=jnp.float32
                                ).astype(xn.dtype)
    dwo_part = jax.lax.dot_general(attn, do_y, _AT_B,
                                   preferred_element_type=jnp.float32)
    dbo_part = jnp.sum(do_y.astype(jnp.float32), axis=0)

    dqkv = _attn_core_grads(qkv, ps, outs, dattn, ths, spq, hhd, head_dim,
                            scale, tile, heads, xn.dtype, kv_heads)

    dxn = jax.lax.dot_general(dqkv, w_ref[:], _AB_T,
                              preferred_element_type=jnp.float32)
    # LN backward (fp32): dx = rstd·(dxn·γ − mean(dxn·γ) − xhat·mean(dxn·γ·xhat))
    dyg = dxn * g32
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx = rstd * (dyg - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype).reshape(tile, spq, d_model)

    dg_part = jnp.sum(dxn * xhat, axis=0)
    dbe_part = jnp.sum(dxn, axis=0)
    dw_part = jax.lax.dot_general(xn, dqkv, _AT_B,
                                  preferred_element_type=jnp.float32)
    db_part = jnp.sum(dqkv.astype(jnp.float32), axis=0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg_part
        dbe_ref[:] = dbe_part
        dw_ref[:] = dw_part
        db_ref[:] = db_part
        dwo_ref[:] = dwo_part
        dbo_ref[:] = dbo_part

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_part
        dbe_ref[:] = dbe_ref[:] + dbe_part
        dw_ref[:] = dw_ref[:] + dw_part
        db_ref[:] = db_ref[:] + db_part
        dwo_ref[:] = dwo_ref[:] + dwo_part
        dbo_ref[:] = dbo_ref[:] + dbo_part


def _ln_qkvo_bwd_int8_kernel(x_ref, g_ref, be_ref, b_ref,
                             w8_ref, sw_ref, w8r_ref, swr_ref,
                             wo8r_ref, swor_ref, do_ref,
                             dx_ref, dg_ref, dbe_ref, dw_ref, db_ref,
                             dwo_ref, dbo_ref, *, eps, scale, seq_len,
                             heads, head_dim, tile, int8_dw=False,
                             int4_grad=False, kv_heads=None):
    """int8 variant of the tiled backward: the qkv RECOMPUTE and both
    dL/dx-path projections (dattn = do Woᵀ, dxn = dqkv Wᵀ) run W8A8;
    the attention-core grads stay bf16 (SwitchBack precision split).
    Dense wqkv/wo are never read (dW uses xn·dqkv directly, the bf16
    branch included), so only the quantized weight forms are passed —
    the dense refs would be ~3.5 MB of dead VMEM residency per grid step.
    int8_dw=True additionally runs dW/dWo as Jetfire-style per-block int8
    matmuls (per-column scales over the grid step's row block, int32
    accumulation in-block, fp32 accumulation across blocks).
    int4_grad=True (the caller then passes int4 weight forms/scales) drops
    the recompute + dx-path matmuls to A4W4; dW/dWo stay >=8-bit — the
    row-scale folding can't reuse int4 row tensors (mixed int4×int8 dots
    are Mosaic-rejected), so int8_dw falls back to fresh per-column int8
    packs of both dW operands."""
    _qr = _quant_rows4 if int4_grad else _quant_rows
    i = pl.program_id(0)
    spq = x_ref.shape[1]
    d_model = x_ref.shape[2]
    rows = tile * spq
    x = x_ref[:].reshape(rows, d_model).astype(jnp.float32)
    do_y = do_ref[:].reshape(rows, d_model)
    g32 = g_ref[:].astype(jnp.float32)

    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    xn32 = xhat * g32 + be_ref[:].astype(jnp.float32)
    xn = xn32.astype(x_ref.dtype)

    xq, sx = _qr(xn32)
    qkv = jax.lax.dot_general(xq, w8_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32
                              ).astype(jnp.float32) * sx * sw_ref[:]
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    hhd = heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (spq, spq), 1)
    ths = [(t, h) for t in range(tile) for h in range(heads)]

    ps, outs, attn = _attn_core_recompute(qkv, ths, spq, hhd, head_dim,
                                          scale, seq_len, col, tile, heads,
                                          xn.dtype, kv_heads)

    doq, sdo = _qr(do_y.astype(jnp.float32))
    dattn32 = jax.lax.dot_general(doq, wo8r_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32
                                  ).astype(jnp.float32) * sdo * swor_ref[:]
    dattn = dattn32.astype(xn.dtype)
    if int8_dw and int4_grad:
        # int4 row tensors can't fold into an int8 dW matmul — quantize
        # both dWo operands per-column int8 directly
        attnq, sat = _quant_cols(attn.astype(jnp.float32))
        doqc, sdoc = _quant_cols(do_y.astype(jnp.float32))
        dwo_part = jax.lax.dot_general(
            attnq, doqc, _AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sat[0][:, None] * sdoc[0][None, :]
    elif int8_dw:
        # row-scale folding (see the MLP backward): reuse the per-row int8
        # doq from the dattn matmul as the dWo operand, folding its row
        # scales into attn before attn's per-column quantization — drops
        # the fresh per-col quantization pass over do
        attnq, sat = _quant_cols(attn.astype(jnp.float32) * sdo)
        dwo_part = jax.lax.dot_general(
            attnq, doq, _AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sat[0][:, None]
    else:
        dwo_part = jax.lax.dot_general(attn, do_y, _AT_B,
                                       preferred_element_type=jnp.float32)
    dbo_part = jnp.sum(do_y.astype(jnp.float32), axis=0)

    dqkv = _attn_core_grads(qkv, ps, outs, dattn, ths, spq, hhd, head_dim,
                            scale, tile, heads, xn.dtype, kv_heads)

    dqkv32 = dqkv.astype(jnp.float32)
    dqq, sdq = _qr(dqkv32)
    dxn = jax.lax.dot_general(dqq, w8r_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32
                              ).astype(jnp.float32) * sdq * swr_ref[:]
    dyg = dxn * g32
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx = rstd * (dyg - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype).reshape(tile, spq, d_model)

    dg_part = jnp.sum(dxn * xhat, axis=0)
    dbe_part = jnp.sum(dxn, axis=0)
    if int8_dw and int4_grad:
        xnq2, sxn2 = _quant_cols(xn32)
        dqqc, sdqc = _quant_cols(dqkv32)
        dw_part = jax.lax.dot_general(
            xnq2, dqqc, _AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sxn2[0][:, None] * sdqc[0][None, :]
    elif int8_dw:
        # row-scale folding: reuse the per-row int8 dqq from the dxn
        # matmul as the dW operand — drops the per-col quantization pass
        # over dqkv [rows, 3·H·Hd], the biggest VPU item in this dW path
        xnq2, sxn2 = _quant_cols(xn32 * sdq)
        dw_part = jax.lax.dot_general(
            xnq2, dqq, _AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sxn2[0][:, None]
    else:
        dw_part = jax.lax.dot_general(xn, dqkv, _AT_B,
                                      preferred_element_type=jnp.float32)
    db_part = jnp.sum(dqkv32, axis=0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg_part
        dbe_ref[:] = dbe_part
        dw_ref[:] = dw_part
        db_ref[:] = db_part
        dwo_ref[:] = dwo_part
        dbo_ref[:] = dbo_part

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_part
        dbe_ref[:] = dbe_ref[:] + dbe_part
        dw_ref[:] = dw_ref[:] + dw_part
        db_ref[:] = db_ref[:] + db_part
        dwo_ref[:] = dwo_ref[:] + dwo_part
        dbo_ref[:] = dbo_ref[:] + dbo_part


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15, 16))
def fused_ln_qkvo_attention(x, gamma, beta, wqkv, bqkv, wo, bo,
                            eps, seq_len, heads, head_dim, int8=False,
                            int8_grad=False, int8_dw=False, int4=False,
                            int4_grad=False, kv_heads=None):
    """LN + QKV projection + attention core + out-projection in one kernel.
    Takes the PRE-LN block input x [B,SPQ,D] (pad rows zero-filled);
    backward emits dx through the LN and accumulates dγ/dβ/dW/db/dWo/dbo.
    int8=True runs both projections W8A8 (bwd stays bf16 recompute);
    int8_dw adds Jetfire-style per-block int8 dW/dWo matmuls.
    int4=True runs the FORWARD projections A4W4 (overrides int8 forward;
    the backward still follows int8_grad/int8_dw) — same opt-in accuracy
    tier as fused_ln_mlp's int4. int4_grad=True (requires int8_grad)
    drops the backward's qkv recompute + dattn/dxn projections to A4W4
    too; dW/dWo stay >=8-bit, the attention-core grads stay bf16. The
    rect compact variant (fused_ln_qkvo_attention_rect) carries the same
    tiers."""
    scale = 1.0 / math.sqrt(head_dim)
    b, spq, d = x.shape
    hhd = heads * head_dim
    kvw = (heads + 2 * (kv_heads or heads)) * head_dim   # packed qkv width
    tile = _qkvo_tile(b, spq)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    if int4:
        w4, sw = _quant_cols_host4(wqkv)
        wo4, swo = _quant_cols_host4(wo)
        return pl.pallas_call(
            functools.partial(_ln_qkvo_fwd_int4_kernel, eps=eps, scale=scale,
                              seq_len=seq_len, heads=heads,
                              head_dim=head_dim, tile=tile,
                              kv_heads=kv_heads),
            grid=(b // tile,),
            in_specs=[
                pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                vec(d), vec(d),
                pl.BlockSpec((d, kvw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(kvw), vec(kvw),
                pl.BlockSpec((hhd, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(d), vec(d),
            ],
            out_specs=pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, spq, d), x.dtype),
            interpret=_INTERPRET,
            **_VMEM_LIMIT,
        )(x, gamma, beta, w4, sw, bqkv, wo4, swo, bo)
    if int8:
        w8, sw = _quant_cols_host(wqkv)
        wo8, swo = _quant_cols_host(wo)
        return pl.pallas_call(
            functools.partial(_ln_qkvo_fwd_int8_kernel, eps=eps, scale=scale,
                              seq_len=seq_len, heads=heads,
                              head_dim=head_dim, tile=tile,
                              kv_heads=kv_heads),
            grid=(b // tile,),
            in_specs=[
                pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                vec(d), vec(d),
                pl.BlockSpec((d, kvw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(kvw), vec(kvw),
                pl.BlockSpec((hhd, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(d), vec(d),
            ],
            out_specs=pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, spq, d), x.dtype),
            interpret=_INTERPRET,
            **_VMEM_LIMIT,
        )(x, gamma, beta, w8, sw, bqkv, wo8, swo, bo)
    return pl.pallas_call(
        functools.partial(_ln_qkvo_fwd_kernel, eps=eps, scale=scale,
                          seq_len=seq_len, heads=heads, head_dim=head_dim,
                          tile=tile, kv_heads=kv_heads),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(d), vec(d),
            pl.BlockSpec((d, kvw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(kvw),
            pl.BlockSpec((hhd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(d),
        ],
        out_specs=pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, spq, d), x.dtype),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x, gamma, beta, wqkv, bqkv, wo, bo)


def _fused_ln_qkvo_fwd(x, gamma, beta, wqkv, bqkv, wo, bo,
                       eps, seq_len, heads, head_dim, int8=False,
                       int8_grad=False, int8_dw=False, int4=False,
                       int4_grad=False, kv_heads=None):
    out = fused_ln_qkvo_attention(x, gamma, beta, wqkv, bqkv, wo, bo,
                                  eps, seq_len, heads, head_dim, int8,
                                  int8_grad, int8_dw, int4, int4_grad,
                                  kv_heads)
    return out, (x, gamma, beta, wqkv, bqkv, wo)


_QKVO_BWD_TILE = int(_os.environ.get("VITAX_QKVO_BWD_TILE", 2))


def _qkvo_bwd_tile(b: int, spq: int = 256) -> int:
    t = _QKVO_BWD_TILE
    if "VITAX_QKVO_BWD_TILE" not in _os.environ and spq <= 128:
        t = 4  # short-seq (token-drop) geometry — see _qkvo_tile
    while t > 1 and b % t:
        t //= 2
    return max(t, 1)


def _fused_ln_qkvo_bwd(eps, seq_len, heads, head_dim, int8, int8_grad,
                       int8_dw, int4, int4_grad, kv_heads, res, do):
    # int4 applies to the forward projections; the backward follows the
    # int8_grad/int8_dw tiers unless int4_grad opts the recompute +
    # dattn/dxn projections into A4W4 as well (dW/dWo stay >=8-bit; the
    # attention-core grads stay bf16 at every tier).
    x, gamma, beta, wqkv, bqkv, wo = res
    scale = 1.0 / math.sqrt(head_dim)
    b, spq, d = x.shape
    hhd = heads * head_dim
    kvw = (heads + 2 * (kv_heads or heads)) * head_dim
    tile = _qkvo_bwd_tile(b, spq)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    if int8 and int8_grad:
        qc = _quant_cols_host4 if int4_grad else _quant_cols_host
        qr = _quant_rows_host4 if int4_grad else _quant_rows_host
        w8, sw = qc(wqkv)       # qkv recompute (over D)
        w8r, swr = qr(wqkv)     # dxn (over 3hhd)
        wo8r, swor = qr(wo)     # dattn (over D)
        dx, dg, dbe, dw, db, dwo, dbo = pl.pallas_call(
            functools.partial(_ln_qkvo_bwd_int8_kernel, eps=eps, scale=scale,
                              seq_len=seq_len, heads=heads,
                              head_dim=head_dim, tile=tile,
                              int8_dw=int8_dw, int4_grad=int4_grad,
                              kv_heads=kv_heads),
            grid=(b // tile,),
            in_specs=[
                pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                vec(d), vec(d),
                vec(kvw),
                pl.BlockSpec((d, kvw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(kvw),
                pl.BlockSpec((d, kvw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(d),
                pl.BlockSpec((hhd, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(hhd),
                pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                vec(d), vec(d),
                pl.BlockSpec((d, kvw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(kvw),
                pl.BlockSpec((hhd, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                vec(d),
            ),
            out_shape=(jax.ShapeDtypeStruct((b, spq, d), x.dtype),
                       jax.ShapeDtypeStruct((d,), jnp.float32),
                       jax.ShapeDtypeStruct((d,), jnp.float32),
                       jax.ShapeDtypeStruct((d, kvw), jnp.float32),
                       jax.ShapeDtypeStruct((kvw,), jnp.float32),
                       jax.ShapeDtypeStruct((hhd, d), jnp.float32),
                       jax.ShapeDtypeStruct((d,), jnp.float32)),
            interpret=_INTERPRET,
            **_VMEM_LIMIT,
        )(x, gamma, beta, bqkv, w8, sw, w8r, swr, wo8r, swor, do)
        return (dx, dg.astype(gamma.dtype), dbe.astype(beta.dtype),
                dw.astype(wqkv.dtype), db.astype(bqkv.dtype),
                dwo.astype(wo.dtype), dbo)
    dx, dg, dbe, dw, db, dwo, dbo = pl.pallas_call(
        functools.partial(_ln_qkvo_bwd_kernel, eps=eps, scale=scale,
                          seq_len=seq_len, heads=heads, head_dim=head_dim,
                          tile=tile, kv_heads=kv_heads),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(d), vec(d),
            pl.BlockSpec((d, kvw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(kvw),
            pl.BlockSpec((hhd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, spq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(d), vec(d),
            pl.BlockSpec((d, kvw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(kvw),
            pl.BlockSpec((hhd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(d),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, spq, d), x.dtype),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d, kvw), jnp.float32),
                   jax.ShapeDtypeStruct((kvw,), jnp.float32),
                   jax.ShapeDtypeStruct((hhd, d), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32)),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x, gamma, beta, wqkv, bqkv, wo, do)
    return (dx, dg.astype(gamma.dtype), dbe.astype(beta.dtype),
            dw.astype(wqkv.dtype), db.astype(bqkv.dtype),
            dwo.astype(wo.dtype), dbo)


fused_ln_qkvo_attention.defvjp(_fused_ln_qkvo_fwd, _fused_ln_qkvo_bwd)


# =============================================================================
# KV-blocked (online-softmax) flash attention half — big-d geometries
#
# The whole-seq kernels above hold every (tile, head) pair's [spq, spq]
# fp32 probabilities in VMEM, which is what gates h14 (d=1280, s=736 @384)
# off the fused path (VERDICT r4 #6). These variants never materialize the
# full probability matrix: the forward runs the standard flash-attention
# recurrence (blockwise over KV with running row max m and normalizer l),
# and the backward recomputes m/l in a first chunked pass, then forms the
# per-chunk probabilities again for dq/dk/dv — all O(spq·ckv) VMEM.
# LN + qkv projection + out-projection stay fused exactly like the
# whole-seq kernel (dγ/dβ/dW/db/dWo/dbo accumulate across the grid).
# Reference math being reproduced: src/model.py:94-96 (scores/softmax/PV)
# at the h14 preset src/config.py:95-104.
# =============================================================================

_QKVO_FLASH_KV = int(_os.environ.get("VITAX_QKVO_FLASH_KV", 4))


def qkv_attention_flash_supported(xhat, wqkv) -> bool:
    """Geometries the KV-blocked kernel serves (notably d=1280/h14, which
    the whole-seq gate rejects)."""
    if xhat.ndim != 3 or wqkv.ndim != 2:
        return False
    b, s, d = xhat.shape
    if wqkv.shape[0] != d or wqkv.shape[1] % 3:
        return False
    hhd = wqkv.shape[1] // 3
    max_d = int(_os.environ.get("VITAX_QKVO_FLASH_MAX_D", "1536"))
    spq = (s + 7) // 8 * 8
    if s > 1024 or d > max_d or hhd > max_d or d % 128 or spq % 8:
        return False
    # weights + fp32 dW/dWo accumulators + whole-row qkv activations (the
    # only seq-sized tensors; probs are chunked)
    weights = 2 * d * 3 * hhd + 2 * hhd * d
    accum = 4 * d * 3 * hhd + 4 * hhd * d
    act = spq * 3 * hhd * 6 + spq * d * 10
    return weights + accum + act <= 88 * 1024 * 1024


def _flash_chunks(spq: int) -> int:
    n = _QKVO_FLASH_KV
    while n > 1 and (spq % n or (spq // n) % 8):
        n -= 1
    return max(n, 1)


def _flash_head_fwd(q, qkv, o, hhd, head_dim, spq, scale, seq_len, n_kv,
                    want_stats=False):
    """Online-softmax recurrence for ONE head; q [spq, hd] bf16.
    Returns out [spq, hd] fp32 (and (m, l) when want_stats)."""
    ckv = spq // n_kv
    m = jnp.full((spq, 1), -1e30, jnp.float32)
    l = jnp.zeros((spq, 1), jnp.float32)
    acc = jnp.zeros((spq, head_dim), jnp.float32)
    for c in range(n_kv):
        lo = c * ckv
        ks = qkv[lo:lo + ckv, hhd + o:hhd + o + head_dim]
        s_c = jax.lax.dot_general(q, ks, _AB_T,
                                  preferred_element_type=jnp.float32) * scale
        if seq_len < spq and lo + ckv > seq_len:
            col = jax.lax.broadcasted_iota(jnp.int32, (spq, ckv), 1) + lo
            s_c = jnp.where(col < seq_len, s_c, -1e30)
        m_new = jnp.maximum(m, jnp.max(s_c, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s_c - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vs = qkv[lo:lo + ckv, 2 * hhd + o:2 * hhd + o + head_dim]
        acc = acc * alpha + jnp.dot(p.astype(vs.dtype), vs,
                                    preferred_element_type=jnp.float32)
        m = m_new
    out = acc / l
    return (out, m, l) if want_stats else out


def _ln_qkvo_fwd_flash_kernel(x_ref, g_ref, be_ref, w_ref, b_ref, wo_ref,
                              bo_ref, o_ref, *, eps, scale, seq_len, heads,
                              head_dim, n_kv):
    spq = x_ref.shape[1]
    d = x_ref.shape[2]
    x = x_ref[0].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    xn = (xhat * g_ref[:].astype(jnp.float32)
          + be_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    qkv = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(xn.dtype)
    hhd = heads * head_dim
    outs = []
    for h in range(heads):
        o = h * head_dim
        q = qkv[:, o:o + head_dim]
        outs.append(_flash_head_fwd(q, qkv, o, hhd, head_dim, spq, scale,
                                    seq_len, n_kv).astype(xn.dtype))
    attn = jnp.concatenate(outs, axis=-1)
    y = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
    y = (y + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[0] = y


def _ln_qkvo_bwd_flash_kernel(x_ref, g_ref, be_ref, w_ref, b_ref, wo_ref,
                              do_ref, dx_ref, dg_ref, dbe_ref, dw_ref,
                              db_ref, dwo_ref, dbo_ref, *, eps, scale,
                              seq_len, heads, head_dim, n_kv):
    i = pl.program_id(0)
    spq = x_ref.shape[1]
    d_model = x_ref.shape[2]
    x = x_ref[0].astype(jnp.float32)
    do_y = do_ref[0]
    g32 = g_ref[:].astype(jnp.float32)

    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    xn = (xhat * g32 + be_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    qkv = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(xn.dtype)
    hhd = heads * head_dim
    ckv = spq // n_kv

    dattn = jax.lax.dot_general(do_y, wo_ref[:], _AB_T,
                                preferred_element_type=jnp.float32
                                ).astype(xn.dtype)
    dqs, dks, dvs, outs = [], [], [], []
    for h in range(heads):
        o = h * head_dim
        q = qkv[:, o:o + head_dim]
        out_h, m, l = _flash_head_fwd(q, qkv, o, hhd, head_dim, spq, scale,
                                      seq_len, n_kv, want_stats=True)
        outs.append(out_h.astype(xn.dtype))
        do_h = dattn[:, o:o + head_dim]
        dd = jnp.sum(do_h.astype(jnp.float32) * out_h, axis=-1,
                     keepdims=True)
        dq = jnp.zeros((spq, head_dim), jnp.float32)
        dk_cs, dv_cs = [], []
        for c in range(n_kv):
            lo = c * ckv
            ks = qkv[lo:lo + ckv, hhd + o:hhd + o + head_dim]
            vs = qkv[lo:lo + ckv, 2 * hhd + o:2 * hhd + o + head_dim]
            s_c = jax.lax.dot_general(q, ks, _AB_T,
                                      preferred_element_type=jnp.float32
                                      ) * scale
            if seq_len < spq and lo + ckv > seq_len:
                col = (jax.lax.broadcasted_iota(jnp.int32, (spq, ckv), 1)
                       + lo)
                s_c = jnp.where(col < seq_len, s_c, -1e30)
            p = jnp.exp(s_c - m) / l
            pb = p.astype(xn.dtype)
            dp = jax.lax.dot_general(do_h, vs, _AB_T,
                                     preferred_element_type=jnp.float32)
            ds = (p * (dp - dd)).astype(xn.dtype)
            dq = dq + jnp.dot(ds, ks,
                              preferred_element_type=jnp.float32) * scale
            dk_cs.append(jax.lax.dot_general(ds, q, _AT_B,
                                             preferred_element_type=jnp.float32
                                             ) * scale)
            dv_cs.append(jax.lax.dot_general(pb, do_h, _AT_B,
                                             preferred_element_type=jnp.float32))
        dqs.append(dq.astype(xn.dtype))
        dks.append(jnp.concatenate(dk_cs, axis=0).astype(xn.dtype))
        dvs.append(jnp.concatenate(dv_cs, axis=0).astype(xn.dtype))
    attn = jnp.concatenate(outs, axis=-1)
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)

    dwo_part = jax.lax.dot_general(attn, do_y, _AT_B,
                                   preferred_element_type=jnp.float32)
    dbo_part = jnp.sum(do_y.astype(jnp.float32), axis=0)
    dxn = jax.lax.dot_general(dqkv, w_ref[:], _AB_T,
                              preferred_element_type=jnp.float32)
    dyg = dxn * g32
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx = rstd * (dyg - m1 - xhat * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    dg_part = jnp.sum(dxn * xhat, axis=0)
    dbe_part = jnp.sum(dxn, axis=0)
    dw_part = jax.lax.dot_general(xn, dqkv, _AT_B,
                                  preferred_element_type=jnp.float32)
    db_part = jnp.sum(dqkv.astype(jnp.float32), axis=0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg_part
        dbe_ref[:] = dbe_part
        dw_ref[:] = dw_part
        db_ref[:] = db_part
        dwo_ref[:] = dwo_part
        dbo_ref[:] = dbo_part

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_part
        dbe_ref[:] = dbe_ref[:] + dbe_part
        dw_ref[:] = dw_ref[:] + dw_part
        db_ref[:] = db_ref[:] + db_part
        dwo_ref[:] = dwo_ref[:] + dwo_part
        dbo_ref[:] = dbo_ref[:] + dbo_part


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_ln_qkvo_attention_flash(x, gamma, beta, wqkv, bqkv, wo, bo,
                                  eps, seq_len, heads, head_dim):
    """KV-blocked flash variant of fused_ln_qkvo_attention (bf16 tier):
    identical math (same LN/projection/out-proj fusion and grad
    accumulation), online-softmax core — serves d=1280/h14 which the
    whole-seq kernel cannot. Forward output matches the whole-seq kernel
    to fp32 ulps (the softmax is computed as exp(s−m)/l instead of the
    one-pass row softmax)."""
    return _qkvo_flash_fwd_call(x, gamma, beta, wqkv, bqkv, wo, bo,
                                eps, seq_len, heads, head_dim)


def _qkvo_flash_fwd_call(x, gamma, beta, wqkv, bqkv, wo, bo,
                         eps, seq_len, heads, head_dim):
    b, spq, d = x.shape
    hhd = heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    t3 = pl.BlockSpec((1, spq, d), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_qkvo_fwd_flash_kernel, eps=eps, scale=scale,
                          seq_len=seq_len, heads=heads, head_dim=head_dim,
                          n_kv=_flash_chunks(spq)),
        grid=(b,),
        in_specs=[t3, vec(d), vec(d),
                  pl.BlockSpec((d, 3 * hhd), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(3 * hhd),
                  pl.BlockSpec((hhd, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d)],
        out_specs=t3,
        out_shape=jax.ShapeDtypeStruct((b, spq, d), x.dtype),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x, gamma, beta, wqkv, bqkv, wo, bo)


def _fused_flash_fwd(x, gamma, beta, wqkv, bqkv, wo, bo,
                     eps, seq_len, heads, head_dim):
    out = _qkvo_flash_fwd_call(x, gamma, beta, wqkv, bqkv, wo, bo,
                               eps, seq_len, heads, head_dim)
    return out, (x, gamma, beta, wqkv, bqkv, wo)


def _fused_flash_bwd(eps, seq_len, heads, head_dim, res, do):
    x, gamma, beta, wqkv, bqkv, wo = res
    b, spq, d = x.shape
    hhd = heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    t3 = pl.BlockSpec((1, spq, d), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    dx, dg, dbe, dw, db, dwo, dbo = pl.pallas_call(
        functools.partial(_ln_qkvo_bwd_flash_kernel, eps=eps, scale=scale,
                          seq_len=seq_len, heads=heads, head_dim=head_dim,
                          n_kv=_flash_chunks(spq)),
        grid=(b,),
        in_specs=[t3, vec(d), vec(d),
                  pl.BlockSpec((d, 3 * hhd), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(3 * hhd),
                  pl.BlockSpec((hhd, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  t3],
        out_specs=(t3, vec(d), vec(d),
                   pl.BlockSpec((d, 3 * hhd), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   vec(3 * hhd),
                   pl.BlockSpec((hhd, d), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   vec(d)),
        out_shape=(jax.ShapeDtypeStruct((b, spq, d), x.dtype),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32),
                   jax.ShapeDtypeStruct((d, 3 * hhd), jnp.float32),
                   jax.ShapeDtypeStruct((3 * hhd,), jnp.float32),
                   jax.ShapeDtypeStruct((hhd, d), jnp.float32),
                   jax.ShapeDtypeStruct((d,), jnp.float32)),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x, gamma, beta, wqkv, bqkv, wo, do)
    return (dx, dg.astype(gamma.dtype), dbe.astype(beta.dtype),
            dw.astype(wqkv.dtype), db.astype(bqkv.dtype),
            dwo.astype(wo.dtype), dbo)


fused_ln_qkvo_attention_flash.defvjp(_fused_flash_fwd, _fused_flash_bwd)


# =============================================================================
# Cross-kernel int8 activation handoff (VERDICT r4 #1)
#
# In the int8 forward, both block-half kernels pay a per-row input
# quantization (LN + amax + round/clip/convert pack) that serializes against
# the MXU. Each kernel's epilogue already materializes the NEXT kernel's
# input — the residual stream — so the handoff kernels emit, alongside the
# bf16 residual, the next consumer's LN-normalized per-row int8 input and
# row scales; the consumer skips its LN + input pack entirely. Gradients
# are UNCHANGED: the int8 forward is a straight-through approximation and
# every backward below reuses the existing backward kernels on the saved
# bf16 stream, so the handoff path's gradients are bit-identical to the
# non-handoff int8 path's. Measured (scripts/handoff_probe.py): −9% forward
# per layer on top of the padded stream. Target being accelerated: the
# encoder block, src/model.py:104-130.
# =============================================================================


def _ln_quant_rows(r32, g32, be32, eps):
    """LN (fp32 statistics) + per-row symmetric int8 quantization."""
    mu = jnp.mean(r32, axis=-1, keepdims=True)
    rc = r32 - mu
    var = jnp.mean(rc * rc, axis=-1, keepdims=True)
    xhat = rc * jax.lax.rsqrt(var + eps)
    return _quant_rows(xhat * g32 + be32)


def _ln_qkvo_fwd_int8_ho_kernel(x_ref, xq_ref, sx_ref, g2_ref, be2_ref,
                                w8_ref, sw_ref, b_ref, wo8_ref, swo_ref,
                                bo_ref, r1_ref, xq2_ref, sx2_ref, *,
                                eps, scale, seq_len, heads, head_dim, tile):
    """int8 attention half with prepacked input and packed-output epilogue:
    consumes (x, xq, sx) where xq/sx are the already-quantized LN1 output
    (produced by the previous layer's MLP epilogue, or packed once in XLA
    for layer 0), adds the residual IN-kernel, and emits r1 = x + attn plus
    LN2(r1) quantized for the MLP kernel. The epilogue quantizes the
    bf16-ROUNDED r1 so the consumer sees exactly the values it would have
    computed from r1 itself."""
    kv_heads = heads  # handoff path is plain-ViT only (no GQA)
    spq = x_ref.shape[1]
    d = x_ref.shape[2]
    nrows = tile * spq
    xq = xq_ref[:].reshape(nrows, d)
    sx = sx_ref[:].reshape(nrows, sx_ref.shape[2])[:, :1]
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
        ko, _ = _kv_off(h, heads, kv_heads, head_dim)
        q = qkv[sl, o:o + head_dim]
        k = qkv[sl, ko:ko + head_dim]
        s = jax.lax.dot_general(q, k, _AB_T,
                                preferred_element_type=jnp.float32) * scale
        if seq_len < spq:
            s = jnp.where(col < seq_len, s, -1e30)
        ss.append(s)
    pss = [_softmax_rows(s) for s in ss]
    outs = []
    for (t, h), p in zip(ths, pss):
        sl = slice(t * spq, (t + 1) * spq)
        _, vo = _kv_off(h, heads, kv_heads, head_dim)
        v = qkv[sl, vo:vo + head_dim]
        outs.append(jnp.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32))
    attn = jnp.concatenate(
        [jnp.concatenate(outs[t * heads:(t + 1) * heads], axis=-1)
         for t in range(tile)], axis=0)
    aq, sa = _quant_rows(attn)
    y = jax.lax.dot_general(aq, wo8_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * sa * swo_ref[:] \
        + bo_ref[:].astype(jnp.float32)
    r1 = x_ref[:].reshape(nrows, d).astype(jnp.float32) + y
    r1b = r1.astype(x_ref.dtype)
    r1_ref[:] = r1b.reshape(tile, spq, d)
    q2, s2 = _ln_quant_rows(r1b.astype(jnp.float32),
                            g2_ref[:].astype(jnp.float32),
                            be2_ref[:].astype(jnp.float32), eps)
    xq2_ref[:] = q2.reshape(tile, spq, d)
    sx2_ref[:] = jnp.broadcast_to(s2, (nrows, sx2_ref.shape[2])
                                  ).reshape(tile, spq, sx2_ref.shape[2])


def _ln_mlp_fwd_int8_ho_kernel(x_ref, xq_ref, sx_ref, gn_ref, ben_ref,
                               w1q_ref, s1_ref, b1_ref, w2q_ref, s2_ref,
                               b2_ref, o_ref, xqn_ref, sxn_ref, *,
                               eps, chunks):
    """int8 MLP half with prepacked input and packed-output epilogue:
    consumes (r1, xq2, sx2) from the attention handoff kernel, emits
    r2 = r1 + mlp plus LN1_next(r2) quantized for the NEXT layer's
    attention kernel (gn/ben are the next layer's LN1 — or the final
    encoder norm for the last layer, whose packed output is discarded)."""
    rows = x_ref.shape[0] // chunks
    s1 = s1_ref[:]
    s2 = s2_ref[:]
    b1f = b1_ref[:].astype(jnp.float32)
    b2f = b2_ref[:].astype(jnp.float32)
    gn32 = gn_ref[:].astype(jnp.float32)
    ben32 = ben_ref[:].astype(jnp.float32)
    sls = [slice(c * rows, (c + 1) * rows) for c in range(chunks)]
    a1s = [jax.lax.dot_general(xq_ref[sl, :], w1q_ref[:],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32)
           * sx_ref[sl, :][:, :1] * s1 + b1f
           for sl in sls]
    h1qs = [_quant_rows(_gelu_q(a1)) for a1 in a1s]
    for sl, (h1q, sh) in zip(sls, h1qs):
        y = jax.lax.dot_general(h1q, w2q_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * sh * s2 + b2f
        r2 = x_ref[sl, :].astype(jnp.float32) + y
        r2b = r2.astype(x_ref.dtype)
        o_ref[sl, :] = r2b
        qn, sn = _ln_quant_rows(r2b.astype(jnp.float32), gn32, ben32, eps)
        xqn_ref[sl, :] = qn
        sxn_ref[sl, :] = jnp.broadcast_to(sn, (rows, sxn_ref.shape[1]))


_HO_SCALE_LANES = int(_os.environ.get("VITAX_HO_SCALE_LANES", 8))


def _qkvo_ho_fwd_call(x, xq, sx, g2, be2, wqkv, bqkv, wo, bo,
                      eps, seq_len, heads, head_dim):
    b, spq, d = x.shape
    hhd = heads * head_dim
    kvw = 3 * hhd    # handoff path is plain-ViT only (no GQA)
    tile = _qkvo_tile(b, spq)
    scale = 1.0 / math.sqrt(head_dim)
    w8, sw = _quant_cols_host(wqkv)
    wo8, swo = _quant_cols_host(wo)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    t3 = lambda w, dt=None: pl.BlockSpec((tile, spq, w), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_qkvo_fwd_int8_ho_kernel, eps=eps, scale=scale,
                          seq_len=seq_len, heads=heads, head_dim=head_dim,
                          tile=tile),
        grid=(b // tile,),
        in_specs=[t3(d), t3(d), t3(_HO_SCALE_LANES), vec(d), vec(d),
                  pl.BlockSpec((d, kvw), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(kvw), vec(kvw),
                  pl.BlockSpec((hhd, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d)],
        out_specs=(t3(d), t3(d), t3(_HO_SCALE_LANES)),
        out_shape=(jax.ShapeDtypeStruct((b, spq, d), x.dtype),
                   jax.ShapeDtypeStruct((b, spq, d), jnp.int8),
                   jax.ShapeDtypeStruct((b, spq, _HO_SCALE_LANES),
                                        jnp.float32)),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x, xq, sx, g2, be2, w8, sw, bqkv, wo8, swo, bo)


def _mlp_ho_fwd_call(x2, xq2, sx2, gn, ben, w1, b1, w2, b2, eps):
    n, d = x2.shape
    m = w1.shape[1]
    w1q, s1 = _quant_cols_host(w1)
    w2q, s2 = _quant_cols_host(w2)
    rows, chunks = _ln_mlp_fwd_geometry(n, int8=True)
    vec = lambda k: pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    s_blk = pl.BlockSpec((rows, _HO_SCALE_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_fwd_int8_ho_kernel, eps=eps,
                          chunks=chunks),
        grid=(n // rows,),
        in_specs=[row_blk, row_blk, s_blk, vec(d), vec(d),
                  pl.BlockSpec((d, m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(m), vec(m),
                  pl.BlockSpec((m, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d)],
        out_specs=(row_blk, row_blk, s_blk),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((n, d), jnp.int8),
                   jax.ShapeDtypeStruct((n, _HO_SCALE_LANES), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * m, transcendentals=2 * n * m,
            bytes_accessed=3 * n * d * x2.dtype.itemsize + 4 * d * m),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(x2, xq2, sx2, gn, ben, w1q, s1, b1, w2q, s2, b2)


def pack_stream(x, gamma, beta, eps):
    """XLA-side LN + per-row int8 pack of the stream — layer 0's handoff
    input (every later layer's comes from the previous MLP epilogue)."""
    b, spq, d = x.shape
    x32 = x.reshape(b * spq, d).astype(jnp.float32)
    q, s = _ln_quant_rows(x32, gamma.astype(jnp.float32),
                          beta.astype(jnp.float32), eps)
    return (q.reshape(b, spq, d),
            jnp.broadcast_to(s, (b * spq, _HO_SCALE_LANES)
                             ).reshape(b, spq, _HO_SCALE_LANES))


def block_handoff_supported(x, cfg_like=None) -> bool:
    """Shape gate for fused_block_int8_handoff: both halves' gates, plus
    the MLP row geometry must divide the padded stream exactly (the whole
    point is zero re-padding)."""
    b, spq, d = x.shape
    n = b * spq
    rows, _ = _ln_mlp_fwd_geometry(n, int8=True)
    return n % rows == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19, 20, 21))
def fused_block_int8_handoff(x, xq, sx, g1, be1, wqkv, bqkv, wo, bo,
                             g2, be2, w1, b1, w2, b2, gn, ben,
                             eps, seq_len, heads, head_dim, int8_dw):
    """One full encoder block on the int8 handoff path.

    (x, xq, sx) -> (r2, xqn, sxn): x is the bf16 padded residual stream
    [B,spq,D], xq/sx its packed LN1 form. Forward runs the two handoff
    kernels (each skips its input LN+pack and emits the next consumer's);
    gn/ben are the NEXT layer's LN1 params (the final encoder norm for the
    last layer — its packed output is simply discarded).

    Backward is bit-identical to the non-handoff int8 path: the packed
    tensors are straight-through forward data (zero cotangent — the full
    gradient of the stream rides the bf16 x, exactly the STE convention
    every int8 tier here already uses), and the two existing backward
    kernels run unchanged on the saved bf16 stream. gn/ben get zero
    gradient from this block — their real gradient comes from the next
    block's backward (or the final layer_norm), where they are g1/be1."""
    out, _ = _block_ho_fwd(x, xq, sx, g1, be1, wqkv, bqkv, wo, bo,
                           g2, be2, w1, b1, w2, b2, gn, ben,
                           eps, seq_len, heads, head_dim, int8_dw)
    return out


def _block_ho_fwd(x, xq, sx, g1, be1, wqkv, bqkv, wo, bo,
                  g2, be2, w1, b1, w2, b2, gn, ben,
                  eps, seq_len, heads, head_dim, int8_dw):
    b, spq, d = x.shape
    n = b * spq
    r1, xq2, sx2 = _qkvo_ho_fwd_call(x, xq, sx, g2, be2, wqkv, bqkv, wo, bo,
                                     eps, seq_len, heads, head_dim)
    r2, xqn, sxn = _mlp_ho_fwd_call(
        r1.reshape(n, d), xq2.reshape(n, d),
        sx2.reshape(n, _HO_SCALE_LANES), gn, ben, w1, b1, w2, b2, eps)
    out = (r2.reshape(b, spq, d), xqn.reshape(b, spq, d),
           sxn.reshape(b, spq, _HO_SCALE_LANES))
    return out, (x, r1, g1, be1, wqkv, bqkv, wo, g2, be2, w1, b1, w2, sx)


def _block_ho_bwd(eps, seq_len, heads, head_dim, int8_dw, res, cts):
    x, r1, g1, be1, wqkv, bqkv, wo, g2, be2, w1, b1, w2, sx = res
    dr2, _, _ = cts            # packed outputs: forward-only data (STE)
    b, spq, d = x.shape
    n = b * spq
    dr1_2d, dg2, dbe2, dw1, db1, dw2, db2 = _ln_mlp_bwd_int8_call(
        r1.reshape(n, d), g2, be2, w1, b1, w2, dr2.reshape(n, d), eps,
        True, int8_dw)
    dr1 = dr1_2d.reshape(b, spq, d)
    # attention half: forward was r1 = x + attn(x); the qkvo backward
    # kernel produces d(attn)/dx through LN1 — add the residual identity
    datt = _fused_ln_qkvo_bwd(eps, seq_len, heads, head_dim, True, True,
                              int8_dw, False, False, None,
                              (x, g1, be1, wqkv, bqkv, wo), dr1)
    dx_att, dg1, dbe1, dwqkv, dbqkv, dwo, dbo = datt
    dx = dx_att + dr1
    f0 = _np.zeros((), jax.dtypes.float0)
    dxq = _np.broadcast_to(f0, (b, spq, d))
    # cast weight grads to the primal dtypes (like every wrapper above) —
    # also halves the stacked-[L,...] grad buffers XLA fuses around the
    # backward kernels when params are bf16
    return (dx, dxq, jnp.zeros_like(sx),
            dg1, dbe1, dwqkv, dbqkv, dwo, dbo,
            dg2.astype(g2.dtype), dbe2.astype(be2.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2,
            jnp.zeros_like(g2), jnp.zeros_like(be2))


fused_block_int8_handoff.defvjp(_block_ho_fwd, _block_ho_bwd)


# =============================================================================
# Rectangular (compacted-Q) fused attention half — token-compaction support
#
# In the capacity-compaction path (models/resvit.compact_routed_block — the
# TPU-native form of the reference's data-dependent token routing,
# res-vit/model.py:371-529) an inactive token's entire block output is
# DISCARDED by the merge; only its K/V contribution survives. The square
# kernel still computes Q rows / core rows / the out-projection for every
# token; these rectangular variants compute them ONLY for the top-capacity
# gathered rows (xc) while K and V still come from all rows (x).
# Bit-exact vs running the square kernel and gathering afterwards: every
# row-wise quantity (LN statistics, int8 row scales, softmax) is computed
# per row on identical row values — the rect form just skips the dead rows.
# =============================================================================

def _rect_core_recompute(q, kv, ths, cpq, spq, hhd, head_dim, scale,
                         seq_len, col, tile, heads, dtype):
    """Staged rect attention core: q [tile*cpq, hhd], kv [tile*spq, 2*hhd]
    (K columns first, then V) → (probs, per-pair outs, attn [tile*cpq, hhd])."""
    ss = []
    for t, h in ths:
        o = h * head_dim
        s = jax.lax.dot_general(q[t * cpq:(t + 1) * cpq, o:o + head_dim],
                                kv[t * spq:(t + 1) * spq, o:o + head_dim],
                                _AB_T,
                                preferred_element_type=jnp.float32) * scale
        if seq_len < spq:
            s = jnp.where(col < seq_len, s, -1e30)
        ss.append(s)
    ps = [_softmax_rows(s) for s in ss]
    outs = []
    for (t, h), p in zip(ths, ps):
        o = hhd + h * head_dim
        v = kv[t * spq:(t + 1) * spq, o:o + head_dim]
        outs.append(jnp.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32
                            ).astype(dtype))
    attn = jnp.concatenate(
        [jnp.concatenate(outs[t * heads:(t + 1) * heads], axis=-1)
         for t in range(tile)], axis=0)
    return ps, outs, attn


def _rect_core_grads(q, kv, ps, outs, dattn, ths, cpq, spq, hhd, head_dim,
                     scale, tile, heads, dtype):
    """Rect attention-core gradients: returns dq [tile*cpq, hhd] and
    dkv [tile*spq, 2*hhd]. Same dot_general forms as the square
    _attn_core_grads — dk/dv naturally land on the KV (full) row set."""
    def slq(t):
        return slice(t * cpq, (t + 1) * cpq)

    def slk(t):
        return slice(t * spq, (t + 1) * spq)
    dps = []
    for t, h in ths:
        o = h * head_dim
        v = kv[slk(t), hhd + o:hhd + o + head_dim]
        do = dattn[slq(t), o:o + head_dim]
        dps.append(jax.lax.dot_general(do, v, _AB_T,
                                       preferred_element_type=jnp.float32))
    dss = []
    for (t, h), p, dp, out_h in zip(ths, ps, dps,
                                    [o_.astype(jnp.float32) for o_ in outs]):
        o = h * head_dim
        do = dattn[slq(t), o:o + head_dim]
        dd = jnp.sum(do.astype(jnp.float32) * out_h, axis=-1, keepdims=True)
        dss.append((p * (dp - dd)).astype(dtype))
    dqs, dks, dvs = [], [], []
    for (t, h), p, ds in zip(ths, ps, dss):
        o = h * head_dim
        qh = q[slq(t), o:o + head_dim]
        kh = kv[slk(t), o:o + head_dim]
        do = dattn[slq(t), o:o + head_dim]
        dqs.append((jnp.dot(ds, kh, preferred_element_type=jnp.float32)
                    * scale).astype(dtype))
        dks.append((jax.lax.dot_general(ds, qh, _AT_B,
                                        preferred_element_type=jnp.float32)
                    * scale).astype(dtype))
        dvs.append(jax.lax.dot_general(p.astype(do.dtype), do, _AT_B,
                                       preferred_element_type=jnp.float32
                                       ).astype(dtype))
    dq = jnp.concatenate(
        [jnp.concatenate(dqs[t * heads:(t + 1) * heads], axis=-1)
         for t in range(tile)], axis=0)
    dkv = jnp.concatenate(
        [jnp.concatenate(dks[t * heads:(t + 1) * heads]
                         + dvs[t * heads:(t + 1) * heads], axis=-1)
         for t in range(tile)], axis=0)
    return dq, dkv


def _ln_stats(v32, eps):
    mu = jnp.mean(v32, axis=-1, keepdims=True)
    vc = v32 - mu
    var = jnp.mean(vc * vc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return vc * rstd, rstd


def _ln_qkvo_rect_fwd_kernel(xc_ref, x_ref, g_ref, be_ref, wq_ref, wkv_ref,
                             bq_ref, bkv_ref, wo_ref, bo_ref, o_ref, *, eps,
                             scale, seq_len, heads, head_dim, tile):
    # wq/wkv (and biases) arrive pre-split: in-kernel column slicing of a
    # loaded weight at lane offset H·Hd is not lowerable ("Input offsets
    # outside of the first tile", Mosaic) — the split is free in XLA.
    cpq = xc_ref.shape[1]
    spq = x_ref.shape[1]
    d = x_ref.shape[2]
    hhd = heads * head_dim
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)

    xhat_q, _ = _ln_stats(xc_ref[:].reshape(tile * cpq, d)
                          .astype(jnp.float32), eps)
    xn_q = (xhat_q * g32 + be32).astype(xc_ref.dtype)
    xhat_k, _ = _ln_stats(x_ref[:].reshape(tile * spq, d)
                          .astype(jnp.float32), eps)
    xn_k = (xhat_k * g32 + be32).astype(x_ref.dtype)

    q = (jnp.dot(xn_q, wq_ref[:], preferred_element_type=jnp.float32)
         + bq_ref[:].astype(jnp.float32)).astype(xn_q.dtype)
    kv = (jnp.dot(xn_k, wkv_ref[:], preferred_element_type=jnp.float32)
          + bkv_ref[:].astype(jnp.float32)).astype(xn_k.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (cpq, spq), 1)
    ths = [(t, h) for t in range(tile) for h in range(heads)]
    _, _, attn = _rect_core_recompute(q, kv, ths, cpq, spq, hhd, head_dim,
                                      scale, seq_len, col, tile, heads,
                                      xn_q.dtype)
    y = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
    y = (y + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[:] = y.reshape(tile, cpq, d)


def _ln_qkvo_rect_fwd_int8_kernel(xc_ref, x_ref, g_ref, be_ref, wq8_ref,
                                  swq_ref, wkv8_ref, swkv_ref, bq_ref,
                                  bkv_ref, wo8_ref, swo_ref, bo_ref,
                                  o_ref, *, eps, scale, seq_len, heads,
                                  head_dim, tile):
    """int8 rect forward: same W8A8 projections as the square int8 kernel
    (per-row activation / per-column weight), core bf16/fp32. Row scales of
    the gathered rows equal the square kernel's for those rows, so the
    output is bit-exact vs square-then-gather. Weights arrive pre-split
    (see _ln_qkvo_rect_fwd_kernel)."""
    cpq = xc_ref.shape[1]
    spq = x_ref.shape[1]
    d = x_ref.shape[2]
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    hhd = heads * head_dim

    xhat_q, _ = _ln_stats(xc_ref[:].reshape(tile * cpq, d)
                          .astype(jnp.float32), eps)
    xq_c, sx_c = _quant_rows(xhat_q * g32 + be32)
    xhat_k, _ = _ln_stats(x_ref[:].reshape(tile * spq, d)
                          .astype(jnp.float32), eps)
    xq_k, sx_k = _quant_rows(xhat_k * g32 + be32)

    q = (jax.lax.dot_general(xq_c, wq8_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32
                             ).astype(jnp.float32) * sx_c * swq_ref[:]
         + bq_ref[:].astype(jnp.float32)).astype(xc_ref.dtype)
    kv = (jax.lax.dot_general(xq_k, wkv8_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32
                              ).astype(jnp.float32) * sx_k * swkv_ref[:]
          + bkv_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (cpq, spq), 1)
    ths = [(t, h) for t in range(tile) for h in range(heads)]
    _, _, attn32 = _rect_core_recompute(q, kv, ths, cpq, spq, hhd, head_dim,
                                        scale, seq_len, col, tile, heads,
                                        jnp.float32)
    aq, sa = _quant_rows(attn32)
    y = jax.lax.dot_general(aq, wo8_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * sa * swo_ref[:]
    y = (y + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[:] = y.reshape(tile, cpq, d)


def _ln_qkvo_rect_fwd_int4_kernel(xc_ref, x_ref, g_ref, be_ref, wq4_ref,
                                  swq_ref, wkv4_ref, swkv_ref, bq_ref,
                                  bkv_ref, wo4_ref, swo_ref, bo_ref,
                                  o_ref, *, eps, scale, seq_len, heads,
                                  head_dim, tile):
    """A4W4 rect forward: the Q/KV/out projections on the int4 MXU path
    (core stays bf16/fp32) — the rect analog of _ln_qkvo_fwd_int4_kernel,
    same opt-in accuracy tier (PERF.md)."""
    cpq = xc_ref.shape[1]
    spq = x_ref.shape[1]
    d = x_ref.shape[2]
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    hhd = heads * head_dim

    xhat_q, _ = _ln_stats(xc_ref[:].reshape(tile * cpq, d)
                          .astype(jnp.float32), eps)
    xq_c, sx_c = _quant_rows4(xhat_q * g32 + be32)
    xhat_k, _ = _ln_stats(x_ref[:].reshape(tile * spq, d)
                          .astype(jnp.float32), eps)
    xq_k, sx_k = _quant_rows4(xhat_k * g32 + be32)

    q = (jax.lax.dot_general(xq_c, wq4_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32
                             ).astype(jnp.float32) * sx_c * swq_ref[:]
         + bq_ref[:].astype(jnp.float32)).astype(xc_ref.dtype)
    kv = (jax.lax.dot_general(xq_k, wkv4_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32
                              ).astype(jnp.float32) * sx_k * swkv_ref[:]
          + bkv_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (cpq, spq), 1)
    ths = [(t, h) for t in range(tile) for h in range(heads)]
    _, _, attn32 = _rect_core_recompute(q, kv, ths, cpq, spq, hhd, head_dim,
                                        scale, seq_len, col, tile, heads,
                                        jnp.float32)
    aq, sa = _quant_rows4(attn32)
    y = jax.lax.dot_general(aq, wo4_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * sa * swo_ref[:]
    y = (y + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[:] = y.reshape(tile, cpq, d)


def _ln_qkvo_rect_bwd_kernel(xc_ref, x_ref, g_ref, be_ref, wq_ref, wkv_ref,
                             bq_ref, bkv_ref, wo_ref, do_ref,
                             dxc_ref, dx_ref, dg_ref, dbe_ref, dwq_ref,
                             dwkv_ref, dbq_ref, dbkv_ref, dwo_ref, dbo_ref,
                             *, eps, scale, seq_len, heads, head_dim, tile):
    """Rect backward (bf16): recomputes both LNs + the rect projections +
    core in VMEM, forms dq/dkv, and emits dxc (compacted Q rows) AND dx
    (full KV rows) — the caller's gather transpose scatters dxc back into
    the full row set. dγ/dβ accumulate from BOTH LN row sets (the gathered
    rows legitimately pass through the LN twice: once for Q, once for K/V —
    identical to the square path where both uses share one LN)."""
    i = pl.program_id(0)
    cpq = xc_ref.shape[1]
    spq = x_ref.shape[1]
    d_model = x_ref.shape[2]
    hhd = heads * head_dim
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    do_y = do_ref[:].reshape(tile * cpq, d_model)

    xhat_q, rstd_q = _ln_stats(xc_ref[:].reshape(tile * cpq, d_model)
                               .astype(jnp.float32), eps)
    xn_q32 = xhat_q * g32 + be32
    xn_q = xn_q32.astype(xc_ref.dtype)
    xhat_k, rstd_k = _ln_stats(x_ref[:].reshape(tile * spq, d_model)
                               .astype(jnp.float32), eps)
    xn_k32 = xhat_k * g32 + be32
    xn_k = xn_k32.astype(x_ref.dtype)

    q = (jnp.dot(xn_q, wq_ref[:], preferred_element_type=jnp.float32)
         + bq_ref[:].astype(jnp.float32)).astype(xn_q.dtype)
    kv = (jnp.dot(xn_k, wkv_ref[:], preferred_element_type=jnp.float32)
          + bkv_ref[:].astype(jnp.float32)).astype(xn_k.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (cpq, spq), 1)
    ths = [(t, h) for t in range(tile) for h in range(heads)]
    ps, outs, attn = _rect_core_recompute(q, kv, ths, cpq, spq, hhd,
                                          head_dim, scale, seq_len, col,
                                          tile, heads, xn_q.dtype)

    dattn = jax.lax.dot_general(do_y, wo_ref[:], _AB_T,
                                preferred_element_type=jnp.float32
                                ).astype(xn_q.dtype)
    dwo_part = jax.lax.dot_general(attn, do_y, _AT_B,
                                   preferred_element_type=jnp.float32)
    dbo_part = jnp.sum(do_y.astype(jnp.float32), axis=0)

    dq, dkv = _rect_core_grads(q, kv, ps, outs, dattn, ths, cpq, spq, hhd,
                               head_dim, scale, tile, heads, xn_q.dtype)

    dxn_q = jax.lax.dot_general(dq, wq_ref[:], _AB_T,
                                preferred_element_type=jnp.float32)
    dxn_k = jax.lax.dot_general(dkv, wkv_ref[:], _AB_T,
                                preferred_element_type=jnp.float32)

    def lnbwd(dxn, xhat, rstd):
        dyg = dxn * g32
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
        return rstd * (dyg - m1 - xhat * m2)

    dxc_ref[:] = lnbwd(dxn_q, xhat_q, rstd_q).astype(
        dxc_ref.dtype).reshape(tile, cpq, d_model)
    dx_ref[:] = lnbwd(dxn_k, xhat_k, rstd_k).astype(
        dx_ref.dtype).reshape(tile, spq, d_model)

    dg_part = jnp.sum(dxn_q * xhat_q, axis=0) + jnp.sum(dxn_k * xhat_k,
                                                        axis=0)
    dbe_part = jnp.sum(dxn_q, axis=0) + jnp.sum(dxn_k, axis=0)
    dwq_part = jax.lax.dot_general(xn_q, dq, _AT_B,
                                   preferred_element_type=jnp.float32)
    dwkv_part = jax.lax.dot_general(xn_k, dkv, _AT_B,
                                    preferred_element_type=jnp.float32)
    dbq_part = jnp.sum(dq.astype(jnp.float32), axis=0)
    dbkv_part = jnp.sum(dkv.astype(jnp.float32), axis=0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg_part
        dbe_ref[:] = dbe_part
        dwq_ref[:] = dwq_part
        dwkv_ref[:] = dwkv_part
        dbq_ref[:] = dbq_part
        dbkv_ref[:] = dbkv_part
        dwo_ref[:] = dwo_part
        dbo_ref[:] = dbo_part

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_part
        dbe_ref[:] = dbe_ref[:] + dbe_part
        dwq_ref[:] = dwq_ref[:] + dwq_part
        dwkv_ref[:] = dwkv_ref[:] + dwkv_part
        dbq_ref[:] = dbq_ref[:] + dbq_part
        dbkv_ref[:] = dbkv_ref[:] + dbkv_part
        dwo_ref[:] = dwo_ref[:] + dwo_part
        dbo_ref[:] = dbo_ref[:] + dbo_part


def _ln_qkvo_rect_bwd_int8_kernel(xc_ref, x_ref, g_ref, be_ref, bq_ref,
                                  bkv_ref,
                                  wq8_ref, swq_ref, wkv8_ref, swkv_ref,
                                  wq8r_ref, swqr_ref,
                                  wkv8r_ref, swkvr_ref, wo8r_ref, swor_ref,
                                  do_ref,
                                  dxc_ref, dx_ref, dg_ref, dbe_ref, dwq_ref,
                                  dwkv_ref, dbq_ref, dbkv_ref, dwo_ref,
                                  dbo_ref, *,
                                  eps, scale, seq_len, heads, head_dim,
                                  tile, int8_dw=False, int4_grad=False):
    """int8 rect backward: W8A8 recompute + dL/dx-path projections (dattn,
    dxn_q, dxn_k), bf16 core grads, optional Jetfire-style int8 dW with the
    same row-scale folding as the square kernel (the per-row int8 tensors
    from the dx-path matmuls are reused as dW operands). int4_grad=True
    (caller passes int4 weight forms) drops the recompute + dx-path to
    A4W4; dW stays >=8-bit via direct per-column int8 packs (folding is
    int8-only), core grads stay bf16 — same contract as the square
    kernel."""
    _qr = _quant_rows4 if int4_grad else _quant_rows
    i = pl.program_id(0)
    cpq = xc_ref.shape[1]
    spq = x_ref.shape[1]
    d_model = x_ref.shape[2]
    hhd = heads * head_dim
    g32 = g_ref[:].astype(jnp.float32)
    be32 = be_ref[:].astype(jnp.float32)
    do_y = do_ref[:].reshape(tile * cpq, d_model)

    xhat_q, rstd_q = _ln_stats(xc_ref[:].reshape(tile * cpq, d_model)
                               .astype(jnp.float32), eps)
    xn_q32 = xhat_q * g32 + be32
    xhat_k, rstd_k = _ln_stats(x_ref[:].reshape(tile * spq, d_model)
                               .astype(jnp.float32), eps)
    xn_k32 = xhat_k * g32 + be32

    xq_c, _sxc = _qr(xn_q32)
    xq_k, _sxk = _qr(xn_k32)
    q = (jax.lax.dot_general(xq_c, wq8_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32
                             ).astype(jnp.float32) * _sxc * swq_ref[:]
         + bq_ref[:].astype(jnp.float32)).astype(xc_ref.dtype)
    kv = (jax.lax.dot_general(xq_k, wkv8_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32
                              ).astype(jnp.float32) * _sxk * swkv_ref[:]
          + bkv_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (cpq, spq), 1)
    ths = [(t, h) for t in range(tile) for h in range(heads)]
    ps, outs, attn = _rect_core_recompute(q, kv, ths, cpq, spq, hhd,
                                          head_dim, scale, seq_len, col,
                                          tile, heads, q.dtype)

    doq, sdo = _qr(do_y.astype(jnp.float32))
    dattn32 = jax.lax.dot_general(doq, wo8r_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32
                                  ).astype(jnp.float32) * sdo * swor_ref[:]
    dattn = dattn32.astype(q.dtype)
    if int8_dw and int4_grad:
        attnq, sat = _quant_cols(attn.astype(jnp.float32))
        doqc, sdoc = _quant_cols(do_y.astype(jnp.float32))
        dwo_part = jax.lax.dot_general(
            attnq, doqc, _AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sat[0][:, None] * sdoc[0][None, :]
    elif int8_dw:
        attnq, sat = _quant_cols(attn.astype(jnp.float32) * sdo)
        dwo_part = jax.lax.dot_general(
            attnq, doq, _AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sat[0][:, None]
    else:
        dwo_part = jax.lax.dot_general(attn, do_y, _AT_B,
                                       preferred_element_type=jnp.float32)
    dbo_part = jnp.sum(do_y.astype(jnp.float32), axis=0)

    dq, dkv = _rect_core_grads(q, kv, ps, outs, dattn, ths, cpq, spq, hhd,
                               head_dim, scale, tile, heads, q.dtype)

    dqq, sdq = _qr(dq.astype(jnp.float32))
    dxn_q = jax.lax.dot_general(dqq, wq8r_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * sdq * swqr_ref[:]
    dkvq, sdkv = _qr(dkv.astype(jnp.float32))
    dxn_k = jax.lax.dot_general(dkvq, wkv8r_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * sdkv * swkvr_ref[:]

    def lnbwd(dxn, xhat, rstd):
        dyg = dxn * g32
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
        return rstd * (dyg - m1 - xhat * m2)

    dxc_ref[:] = lnbwd(dxn_q, xhat_q, rstd_q).astype(
        dxc_ref.dtype).reshape(tile, cpq, d_model)
    dx_ref[:] = lnbwd(dxn_k, xhat_k, rstd_k).astype(
        dx_ref.dtype).reshape(tile, spq, d_model)

    dg_part = jnp.sum(dxn_q * xhat_q, axis=0) + jnp.sum(dxn_k * xhat_k,
                                                        axis=0)
    dbe_part = jnp.sum(dxn_q, axis=0) + jnp.sum(dxn_k, axis=0)
    if int8_dw and int4_grad:
        xnq_c, sxn_c = _quant_cols(xn_q32)
        dqqc, sdqc = _quant_cols(dq.astype(jnp.float32))
        dwq_part = jax.lax.dot_general(
            xnq_c, dqqc, _AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sxn_c[0][:, None] * sdqc[0][None, :]
        xnq_k, sxn_k = _quant_cols(xn_k32)
        dkvqc, sdkvc = _quant_cols(dkv.astype(jnp.float32))
        dwkv_part = jax.lax.dot_general(
            xnq_k, dkvqc, _AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sxn_k[0][:, None] * sdkvc[0][None, :]
    elif int8_dw:
        # row-scale folding (square-kernel scheme): reuse dqq/dkvq as the
        # dW operands, folding their row scales into xn before its per-
        # column quantization
        xnq_c, sxn_c = _quant_cols(xn_q32 * sdq)
        dwq_part = jax.lax.dot_general(
            xnq_c, dqq, _AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sxn_c[0][:, None]
        xnq_k, sxn_k = _quant_cols(xn_k32 * sdkv)
        dwkv_part = jax.lax.dot_general(
            xnq_k, dkvq, _AT_B, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sxn_k[0][:, None]
    else:
        dwq_part = jax.lax.dot_general(
            xn_q32.astype(q.dtype), dq, _AT_B,
            preferred_element_type=jnp.float32)
        dwkv_part = jax.lax.dot_general(
            xn_k32.astype(q.dtype), dkv, _AT_B,
            preferred_element_type=jnp.float32)
    dbq_part = jnp.sum(dq.astype(jnp.float32), axis=0)
    dbkv_part = jnp.sum(dkv.astype(jnp.float32), axis=0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = dg_part
        dbe_ref[:] = dbe_part
        dwq_ref[:] = dwq_part
        dwkv_ref[:] = dwkv_part
        dbq_ref[:] = dbq_part
        dbkv_ref[:] = dbkv_part
        dwo_ref[:] = dwo_part
        dbo_ref[:] = dbo_part

    @pl.when(i > 0)
    def _():
        dg_ref[:] = dg_ref[:] + dg_part
        dbe_ref[:] = dbe_ref[:] + dbe_part
        dwq_ref[:] = dwq_ref[:] + dwq_part
        dwkv_ref[:] = dwkv_ref[:] + dwkv_part
        dbq_ref[:] = dbq_ref[:] + dbq_part
        dbkv_ref[:] = dbkv_ref[:] + dbkv_part
        dwo_ref[:] = dwo_ref[:] + dwo_part
        dbo_ref[:] = dbo_ref[:] + dbo_part


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16))
def fused_ln_qkvo_attention_rect(xc, x, gamma, beta, wqkv, bqkv, wo, bo,
                                 eps, seq_len, heads, head_dim, int8=False,
                                 int8_grad=False, int8_dw=False, int4=False,
                                 int4_grad=False):
    """Rect attention half for token compaction: Q / core rows / out-proj
    on the compacted rows xc [B, CPQ, D] (pad rows zero-filled), K/V on the
    full rows x [B, SPQ, D]. Returns the attention-half output for the
    COMPACTED rows [B, CPQ, D], WITHOUT residual. Same int8/int4 tiers as
    fused_ln_qkvo_attention (incl. int4_grad's A4W4 backward dx-path);
    bit-exact vs square-then-gather."""
    scale = 1.0 / math.sqrt(head_dim)
    b, cpq, d = xc.shape
    spq = x.shape[1]
    hhd = heads * head_dim
    tile = _qkvo_tile(b, spq)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    blk = lambda rows: pl.BlockSpec((tile, rows, d), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    # wq/wkv (and their biases/scales) are split OUTSIDE the kernel: the
    # in-kernel column slice at lane offset hhd is not lowerable ("Input
    # offsets outside of the first tile" — captured Mosaic error).
    wq, wkv = wqkv[:, :hhd], wqkv[:, hhd:]
    bq, bkv = bqkv[:hhd], bqkv[hhd:]
    wqspec = pl.BlockSpec((d, hhd), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    wkvspec = pl.BlockSpec((d, 2 * hhd), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    wospec = pl.BlockSpec((hhd, d), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    if int4 or int8:
        quant = _quant_cols_host4 if int4 else _quant_cols_host
        kern = (_ln_qkvo_rect_fwd_int4_kernel if int4
                else _ln_qkvo_rect_fwd_int8_kernel)
        wq8, swq = quant(wq)
        wkv8, swkv = quant(wkv)
        wo8, swo = quant(wo)
        return pl.pallas_call(
            functools.partial(kern, eps=eps,
                              scale=scale, seq_len=seq_len, heads=heads,
                              head_dim=head_dim, tile=tile),
            grid=(b // tile,),
            in_specs=[
                blk(cpq), blk(spq), vec(d), vec(d),
                wqspec, vec(hhd), wkvspec, vec(2 * hhd),
                vec(hhd), vec(2 * hhd),
                wospec, vec(d), vec(d),
            ],
            out_specs=blk(cpq),
            out_shape=jax.ShapeDtypeStruct((b, cpq, d), xc.dtype),
            interpret=_INTERPRET,
            **_VMEM_LIMIT,
        )(xc, x, gamma, beta, wq8, swq, wkv8, swkv, bq, bkv, wo8, swo, bo)
    return pl.pallas_call(
        functools.partial(_ln_qkvo_rect_fwd_kernel, eps=eps, scale=scale,
                          seq_len=seq_len, heads=heads, head_dim=head_dim,
                          tile=tile),
        grid=(b // tile,),
        in_specs=[
            blk(cpq), blk(spq), vec(d), vec(d),
            wqspec, wkvspec, vec(hhd), vec(2 * hhd),
            wospec, vec(d),
        ],
        out_specs=blk(cpq),
        out_shape=jax.ShapeDtypeStruct((b, cpq, d), xc.dtype),
        interpret=_INTERPRET,
        **_VMEM_LIMIT,
    )(xc, x, gamma, beta, wq, wkv, bq, bkv, wo, bo)


def _fused_ln_qkvo_rect_fwd(xc, x, gamma, beta, wqkv, bqkv, wo, bo,
                            eps, seq_len, heads, head_dim, int8=False,
                            int8_grad=False, int8_dw=False, int4=False,
                            int4_grad=False):
    out = fused_ln_qkvo_attention_rect(xc, x, gamma, beta, wqkv, bqkv, wo,
                                       bo, eps, seq_len, heads, head_dim,
                                       int8, int8_grad, int8_dw, int4,
                                       int4_grad)
    return out, (xc, x, gamma, beta, wqkv, bqkv, wo)


def _fused_ln_qkvo_rect_bwd(eps, seq_len, heads, head_dim, int8, int8_grad,
                            int8_dw, int4, int4_grad, res, do):
    # int4 applies to the forward projections; int4_grad additionally
    # drops the backward recompute + dx-path to A4W4 (same contract as
    # the square kernel — dW >=8-bit, core grads bf16).
    xc, x, gamma, beta, wqkv, bqkv, wo = res
    scale = 1.0 / math.sqrt(head_dim)
    b, cpq, d = xc.shape
    spq = x.shape[1]
    hhd = heads * head_dim
    tile = _qkvo_bwd_tile(b, spq)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    blk = lambda rows: pl.BlockSpec((tile, rows, d), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    wqspec = pl.BlockSpec((d, hhd), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    wkvspec = pl.BlockSpec((d, 2 * hhd), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    wospec = pl.BlockSpec((hhd, d), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    wq, wkv = wqkv[:, :hhd], wqkv[:, hhd:]
    bq, bkv = bqkv[:hhd], bqkv[hhd:]
    out_shapes = (jax.ShapeDtypeStruct((b, cpq, d), xc.dtype),
                  jax.ShapeDtypeStruct((b, spq, d), x.dtype),
                  jax.ShapeDtypeStruct((d,), jnp.float32),
                  jax.ShapeDtypeStruct((d,), jnp.float32),
                  jax.ShapeDtypeStruct((d, hhd), jnp.float32),
                  jax.ShapeDtypeStruct((d, 2 * hhd), jnp.float32),
                  jax.ShapeDtypeStruct((hhd,), jnp.float32),
                  jax.ShapeDtypeStruct((2 * hhd,), jnp.float32),
                  jax.ShapeDtypeStruct((hhd, d), jnp.float32),
                  jax.ShapeDtypeStruct((d,), jnp.float32))
    out_specs = (blk(cpq), blk(spq), vec(d), vec(d), wqspec, wkvspec,
                 vec(hhd), vec(2 * hhd), wospec, vec(d))
    if int8 and int8_grad:
        qc = _quant_cols_host4 if int4_grad else _quant_cols_host
        qr = _quant_rows_host4 if int4_grad else _quant_rows_host
        wq8, swq = qc(wq)
        wkv8, swkv = qc(wkv)
        wq8r, swqr = qr(wq)
        wkv8r, swkvr = qr(wkv)
        wo8r, swor = qr(wo)
        outs = pl.pallas_call(
            functools.partial(_ln_qkvo_rect_bwd_int8_kernel, eps=eps,
                              scale=scale, seq_len=seq_len, heads=heads,
                              head_dim=head_dim, tile=tile,
                              int8_dw=int8_dw, int4_grad=int4_grad),
            grid=(b // tile,),
            in_specs=[
                blk(cpq), blk(spq), vec(d), vec(d), vec(hhd), vec(2 * hhd),
                wqspec, vec(hhd), wkvspec, vec(2 * hhd),
                wqspec, vec(d),
                wkvspec, vec(d),
                wospec, vec(hhd),
                blk(cpq),
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=_INTERPRET,
            **_VMEM_LIMIT,
        )(xc, x, gamma, beta, bq, bkv, wq8, swq, wkv8, swkv, wq8r, swqr,
          wkv8r, swkvr, wo8r, swor, do)
    else:
        outs = pl.pallas_call(
            functools.partial(_ln_qkvo_rect_bwd_kernel, eps=eps,
                              scale=scale, seq_len=seq_len, heads=heads,
                              head_dim=head_dim, tile=tile),
            grid=(b // tile,),
            in_specs=[
                blk(cpq), blk(spq), vec(d), vec(d), wqspec, wkvspec,
                vec(hhd), vec(2 * hhd), wospec, blk(cpq),
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=_INTERPRET,
            **_VMEM_LIMIT,
        )(xc, x, gamma, beta, wq, wkv, bq, bkv, wo, do)
    dxc, dx, dg, dbe, dwq, dwkv, dbq, dbkv, dwo, dbo = outs
    return (dxc, dx, dg.astype(gamma.dtype), dbe.astype(beta.dtype),
            jnp.concatenate([dwq, dwkv], axis=1).astype(wqkv.dtype),
            jnp.concatenate([dbq, dbkv]).astype(bqkv.dtype),
            dwo.astype(wo.dtype), dbo)


fused_ln_qkvo_attention_rect.defvjp(_fused_ln_qkvo_rect_fwd,
                                    _fused_ln_qkvo_rect_bwd)
