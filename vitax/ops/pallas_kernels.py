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
  traffic is what caps the pure-XLA step). Forward saves the row logsumexp;
  the custom-VJP backward recomputes P in VMEM and emits dQ/dK/dV directly.
  Replaces the reference attention math (src/model.py:83-101,
  res-vit/model.py:288-292) with identical fp32-softmax numerics.

* `layer_norm` — row-tiled LN with fp32 statistics, custom VJP; dγ/dβ are
  accumulated across row-blocks in the kernel (TPU grid steps execute
  sequentially, so read-modify-write accumulation on the output block is
  race-free). Replaces nn.LayerNorm (src/model.py:108,114,146).

Padding: sequence is padded to the 128-lane boundary in the wrappers; padded
KV columns are masked to -1e30 before softmax, padded Q rows are sliced off
(their gradient contribution is zero because the cotangent is zero-padded).
"""

from __future__ import annotations

import functools
import math

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


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, seq_len):
    q = q_ref[0].astype(jnp.float32)            # [SP, Hd]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    sp = q.shape[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    if seq_len < sp:  # mask padded KV columns
        col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
        s = jnp.where(col < seq_len, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom
    lse_ref[0] = (m + jnp.log(denom))[:, 0]
    o_ref[0] = jnp.dot(p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale, seq_len):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, None]
    sp = q.shape[0]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    if seq_len < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
        s = jnp.where(col < seq_len, s, -1e30)
    p = jnp.exp(s - lse)                        # [SP, SP]

    dv = jnp.dot(p.T, do, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    d = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - d)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bh_spec(sp, hd):
    return pl.BlockSpec((1, sp, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _lse_spec(sp):
    return pl.BlockSpec((1, sp), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _attn_fwd(q, k, v, scale, seq_len):
    bh, sp, hd = q.shape
    out, lse = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, seq_len=seq_len),
        grid=(bh,),
        in_specs=[_bh_spec(sp, hd)] * 3,
        out_specs=(_bh_spec(sp, hd), _lse_spec(sp)),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((bh, sp), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sp * sp * hd, transcendentals=bh * sp * sp,
            bytes_accessed=4 * bh * sp * hd * q.dtype.itemsize),
        interpret=_INTERPRET,
    )(q, k, v)
    return out, lse


def _attn_bwd(scale, seq_len, residuals, do):
    q, k, v, out, lse = residuals
    bh, sp, hd = q.shape
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, seq_len=seq_len),
        grid=(bh,),
        in_specs=[_bh_spec(sp, hd)] * 4 + [_lse_spec(sp), _bh_spec(sp, hd)],
        out_specs=(_bh_spec(sp, hd),) * 3,
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),) * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * sp * sp * hd, transcendentals=bh * sp * sp,
            bytes_accessed=8 * bh * sp * hd * q.dtype.itemsize),
        interpret=_INTERPRET,
    )(q, k, v, out, lse, do)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_bh(q, k, v, scale, seq_len):
    return _attn_fwd(q, k, v, scale, seq_len)[0]


def _attention_bh_fwd(q, k, v, scale, seq_len):
    out, lse = _attn_fwd(q, k, v, scale, seq_len)
    return out, (q, k, v, out, lse)


_attention_bh.defvjp(_attention_bh_fwd, _attn_bwd)


def flash_attention(q, k, v):
    """[B,S,H,Hd]³ → [B,S,H,Hd]; fp32 softmax, scale = Hd^-0.5."""
    b, s, h, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    sp = _round_up(s, 128)

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, hd)
        if sp != s:
            x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
        return x

    out = _attention_bh(prep(q), prep(k), prep(v), scale, s)
    out = out[:, :s].reshape(b, h, s, hd)
    return jnp.transpose(out, (0, 2, 1, 3))


# =============================================================================
# LayerNorm
# =============================================================================

_LN_BLOCK_ROWS = 512


def layernorm_supported(x) -> bool:
    d = x.shape[-1]
    return x.ndim >= 2 and d % 128 == 0 and d <= 8192


def _ln_fwd_kernel(x_ref, g_ref, b_ref, y_ref, mu_ref, rstd_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    y = xhat * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    mu_ref[:] = mu[:, 0]
    rstd_ref[:] = rstd[:, 0]


def _ln_bwd_kernel(x_ref, g_ref, mu_ref, rstd_ref, dy_ref,
                   dx_ref, dg_ref, db_ref, *, total_rows, block_rows):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    mu = mu_ref[:][:, None]
    rstd = rstd_ref[:][:, None]
    xhat = (x - mu) * rstd

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
    y, mu, rstd = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((n,), jnp.float32),
                   jax.ShapeDtypeStruct((n,), jnp.float32)),
        interpret=_INTERPRET,
    )(x2, gamma, beta)
    return y, mu, rstd


def _ln_bwd_call(x2, gamma, mu, rstd, dy2):
    n, d = x2.shape
    rows = min(_LN_BLOCK_ROWS, n)
    grid = (pl.cdiv(n, rows),)
    dx, dg, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, total_rows=n, block_rows=rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows,), lambda i: (i,), memory_space=pltpu.VMEM),
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
    )(x2, gamma, mu, rstd, dy2)
    return dx, dg, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_2d(x2, gamma, beta, eps):
    return _ln_fwd(x2, gamma, beta, eps)[0]


def _layer_norm_2d_fwd(x2, gamma, beta, eps):
    y, mu, rstd = _ln_fwd(x2, gamma, beta, eps)
    return y, (x2, gamma, mu, rstd)


def _layer_norm_2d_bwd(eps, residuals, dy2):
    x2, gamma, mu, rstd = residuals
    dx, dg, db = _ln_bwd_call(x2, gamma, mu, rstd, dy2)
    return dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


_layer_norm_2d.defvjp(_layer_norm_2d_fwd, _layer_norm_2d_bwd)


def layer_norm(x, scale, bias, eps):
    """LN over the last dim, fp32 statistics; any leading shape."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    y = _layer_norm_2d(x.reshape(-1, d), scale, bias, eps)
    return y.reshape(*lead, d)


# =============================================================================
# Fused MLP — not yet a kernel: XLA already fuses bias+GELU into the matmul
# epilogues on TPU; measured before building (SURVEY §7 step 5 order).
# =============================================================================

def mlp_supported(x, w1, w2) -> bool:
    return False


def fused_mlp(x, w1, b1, w2, b2):  # pragma: no cover - gated off
    raise NotImplementedError
