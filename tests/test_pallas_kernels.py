"""Pallas kernel unit tests vs the jnp reference implementations.

Run in interpreter mode on CPU (SURVEY §4: "unit tests per kernel vs jnp
reference impls"). Forward AND backward (custom VJP) must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitax.ops import pallas_kernels as pk
from vitax.ops.attention import mha_ref
from vitax.ops.layernorm import layer_norm_ref


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


def test_attention_forward_matches_ref():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    shape = (2, 197, 3, 64)  # b16 @224 sequence length
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    out = pk.flash_attention(q, k, v)
    ref = mha_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_attention_forward_aligned_seq():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    shape = (1, 256, 2, 64)  # no padding path
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    np.testing.assert_allclose(np.asarray(pk.flash_attention(q, k, v)),
                               np.asarray(mha_ref(q, k, v)),
                               rtol=2e-5, atol=2e-5)


def test_attention_grads_match_ref():
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 3)
    shape = (2, 130, 2, 32)  # padded seq exercises masking in bwd
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)

    def loss_pallas(q, k, v):
        return jnp.sum(jnp.sin(pk.flash_attention(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_ref(q, k, v)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_attention_bf16():
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 3)
    shape = (2, 197, 2, 64)
    q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)
    out = pk.flash_attention(q, k, v)
    ref = mha_ref(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_attention_supported_gate():
    x = jnp.zeros((1, 197, 3, 64))
    assert pk.attention_supported(x, x, x)
    big = jnp.zeros((1, 2048, 3, 64))
    assert not pk.attention_supported(big, big, big)


def test_layernorm_forward_matches_ref():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (4, 197, 128), jnp.float32) * 3 + 1
    g = jax.random.normal(jax.random.fold_in(key, 1), (128,))
    b = jax.random.normal(jax.random.fold_in(key, 2), (128,))
    out = pk.layer_norm(x, g, b, 1e-5)
    ref = layer_norm_ref(x, g, b, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_layernorm_grads_match_ref():
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (600, 128), jnp.float32)  # 2 row-blocks
    g = jax.random.normal(jax.random.fold_in(key, 1), (128,))
    b = jax.random.normal(jax.random.fold_in(key, 2), (128,))

    def loss_pallas(x, g, b):
        return jnp.sum(jnp.cos(pk.layer_norm(x, g, b, 1e-5)))

    def loss_ref(x, g, b):
        return jnp.sum(jnp.cos(layer_norm_ref(x, g, b, 1e-5)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_layernorm_supported_gate():
    assert pk.layernorm_supported(jnp.zeros((4, 128)))
    assert not pk.layernorm_supported(jnp.zeros((4, 100)))
