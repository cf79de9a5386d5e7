"""Token-compaction inference: exact match to the dense path when capacity
covers all active tokens; graceful capacity-drop otherwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitax.core.config import ResViTConfig
from vitax.models import resvit, resvit_compact


def cfg_(**kw):
    base = dict(dim=48, mlp_dim=96, n_layers=4, n_heads=4, n_kv_heads=4,
                lora_rank=4, dynamic_start_layer=1, dynamic_router_hdim=32,
                dynamic_reserve_initials=1, low_rank_dim=8, block_size=1,
                use_lora=False, use_reslr=True, image_size=(32, 32),
                patch_size=(8, 8), num_classes=7, dropout=0.0,
                dtype=jnp.float32, param_dtype=jnp.float32, use_pallas=False)
    base.update(kw)
    return ResViTConfig(**base)


def _randomized_router(params, cfg, key):
    """Randomize router final bias so routing is non-trivial."""
    for lid, role in enumerate(resvit.layer_roles(cfg)):
        if role.get("is_block_head"):
            k = jax.random.fold_in(key, lid)
            params["layers"][lid]["router"]["out3"]["bias"] = \
                jax.random.uniform(k, (cfg.block_size * 2,), jnp.float32,
                                   -0.3, 0.3)
    return params


def test_full_capacity_matches_dense():
    cfg = cfg_()
    params = _randomized_router(
        resvit.init_params(jax.random.PRNGKey(0), cfg), cfg,
        jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    dense_logits, dense_aux = resvit.apply(params, x, cfg, train=False)
    comp_logits, comp_aux = resvit_compact.apply_compact(params, x, cfg,
                                                         capacity=1.0)
    np.testing.assert_allclose(np.asarray(comp_logits),
                               np.asarray(dense_logits), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp_aux["acts"]),
                               np.asarray(dense_aux["acts"]), atol=0)


def test_capacity_covers_active_matches_dense():
    """With capacity ≥ max active fraction, compaction is exact."""
    cfg = cfg_()
    params = _randomized_router(
        resvit.init_params(jax.random.PRNGKey(2), cfg), cfg,
        jax.random.PRNGKey(10))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    _, dense_aux = resvit.apply(params, x, cfg, train=False)
    max_active = float(np.asarray(dense_aux["acts"]).mean(axis=(1,)).max())
    capacity = min(1.0, max_active + 0.3)
    dense_logits, _ = resvit.apply(params, x, cfg, train=False)
    comp_logits, _ = resvit_compact.apply_compact(params, x, cfg,
                                                  capacity=capacity)
    np.testing.assert_allclose(np.asarray(comp_logits),
                               np.asarray(dense_logits), rtol=1e-4, atol=1e-5)


def test_low_capacity_still_finite_and_jits():
    cfg = cfg_()
    params = resvit.init_params(jax.random.PRNGKey(4), cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
    f = jax.jit(lambda p, x: resvit_compact.apply_compact(p, x, cfg,
                                                          capacity=0.4))
    logits, aux = f(params, x)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()
    assert aux["capacity"] <= 0.45


def test_rejects_without_reslr():
    cfg = cfg_(use_reslr=False)
    params = resvit.init_params(jax.random.PRNGKey(6), cfg)
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError):
        resvit_compact.apply_compact(params, x, cfg)
