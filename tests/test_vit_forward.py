"""Smoke + structural tests for the standard ViT forward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitax.core.config import ViTConfig, arch_config
from vitax.models import vit

TINY = ViTConfig(image_size=(64, 64), patch_size=(16, 16), emb_dim=96,
                 mlp_dim=192, num_heads=3, num_layers=2, num_classes=10,
                 dropout_rate=0.0, dtype=jnp.float32, use_pallas=False)


def test_forward_shape():
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    logits = vit.apply(params, x, TINY)
    assert logits.shape == (2, 10)
    assert jnp.isfinite(logits).all()


def test_forward_jit_matches_eager():
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    eager = vit.apply(params, x, TINY)
    jitted = jax.jit(lambda p, x: vit.apply(p, x, TINY))(params, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               rtol=1e-5, atol=1e-5)


def test_dropout_train_vs_eval():
    cfg = TINY.replace(dropout_rate=0.5)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    eval_logits = vit.apply(params, x, cfg, train=False)
    train_logits = vit.apply(params, x, cfg, train=True,
                             rng=jax.random.PRNGKey(2))
    # dropout must change the output in train mode
    assert not np.allclose(np.asarray(eval_logits), np.asarray(train_logits))
    # and be deterministic given the same rng
    train_logits2 = vit.apply(params, x, cfg, train=True,
                              rng=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(train_logits),
                               np.asarray(train_logits2), rtol=1e-6)


def test_remat_matches():
    cfg = TINY.replace(remat=True)
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    a = vit.apply(params, x, TINY)
    b = vit.apply(params, x, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_reinit_classifier():
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    new = vit.reinit_classifier(params, jax.random.PRNGKey(3), 33)
    assert new["classifier"]["kernel"].shape == (96, 33)
    assert new["classifier"]["bias"].shape == (33,)


@pytest.mark.parametrize("arch,depth,dim", [("b16", 12, 768), ("h14", 32, 1280)])
def test_arch_presets(arch, depth, dim):
    cfg = arch_config(arch)
    assert cfg.num_layers == depth and cfg.emb_dim == dim
    assert cfg.dropout_rate == 0.0 and cfg.attn_dropout_rate == 0.0


def test_h14_seq_len():
    cfg = arch_config("h14", image_size=384)
    assert cfg.seq_len == 730  # (384/14)^2 + 1, SURVEY §5 long-context note


def test_npz_roundtrip(tmp_path):
    from vitax.checkpointing import load_npz_params, save_npz_params
    params = vit.init_params(jax.random.PRNGKey(0), TINY)
    path = str(tmp_path / "ckpt.npz")
    save_npz_params(path, jax.tree.map(np.asarray, params))
    loaded = load_npz_params(path, TINY)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 params, loaded)
