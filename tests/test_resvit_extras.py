"""Res-ViT coverage beyond the golden-parity tests: GQA repeat_kv, position-
embedding length mismatch, train-step convergence, router straight-through
gradients, big-arch config smoke."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, requires_reference
from vitax.core.config import ResViTConfig, arch_config, resvit_arch_config
from vitax.models import resvit


def tiny_cfg(**kw):
    base = dict(dim=48, mlp_dim=96, n_layers=4, n_heads=4, n_kv_heads=4,
                lora_rank=4, dynamic_start_layer=1, dynamic_router_hdim=32,
                dynamic_reserve_initials=1, low_rank_dim=8, block_size=1,
                use_lora=False, use_reslr=True, image_size=(32, 32),
                patch_size=(16, 16), num_classes=7, dropout=0.0,
                dtype=jnp.float32, param_dtype=jnp.float32, use_pallas=False)
    base.update(kw)
    return ResViTConfig(**base)


@requires_reference
def test_gqa_repeat_kv_parity():
    """n_kv_heads < n_heads exercises repeat_kv (res-vit scaffolding,
    res-vit/model.py:220-223,281-282)."""
    sys.path.insert(0, f"{REFERENCE_DIR}/res-vit")
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_resvit_model_gqa", f"{REFERENCE_DIR}/res-vit/model.py")
    ref = importlib.util.module_from_spec(spec)
    sys.modules["ref_resvit_model_gqa"] = ref
    spec.loader.exec_module(ref)

    from vitax.checkpointing.resvit_convert import \
        resvit_params_from_torch_state_dict

    cfg = tiny_cfg(n_kv_heads=2, use_reslr=False)
    args = ref.ModelArgs(dim=cfg.dim, mlp_dim=cfg.mlp_dim,
                         n_layers=cfg.n_layers, n_heads=cfg.n_heads,
                         n_kv_heads=2, use_lora=False, use_reslr=False,
                         image_size=cfg.image_size,
                         patch_size=cfg.patch_size,
                         num_classes=cfg.num_classes, dropout=0.0,
                         device="cpu")
    torch.manual_seed(0)
    tmodel = ref.Transformer(args)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = resvit_params_from_torch_state_dict(sd, cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    labels = rng.randint(0, 7, 2)
    with torch.no_grad():
        tmodel(torch.from_numpy(x), torch.from_numpy(labels))
        ref_logits = tmodel.logits.numpy()
    logits, _ = resvit.apply_nchw(jax.tree.map(jnp.asarray, params),
                                  jnp.asarray(x), cfg, train=False)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=1e-4, atol=1e-4)


def test_pos_embedding_length_mismatch():
    """res-vit PositionEmbs truncates on mismatch (res-vit/model.py:93-97):
    loading pos-embeddings for a longer grid must still work."""
    cfg = tiny_cfg()
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    # simulate a checkpoint with a longer pos table (e.g. 384px pretrain)
    longer = jax.random.normal(jax.random.PRNGKey(1), (1, 100, cfg.dim))
    params["pos_embedding"] = longer
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    logits, _ = resvit.apply(params, x, cfg, train=False)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_router_gradient_paths():
    """Faithful-behavior check: in the reference the where-merge uses boolean
    `torch.isin` masks (res-vit/model.py:470-472,487), so the classification
    loss feeds NO gradient to the router — the router trains only through
    the active (ratio) loss on soft probs (res-vit/model.py:684-689). vitax
    reproduces exactly that gradient structure."""
    cfg = tiny_cfg()
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    labels = jnp.asarray([0, 1])

    def ce_loss(params):
        logits, aux = resvit.apply(params, x, cfg, train=True,
                                   rng=jax.random.PRNGKey(2))
        from vitax.train.steps import cross_entropy
        return cross_entropy(logits, labels)

    def a_loss(params):
        _, aux = resvit.apply(params, x, cfg, train=True,
                              rng=jax.random.PRNGKey(2))
        return resvit.active_loss(aux["soft_probs"], 0.4,
                                  cfg.dynamic_reserve_initials)

    g_ce = jax.grad(ce_loss)(params)["layers"][1]["router"]["out3"]["kernel"]
    g_a = jax.grad(a_loss)(params)["layers"][1]["router"]["out3"]["kernel"]
    assert float(jnp.abs(g_ce).sum()) == 0.0  # reference quirk preserved
    assert float(jnp.abs(g_a).sum()) > 0.0    # ratio loss trains the router


def test_resvit_training_reduces_loss():
    cfg = tiny_cfg(dynamic_active_target=0.5)
    from vitax.train.resvit_steps import (Lambdas, create_state,
                                          make_adamw_for, make_train_step)
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_adamw_for(cfg, params, lambda _: 3e-3)
    state = create_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, Lambdas(), donate=False)
    key = jax.random.PRNGKey(2)
    images = jax.random.normal(key, (8, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (8,), 0, 7)
    first = None
    for i in range(12):
        state, metrics = step(state, images, labels)
        if first is None:
            first = float(metrics["c_loss"])
    assert float(metrics["c_loss"]) < first
    # activation metric is a valid ratio
    assert 0.0 <= float(metrics["non_low_rank_ratio"]) <= 1.0


@pytest.mark.parametrize("arch,image", [("l16", 32), ("h14", 28)])
def test_big_arch_config_shapes(arch, image):
    """l16/h14 presets construct and trace (SURVEY §7 step 7); h14@28
    exercises the 14px patch grid."""
    cfg = arch_config(arch, image_size=image, num_classes=5,
                      dtype=jnp.float32, use_pallas=False, remat=True)
    from vitax.models import vit
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    out = jax.eval_shape(lambda p, x: vit.apply(p, x, cfg), params,
                         jnp.zeros((2, image, image, 3)))
    assert out.shape == (2, 5)


def test_lra_debug_report():
    """The reference's sakura.py debug script (prints the LRA mask) becomes
    a real assertion set (SURVEY §2.2 'Debug script' row)."""
    from vitax.models.resvit_utils import lra_path_ids
    out = lra_path_ids(1)
    assert out == [([0], [1], [])]


def test_gumbel_st_sampling_distribution():
    """Gumbel-max property: the router's hard train-time decisions must be
    distributed as softmax(logits) — the same law as torch's
    F.gumbel_softmax(tau=1, hard=True) (res-vit/model.py:199-200)."""
    cfg = tiny_cfg()
    params = resvit.init_params(jax.random.PRNGKey(0), cfg)
    # bias the router so keep-prob is a nontrivial, known value
    rp = params["layers"][1]["router"]
    rp["out3"]["kernel"] = jnp.zeros_like(rp["out3"]["kernel"])
    rp["out3"]["bias"] = jnp.asarray([0.0, 1.0], jnp.float32)  # block_size 1
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, cfg.dim))

    expect_keep = float(jax.nn.softmax(jnp.asarray([0.0, 1.0]))[1])
    keeps = []
    for t in range(300):
        hard, *_ = resvit.router_forward(
            x, rp, cfg, train=True, rng=jax.random.PRNGKey(100 + t))
        keeps.append(np.asarray(hard[:, cfg.dynamic_reserve_initials:, :, 1]))
    freq = float(np.mean(keeps))
    assert abs(freq - expect_keep) < 0.03, (freq, expect_keep)


def test_resvit_eval_cli_compact_flag(tmp_path):
    from vitax import resvit_eval_cli
    result = resvit_eval_cli.main([
        "--dataset", "Synthetic", "--model-arch", "tiny",
        "--image-size", "32", "--batch-size", "8",
        "--synthetic-samples", "32", "--num-workers", "0",
        "--dtype", "float32", "--no-pallas",
        "--use_lora", "False", "--use_reslr", "True",
        "--dynamic_start_layer", "1", "--block_size", "1",
        "--dynamic_router_hdim", "32", "--low_rank_dim", "8",
        "--n_heads", "3", "--n_kv_heads", "3",
        "--compact-capacity", "0.8"])
    assert "acc1" in result
