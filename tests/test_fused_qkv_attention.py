"""Fused QKV+attention kernel vs the unfused reference math (fwd + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitax.ops import pallas_kernels as pk
from vitax.ops.attention import mha_ref


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


def _ref(xhat, wqkv, bqkv, seq_len, heads, head_dim):
    """Unfused reference: qkv matmul + per-head attention, numpy-style."""
    b, spq, d = xhat.shape
    hhd = heads * head_dim
    qkv = jnp.einsum("bsd,dk->bsk", xhat, wqkv,
                     preferred_element_type=jnp.float32) + bqkv
    qkv = qkv.astype(xhat.dtype)
    q = qkv[..., :hhd].reshape(b, spq, heads, head_dim)
    k = qkv[..., hhd:2 * hhd].reshape(b, spq, heads, head_dim)
    v = qkv[..., 2 * hhd:].reshape(b, spq, heads, head_dim)
    # mask padded rows out of the KV set like the kernel does
    if seq_len < spq:
        scale = 1.0 / (head_dim ** 0.5)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        col = jnp.arange(spq)
        scores = jnp.where(col[None, None, None, :] < seq_len, scores, -1e30)
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(xhat.dtype)
    else:
        out = mha_ref(q, k, v)
    return out.reshape(b, spq, hhd)


def _setup(seq_len=40, spq=40, heads=3, head_dim=32, d=128, b=2):
    key = jax.random.PRNGKey(0)
    xhat = jax.random.normal(key, (b, spq, d), jnp.float32)
    wqkv = jax.random.normal(jax.random.fold_in(key, 1),
                             (d, 3 * heads * head_dim), jnp.float32) * 0.05
    bqkv = jax.random.normal(jax.random.fold_in(key, 2),
                             (3 * heads * head_dim,), jnp.float32) * 0.1
    return xhat, wqkv, bqkv


def test_forward_matches_unfused():
    xhat, wqkv, bqkv = _setup()
    out = pk.fused_qkv_attention(xhat, wqkv, bqkv, 40, 3, 32)
    ref = _ref(xhat, wqkv, bqkv, 40, 3, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_with_padded_rows():
    xhat, wqkv, bqkv = _setup(seq_len=33, spq=40)
    out = pk.fused_qkv_attention(xhat, wqkv, bqkv, 33, 3, 32)
    ref = _ref(xhat, wqkv, bqkv, 33, 3, 32)
    np.testing.assert_allclose(np.asarray(out)[:, :33],
                               np.asarray(ref)[:, :33],
                               rtol=2e-5, atol=2e-5)


def test_grads_match_unfused():
    xhat, wqkv, bqkv = _setup(seq_len=33, spq=40)

    def pad_cotangent(f):
        def loss(x, w, bv):
            out = f(x, w, bv)
            return jnp.sum(jnp.sin(out[:, :33]))  # zero cotangent on pad rows
        return loss

    lp = pad_cotangent(lambda x, w, bv: pk.fused_qkv_attention(
        x, w, bv, 33, 3, 32))
    lr = pad_cotangent(lambda x, w, bv: _ref(x, w, bv, 33, 3, 32))
    gp = jax.grad(lp, argnums=(0, 1, 2))(xhat, wqkv, bqkv)
    gr = jax.grad(lr, argnums=(0, 1, 2))(xhat, wqkv, bqkv)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a)[np.isfinite(np.asarray(a))],
                                   np.asarray(b)[np.isfinite(np.asarray(b))],
                                   rtol=2e-4, atol=2e-4)


def test_fused_model_path_matches_standard():
    """fused_qkv=True model output and gradients equal the standard path."""
    from vitax.core.config import ViTConfig
    from vitax.models import vit

    base = dict(image_size=(32, 32), patch_size=(16, 16), emb_dim=128,
                mlp_dim=256, num_heads=4, num_layers=2, num_classes=10,
                dropout_rate=0.0, dtype=jnp.float32, use_pallas=False)
    p = vit.init_params(jax.random.PRNGKey(0), ViTConfig(**base))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    std = vit.apply(p, x, ViTConfig(**base))
    fused = vit.apply(p, x, ViTConfig(**base, fused_qkv=True))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(std),
                               rtol=2e-4, atol=2e-4)
    g1 = jax.grad(lambda p: jnp.sum(vit.apply(p, x, ViTConfig(**base)) ** 2))(p)
    g2 = jax.grad(lambda p: jnp.sum(
        vit.apply(p, x, ViTConfig(**base, fused_qkv=True)) ** 2))(p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_model_under_dp_mesh_matches_single_device():
    """The fused kernel must compose with SPMD batch sharding: DP-8 training
    equals single-device (XLA partitions around the pallas_call)."""
    from vitax.core.config import ViTConfig
    from vitax.models import vit
    from vitax.parallel import mesh as pmesh
    from vitax.train import (create_train_state, make_train_step,
                             onecycle_lr, onecycle_momentum, sgd_momentum)

    base = dict(image_size=(32, 32), patch_size=(16, 16), emb_dim=128,
                mlp_dim=256, num_heads=4, num_layers=2, num_classes=10,
                dropout_rate=0.0, dtype=jnp.float32, use_pallas=False,
                fused_qkv=True)
    cfg = ViTConfig(**base)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    tx = sgd_momentum(onecycle_lr(0.01, 100, 0.1),
                      momentum_schedule=onecycle_momentum(100, 0.1))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    images = jax.random.normal(key, (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (16,), 0, 10)

    step1 = make_train_step(cfg, tx, donate=False)
    s1, m1 = step1(state, images, labels)

    m = pmesh.make_mesh(n_data=8, n_model=1, devices=jax.devices()[:8])
    with m:
        pshard = pmesh.vit_param_shardings(state.params, m)
        st = state._replace(
            params=jax.device_put(state.params, pshard),
            opt_state=jax.device_put(
                state.opt_state,
                pmesh.opt_state_shardings(state.opt_state, state.params,
                                          pshard, m)))
        step8 = make_train_step(cfg, tx, donate=False)
        s8, m8 = step8(st, jax.device_put(images, pmesh.batch_sharding(m)),
                       jax.device_put(labels, pmesh.batch_sharding(m)))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_resvit_fused_with_lora_matches_unfused():
    """The default res-vit recipe has --use_lora True; the fused kernel must
    serve it via the exact weight fold W_eff = W + A@B (LoRA a/b carry no
    bias, res-vit/model.py LoRAModule). Forward AND grads must match the
    unfused composition."""
    from vitax.core.config import ResViTConfig
    from vitax.models import resvit

    base = dict(dim=128, mlp_dim=256, n_layers=2, n_heads=4, n_kv_heads=4,
                lora_rank=4, dynamic_start_layer=1, dynamic_router_hdim=32,
                dynamic_reserve_initials=1, low_rank_dim=8, block_size=1,
                use_lora=True, use_reslr=True, image_size=(32, 32),
                patch_size=(16, 16), num_classes=7, dropout=0.0,
                dtype=jnp.float32, param_dtype=jnp.float32, use_pallas=False)
    cfg0 = ResViTConfig(**base)
    cfg1 = ResViTConfig(**base, fused_qkv=True)
    params = resvit.init_params(jax.random.PRNGKey(0), cfg0)
    # LoRA b inits to N(0,0.01) — bump a/b so the delta is non-trivial
    for lid in range(2):
        att = params["layers"][lid]["attention"]
        for nm in ("lora_q", "lora_k", "lora_v"):
            att[nm]["a"]["kernel"] = att[nm]["a"]["kernel"] * 10
            att[nm]["b"]["kernel"] = att[nm]["b"]["kernel"] * 10
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    rng = jax.random.PRNGKey(2)

    out0, _ = resvit.apply(params, x, cfg0, train=True, rng=rng)
    out1, _ = resvit.apply(params, x, cfg1, train=True, rng=rng)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=2e-4, atol=2e-4)

    def loss(p, cfg):
        logits, aux = resvit.apply(p, x, cfg, train=True, rng=rng)
        return jnp.sum(logits ** 2) + aux["d_loss"]

    g0 = jax.grad(loss)(params, cfg0)
    g1 = jax.grad(loss)(params, cfg1)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree.leaves(g1)
    for (path, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_resvit_fused_qkvo_and_mlp_matches_unfused():
    """qkvo (out-proj-subsuming) + fused LN+MLP variants must match the
    plain composition for the routed res-vit model (fwd + grads)."""
    from vitax.core.config import ResViTConfig
    from vitax.models import resvit

    base = dict(dim=128, mlp_dim=256, n_layers=2, n_heads=4, n_kv_heads=4,
                lora_rank=4, dynamic_start_layer=1, dynamic_router_hdim=32,
                dynamic_reserve_initials=1, low_rank_dim=8, block_size=1,
                use_lora=True, use_reslr=True, image_size=(32, 32),
                patch_size=(16, 16), num_classes=7, dropout=0.0,
                dtype=jnp.float32, param_dtype=jnp.float32, use_pallas=False)
    cfg0 = ResViTConfig(**base)
    cfg1 = ResViTConfig(**base, fused_qkv=True, fused_qkvo=True,
                        fused_mlp=True)
    params = resvit.init_params(jax.random.PRNGKey(4), cfg0)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
    rng = jax.random.PRNGKey(6)

    out0, _ = resvit.apply(params, x, cfg0, train=True, rng=rng)
    out1, _ = resvit.apply(params, x, cfg1, train=True, rng=rng)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=2e-4, atol=2e-4)

    def loss(p, cfg):
        logits, aux = resvit.apply(p, x, cfg, train=True, rng=rng)
        return jnp.sum(logits ** 2) + aux["d_loss"]

    g0 = jax.grad(loss)(params, cfg0)
    g1 = jax.grad(loss)(params, cfg1)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree.leaves(g1)
    for (path, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))
