"""Flag→config plumbing: the CLIs must be able to reproduce the bench config.

Round-2 verdict weak #6: the int8 grad/dW tiers (half the measured perf)
were unreachable from any CLI. These tests pin the mapping from argparse
flags to the model dataclass fields so the documented recipes and bench.py
measure the same program.
"""

import jax


def _vit_cfg(tmp_path, *flags):
    from vitax import cli
    from vitax.train_cli import model_config_from_cli
    config = cli.get_train_config(
        ["--dataset", "Synthetic", "--exp-root", str(tmp_path), *flags])
    return model_config_from_cli(config)


def test_int8_dw_implies_full_stack(tmp_path):
    cfg = _vit_cfg(tmp_path, "--int8-dw")
    assert cfg.int8_mlp and cfg.int8_attn
    assert cfg.int8_mlp_grad and cfg.int8_attn_grad
    assert cfg.int8_dw


def test_int8_grad_implies_int8(tmp_path):
    cfg = _vit_cfg(tmp_path, "--int8-grad")
    assert cfg.int8_mlp and cfg.int8_attn
    assert cfg.int8_mlp_grad and cfg.int8_attn_grad
    assert not cfg.int8_dw


def test_int4_implies_int8_fwd(tmp_path):
    cfg = _vit_cfg(tmp_path, "--int4")
    assert cfg.int4_mlp
    # attention projections ride the int8 tier (no int4 attention path)
    assert cfg.int8_mlp and cfg.int8_attn
    assert not cfg.int8_mlp_grad and not cfg.int8_dw


def test_int4_stacks_with_grad_tiers(tmp_path):
    cfg = _vit_cfg(tmp_path, "--int4", "--int8-dw")
    assert cfg.int4_mlp and cfg.int8_dw and cfg.int8_mlp_grad


def test_int4_grad_implies_int4(tmp_path):
    cfg = _vit_cfg(tmp_path, "--int4-grad")
    assert cfg.int4_grad and cfg.int4_mlp and cfg.int8_mlp
    cfg = _vit_cfg(tmp_path, "--int4")
    assert not cfg.int4_grad


def test_int8_forward_only(tmp_path):
    cfg = _vit_cfg(tmp_path, "--int8")
    assert cfg.int8_mlp and cfg.int8_attn
    assert not cfg.int8_mlp_grad and not cfg.int8_dw


def test_remat_default_is_selective(tmp_path):
    cfg = _vit_cfg(tmp_path)
    assert cfg.remat == "selective"


def test_remat_none_and_full(tmp_path):
    assert _vit_cfg(tmp_path, "--remat", "none").remat is False
    assert _vit_cfg(tmp_path, "--remat").remat is True  # bare = full
    assert _vit_cfg(tmp_path, "--remat", "full").remat is True


def test_fused_defaults_follow_backend(tmp_path):
    # tests run on CPU (conftest) — fused kernels default off there,
    # on (gated per shape) on TPU backends
    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = _vit_cfg(tmp_path)
    assert cfg.fused_qkv == on_tpu and cfg.fused_mlp == on_tpu
    # explicit flags override the backend default in both directions
    cfg = _vit_cfg(tmp_path, "--fused-qkv", "--fused-mlp")
    assert cfg.fused_qkv and cfg.fused_mlp
    cfg = _vit_cfg(tmp_path, "--no-fused-qkv", "--no-fused-mlp")
    assert not cfg.fused_qkv and not cfg.fused_mlp


def _resvit_cfg(tmp_path, *flags):
    from vitax.resvit_train_cli import config_to_model_args, get_train_config
    config = get_train_config(
        ["--dataset", "Synthetic", "--exp-root", str(tmp_path), *flags])
    return config_to_model_args(config)


def test_resvit_int8_grad_implies_int8(tmp_path):
    cfg = _resvit_cfg(tmp_path, "--int8-grad")
    assert cfg.int8_attn and cfg.int8_attn_grad
    assert cfg.int8_mlp and cfg.int8_mlp_grad
    cfg = _resvit_cfg(tmp_path, "--int8")
    assert cfg.int8_attn and not cfg.int8_attn_grad
    assert cfg.int8_mlp and not cfg.int8_mlp_grad


def test_resvit_int4_implies_int8(tmp_path):
    cfg = _resvit_cfg(tmp_path, "--int4")
    assert cfg.int4_mlp and cfg.int8_mlp and cfg.int8_attn
    cfg = _resvit_cfg(tmp_path, "--int4-grad")
    assert cfg.int4_grad and cfg.int4_mlp and cfg.int8_mlp
    assert cfg.fused_mlp is not None  # int8-on default logic still applies


def test_resvit_fused_defaults(tmp_path):
    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = _resvit_cfg(tmp_path)
    assert cfg.fused_qkv == on_tpu and cfg.fused_qkvo == on_tpu
    cfg = _resvit_cfg(tmp_path, "--fused-qkv", "--fused-mlp")
    assert cfg.fused_qkv and cfg.fused_qkvo and cfg.fused_mlp
    cfg = _resvit_cfg(tmp_path, "--no-fused-qkv")
    assert not cfg.fused_qkv and not cfg.fused_qkvo
