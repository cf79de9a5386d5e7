"""Test configuration.

Tests run on CPU with 8 fake devices so multi-device sharding paths
(data-parallel mesh, collectives) are exercised without TPU hardware —
the SURVEY §4 test strategy. Must run before jax initializes a backend.
"""

import os

# Force CPU: the session env may pin JAX_PLATFORMS to the TPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Pallas kernels run in interpreter mode on CPU only where tests opt in.
os.environ.setdefault("VITAX_DISABLE_PALLAS", "1")

import jax  # noqa: E402

# A sitecustomize hook may have force-selected a TPU platform via
# jax.config after env vars were read; override it back to CPU.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "src"))


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="PyTorch reference repo not mounted")


# Heavyweight modules (interpret-mode kernel sweeps, subprocess spawns,
# full training loops) get the `slow` marker so a quick pass exists:
#   python -m pytest tests/ -m "not slow"   (~3-4 min)
# vs the full suite (~17 min on this CPU).
_SLOW_MODULES = {
    "test_pallas_kernels", "test_tp_fused_kernels", "test_resvit_parallel",
    "test_multihost", "test_token_drop", "test_trainer_equivalence",
    "test_resvit_compact", "test_parity_resvit", "test_fused_qkv_attention",
    "test_cifar_e2e", "test_handoff",
}


def pytest_collection_modifyitems(items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
