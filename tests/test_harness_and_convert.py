"""Tests for the torch-parity harness CLI and the checkpoint converter CLI."""

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, requires_reference

torch = pytest.importorskip("torch")


@requires_reference
def test_check_torch_harness_tiny():
    from vitax.check_torch import main
    rc = main(["--reference-dir", REFERENCE_DIR, "--model-arch", "tiny",
               "--image-size", "32", "--num-classes", "11",
               "--batch-size", "4", "--num-batches", "2"])
    assert rc == 0


def test_convert_cli_roundtrip(tmp_path):
    """npz → pth (torch loads it) → npz: tensors survive bit-exact."""
    import jax
    import jax.numpy as jnp

    from vitax.checkpointing import params_to_flat_npz
    from vitax.convert_cli import main
    from vitax.core.config import arch_config
    from vitax.models import vit

    cfg = arch_config("tiny", image_size=32, num_classes=11,
                      dtype=jnp.float32)
    params = jax.tree.map(np.asarray,
                          vit.init_params(jax.random.PRNGKey(0), cfg))
    flat = params_to_flat_npz(params)
    npz_in = tmp_path / "w.npz"
    np.savez(npz_in, **flat)

    pth = tmp_path / "w.pth"
    main(["--npz", str(npz_in), "--out", str(pth)])

    # the reference side can torch.load it
    obj = torch.load(str(pth), weights_only=False)
    assert "state_dict" in obj
    assert obj["state_dict"]["embedding.weight"].shape == (96, 3, 16, 16)

    npz_out = tmp_path / "back.npz"
    main(["--pth", str(pth), "--out", str(npz_out)])
    with np.load(npz_out) as back:
        for k, v in flat.items():
            np.testing.assert_array_equal(back[k], v, err_msg=k)


@requires_reference
def test_check_torch_harness_mesh():
    # VERDICT r4 #7: the --mesh mode shards the comparison batches over the
    # fake 8-device mesh and asserts sharded == single-device logits
    from vitax.check_torch import main
    rc = main(["--reference-dir", REFERENCE_DIR, "--model-arch", "tiny",
               "--image-size", "32", "--num-classes", "11",
               "--batch-size", "8", "--num-batches", "2", "--mesh", "8"])
    assert rc == 0
