"""End-to-end with the real CIFAR on-disk format (fabricated pickle files):
exercises the exact dataset plumbing the reference recipes use."""

import pickle

import numpy as np
import pytest


@pytest.fixture()
def cifar100_dir(tmp_path):
    rng = np.random.RandomState(0)
    base = tmp_path / "cifar-100-python"
    base.mkdir()
    # class-correlated pixels so short training can actually learn
    def make(n):
        labels = rng.randint(0, 100, n)
        data = (rng.randint(0, 40, (n, 3072)) +
                (labels[:, None] * 2) % 200).astype(np.uint8)
        return {"data": data, "fine_labels": labels.tolist()}
    with open(base / "train", "wb") as f:
        pickle.dump(make(128), f)
    with open(base / "test", "wb") as f:
        pickle.dump(make(64), f)
    return str(tmp_path)


def test_cifar100_train_eval_cli(cifar100_dir, tmp_path):
    from vitax import eval_cli, train_cli

    best = train_cli.main([
        "--dataset", "CIFAR100", "--model-arch", "tiny",
        "--image-size", "32", "--batch-size", "16",
        "--train-steps", "24", "--lr", "0.02", "--warmup-steps", "4",
        "--num-workers", "0", "--dtype", "float32", "--no-pallas",
        "--data-dir", cifar100_dir,
        "--exp-name", "cifar", "--exp-root", str(tmp_path / "exp")])
    assert 0.0 <= best <= 1.0

    exp = list((tmp_path / "exp" / "save").iterdir())[0]
    result = eval_cli.main([
        "--dataset", "CIFAR100", "--model-arch", "tiny",
        "--image-size", "32", "--batch-size", "16",
        "--num-workers", "0", "--dtype", "float32", "--no-pallas",
        "--data-dir", cifar100_dir,
        "--checkpoint-path", str(exp / "checkpoints" / "best")])
    # eval over the same val split must reproduce the best val accuracy
    assert abs(result["acc1"] - best) < 1e-6


def test_weighted_eval_counts_only_real_samples():
    """The padded final batch must not distort metrics: duplicate a batch
    row as padding with weight 0 and compare against the unpadded eval."""
    import jax
    import jax.numpy as jnp

    from vitax.core.config import arch_config
    from vitax.models import vit
    from vitax.train_cli import make_weighted_eval_step

    cfg = arch_config("tiny", image_size=32, num_classes=10,
                      dtype=jnp.float32, use_pallas=False)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    step = make_weighted_eval_step(cfg)

    key = jax.random.PRNGKey(1)
    images = jax.random.normal(key, (6, 32, 32, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (6,), 0, 10)

    full = step(params, images, labels, jnp.ones((6,)))
    padded_imgs = jnp.concatenate([images, images[:2]], axis=0)
    padded_lbls = jnp.concatenate([labels, labels[:2]])
    weight = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)
    padded = step(params, padded_imgs, padded_lbls, weight)
    for k in full:
        np.testing.assert_allclose(float(full[k]), float(padded[k]),
                                   rtol=1e-6)
