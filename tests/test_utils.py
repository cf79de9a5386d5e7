"""Unit tests for utils: MetricTracker, ExperimentWriter, experiment dirs,
KeyChain, StepTimer, memory helpers."""

import os

import jax
import numpy as np

from vitax.core.prng import KeyChain, set_seed
from vitax.utils import (ExperimentWriter, MetricTracker, StepTimer,
                         experiment_name, log_model_layers,
                         optimize_memory_usage, process_config, read_json,
                         tree_bytes, write_json)


def test_metric_tracker_running_mean():
    t = MetricTracker("loss", "acc1")
    t.update("loss", 2.0)
    t.update("loss", 4.0)
    t.update("acc1", 0.5, n=3)
    t.update("acc1", 1.0, n=1)
    r = t.result()
    assert r["loss"] == 3.0
    assert abs(r["acc1"] - (0.5 * 3 + 1.0) / 4) < 1e-9
    t.reset()
    assert t.result()["loss"] == 0.0


def test_metric_tracker_dynamic_keys():
    t = MetricTracker()
    t.update("new_metric", 7.0)
    assert t.avg("new_metric") == 7.0
    assert "new_metric" in t.keys()


def test_experiment_writer_nullbackend_tags():
    w = ExperimentWriter("/tmp/nope", backend="none")
    w.set_step(0, "train")
    w.add_scalar("loss", 1.0)    # must not raise
    w.set_step(1, "valid")
    assert w._tag("loss") == "loss/valid"
    w.add_scalars("rates", {"a": 1.0})
    w.close()


def test_process_config_creates_layout(tmp_path):
    cfg = {"exp_name": "e", "dataset": "CIFAR10", "batch_size": 8,
           "lr": 0.1, "wd": 0.0}
    out = process_config(cfg, root=str(tmp_path))
    assert os.path.isdir(out["summary_dir"])
    assert os.path.isdir(out["checkpoint_dir"])
    assert os.path.isdir(out["result_dir"])
    dumped = read_json(os.path.join(os.path.dirname(out["checkpoint_dir"]),
                                    "config.json"))
    assert dumped["dataset"] == "CIFAR10"
    assert "e_CIFAR10_bs8_lr0.1_wd0.0_" in out["summary_dir"]


def test_experiment_name_format():
    n = experiment_name("ft", "CIFAR100", 32, 0.03, 0.0, timestamp="t")
    assert n == "ft_CIFAR100_bs32_lr0.03_wd0.0_t"


def test_keychain_streams_are_distinct_and_stable():
    root = set_seed(123)
    c1 = KeyChain(root)
    c2 = KeyChain(jax.random.PRNGKey(123))
    a = c1.next("dropout")
    b = c1.next("dropout")
    g = c1.next("gumbel")
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(g))
    # same seed → same sequence
    np.testing.assert_array_equal(np.asarray(a),
                                  np.asarray(c2.next("dropout")))


def test_step_timer_excludes_warmup():
    t = StepTimer(batch_size=4, warmup=2)
    for _ in range(6):
        t.tick()
    rep = t.report()
    assert rep["steps_per_sec"] > 0
    assert rep["images_per_sec"] == rep["steps_per_sec"] * 4
    assert "p50" in rep


def test_tree_bytes_and_layer_log():
    tree = {"a": np.zeros((2, 3), np.float32), "b": np.zeros((4,), np.int64)}
    assert tree_bytes(tree) == 2 * 3 * 4 + 4 * 8
    lines = []
    total = log_model_layers(tree, log=lines.append)
    assert total == 10 and len(lines) == 3


def test_optimize_memory_usage_runs():
    optimize_memory_usage()  # must not raise


def test_write_read_json_roundtrip(tmp_path):
    p = tmp_path / "x.json"
    write_json({"a": [1, 2], "b": "s"}, str(p))
    assert read_json(str(p)) == {"a": [1, 2], "b": "s"}


def test_checkpoint_step_retention(tmp_path):
    import jax
    import jax.numpy as jnp
    from vitax.checkpointing import CheckpointStore

    store = CheckpointStore(str(tmp_path), keep=2)
    state = {"w": jnp.ones((2,))}
    for s in (1, 2, 3, 4):
        store.save_step(s, state, {"step": s})
    assert store.list_steps() == [3, 4]
    restored = store.restore("step_00000004", {"w": jnp.zeros((2,))})
    np.testing.assert_array_equal(np.asarray(restored["w"]), [1.0, 1.0])


def test_async_save_and_restore_roundtrip(tmp_path):
    """save_async snapshots state synchronously and commits in the
    background; restore/save force completion first (VERDICT r1 #10)."""
    import jax.numpy as jnp
    from vitax.checkpointing import CheckpointStore

    for use_orbax in (False, True):
        d = tmp_path / ("orbax" if use_orbax else "npz")
        store = CheckpointStore(str(d), use_orbax=use_orbax)
        state = {"w": jnp.arange(4.0), "n": jnp.asarray(3)}
        store.save_async("current", state, {"epoch": 1})
        # a restore immediately after must see the full checkpoint
        got = store.restore("current", {"w": jnp.zeros(4), "n": jnp.asarray(0)})
        np.testing.assert_array_equal(np.asarray(got["w"]), [0, 1, 2, 3])
        store.wait_until_finished()
        assert store.metadata("current") == {"epoch": 1}


def test_save_model_async_best_copy(tmp_path):
    import jax.numpy as jnp
    from vitax.checkpointing import CheckpointStore

    store = CheckpointStore(str(tmp_path), use_orbax=False)
    state = {"w": jnp.ones(2)}
    store.save_model(state, epoch=0, is_best=True,
                     metrics={"acc1": 0.5}, async_save=True)
    store.wait_until_finished()
    assert store.exists("current") and store.exists("best")
    got = store.restore("best", {"w": jnp.zeros(2)})
    np.testing.assert_array_equal(np.asarray(got["w"]), [1, 1])
