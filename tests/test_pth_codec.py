"""Round-trip tests for the pure-Python .pth codec vs real torch."""

import numpy as np
import pytest

from vitax.checkpointing.pth import load_pth, load_state_dict_pth, save_pth

torch = pytest.importorskip("torch")


def _rand_state_dict():
    rng = np.random.RandomState(0)
    return {
        "layer.weight": rng.randn(8, 4).astype(np.float32),
        "layer.bias": rng.randn(8).astype(np.float32),
        "emb.weight": rng.randn(2, 3, 4, 5).astype(np.float32),
        "counter": rng.randint(0, 100, (7,)).astype(np.int64),
        "flag": rng.rand(3) > 0.5,
    }


def test_read_torch_written(tmp_path):
    sd_np = _rand_state_dict()
    sd_t = {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}
    p = tmp_path / "t.pth"
    torch.save(sd_t, p)
    got = load_pth(str(p))
    assert set(got) == set(sd_np)
    for k in sd_np:
        np.testing.assert_array_equal(got[k], sd_np[k])


def test_read_noncontiguous_and_wrapped(tmp_path):
    w = torch.randn(6, 6)
    obj = {"state_dict": {"w_t": w.t(), "w_slice": w[1:5:2]},
           "epoch": 3, "lr": 0.5, "name": "best"}
    p = tmp_path / "t.pth"
    torch.save(obj, p)
    got = load_pth(str(p))
    np.testing.assert_allclose(got["state_dict"]["w_t"], w.t().numpy())
    np.testing.assert_allclose(got["state_dict"]["w_slice"], w[1:5:2].numpy())
    assert got["epoch"] == 3 and got["lr"] == 0.5 and got["name"] == "best"
    sd = load_state_dict_pth(str(p))
    assert set(sd) == {"w_t", "w_slice"}


def test_torch_reads_ours(tmp_path):
    sd = _rand_state_dict()
    obj = {"state_dict": sd, "epoch": 12, "tag": "current",
           "nested": {"lrs": [0.1, 0.2], "steps": (1, 2, 3)}}
    p = tmp_path / "ours.pth"
    save_pth(obj, str(p))
    got = torch.load(str(p), weights_only=False)
    assert got["epoch"] == 12 and got["tag"] == "current"
    assert got["nested"]["lrs"] == [0.1, 0.2]
    assert tuple(got["nested"]["steps"]) == (1, 2, 3)
    for k, v in sd.items():
        tv = got["state_dict"][k]
        assert isinstance(tv, torch.Tensor)
        np.testing.assert_array_equal(tv.numpy(), v)


def test_our_roundtrip_without_torch(tmp_path):
    sd = _rand_state_dict()
    p = tmp_path / "rt.pth"
    save_pth({"state_dict": sd}, str(p))
    got = load_state_dict_pth(str(p))
    for k, v in sd.items():
        np.testing.assert_array_equal(got[k], v)


def test_bf16_read(tmp_path):
    x = torch.randn(4, 4, dtype=torch.bfloat16)
    p = tmp_path / "bf16.pth"
    torch.save({"x": x}, p)
    got = load_pth(str(p))
    np.testing.assert_allclose(got["x"], x.float().numpy(), rtol=0, atol=0)


def test_big_tensor_and_many_keys(tmp_path):
    sd = {f"k{i}": np.full((300,), i, np.float32) for i in range(300)}
    p = tmp_path / "many.pth"
    save_pth(sd, str(p))
    got = torch.load(str(p), weights_only=False)
    assert len(got) == 300
    np.testing.assert_array_equal(got["k299"].numpy(), sd["k299"])


# -- legacy (pre-1.6 sequential-pickle) format --------------------------------

def test_read_torch_legacy_format(tmp_path):
    """torch.save(_use_new_zipfile_serialization=False) emits the legacy
    sequential-pickle stream the reference's torch.load also accepts
    (src/checkpoint.py:13); load_pth must dispatch and read it."""
    sd_np = _rand_state_dict()
    sd_t = {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}
    p = tmp_path / "legacy.pth"
    torch.save(sd_t, p, _use_new_zipfile_serialization=False)
    import zipfile
    assert not zipfile.is_zipfile(p)  # really the legacy stream
    got = load_pth(str(p))
    assert set(got) == set(sd_np)
    for k in sd_np:
        np.testing.assert_array_equal(got[k], sd_np[k])


def test_read_torch_legacy_wrapped_and_views(tmp_path):
    """Legacy format with a {'state_dict': ...} wrapper, scalars, and
    non-contiguous tensors sharing one storage (exercises strides and the
    shared-root-storage path)."""
    w = torch.randn(6, 6)
    obj = {"state_dict": {"w": w, "w_t": w.t(), "w_slice": w[1:5:2]},
           "epoch": 7, "lr": 0.25, "name": "legacy-best",
           "nested": {"lrs": [0.1, 0.2], "steps": (1, 2, 3)}}
    p = tmp_path / "legacy2.pth"
    torch.save(obj, p, _use_new_zipfile_serialization=False)
    got = load_pth(str(p))
    np.testing.assert_allclose(got["state_dict"]["w"], w.numpy())
    np.testing.assert_allclose(got["state_dict"]["w_t"], w.t().numpy())
    np.testing.assert_allclose(got["state_dict"]["w_slice"],
                               w[1:5:2].numpy())
    assert got["epoch"] == 7 and got["name"] == "legacy-best"
    assert got["nested"]["steps"] == (1, 2, 3)
    sd = load_state_dict_pth(str(p))
    assert set(sd) == {"w", "w_t", "w_slice"}


def test_read_torch_legacy_bf16_and_dtypes(tmp_path):
    t = {"bf": torch.arange(16, dtype=torch.bfloat16).reshape(4, 4) / 8,
         "half": torch.randn(3, 5).half(),
         "i32": torch.arange(6, dtype=torch.int32),
         "u8": torch.arange(4, dtype=torch.uint8)}
    p = tmp_path / "legacy3.pth"
    torch.save(t, p, _use_new_zipfile_serialization=False)
    got = load_pth(str(p))
    np.testing.assert_allclose(got["bf"], t["bf"].float().numpy())
    np.testing.assert_allclose(got["half"], t["half"].numpy())
    np.testing.assert_array_equal(got["i32"], t["i32"].numpy())
    np.testing.assert_array_equal(got["u8"], t["u8"].numpy())


def test_legacy_rejects_garbage(tmp_path):
    p = tmp_path / "junk.pth"
    p.write_bytes(b"\x80\x02K\x01.")  # a pickle, but not the torch magic
    with pytest.raises(ValueError, match="not a torch .pth"):
        load_pth(str(p))


def test_emitter_randomized_nesting_roundtrip(tmp_path):
    """Property-style: random nested containers of arrays/scalars must
    round-trip through save_pth -> torch.load AND save_pth -> load_pth."""
    rng = np.random.RandomState(42)
    dtypes = [np.float32, np.float64, np.float16, np.int64, np.int32,
              np.int16, np.int8, np.uint8, np.bool_]

    def rand_leaf(depth):
        r = rng.rand()
        if r < 0.45:
            dt = dtypes[rng.randint(len(dtypes))]
            shape = tuple(rng.randint(1, 5)
                          for _ in range(rng.randint(0, 4)))
            if dt == np.bool_:
                return np.asarray(rng.rand(*shape) > 0.5)
            if np.issubdtype(dt, np.floating):
                return np.asarray(rng.randn(*shape)).astype(dt)
            return np.asarray(rng.randint(0, 100, shape)).astype(dt)
        if r < 0.55:
            return float(rng.randn())
        if r < 0.65:
            return int(rng.randint(-10**12, 10**12))
        if r < 0.72:
            return bool(rng.rand() > 0.5)
        if r < 0.78:
            return None
        if r < 0.86:
            return "s" * rng.randint(0, 300)  # exercises both str opcodes
        if depth >= 3:
            return float(rng.randn())
        kind = rng.randint(3)
        n = rng.randint(0, 4)
        if kind == 0:
            return {f"k{i}": rand_leaf(depth + 1) for i in range(n)}
        if kind == 1:
            return [rand_leaf(depth + 1) for _ in range(n)]
        return tuple(rand_leaf(depth + 1) for _ in range(n))

    def assert_same(a, b, path="root"):
        if isinstance(a, dict):
            assert set(a) == set(b), path
            for k in a:
                assert_same(a[k], b[k], f"{path}.{k}")
        elif isinstance(a, (list, tuple)):
            # torch.load round-trips tuples as tuples, lists as lists
            assert len(a) == len(b), path
            for i, (x, y) in enumerate(zip(a, b)):
                assert_same(x, y, f"{path}[{i}]")
        elif isinstance(a, np.ndarray):
            got = b.numpy() if hasattr(b, "numpy") else np.asarray(b)
            assert a.dtype == got.dtype or a.dtype.kind == got.dtype.kind, path
            np.testing.assert_array_equal(np.asarray(got, a.dtype), a, path)
        else:
            assert a == b or (a is None and b is None), f"{path}: {a!r}!={b!r}"

    for trial in range(10):
        obj = {f"top{i}": rand_leaf(0) for i in range(rng.randint(1, 4))}
        p = tmp_path / f"t{trial}.pth"
        save_pth(obj, str(p))
        via_torch = torch.load(str(p), weights_only=False)
        assert_same(obj, via_torch, f"trial{trial}/torch")
        via_ours = load_pth(str(p))
        assert_same(obj, via_ours, f"trial{trial}/ours")


# -- pre-torch-0.4 tar container ----------------------------------------------

def test_torch_reads_our_tar(tmp_path):
    """torch.load still READS the ancient tar container (torch can no longer
    write it) — validates the emitter against the real consumer."""
    from vitax.checkpointing.pth import save_pth_tar
    sd = _rand_state_dict()
    p = tmp_path / "legacy_tar.pth"
    save_pth_tar(sd, str(p))
    loaded = torch.load(str(p), weights_only=False)
    assert set(loaded.keys()) == set(sd.keys())
    for k, v in sd.items():
        np.testing.assert_array_equal(loaded[k].numpy(), v)


def test_tar_roundtrip_without_torch(tmp_path):
    from vitax.checkpointing.pth import save_pth_tar
    sd = {"w": np.arange(24, dtype=np.float32).reshape(2, 3, 4),
          "meta": {"step": 7, "name": "x"},
          "l": [np.ones((5,), np.int64), 2.5]}
    p = tmp_path / "rt_tar.pth"
    save_pth_tar(sd, str(p))
    out = load_pth(str(p))
    np.testing.assert_array_equal(out["w"], sd["w"])
    assert out["meta"] == sd["meta"]
    np.testing.assert_array_equal(out["l"][0], sd["l"][0])
    assert out["l"][1] == 2.5


def test_tar_wrapped_state_dict(tmp_path):
    from vitax.checkpointing.pth import save_pth_tar
    sd = _rand_state_dict()
    p = tmp_path / "wrap_tar.pth"
    save_pth_tar({"state_dict": sd, "epoch": 3}, str(p))
    out = load_state_dict_pth(str(p))
    for k, v in sd.items():
        np.testing.assert_array_equal(out[k], v)
