"""Pure-Python `.pth` (PyTorch zip serialization) reader/writer — no torch.

The reference's pretrained weights and saved checkpoints are `.pth` archives
(src/checkpoint.py:13, src/train.py:69-81). vitax reads and writes that
format natively so users can interoperate with reference-produced files (and
the reference can load vitax-exported ones) without importing torch.

Format (torch.save, _use_new_zipfile_serialization=True):

    <name>/data.pkl      pickle of the object; each tensor is rebuilt via
                         torch._utils._rebuild_tensor_v2(storage, offset,
                         size, stride, requires_grad, hooks) where `storage`
                         is a pickle *persistent id* tuple
                         ('storage', <StorageType>, key, location, numel)
    <name>/data/<key>    raw little-endian bytes of each storage
    <name>/version       serialization version ("3")

Reading uses a custom Unpickler (persistent_load + find_class shims).
Writing emits the pickle opcode stream by hand — the stdlib Pickler cannot
reference torch globals without importing torch (save_global verifies
identity), so the fixed schema is serialized directly.

Round-trip equivalence against real torch.save/torch.load is tested in
tests/test_pth_codec.py.
"""

from __future__ import annotations

import io
import pickle
import struct
import tarfile
import zipfile
from typing import Any, Dict, Optional, Tuple

import numpy as np

# -- dtype <-> torch storage-class names -------------------------------------

STORAGE_TO_DTYPE = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("<?"),
    # BFloat16 has no numpy dtype; stored as uint16 words + tagged
    "BFloat16Storage": np.dtype("<u2"),
}

DTYPE_TO_STORAGE = {
    np.dtype("<f4"): "FloatStorage",
    np.dtype("<f8"): "DoubleStorage",
    np.dtype("<f2"): "HalfStorage",
    np.dtype("<i8"): "LongStorage",
    np.dtype("<i4"): "IntStorage",
    np.dtype("<i2"): "ShortStorage",
    np.dtype("<i1"): "CharStorage",
    np.dtype("<u1"): "ByteStorage",
    np.dtype("<?"): "BoolStorage",
}


class _StorageRef:
    __slots__ = ("storage_type", "key", "numel")

    def __init__(self, storage_type: str, key: str, numel: int):
        self.storage_type = storage_type
        self.key = key
        self.numel = numel


class _TorchGlobalStub:
    """Placeholder for any unresolvable global referenced by the pickle.

    `_stub(module, name)` returns a dynamically generated SUBCLASS per
    (module, name), so the pickle VM's GLOBAL/REDUCE/NEWOBJ opcodes
    reconstruct real instances whose `__dict__` carries the pickled state.
    That makes a whole `torch.save(model)` nn.Module graph — the reference's
    ONLY res-vit save format (res-vit/utils.py:149-155) — walkable:
    `module_state_dict()` recovers `_parameters`/`_buffers`/`_modules` into
    a flat state_dict without torch. Plain value globals (torch.float32,
    devices, …) come back as the inert class object itself."""

    module = "?"
    name = "?"

    def __new__(cls, *args, **kwargs):
        inst = object.__new__(cls)
        inst._stub_args = args
        return inst

    def __init__(self, *args, **kwargs):
        pass

    def __repr__(self):
        flavor = "instance" if type(self) is not _TorchGlobalStub else "stub"
        return f"<torch-global {self.module}.{self.name} {flavor}>"


_STUB_CLASSES: Dict[Tuple[str, str], type] = {}


def _stub(module: str, name: str) -> type:
    cls = _STUB_CLASSES.get((module, name))
    if cls is None:
        cls = type(f"_Stub_{name}", (_TorchGlobalStub,),
                   {"module": module, "name": name})
        _STUB_CLASSES[(module, name)] = cls
    return cls


def _storage_type_name(st) -> str:
    """Storage type from a persistent id — a stub class (GLOBAL) or str."""
    if isinstance(st, type) and issubclass(st, _TorchGlobalStub):
        return st.name
    if isinstance(st, _TorchGlobalStub):
        return st.name
    return str(st)


def _rebuild_tensor_v2(storage_and_bytes, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    ref, raw = storage_and_bytes
    dtype = STORAGE_TO_DTYPE[ref.storage_type]
    flat = np.frombuffer(raw, dtype=dtype)
    if ref.storage_type == "BFloat16Storage":
        # widen bf16 words to float32: place them in the high half
        flat = (flat.astype(np.uint32) << 16).view(np.float32)
    itemsize = flat.dtype.itemsize
    strides_bytes = tuple(s * itemsize for s in stride)
    arr = np.lib.stride_tricks.as_strided(
        flat[storage_offset:], shape=tuple(size), strides=strides_bytes)
    return np.array(arr)  # materialize a contiguous owned copy


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _PthUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file, encoding="latin1")
        self._zf = zf
        self._prefix = prefix

    def persistent_load(self, pid):
        typename, storage_type, key, _location, numel = pid[0], *pid[1:5]
        if typename != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {typename!r}")
        st_name = _storage_type_name(storage_type)
        raw = self._zf.read(f"{self._prefix}data/{key}")
        return (_StorageRef(st_name, key, numel), raw)

    def find_class(self, module, name):
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module.startswith("torch"):
            return _stub(module, name)
        if module == "collections" and name == "OrderedDict":
            return dict
        if module in ("builtins", "__builtin__"):
            return super().find_class(module, name)
        if module.startswith("numpy"):
            return super().find_class(module, name)
        # anything else (e.g. whole pickled nn.Module graphs): opaque stub
        return _stub(module, name)


def load_pth(path: str) -> Any:
    """Load a `.pth` file into numpy-backed python objects.

    Dispatches on the on-disk format the same way torch.load does
    (src/checkpoint.py:13 reads either transparently):
      - zip archive        -> torch >= 1.6 default (`_use_new_zipfile_...=True`)
      - tar archive        -> pre-torch-0.4 container (members sys_info/
                              pickle/tensors/storages)
      - sequential pickles -> legacy format (`_use_new_zipfile_...=False`)
    Tensors become numpy arrays (bf16 widened to fp32). Unresolvable torch
    objects (e.g. whole pickled modules) come back as inert stubs."""
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            pkl = next(n for n in names if n.endswith("data.pkl"))
            prefix = pkl[: -len("data.pkl")]
            with zf.open(pkl) as f:
                return _PthUnpickler(io.BytesIO(f.read()), zf, prefix).load()
    if tarfile.is_tarfile(path):
        return _load_pth_tar(path)
    return _load_pth_legacy(path)


# -- legacy (pre-torch-1.6) sequential-pickle format --------------------------
#
# torch.save(obj, f, _use_new_zipfile_serialization=False) writes, in order:
#   1. pickle: magic number 0x1950a86a20f9469cfc6c
#   2. pickle: protocol version 1001
#   3. pickle: sys_info dict (endianness, type sizes)
#   4. pickle: the object; storages are persistent ids
#      ('storage', StorageType, root_key, location, numel, view_metadata)
#   5. pickle: list of root storage keys, in serialization order
#   6. for each root key: <int64 numel> followed by numel*itemsize raw bytes
#
# Storage DATA arrives after the object pickle, so tensor rebuilds are
# deferred: persistent_load returns shared _LazyStorage cells, the rebuild
# functions return _PendingTensor nodes, and the tree is materialized once
# the tail section has filled every cell.

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


class _LazyStorage:
    __slots__ = ("storage_type", "data")

    def __init__(self, storage_type: str):
        self.storage_type = storage_type
        self.data: Optional[bytes] = None


class _PendingTensor:
    __slots__ = ("storage", "offset", "size", "stride")

    def __init__(self, storage, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = size
        self.stride = stride

    def materialize(self) -> np.ndarray:
        if self.storage.data is None:
            raise ValueError("legacy .pth storage data section incomplete")
        dtype = STORAGE_TO_DTYPE[self.storage.storage_type]
        flat = np.frombuffer(self.storage.data, dtype=dtype)
        if self.storage.storage_type == "BFloat16Storage":
            flat = (flat.astype(np.uint32) << 16).view(np.float32)
        itemsize = flat.dtype.itemsize
        strides_bytes = tuple(s * itemsize for s in self.stride)
        arr = np.lib.stride_tricks.as_strided(
            flat[self.offset:], shape=tuple(self.size), strides=strides_bytes)
        return np.array(arr)


class _LegacyUnpickler(pickle.Unpickler):
    """Object-pickle unpickler for the legacy format: storages resolve to
    shared _LazyStorage cells keyed by root key; views slice the root lazily
    at materialization time (views carry their own byte range)."""

    def __init__(self, file, storages: Dict[str, _LazyStorage],
                 views: Dict[str, Tuple[str, int, int]]):
        super().__init__(file, encoding="latin1")
        self._storages = storages
        self._views = views

    def persistent_load(self, pid):
        if pid[0] == "module":
            # whole-module saves tag container objects with their source for
            # torch's source-drift warning; the payload is the module itself
            # (torch/serialization.py legacy persistent_load 'module' branch)
            return pid[1]
        if pid[0] != "storage":
            raise pickle.UnpicklingError(
                f"unsupported legacy persistent id {pid[0]!r}")
        storage_type, root_key, _location, _numel = pid[1:5]
        view_metadata = pid[5] if len(pid) > 5 else None
        st_name = _storage_type_name(storage_type)
        if root_key not in self._storages:
            self._storages[root_key] = _LazyStorage(st_name)
        root = self._storages[root_key]
        if view_metadata is not None:
            view_key, view_offset, view_size = view_metadata
            if view_key not in self._views:
                self._views[view_key] = (root_key, view_offset, view_size)
            view = _LazyStorage(st_name)
            # resolved later: _fill_views copies the root's byte slice in
            view.data = ("__view__", root_key, view_offset, view_size)
            return view
        return root

    def find_class(self, module, name):
        if module == "torch._utils" and name in ("_rebuild_tensor_v2",
                                                 "_rebuild_tensor"):
            if name == "_rebuild_tensor":
                return lambda st, off, size, stride: _PendingTensor(
                    st, off, size, stride)
            return lambda st, off, size, stride, *rest: _PendingTensor(
                st, off, size, stride)
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module.startswith("torch"):
            return _stub(module, name)
        if module == "collections" and name == "OrderedDict":
            return dict
        if module in ("builtins", "__builtin__"):
            return super().find_class(module, name)
        if module.startswith("numpy"):
            return super().find_class(module, name)
        return _stub(module, name)


def _materialize_tree(obj: Any) -> Any:
    if isinstance(obj, _PendingTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        return {k: _materialize_tree(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_materialize_tree(v) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_materialize_tree(v) for v in obj)
    if isinstance(obj, _TorchGlobalStub):
        # whole-module graphs: tensors live inside stub instance __dict__s
        # (in-place + visited marker: module graphs may share/cycle refs)
        if "_vitax_materialized" not in obj.__dict__:
            obj.__dict__["_vitax_materialized"] = True
            for k, v in list(obj.__dict__.items()):
                obj.__dict__[k] = _materialize_tree(v)
        return obj
    return obj


def _load_pth_legacy(path: str) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)

    plain = pickle.Unpickler(buf, encoding="latin1")
    magic = plain.load()
    if magic != _LEGACY_MAGIC:
        raise ValueError(
            f"{path}: not a torch .pth file (neither zip nor legacy "
            f"sequential-pickle; magic={magic!r})")
    _protocol = pickle.Unpickler(buf, encoding="latin1").load()
    _sys_info = pickle.Unpickler(buf, encoding="latin1").load()

    storages: Dict[str, _LazyStorage] = {}
    views: Dict[str, Tuple[str, int, int]] = {}
    result = _LegacyUnpickler(buf, storages, views).load()

    keys = pickle.Unpickler(buf, encoding="latin1").load()
    for key in keys:
        cell = storages[key]
        itemsize = STORAGE_TO_DTYPE[cell.storage_type].itemsize
        (numel,) = struct.unpack("<q", buf.read(8))
        cell.data = buf.read(numel * itemsize)

    def resolve_views(obj):
        # view cells hold ('__view__', root_key, offset_elems, size_elems)
        if isinstance(obj, _PendingTensor) and isinstance(obj.storage.data,
                                                          tuple):
            tag, root_key, off, size = obj.storage.data
            assert tag == "__view__"
            root = storages[root_key]
            itemsize = STORAGE_TO_DTYPE[root.storage_type].itemsize
            obj.storage.data = root.data[off * itemsize:(off + size) * itemsize]
        elif isinstance(obj, dict):
            for v in obj.values():
                resolve_views(v)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                resolve_views(v)
        elif isinstance(obj, _TorchGlobalStub):
            if "_vitax_views_seen" not in obj.__dict__:
                obj.__dict__["_vitax_views_seen"] = True
                for v in list(obj.__dict__.values()):
                    resolve_views(v)

    resolve_views(result)
    return _materialize_tree(result)


# -- pre-torch-0.4 tar container ----------------------------------------------
#
# torch.save on ancient torch wrote an UNCOMPRESSED tar with four members
# (torch.serialization legacy_load still reads it, torch can no longer write
# it):
#   sys_info  pickle: {protocol_version, little_endian, type_sizes}
#   storages  one stream: pickle(num) then per storage
#             pickle((key, location, StorageType)) + <int64 numel> + raw
#             bytes, then pickle(view list [(target, root, offset, numel)])
#   tensors   one stream: pickle(num) then per tensor
#             pickle((key, storage_key, TensorType)) + <int32 ndim> <4 pad
#             bytes> <int64 sizes[ndim]> <int64 strides[ndim]> <int64 offset>
#   pickle    the root object; tensors appear as integer persistent ids
#             into the shared key space


class _TarMemberUnpickler(pickle.Unpickler):
    """Header pickles inside storages/tensors members (torch globals only)."""

    def find_class(self, module, name):
        if module.startswith("torch"):
            return _stub(module, name)
        if module in ("builtins", "__builtin__"):
            return super().find_class(module, name)
        return _stub(module, name)


class _TarRootUnpickler(pickle.Unpickler):
    def __init__(self, file, objects: Dict[int, np.ndarray]):
        super().__init__(file, encoding="latin1")
        self._objects = objects

    def persistent_load(self, pid):
        if isinstance(pid, tuple):  # container-source records: the class ref
            return pid[0]
        return self._objects[int(pid)]

    def find_class(self, module, name):
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module.startswith("torch"):
            return _stub(module, name)
        if module == "collections" and name == "OrderedDict":
            return dict
        if module in ("builtins", "__builtin__"):
            return super().find_class(module, name)
        return _stub(module, name)


def _load_pth_tar(path: str) -> Any:
    with tarfile.open(path, "r:") as tar:
        def member(name: str) -> io.BytesIO:
            f = tar.extractfile(name)
            if f is None:
                raise ValueError(f"{path}: tar .pth missing member {name!r}")
            return io.BytesIO(f.read())

        storages: Dict[int, Tuple[str, bytes]] = {}  # key -> (type, bytes)
        f = member("storages")
        num = _TarMemberUnpickler(f, encoding="latin1").load()
        for _ in range(num):
            key, _location, storage_type = _TarMemberUnpickler(
                f, encoding="latin1").load()
            st_name = _storage_type_name(storage_type)
            itemsize = STORAGE_TO_DTYPE[st_name].itemsize
            (numel,) = struct.unpack("<q", f.read(8))
            storages[int(key)] = (st_name, f.read(numel * itemsize))
        for target, root, offset, numel in _TarMemberUnpickler(
                f, encoding="latin1").load():
            st_name, data = storages[int(root)]
            itemsize = STORAGE_TO_DTYPE[st_name].itemsize
            storages[int(target)] = (
                st_name, data[offset * itemsize:(offset + numel) * itemsize])

        objects: Dict[int, np.ndarray] = {}
        f = member("tensors")
        num = _TarMemberUnpickler(f, encoding="latin1").load()
        for _ in range(num):
            key, storage_key, _tensor_type = _TarMemberUnpickler(
                f, encoding="latin1").load()
            (ndim,) = struct.unpack("<i", f.read(4))
            f.read(4)  # legacy 8-byte ndim padding
            size = struct.unpack(f"<{ndim}q", f.read(8 * ndim))
            stride = struct.unpack(f"<{ndim}q", f.read(8 * ndim))
            (storage_offset,) = struct.unpack("<q", f.read(8))
            st_name, data = storages[int(storage_key)]
            flat = np.frombuffer(data, dtype=STORAGE_TO_DTYPE[st_name])
            if st_name == "BFloat16Storage":
                flat = (flat.astype(np.uint32) << 16).view(np.float32)
            itemsize = flat.dtype.itemsize
            arr = np.lib.stride_tricks.as_strided(
                flat[storage_offset:], shape=size,
                strides=tuple(s * itemsize for s in stride))
            objects[int(key)] = np.array(arr)

        return _TarRootUnpickler(member("pickle"), objects).load()


def save_pth_tar(obj: Any, path: str) -> None:
    """Write `obj` in the pre-torch-0.4 tar container (torch.load can still
    read this format; torch can no longer WRITE it — this emitter also
    produces the round-trip fixtures for the tar reader)."""
    plan: Dict[int, Tuple[str, np.ndarray]] = {}
    _plan_storages(obj, plan)
    # shared integer key space: storages 1..S, tensors S+1..
    storage_keys = {key: i + 1 for i, (key, _) in enumerate(plan.values())}
    next_key = len(storage_keys) + 1

    def single_pickle(emit) -> bytes:
        w = _PickleWriter()
        emit(w)
        w.stop()
        return w.getvalue()

    storages_buf = io.BytesIO()
    storages_buf.write(single_pickle(lambda w: w.int_(len(plan))))
    for key, arr in plan.values():
        arr_c = np.ascontiguousarray(arr)
        if arr_c.dtype.byteorder == ">":
            arr_c = arr_c.astype(arr_c.dtype.newbyteorder("<"))
        st_name = DTYPE_TO_STORAGE[arr_c.dtype.newbyteorder("<")]

        def head(w, k=storage_keys[key], s=st_name):
            w.mark()
            w.int_(k)
            w.str_("cpu")
            w.global_("torch", s)
            w.out.write(b"t")
        storages_buf.write(single_pickle(head))
        storages_buf.write(struct.pack("<q", arr_c.size))
        storages_buf.write(arr_c.tobytes())
    storages_buf.write(single_pickle(lambda w: (w.empty_list(),)))  # no views

    tensors_buf = io.BytesIO()
    tensor_keys: Dict[int, int] = {}
    tensors_buf.write(single_pickle(lambda w: w.int_(len(plan))))
    for key, arr in plan.values():
        arr_c = np.ascontiguousarray(arr)
        st_name = DTYPE_TO_STORAGE[arr_c.dtype.newbyteorder("<")]
        tkey = next_key
        next_key += 1
        tensor_keys[id(arr)] = tkey

        def head(w, k=tkey, sk=storage_keys[key],
                 t=st_name.replace("Storage", "Tensor")):
            w.mark()
            w.int_(k)
            w.int_(sk)
            w.global_("torch", t)
            w.out.write(b"t")
        tensors_buf.write(single_pickle(head))
        tensors_buf.write(struct.pack("<i", arr_c.ndim))
        tensors_buf.write(b"\x00" * 4)
        tensors_buf.write(struct.pack(f"<{arr_c.ndim}q", *arr_c.shape))
        tensors_buf.write(struct.pack(
            f"<{arr_c.ndim}q",
            *(s // arr_c.itemsize for s in arr_c.strides)))
        tensors_buf.write(struct.pack("<q", 0))

    w = _PickleWriter()
    _emit_tar_root(w, obj, tensor_keys)
    w.stop()
    root_pickle = w.getvalue()

    sys_info = pickle.dumps(
        {"protocol_version": 1000, "little_endian": True,
         "type_sizes": {"short": 2, "int": 4, "long": 4}}, protocol=2)

    with tarfile.open(path, "w", format=tarfile.PAX_FORMAT) as tar:
        for name, data in (("sys_info", sys_info),
                           ("pickle", root_pickle),
                           ("tensors", tensors_buf.getvalue()),
                           ("storages", storages_buf.getvalue())):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


def _emit_tar_root(w: "_PickleWriter", obj: Any,
                   tensor_keys: Dict[int, int]) -> None:
    """Root pickle for the tar container: tensors are integer persistent
    ids; everything else matches _emit."""
    if isinstance(obj, np.ndarray):
        w.int_(tensor_keys[id(obj)])
        w.binpersid()
    elif isinstance(obj, dict):
        w.global_("collections", "OrderedDict")
        w.tuple_end(0)
        w.reduce()
        w.mark()
        for k, v in obj.items():
            _emit_tar_root(w, k, tensor_keys)
            _emit_tar_root(w, v, tensor_keys)
        w.setitems()
    elif isinstance(obj, list):
        w.empty_list()
        w.mark()
        for v in obj:
            _emit_tar_root(w, v, tensor_keys)
        w.appends()
    elif isinstance(obj, tuple):
        w.mark()
        for v in obj:
            _emit_tar_root(w, v, tensor_keys)
        w.out.write(b"t")
    else:
        _emit(w, obj, {})


# -- writer -------------------------------------------------------------------

class _PickleWriter:
    """Minimal pickle-protocol-2 emitter for the torch .pth schema."""

    def __init__(self):
        self.out = io.BytesIO()
        self._memo: Dict[int, int] = {}
        self.out.write(b"\x80\x02")  # PROTO 2

    # low-level opcodes ------------------------------------------------------

    def _memoize(self, obj_id: int) -> None:
        idx = len(self._memo)
        self._memo[obj_id] = idx
        if idx < 256:
            self.out.write(b"q" + struct.pack("<B", idx))    # BINPUT
        else:
            self.out.write(b"r" + struct.pack("<I", idx))    # LONG_BINPUT

    def global_(self, module: str, name: str) -> None:
        self.out.write(b"c" + module.encode() + b"\n" + name.encode() + b"\n")
        self._memoize(id((module, name)) ^ hash((module, name)))

    def str_(self, s: str) -> None:
        b = s.encode("utf-8")
        if len(b) < 256:
            self.out.write(b"U" + struct.pack("<B", len(b)) + b)  # SHORT_BINSTRING
        else:
            self.out.write(b"T" + struct.pack("<I", len(b)) + b)  # BINSTRING
        self._memoize(id(s) ^ hash(("s", s)))

    def int_(self, v: int) -> None:
        if 0 <= v < 2 ** 16:
            if v < 256:
                self.out.write(b"K" + struct.pack("<B", v))       # BININT1
            else:
                self.out.write(b"M" + struct.pack("<H", v))       # BININT2
        elif -2 ** 31 <= v < 2 ** 31:
            self.out.write(b"J" + struct.pack("<i", v))           # BININT
        else:
            data = v.to_bytes((v.bit_length() + 8) // 8, "little", signed=True)
            self.out.write(b"\x8a" + struct.pack("<B", len(data)) + data)  # LONG1

    def float_(self, v: float) -> None:
        self.out.write(b"G" + struct.pack(">d", v))               # BINFLOAT

    def bool_(self, v: bool) -> None:
        self.out.write(b"\x88" if v else b"\x89")                 # NEWTRUE/FALSE

    def none_(self) -> None:
        self.out.write(b"N")

    def mark(self) -> None:
        self.out.write(b"(")

    def tuple_end(self, n: int) -> None:
        if n == 0:
            self.out.write(b")")
        elif n == 1:
            self.out.write(b"\x85")
        elif n == 2:
            self.out.write(b"\x86")
        elif n == 3:
            self.out.write(b"\x87")
        else:
            self.out.write(b"t")  # TUPLE (uses MARK)
        self._memoize(id(object()))

    def reduce(self) -> None:
        self.out.write(b"R")
        self._memoize(id(object()))

    def empty_dict(self) -> None:
        self.out.write(b"}")
        self._memoize(id(object()))

    def setitems(self) -> None:
        self.out.write(b"u")  # SETITEMS (uses MARK)

    def empty_list(self) -> None:
        self.out.write(b"]")
        self._memoize(id(object()))

    def appends(self) -> None:
        self.out.write(b"e")

    def binpersid(self) -> None:
        self.out.write(b"Q")

    def stop(self) -> None:
        self.out.write(b".")

    def getvalue(self) -> bytes:
        return self.out.getvalue()


def _plan_storages(obj: Any, plan: Dict[int, Tuple[str, np.ndarray]]) -> None:
    if isinstance(obj, np.ndarray):
        plan[id(obj)] = (str(len(plan)), obj)
    elif isinstance(obj, dict):
        for v in obj.values():
            _plan_storages(v, plan)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            _plan_storages(v, plan)


def _emit(w: _PickleWriter, obj: Any, plan: Dict[int, Tuple[str, np.ndarray]]) -> None:
    if obj is None:
        w.none_()
    elif isinstance(obj, bool):
        w.bool_(obj)
    elif isinstance(obj, (int, np.integer)):
        w.int_(int(obj))
    elif isinstance(obj, (float, np.floating)):
        w.float_(float(obj))
    elif isinstance(obj, str):
        w.str_(obj)
    elif isinstance(obj, np.ndarray):
        _emit_tensor(w, obj, plan)
    elif isinstance(obj, dict):
        # emit as collections.OrderedDict for torch-idiomatic state_dicts
        w.global_("collections", "OrderedDict")
        w.tuple_end(0)  # EMPTY_TUPLE — no MARK involved
        w.reduce()
        w.mark()
        for k, v in obj.items():
            _emit(w, k, plan)
            _emit(w, v, plan)
        w.setitems()
    elif isinstance(obj, (list,)):
        w.empty_list()
        w.mark()
        for v in obj:
            _emit(w, v, plan)
        w.appends()
    elif isinstance(obj, tuple):
        w.mark()
        for v in obj:
            _emit(w, v, plan)
        w.out.write(b"t")
    else:
        raise TypeError(f"cannot serialize {type(obj)} into .pth")


def _emit_tensor(w: _PickleWriter, arr: np.ndarray,
                 plan: Dict[int, Tuple[str, np.ndarray]]) -> None:
    key, _ = plan[id(arr)]
    arr_c = np.ascontiguousarray(arr)
    dtype = arr_c.dtype.newbyteorder("<")
    if dtype not in DTYPE_TO_STORAGE:
        raise TypeError(f"unsupported tensor dtype {arr.dtype}")
    storage_name = DTYPE_TO_STORAGE[dtype]

    w.global_("torch._utils", "_rebuild_tensor_v2")
    w.mark()  # opens the 6-element args tuple
    # persistent id tuple ('storage', Type, key, 'cpu', numel)
    w.mark()
    w.str_("storage")
    w.global_("torch", storage_name)
    w.str_(key)
    w.str_("cpu")
    w.int_(arr_c.size)
    w.out.write(b"t")
    w.binpersid()
    # remaining args: offset, size, stride, requires_grad, hooks
    w.int_(0)
    _emit_int_tuple(w, arr_c.shape)
    _emit_int_tuple(w, tuple(s // arr_c.itemsize for s in arr_c.strides))
    w.bool_(False)
    w.global_("collections", "OrderedDict")
    w.tuple_end(0)
    w.reduce()
    w.out.write(b"t")  # close the 6-element args tuple
    w.reduce()


def _emit_int_tuple(w: _PickleWriter, t: Tuple[int, ...]) -> None:
    if len(t) <= 3:
        for v in t:
            w.int_(v)
        w.tuple_end(len(t))
    else:
        w.mark()
        for v in t:
            w.int_(v)
        w.out.write(b"t")


def save_pth(obj: Any, path: str, archive_name: str = "archive") -> None:
    """Write `obj` (nested dict/list of numpy arrays + scalars/strings) as a
    torch-loadable `.pth` zip archive."""
    plan: Dict[int, Tuple[str, np.ndarray]] = {}
    _plan_storages(obj, plan)

    w = _PickleWriter()
    _emit(w, obj, plan)
    w.stop()

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{archive_name}/data.pkl", w.getvalue())
        for key, arr in plan.values():
            arr_c = np.ascontiguousarray(arr)
            if arr_c.dtype.byteorder == ">":
                arr_c = arr_c.astype(arr_c.dtype.newbyteorder("<"))
            zf.writestr(f"{archive_name}/data/{key}", arr_c.tobytes())
        zf.writestr(f"{archive_name}/version", "3\n")
        zf.writestr(f"{archive_name}/byteorder", "little")


def module_state_dict(obj: Any) -> Dict[str, np.ndarray]:
    """Recover a state_dict from a whole-module pickle.

    The reference's only res-vit save format is `torch.save(model)` — the
    entire nn.Module object graph (res-vit/utils.py:149-155). The stub
    unpicklers reconstruct that graph as `_TorchGlobalStub` instances whose
    `__dict__` carries torch's module state; this walks
    `_parameters`/`_buffers`/`_modules` exactly the way
    `nn.Module.state_dict()` does and returns the flat `name.sub.weight`
    mapping, tensors already materialized as numpy arrays."""
    out: Dict[str, np.ndarray] = {}

    def walk(m, prefix, stack):
        # guard only against true cycles (the recursion stack), not against
        # revisits: a module shared under two attribute paths (tied weights)
        # must contribute params under EVERY path, exactly like
        # nn.Module.state_dict()'s unconditional child recursion (ADVICE r4)
        if id(m) in stack:
            return
        d = getattr(m, "__dict__", None)
        if not isinstance(d, dict):
            return
        for k, v in (d.get("_parameters") or {}).items():
            if isinstance(v, np.ndarray):
                out[prefix + k] = v
        for k, v in (d.get("_buffers") or {}).items():
            if isinstance(v, np.ndarray):
                out[prefix + k] = v
        stack = stack | {id(m)}
        for k, v in (d.get("_modules") or {}).items():
            if v is not None:
                walk(v, prefix + k + ".", stack)

    walk(obj, "", frozenset())
    return out


def _is_module_graph(obj: Any) -> bool:
    d = getattr(obj, "__dict__", None)
    return (isinstance(obj, _TorchGlobalStub) and isinstance(d, dict)
            and ("_modules" in d or "_parameters" in d))


def load_state_dict_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a reference-style checkpoint and return its state_dict —
    handles raw state_dicts, {'state_dict': ...} wrappers
    (src/checkpoint.py:13), and whole-module `torch.save(model)` graphs
    (res-vit/utils.py:149-155 — walked via `module_state_dict`)."""
    obj = load_pth(path)
    if isinstance(obj, dict) and "state_dict" in obj:
        return obj["state_dict"]
    if _is_module_graph(obj):
        return module_state_dict(obj)
    return obj
