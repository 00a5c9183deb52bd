"""Torch-free reader for PyTorch ``.pth`` checkpoints (both serializations).

The reference's checkpoint contract is a torch-saved dict
``{'model_state_dict', 'epoch'}`` (``NNDetector.py:42-53``,
``settings.py:19-20``).  Loading it normally requires torch; this module
reads the format with only the stdlib + numpy so ``convert-ckpt`` works in
images where torch is absent.

Zip format (torch >= 1.6 ``_use_new_zipfile_serialization=True``, the
default): a zip archive containing

  * ``<name>/data.pkl``   — a protocol-2 pickle of the object graph, where
    every tensor reduces to ``torch._utils._rebuild_tensor_v2(storage,
    storage_offset, size, stride, requires_grad, backward_hooks)`` and each
    storage is externalized as a *persistent id*
    ``('storage', <torch.XStorage class>, key, location, numel)``
  * ``<name>/data/<key>`` — the raw little-endian storage bytes
  * ``<name>/byteorder``  — optional, 'little' or 'big'

Legacy format (pre-1.6, still produced by
``_use_new_zipfile_serialization=False`` — a field user's old checkpoint is
exactly this): five back-to-back sections in one flat file —

  1. pickle of the magic number ``0x1950a86a20f9469cfc6c``
  2. pickle of the protocol version (1001)
  3. pickle of a sys-info dict (``little_endian`` must be True)
  4. pickle of the object graph; storages are persistent ids
     ``('storage', <cls>, root_key, location, numel, view_metadata)``
     where ``view_metadata`` is ``None`` or ``(view_key, offset, size)``
     for a tensor viewing a slice of a shared root storage
  5. pickle of the ordered list of root storage keys, followed by each
     storage's payload: a little-endian int64 element count, then the raw
     little-endian element bytes

Because the legacy stream stores payloads AFTER the object pickle, tensors
materialize lazily (:class:`_LazyTensor`) and are resolved against the
storages in a final graph walk.

Security: a ``.pth`` is arbitrary pickle.  ``_RestrictedUnpickler`` resolves
only the handful of globals the tensor format needs (storage classes,
``_rebuild_tensor*``, ``OrderedDict``); anything else raises — unlike
``torch.load`` without ``weights_only``, no code execution is reachable.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, Dict, Tuple

import numpy as np


class UnsupportedPthError(Exception):
    """Not the zip-serialization format this reader understands."""


# torch storage class name → numpy dtype (bfloat16 via ml_dtypes, which jax
# always ships).  Raw storage bytes are little-endian on every platform torch
# supports; a 'byteorder' archive entry saying otherwise is rejected.
def _dtype_for(storage_name: str) -> np.dtype:
    table = {
        "FloatStorage": np.float32,
        "DoubleStorage": np.float64,
        "HalfStorage": np.float16,
        "LongStorage": np.int64,
        "IntStorage": np.int32,
        "ShortStorage": np.int16,
        "CharStorage": np.int8,
        "ByteStorage": np.uint8,
        "BoolStorage": np.bool_,
    }
    if storage_name in table:
        return np.dtype(table[storage_name])
    if storage_name == "BFloat16Storage":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    raise UnsupportedPthError(f"unsupported storage type {storage_name}")


class _StorageMarker:
    """Stand-in for ``torch.XStorage`` classes referenced by GLOBAL opcodes."""

    def __init__(self, name: str):
        self.name = name


class _LazyStorage:
    """Legacy-format storage reference: payload bytes live AFTER the object
    pickle in the stream, so tensors can only bind (root_key, dtype, view)
    here and materialize in the final resolve pass."""

    __slots__ = ("root_key", "dtype", "numel", "view")

    def __init__(self, root_key: str, dtype: np.dtype, numel: int, view):
        self.root_key = root_key
        self.dtype = dtype
        self.numel = numel
        self.view = view  # None | (view_offset_elems, view_numel)


class _LazyTensor:
    """A tensor awaiting its legacy storage payload."""

    __slots__ = ("storage", "offset", "size", "stride")

    def __init__(self, storage: _LazyStorage, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = size
        self.stride = stride


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> Any:
    if isinstance(storage, _LazyStorage):
        return _LazyTensor(storage, storage_offset, size, stride)
    arr, dtype = storage
    # The pickle controls offset/size/stride; as_strided on unvalidated
    # values reads arbitrary memory (a crafted .pth segfaulted this reader
    # before these checks).  Checkpoint tensors are always non-negative
    # offset/stride views that fit inside their storage — enforce that.
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    storage_offset = int(storage_offset)
    if storage_offset < 0 or len(stride) != len(size):
        raise UnsupportedPthError(
            f"malformed tensor view: offset={storage_offset} "
            f"size={size} stride={stride}")
    if any(s < 0 for s in size) or any(s < 0 for s in stride):
        raise UnsupportedPthError(
            f"negative size/stride not allowed: size={size} stride={stride}")
    base = arr[storage_offset:]
    if len(size) == 0:
        if len(base) < 1:
            raise UnsupportedPthError(
                f"scalar tensor at offset {storage_offset} overruns "
                f"storage of {len(arr)} elements")
        return np.asarray(base[0], dtype=dtype)
    if min(size) > 0:
        last = sum((n - 1) * st for n, st in zip(size, stride))
        if last >= len(base):
            raise UnsupportedPthError(
                f"tensor view overruns storage: needs element "
                f"{storage_offset + last}, storage has {len(arr)}")
    itemsize = dtype.itemsize
    out = np.lib.stride_tricks.as_strided(
        base, shape=size, strides=tuple(s * itemsize for s in stride),
    )
    return np.ascontiguousarray(out)


def _rebuild_tensor(storage, storage_offset, size, stride) -> np.ndarray:
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): OrderedDict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    # benign numpy data constructors: real checkpoints often carry extras
    # like {'best_f1': np.float64(...)} next to the state dict
    ("numpy", "ndarray"): np.ndarray,
    ("numpy", "dtype"): np.dtype,
    # protocol-2 pickles of numpy values reconstruct bytes via
    # _codecs.encode(latin-1 str) — a pure data transform
    ("_codecs", "encode"): __import__("codecs").encode,
}
for _mod in ("numpy.core.multiarray", "numpy._core.multiarray"):  # numpy 1/2
    for _name in ("_reconstruct", "scalar"):
        try:
            import importlib

            _SAFE_GLOBALS[(_mod, _name)] = getattr(
                importlib.import_module(_mod), _name)
        except (ImportError, AttributeError):
            pass


class _RestrictedUnpickler(pickle.Unpickler):
    """Safelisted unpickler for both serializations.

    ``read_storage`` set: zip mode — persistent ids resolve to their bytes
    immediately.  ``read_storage=None``: legacy mode — persistent ids
    resolve to :class:`_LazyStorage` placeholders and the root-key → dtype
    map accumulates in ``lazy_roots`` for the payload-reading pass.
    """

    def __init__(self, stream, read_storage=None):
        if isinstance(stream, bytes):
            stream = io.BytesIO(stream)
        super().__init__(stream)
        self._read_storage = read_storage
        # pickle does not memoize persistent ids: tied/shared storages
        # (several tensors viewing one buffer) would re-read and
        # re-decompress the zip entry per referencing tensor without this
        self._storage_cache = {}
        self.lazy_roots: "OrderedDict[str, Tuple[np.dtype, int]]" = (
            OrderedDict())

    def find_class(self, module: str, name: str):
        if (module, name) in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[(module, name)]
        if module in ("torch", "torch.storage") and name.endswith("Storage"):
            return _StorageMarker(name)
        # UnsupportedPthError (not UnpicklingError) so load_pth's
        # torch.load(weights_only=True) fallback gets a chance at
        # checkpoints carrying globals outside this reader's safelist
        raise UnsupportedPthError(
            f"blocked global {module}.{name} — not part of the tensor "
            "checkpoint format this restricted reader accepts"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and len(pid) >= 5 and pid[0] == "storage"):
            raise UnsupportedPthError(f"unknown persistent id {pid!r}")
        _, storage_cls, key, _location, numel = pid[:5]
        name = storage_cls.name if isinstance(storage_cls, _StorageMarker) \
            else getattr(storage_cls, "__name__", str(storage_cls))
        dtype = _dtype_for(name)
        if self._read_storage is None:  # legacy: payloads come later
            root_key = str(key)
            prev = self.lazy_roots.get(root_key)
            if prev is not None and prev[0] != dtype:
                raise UnsupportedPthError(
                    f"storage {root_key} referenced with conflicting dtypes")
            self.lazy_roots[root_key] = (dtype, int(numel))
            view = None
            if len(pid) >= 6 and pid[5] is not None:
                vm = pid[5]  # (view_key, offset_elems, view_numel)
                if not (isinstance(vm, (tuple, list)) and len(vm) == 3):
                    raise UnsupportedPthError(
                        f"malformed view metadata {vm!r}")
                view = (int(vm[1]), int(vm[2]))
            return _LazyStorage(root_key, dtype, int(numel), view)
        if str(key) in self._storage_cache:
            return self._storage_cache[str(key)]
        raw = self._read_storage(str(key))
        want = int(numel) * dtype.itemsize
        if len(raw) < want:
            raise UnsupportedPthError(
                f"storage {key}: {len(raw)} bytes < expected {want}")
        # storage bytes are little-endian on every platform (the byteorder
        # archive entry records the WRITER, which load() requires to be
        # LE); read them as LE explicitly, then normalize to native so a
        # big-endian host doesn't silently byte-swap every weight
        arr = np.frombuffer(raw[:want], dtype=dtype.newbyteorder("<"))
        if arr.dtype != dtype:
            arr = arr.astype(dtype)
        out = (arr, dtype)
        self._storage_cache[str(key)] = out
        return out


class _ScalarUnpickler(pickle.Unpickler):
    """For the legacy preamble/manifest pickles: data-only — any global or
    persistent id in those sections means this is not the torch format."""

    def find_class(self, module, name):
        raise UnsupportedPthError(
            f"unexpected global {module}.{name} in legacy section")

    def persistent_load(self, pid):
        raise UnsupportedPthError("unexpected persistent id in legacy section")


# ---------------------------------------------------------------------------
# Legacy (pre-zipfile) stream
# ---------------------------------------------------------------------------

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C
_LEGACY_PROTOCOL = 1001


def _resolve_lazy(obj, storages: Dict[str, Tuple[np.ndarray, np.dtype]]):
    """Replace every _LazyTensor in a (checkpoint-shaped) object graph with
    its materialized numpy array.  Containers are rebuilt, preserving type
    for dict/OrderedDict/list/tuple/set — the shapes torch checkpoints use."""
    if isinstance(obj, _LazyTensor):
        st = obj.storage
        if st.root_key not in storages:
            raise UnsupportedPthError(
                f"tensor references missing storage {st.root_key}")
        arr, dtype = storages[st.root_key]
        if st.view is not None:
            off, n = st.view
            if off < 0 or n < 0 or off + n > len(arr):
                raise UnsupportedPthError(
                    f"storage view [{off}:{off + n}] overruns root "
                    f"storage of {len(arr)} elements")
            arr = arr[off:off + n]
        return _rebuild_tensor_v2((arr, dtype), obj.offset, obj.size,
                                  obj.stride)
    if isinstance(obj, _LazyStorage):  # a bare storage in the graph
        arr, _ = storages[obj.root_key]
        return np.asarray(arr)
    if isinstance(obj, OrderedDict):
        return OrderedDict(
            (k, _resolve_lazy(v, storages)) for k, v in obj.items())
    if isinstance(obj, dict):
        return {k: _resolve_lazy(v, storages) for k, v in obj.items()}
    if isinstance(obj, (list, tuple, set)):
        return type(obj)(_resolve_lazy(v, storages) for v in obj)
    return obj


def _load_legacy(f) -> Any:
    """Read torch's pre-1.6 flat serialization from an open binary stream."""
    magic = _ScalarUnpickler(f).load()
    if magic != _LEGACY_MAGIC:
        raise UnsupportedPthError(
            f"not a torch legacy stream (magic {magic!r})")
    proto = _ScalarUnpickler(f).load()
    if not isinstance(proto, int) or proto > _LEGACY_PROTOCOL:
        raise UnsupportedPthError(
            f"legacy protocol {proto!r} newer than supported "
            f"{_LEGACY_PROTOCOL}")
    sys_info = _ScalarUnpickler(f).load()
    if not isinstance(sys_info, dict) or not sys_info.get(
            "little_endian", True):
        raise UnsupportedPthError("big-endian legacy checkpoint")

    up = _RestrictedUnpickler(f, read_storage=None)
    obj = up.load()

    keys = _ScalarUnpickler(f).load()
    if not isinstance(keys, (list, tuple)) or not all(
            isinstance(k, str) for k in keys):
        raise UnsupportedPthError("malformed legacy storage-key manifest")
    storages: Dict[str, Tuple[np.ndarray, np.dtype]] = {}
    for key in keys:
        if key not in up.lazy_roots:
            raise UnsupportedPthError(
                f"manifest storage {key} never referenced by the pickle")
        dtype, numel_ref = up.lazy_roots[key]
        size_bytes = f.read(8)
        if len(size_bytes) != 8:
            raise UnsupportedPthError("truncated legacy storage header")
        (numel,) = struct.unpack("<q", size_bytes)
        if numel < 0 or numel != numel_ref:
            raise UnsupportedPthError(
                f"storage {key}: payload count {numel} != pickled "
                f"count {numel_ref}")
        raw = f.read(numel * dtype.itemsize)
        if len(raw) != numel * dtype.itemsize:
            raise UnsupportedPthError(f"truncated legacy storage {key}")
        arr = np.frombuffer(raw, dtype=dtype.newbyteorder("<"))
        if arr.dtype != dtype:
            arr = arr.astype(dtype)
        storages[key] = (arr, dtype)
    missing = [k for k in up.lazy_roots if k not in storages]
    if missing:
        raise UnsupportedPthError(
            f"storages referenced but absent from manifest: {missing}")
    return _resolve_lazy(obj, storages)


def load(path: str) -> Any:
    """Load a ``.pth`` (zip or legacy flat serialization); tensors come
    back as numpy arrays.  Raises :class:`UnsupportedPthError` for
    anything else so callers can fall back to real torch when installed."""
    if not zipfile.is_zipfile(path):
        try:
            with open(path, "rb") as f:
                return _load_legacy(f)
        except UnsupportedPthError:
            raise
        except (pickle.UnpicklingError, EOFError, KeyError, ValueError,
                IndexError, TypeError, struct.error, OverflowError,
                MemoryError) as e:
            raise UnsupportedPthError(
                f"not a readable .pth (zip or legacy): {e!r}") from e
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl:
            raise UnsupportedPthError(f"{path}: no data.pkl in archive")
        prefix = pkl[0][: -len("data.pkl")]
        bo_name = prefix + "byteorder"
        if bo_name in names and z.read(bo_name).strip() not in (b"little", b""):
            raise UnsupportedPthError("big-endian checkpoints are unsupported")

        def read_storage(key: str) -> bytes:
            try:
                return z.read(f"{prefix}data/{key}")
            except KeyError:
                raise UnsupportedPthError(
                    f"storage entry data/{key} missing from archive")

        try:
            return _RestrictedUnpickler(z.read(pkl[0]), read_storage).load()
        except UnsupportedPthError:
            raise
        except (pickle.UnpicklingError, EOFError, KeyError, ValueError,
                IndexError, TypeError, struct.error, OverflowError,
                zipfile.BadZipFile) as e:
            # corrupt/truncated archives must surface as UnsupportedPthError
            # so convert.py's torch.load(weights_only=True) fallback (which
            # catches exactly that) gets its chance when torch exists
            raise UnsupportedPthError(f"malformed .pth: {e!r}") from e


def load_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], int]:
    """Reference-shaped load: → (state_dict of numpy arrays, epoch)."""
    obj = load(path)
    if not isinstance(obj, dict) or "model_state_dict" not in obj:
        raise UnsupportedPthError(
            "checkpoint is not the reference {'model_state_dict', 'epoch'} "
            f"dict (got {type(obj).__name__})")
    return dict(obj["model_state_dict"]), int(obj.get("epoch", -1))
