"""Torch-free reader for PyTorch ``.pth`` checkpoints (zip serialization).

The reference's checkpoint contract is a torch-saved dict
``{'model_state_dict', 'epoch'}`` (``NNDetector.py:42-53``,
``settings.py:19-20``).  Loading it normally requires torch; this module
reads the format with only the stdlib + numpy so ``convert-ckpt`` works in
images where torch is absent.

Format (torch >= 1.6 ``_use_new_zipfile_serialization=True``, the default):
a zip archive containing

  * ``<name>/data.pkl``   — a protocol-2 pickle of the object graph, where
    every tensor reduces to ``torch._utils._rebuild_tensor_v2(storage,
    storage_offset, size, stride, requires_grad, backward_hooks)`` and each
    storage is externalized as a *persistent id*
    ``('storage', <torch.XStorage class>, key, location, numel)``
  * ``<name>/data/<key>`` — the raw little-endian storage bytes
  * ``<name>/byteorder``  — optional, 'little' or 'big'

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


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
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
    def __init__(self, data: bytes, read_storage):
        super().__init__(io.BytesIO(data))
        self._read_storage = read_storage
        # pickle does not memoize persistent ids: tied/shared storages
        # (several tensors viewing one buffer) would re-read and
        # re-decompress the zip entry per referencing tensor without this
        self._storage_cache = {}

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
        if str(key) in self._storage_cache:
            return self._storage_cache[str(key)]
        dtype = _dtype_for(name)
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


def load(path: str) -> Any:
    """Load a zip-format ``.pth``; tensors come back as numpy arrays.

    Raises :class:`UnsupportedPthError` for the legacy (non-zip) torch
    format so callers can fall back to real torch when it is installed.
    """
    if not zipfile.is_zipfile(path):
        raise UnsupportedPthError(
            f"{path} is not a zip archive (legacy torch format needs torch)")
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
