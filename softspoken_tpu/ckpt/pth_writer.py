"""Torch-free writer for PyTorch ``.pth`` checkpoints (zip serialization).

The inverse of :mod:`.pth_reader`: emits the exact archive layout
``torch.save`` produces (``<name>/data.pkl`` + raw little-endian storages
under ``<name>/data/<key>`` + ``byteorder``/``version`` entries), with the
pickle stream generated directly from opcodes — no torch import.  Output
loads with ``torch.load(..., weights_only=True)`` (verified against real
torch in tests/test_pth_export.py) and with our own restricted reader.

This is what lets a user take weights trained HERE back to the reference
application: export with :func:`write_checkpoint` (via
``ckpt.export_pth`` / CLI ``convert-ckpt --to-pth``), drop the file at
``settings.py:19-20``'s path, and ``NNDetector.load_checkpoint``
(``NNDetector.py:42-53``) reads it unmodified.
"""

from __future__ import annotations

import struct
import zipfile
from typing import Any, Dict, Mapping

import numpy as np

# numpy dtype → torch storage class name (mirror of pth_reader._dtype_for)
_STORAGE_OF = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}


# -- pickle opcode emitters (protocol 2) ------------------------------------

def _int(n: int) -> bytes:
    n = int(n)
    if -(2 ** 31) <= n < 2 ** 31:
        return b"J" + struct.pack("<i", n)
    data = n.to_bytes((n.bit_length() + 8) // 8, "little", signed=True)
    return b"\x8a" + struct.pack("<B", len(data)) + data  # LONG1


def _str(s: str) -> bytes:
    b = s.encode("utf-8")
    return b"X" + struct.pack("<I", len(b)) + b  # SHORT/BINUNICODE


def _global(module: str, name: str) -> bytes:
    return b"c" + module.encode() + b"\n" + name.encode() + b"\n"


def _tuple(*items: bytes) -> bytes:
    if not items:
        return b")"  # EMPTY_TUPLE
    return b"(" + b"".join(items) + b"t"


def _tensor(arr: np.ndarray, storage_key: str) -> bytes:
    """_rebuild_tensor_v2(storage_pid, 0, size, stride, False, OrderedDict())"""
    dtype = np.dtype(arr.dtype.name)  # byteorder-free lookup key
    if dtype not in _STORAGE_OF:
        raise ValueError(f"no torch storage type for dtype {dtype}")
    strides = [int(np.prod(arr.shape[i + 1:], dtype=np.int64))
               for i in range(arr.ndim)]
    pid = _tuple(
        _str("storage"), _global("torch", _STORAGE_OF[dtype]),
        _str(storage_key), _str("cpu"), _int(arr.size),
    )
    return (
        _global("torch._utils", "_rebuild_tensor_v2")
        + _tuple(
            pid + b"Q",  # BINPERSID
            _int(0),
            _tuple(*[_int(d) for d in arr.shape]),
            _tuple(*[_int(s) for s in strides]),
            b"\x89",  # NEWFALSE (requires_grad)
            _global("collections", "OrderedDict") + b")R",  # backward_hooks
        )
        + b"R"  # REDUCE
    )


def _value(v: Any, storages: Dict[str, bytes], counter: list) -> bytes:
    """One top-level value: tensor (ndarray), int, float, str, or dict."""
    if isinstance(v, np.ndarray):
        import sys

        # .reshape(v.shape): ascontiguousarray promotes 0-d arrays to 1-d,
        # which would turn scalar tensors (num_batches_tracked) into (1,)
        arr = np.ascontiguousarray(v).reshape(v.shape)
        # storages are little-endian on disk by contract (pth_reader reads
        # them as '<'); swap on a big-endian host instead of writing native
        if arr.dtype.byteorder == ">" or (
                arr.dtype.byteorder == "=" and sys.byteorder == "big"):
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        key = str(counter[0])
        counter[0] += 1
        storages[key] = arr.tobytes()
        return _tensor(arr, key)
    if isinstance(v, bool):
        return b"\x88" if v else b"\x89"
    if isinstance(v, (int, np.integer)):
        return _int(int(v))
    if isinstance(v, (float, np.floating)):
        return b"G" + struct.pack(">d", float(v))
    if isinstance(v, str):
        return _str(v)
    if isinstance(v, Mapping):
        body = b"}" + b"("
        for k, sub in v.items():
            body += _str(str(k)) + _value(sub, storages, counter)
        return body + b"u"
    raise ValueError(f"unsupported checkpoint value type {type(v)!r}")


def write(path: str, obj: Mapping, archive_name: str = "archive") -> None:
    """Write ``obj`` (a dict of tensors / scalars / nested dicts) as a
    torch-zip ``.pth``."""
    storages: Dict[str, bytes] = {}
    counter = [0]
    body = b"\x80\x02" + _value(dict(obj), storages, counter) + b"."
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(f"{archive_name}/data.pkl", body)
        z.writestr(f"{archive_name}/byteorder", "little")
        z.writestr(f"{archive_name}/version", "3")
        for skey, raw in storages.items():
            z.writestr(f"{archive_name}/data/{skey}", raw)


def write_checkpoint(path: str, state_dict: Mapping[str, np.ndarray],
                     epoch: int = -1) -> None:
    """The reference checkpoint shape: ``{'model_state_dict', 'epoch'}``
    (``NNDetector.py:47-49``)."""
    write(path, {"model_state_dict": dict(state_dict), "epoch": int(epoch)})
