"""Native host-DSP loader (csrc/ssdsp.cpp via ctypes).

Compiles the C++ kernels on first use with g++ (cached as a .so keyed by a
source hash) and exposes them as numpy-friendly wrappers.  Everything
degrades gracefully to the pure-Python/scipy paths when no compiler is
available — the native path is a performance tier, not a dependency.
"""

from __future__ import annotations

import ctypes
import threading
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "ssdsp.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False
_load_lock = threading.Lock()


def _cache_dir() -> str:
    d = os.environ.get(
        "SOFTSPOKEN_NATIVE_CACHE",
        os.path.expanduser("~/.cache/softspoken_tpu/native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _host_isa_tag() -> str:
    """Short digest of the host CPU's ISA surface.

    The build uses -march=native, so the cache key must discriminate hosts:
    a shared/NFS cache dir serving an AVX-512 build to a host without it
    SIGILLs at runtime (review r3 finding).  /proc/cpuinfo flags capture the
    ISA on Linux; elsewhere fall back to the platform machine string.
    """
    import platform

    blob = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    blob = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(blob.encode()).hexdigest()[:8]


def build_shared_lib(src: str, name: str) -> Optional[str]:
    """Compile a csrc/*.cpp into a content-hash-cached .so; None on failure.

    Shared by the DSP kernels (ssdsp) and the FLAC decoder (io/flac.py).
    """
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(
        _cache_dir(), f"{name}_{digest}_{_host_isa_tag()}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", tmp, src, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except Exception as e:  # noqa: BLE001 — no compiler / failed build
        log.info("native build of %s unavailable (%s)", name, e)
        try:
            os.unlink(tmp)  # don't leak partial outputs per failed attempt
        except OSError:
            pass
        return None


def _build() -> Optional[str]:
    return build_shared_lib(_SRC, "ssdsp")


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    with _load_lock:
        # double-checked: _tried published only after the (up-to-120s)
        # compile so a concurrent caller can neither observe a None _lib
        # mid-build nor start a duplicate g++ on this 1-core host
        # (review r3 batch 14; same pattern as flac._get_lib)
        if _tried:
            return _lib
        lib = _load_locked()
        _lib = lib
        _tried = True
        return lib


def _load_locked() -> Optional[ctypes.CDLL]:
    if os.environ.get("SOFTSPOKEN_DISABLE_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.ss_resample_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
    ]
    lib.ss_downmix_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
    ]
    lib.ss_pcm16_to_mono_f32.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
    ]
    lib.ss_fir_decim_i16.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.ss_mulaw_encode_i16.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
        ctypes.c_int32,
    ]
    lib.ss_ima_encode_i16.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    return lib


def _threads() -> int:
    return max(1, min(8, (os.cpu_count() or 2) - 1))


def native_available() -> bool:
    return get_lib() is not None


def resample_f32(x: np.ndarray, up: int, down: int, taps: np.ndarray) -> Optional[np.ndarray]:
    """scipy.resample_poly-equivalent conversion; None if native is absent."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    taps = np.ascontiguousarray(taps, np.float64)
    n_out = -(-(len(x) * up) // down)
    y = np.empty(n_out, np.float32)
    lib.ss_resample_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
        taps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(taps),
        up, down, _threads(),
    )
    return y


def downmix_f32(x: np.ndarray) -> Optional[np.ndarray]:
    """(frames, channels) f32 → mono mean; None if native is absent."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    frames, channels = x.shape
    y = np.empty(frames, np.float32)
    lib.ss_downmix_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frames, channels,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _threads(),
    )
    return y


def mulaw_encode_i16(x: np.ndarray, lut: np.ndarray,
                     out: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    """int16 PCM → int8 mu-law via the 64 Ki LUT; None if native is absent.

    ``out`` (contiguous int8, len(x)) avoids the output allocation.
    """
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.int16)
    lut = np.ascontiguousarray(lut, np.int8)
    if out is None:
        q = np.empty(len(x), np.int8)
    else:
        # not `assert`: the native loop writes through this pointer, so a
        # wrong dtype/size under `python -O` is heap corruption, not a bug
        if out.dtype != np.int8 or not out.flags.c_contiguous:
            raise ValueError("out must be a contiguous int8 buffer")
        if len(out) != len(x):
            raise ValueError(f"out length {len(out)} != input length {len(x)}")
        q = out
    lib.ss_mulaw_encode_i16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(x),
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), _threads(),
    )
    return q


def fir_decim_i16(xbuf: np.ndarray, h: np.ndarray, M: int,
                  n_out: int) -> Optional[np.ndarray]:
    """Zero-phase FIR decimation by ``M`` (io/decimate.py contract):
    ``y[j] = clip(rint(sum_k h[k] * xbuf[j*M + k]))``; None if native is
    absent.  ``len(xbuf)`` must be ``(n_out-1)*M + len(h)``."""
    lib = get_lib()
    if lib is None:
        return None
    xbuf = np.ascontiguousarray(xbuf, np.int16)
    h = np.ascontiguousarray(h, np.float32)
    # not `assert`: the kernel reads xbuf[(n_out-1)*M + T - 1]; a short
    # buffer under `python -O` is an out-of-bounds read, not a bug report
    if len(xbuf) != (n_out - 1) * M + len(h):
        raise ValueError(
            f"xbuf length {len(xbuf)} != (n_out-1)*M+T = {(n_out - 1) * M + len(h)}")
    y = np.empty(n_out, np.int16)
    lib.ss_fir_decim_i16(
        xbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(xbuf),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n_out,
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(h), M,
        _threads(),
    )
    return y


def pcm16_to_mono_f32(raw: np.ndarray, channels: int) -> Optional[np.ndarray]:
    """Interleaved int16 → mono float (fused decode+downmix)."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.int16)
    frames = len(raw) // channels
    y = np.empty(frames, np.float32)
    lib.ss_pcm16_to_mono_f32(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), frames, channels,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _threads(),
    )
    return y


def ima_encode_i16(x: np.ndarray, out: np.ndarray,
                   spb: int) -> Optional[np.ndarray]:
    """int16 PCM → 4-bit IMA-ADPCM wire blocks; None if native is absent.

    ``out`` must be a contiguous uint8 buffer of exactly
    ``ceil(len(x)/spb) * (4 + spb//2)`` bytes (ops/adpcm.py::wire_bytes);
    the caller (ops/adpcm.encode_i16) validates that, but re-check here —
    the native loop writes through the raw pointer.
    """
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.int16)
    nb = -(-len(x) // spb)
    want = nb * (4 + spb // 2)
    if out.dtype != np.uint8 or not out.flags.c_contiguous or len(out) != want:
        raise ValueError(f"out must be contiguous uint8[{want}]")
    lib.ss_ima_encode_i16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(x),
        spb, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
