"""Minimal FLAC *encoder* — parity tooling for tests/test_flac.py.

Independent re-derivation of the FLAC bitstream format (like np_ref.py for
the mel frontend): writes real, spec-conformant FLAC files with a bitwriter
so the native decoder (csrc/ssflac.cpp) is tested against ground-truth
sample data this encoder was given, not against its own output. Supports
what the tests exercise: 8/16/24-bit, mono/stereo, fixed 4096 blocking with
a short last frame, CONSTANT / VERBATIM / FIXED(0-2) subframes with
single-partition rice residuals, optional left/side decorrelation, correct
header CRC-8 and frame CRC-16, optional SEEKTABLE.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        value &= (1 << nbits) - 1
        self._acc = (self._acc << nbits) | value
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self.bytes.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    bits = n.bit_length()
    for total in range(2, 8):
        # capacity of a t-byte extended-UTF-8 number: lead byte carries
        # (7 - t) bits (t<7; 0 for t=7), each continuation 6 -> 5t + 1
        # (review r3 batch 15: the old condition mis-encoded frame numbers
        # >= 2048 and rejected legal 35-36 bit values)
        if bits <= 5 * total + 1:
            body = []
            for _ in range(total - 1):
                body.append(0x80 | (n & 0x3F))
                n >>= 6
            lead = ((0xFF << (8 - total)) & 0xFF) | n
            return bytes([lead] + body[::-1])
    raise ValueError("number too large")


def _rice_param(res: np.ndarray) -> int:
    mean = float(np.mean(np.abs(res))) if len(res) else 0.0
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _write_residual(w: BitWriter, res: np.ndarray) -> None:
    """method 0 (4-bit rice), partition order 0."""
    w.write(0, 2)
    w.write(0, 4)
    k = _rice_param(res)
    w.write(k, 4)
    for v in res:
        v = int(v)
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
        w.write_unary(u >> k)
        if k:
            w.write(u & ((1 << k) - 1), k)


_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
}


def _write_subframe(w: BitWriter, x: np.ndarray, bps: int,
                    force: Optional[str] = None) -> None:
    x = np.asarray(x, np.int64)
    w.write(0, 1)  # reserved
    if force == "verbatim":
        kind = "verbatim"
    elif force == "constant" or (len(np.unique(x)) == 1 and force is None):
        # honor the forced type LOUDLY: silently downgrading to verbatim
        # made tests believe they exercised the CONSTANT path when they
        # didn't (review r3 batch 15)
        if force == "constant" and len(np.unique(x)) != 1:
            raise ValueError("force_subframe='constant' needs constant data")
        kind = "constant"
    elif force in ("fixed0", "fixed1", "fixed2"):
        kind = force
    else:
        kind = "fixed2" if len(x) > 2 else "verbatim"

    if kind == "constant":
        w.write(0, 6)
        w.write(0, 1)
        w.write_signed(int(x[0]), bps)
        return
    if kind == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in x:
            w.write_signed(int(v), bps)
        return
    order = int(kind[-1])
    w.write(8 + order, 6)
    w.write(0, 1)
    for v in x[:order]:
        w.write_signed(int(v), bps)
    if order == 0:
        res = x
    elif order == 1:
        res = x[1:] - x[:-1]
    else:
        res = x[2:] - 2 * x[1:-1] + x[:-2]
    _write_residual(w, res)


BLOCKSIZE = 4096


def write_flac(
    path: str,
    data: np.ndarray,          # (frames,) or (frames, channels) int
    samplerate: int,
    bits: int = 16,
    force_subframe: Optional[str] = None,
    left_side: bool = False,
    seektable_every: Optional[int] = None,
    first_frame_number: int = 0,  # nonzero = malformed stream for seek tests
) -> None:
    data = np.asarray(data, np.int64)
    if data.ndim == 1:
        data = data[:, None]
    frames, channels = data.shape
    assert not left_side or channels == 2

    blocks: List[np.ndarray] = [
        data[i : i + BLOCKSIZE] for i in range(0, frames, BLOCKSIZE)
    ]

    # ---- encode frames ----
    frame_blobs: List[bytes] = []
    for fi, block in enumerate(blocks):
        w = BitWriter()
        n = len(block)
        w.write(0b11111111111110, 14)
        w.write(0, 1)            # mandatory 0
        w.write(0, 1)            # fixed blocking
        if n == BLOCKSIZE:
            bs_code, bs_extra = 12, None       # 256 << (12-8) = 4096
        else:
            bs_code, bs_extra = 7, n - 1       # 16-bit explicit
        w.write(bs_code, 4)
        w.write(0, 4)            # sample rate: from STREAMINFO
        if left_side:
            w.write(8, 4)        # left/side
        else:
            w.write(channels - 1, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits]
        w.write(ss_code, 3)
        w.write(0, 1)            # reserved
        for b in _utf8_number(fi + first_frame_number):
            w.write(b, 8)
        if bs_extra is not None:
            w.write(bs_extra, 16)
        w.align()
        header = bytes(w.bytes)
        w.write(crc8(header), 8)

        if left_side:
            left = block[:, 0]
            side = block[:, 0] - block[:, 1]
            _write_subframe(w, left, bits, force_subframe)
            _write_subframe(w, side, bits + 1, force_subframe)
        else:
            for c in range(channels):
                _write_subframe(w, block[:, c], bits, force_subframe)
        w.align()
        body = bytes(w.bytes)
        w.write(crc16(body), 16)
        frame_blobs.append(bytes(w.bytes))

    # ---- metadata ----
    def streaminfo() -> bytes:
        w = BitWriter()
        w.write(BLOCKSIZE, 16)
        w.write(BLOCKSIZE, 16)
        w.write(0, 24)
        w.write(0, 24)
        w.write(samplerate, 20)
        w.write(channels - 1, 3)
        w.write(bits - 1, 5)
        w.write(frames, 36)
        for _ in range(16):
            w.write(0, 8)        # MD5 unset
        return bytes(w.bytes)

    seektable = b""
    if seektable_every:
        offsets = np.cumsum([0] + [len(b) for b in frame_blobs[:-1]])
        entries = []
        for fi in range(0, len(blocks), seektable_every):
            sample = fi * BLOCKSIZE
            entries.append(
                sample.to_bytes(8, "big")
                + int(offsets[fi]).to_bytes(8, "big")
                + len(blocks[fi]).to_bytes(2, "big")
            )
        seektable = b"".join(entries)

    with open(path, "wb") as f:
        f.write(b"fLaC")
        si = streaminfo()
        last = 0x80 if not seektable else 0x00
        f.write(bytes([last | 0]) + len(si).to_bytes(3, "big") + si)
        if seektable:
            f.write(bytes([0x80 | 3]) + len(seektable).to_bytes(3, "big") + seektable)
        for blob in frame_blobs:
            f.write(blob)
