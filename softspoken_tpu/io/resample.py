"""Polyphase sample-rate conversion.

The reference resamples every file to 22050 Hz with librosa's default
``soxr_hq`` resampler (``voice_activity.py:65-67``).  soxr is not a vendored
part of the reference, so here we implement an explicit Kaiser-windowed-sinc
polyphase resampler with a documented filter design.  BASELINE.md defines
parity at the *detection-interval* level, which tolerates the (sub-1e-3)
passband differences between windowed-sinc designs.

Two execution paths share the same taps:
  * host path  — ``scipy.signal.resample_poly`` (C polyphase)
  * device path — XLA dilated convolution (``jax_resample``), used by the
    streaming engine so decode-side CPU never bottlenecks the TPU.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import scipy.signal

# Filter quality: 32 zero-crossings per side at the lower rate, Kaiser beta
# 12.98 (~130 dB stopband), 0.947 rolloff — comparable to librosa kaiser_best.
_ZEROS = 32
_BETA = 12.984
_ROLLOFF = 0.9475937167399596


@lru_cache(maxsize=64)
def design_taps(up: int, down: int) -> np.ndarray:
    """Linear-phase low-pass FIR for a rational up/down conversion.

    Returned taps are *unscaled* (resample_poly multiplies by ``up``).
    """
    max_rate = max(up, down)
    f_c = _ROLLOFF / max_rate  # relative to Nyquist of the upsampled rate
    half_len = _ZEROS * max_rate
    return scipy.signal.firwin(2 * half_len + 1, f_c, window=("kaiser", _BETA)).astype(
        np.float64
    )


def _ratio(orig_sr: int, target_sr: int):
    g = math.gcd(int(orig_sr), int(target_sr))
    return target_sr // g, orig_sr // g


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Resample 1-D (or [..., time]) float audio on the host.

    Output length is ``ceil(n * target_sr / orig_sr)`` (librosa convention).
    Uses the multithreaded native kernel (csrc/ssdsp.cpp) when available,
    else scipy's polyphase — both share the same taps and alignment.
    """
    if orig_sr == target_sr:
        return np.asarray(x, dtype=np.float32)
    up, down = _ratio(orig_sr, target_sr)
    taps = design_taps(up, down)

    if np.ndim(x) == 1:
        from . import native

        y = native.resample_f32(np.asarray(x, np.float32), up, down, taps)
        if y is not None:
            return y
    y = scipy.signal.resample_poly(
        np.asarray(x, dtype=np.float64), up, down, axis=-1, window=taps
    )
    return y.astype(np.float32)


def resampled_length(n: int, orig_sr: int, target_sr: int) -> int:
    if orig_sr == target_sr:
        return n
    up, down = _ratio(orig_sr, target_sr)
    return -(-(n * up) // down)  # ceil


_DEVICE_RESAMPLERS = {}


def get_device_resampler(orig_sr: int, target_sr: int, out_chunk: int):
    """Cached DeviceChunkResampler — a fresh jit closure per file would
    re-load the program on the device every time (minutes on remote TPUs)."""
    key = (orig_sr, target_sr, out_chunk)
    if key not in _DEVICE_RESAMPLERS:
        _DEVICE_RESAMPLERS[key] = DeviceChunkResampler(orig_sr, target_sr, out_chunk)
    return _DEVICE_RESAMPLERS[key]


def polyphase_matmul_weights(up: int, down: int):
    """Reorganize the polyphase filter as one dense (width, up) matrix.

    Derivation (matches scipy.resample_poly exactly): with H = taps·up,
    half = (T−1)/2 and output m = j·up + q,

        y[m] = Σ_j H[r_q + jj·up] · x[j·down + c_q − jj]
        r_q = (q·down + half) mod up,   c_q = (q·down + half − r_q)/up

    so every block of ``up`` consecutive outputs is ONE matvec against a
    shared window of ``width ≈ down + T/up`` native samples:

        Y[j, q] = Σ_w W[w, q] · x[j·down + wmin + w]  →  Y = X @ W

    This turns resampling into an MXU matmul — the dilated-conv
    formulation compiles poorly on TPU (huge dilation × 40961 taps).
    Returns (W float32 (width, up), wmin int).
    """
    taps = design_taps(up, down)
    H = (taps * up).astype(np.float64)
    T = len(H)
    half = (T - 1) // 2
    q = np.arange(up, dtype=np.int64)
    r = (q * down + half) % up
    c = (q * down + half - r) // up
    J = (T - 1 - r) // up
    wmin = int((c - J).min())
    wmax = int(c.max())
    width = wmax - wmin + 1
    W = np.zeros((width, up), np.float64)
    for qq in range(up):
        jj = np.arange(J[qq] + 1)
        W[c[qq] - jj - wmin, qq] = H[r[qq] + jj * up]
    return W.astype(np.float32), wmin


def polyphase_block_geometry(up: int, down: int, out_chunk: int):
    """Static geometry for the blocked polyphase matmul.

    Returns (W, wmin, n_blocks, n_copies, pad_l, in_len): output block j of
    ``up`` samples is X[j] @ W with X[j] = xp[base + j·down : … + width],
    and X is assembled from ``n_copies`` shifted views of a
    (n_blocks+n_copies, down) reshape (handles any ratio, including small
    ``down`` where the filter spans many native blocks).
    """
    W, wmin = polyphase_matmul_weights(up, down)
    width = W.shape[0]
    n_blocks = -(-out_chunk // up) + 5  # slack: alignment lo can reach ~4·up
    n_copies = -(-width // down) + 1
    pad_l = max(0, -wmin)
    in_len = (n_blocks + n_copies) * down + pad_l + width
    return W, wmin, n_blocks, n_copies, pad_l, in_len


def polyphase_apply(x, W_dev, *, wmin: int, pad_l: int, n_blocks: int,
                    n_copies: int, down: int, width: int):
    """The traced polyphase block matmul, shared by DeviceChunkResampler and
    the fused engine (engine/fused.py) so the alignment arithmetic and the
    precision pin cannot silently diverge (review r3 finding).

    ``x`` is the padded native buffer laid out by polyphase_block_geometry;
    returns the flat internal-rate samples.  precision=HIGHEST: audio
    samples need true f32 — a default (single-bf16-pass) matmul adds ~1e-3
    relative noise to every resampled sample, diverging from the host
    resampler far beyond float32 round-off (review r3 finding; same pin as
    jax_resample below).
    """
    import jax
    import jax.numpy as jnp

    base = wmin + pad_l
    a = jax.lax.dynamic_slice(x, (base,), ((n_blocks + n_copies) * down,))
    A = a.reshape(n_blocks + n_copies, down)
    X = jnp.concatenate(
        [A[k: k + n_blocks] for k in range(n_copies)], axis=1
    )[:, :width]
    Y = jnp.matmul(X, W_dev, precision=jax.lax.Precision.HIGHEST)
    return Y.reshape(-1)


class DeviceChunkResampler:
    """Fixed-shape, jit-compiled device resampler for streaming decode.

    One compiled program per (orig_sr, target_sr, out_chunk) converts a
    native chunk to internal-rate samples as a single MXU matmul (see
    polyphase_matmul_weights) — on a 1-core host the polyphase filter
    dominates decode wall time.  Alignment contract: the native read start
    must be a multiple of ``down`` so chunk outputs land exactly on the
    whole-file resampling grid (same invariant as the host chunk path).

    Not thread-safe per instance (owns a scratch buffer); use one stream at
    a time per (rate, chunk) key.
    """

    def __init__(self, orig_sr: int, target_sr: int, out_chunk: int):
        import jax
        import jax.numpy as jnp

        self.orig_sr, self.target_sr = orig_sr, target_sr
        self.up, self.down = _ratio(orig_sr, target_sr)
        up, down = self.up, self.down
        W, wmin, n_blocks, n_copies, pad_l, in_len = polyphase_block_geometry(
            up, down, out_chunk
        )
        width = W.shape[0]
        self.wmin = wmin
        self.out_chunk = out_chunk
        self.n_blocks = n_blocks
        self.pad_l = pad_l
        self.in_len = in_len
        W_dev = jnp.asarray(W)

        def fn(xp):
            # block starts: j·down + wmin + pad_l (pad_l cancels wmin ≤ 0)
            return polyphase_apply(
                xp, W_dev, wmin=wmin, pad_l=pad_l, n_blocks=n_blocks,
                n_copies=n_copies, down=down, width=width,
            )

        self._fn = jax.jit(fn)
        self._buf = np.zeros(self.in_len, np.float32)

    def resample_range(
        self, read_native, native_frames: int, out_pos: int, out_n: int
    ) -> np.ndarray:
        """Internal-rate samples [out_pos, out_pos+out_n).

        ``read_native(start, frames) -> float32 mono`` supplies native
        samples (clamped at EOF); zero-fill at the edges matches the
        whole-file resample's zero padding.
        """
        assert out_n <= self.out_chunk
        # choose an aligned native start: out index o maps to block
        # j = o // up with in-block phase o % up; native base = j*down.
        # We read from rs (multiple of down) and treat it as block 0 of a
        # local grid whose first output index is rs·up/down.
        in_first = (out_pos * self.down) // self.up
        rs = max(0, in_first - 2 * self.down)
        rs -= rs % self.down
        first_out_global = (rs * self.up) // self.down
        lo = out_pos - first_out_global
        # RuntimeError, not assert: these alignment invariants guard against
        # SILENTLY time-shifted audio (dynamic_slice clamps out-of-range
        # starts) and must survive python -O, like engine/fused.py's checks
        if not 0 <= lo <= 4 * self.up:
            raise RuntimeError(
                f"polyphase alignment violated: lo={lo} up={self.up}")
        if lo + out_n > self.n_blocks * self.up:
            raise RuntimeError(
                f"polyphase range violated: lo={lo} out_n={out_n} "
                f"cap={self.n_blocks * self.up}")

        self._buf[:] = 0.0
        # local layout: native sample (rs + i) sits at buf[pad_l + i]; the
        # filter's left context (indices below rs) must be real audio too
        left = min(rs, self.pad_l)
        re = min(native_frames, rs + self.in_len - self.pad_l)
        got = read_native(rs - left, re - (rs - left))
        self._buf[self.pad_l - left : self.pad_l - left + len(got)] = got
        y = np.asarray(self._fn(self._buf))
        return y[lo : lo + out_n]


def jax_resample(x, orig_sr: int, target_sr: int):
    """Same conversion expressed as one XLA dilated convolution on device.

    Zero-stuff by ``up`` (lhs dilation), convolve with the shared taps, then
    stride by ``down`` — the textbook polyphase identity, but left to XLA,
    which lowers it onto the MXU/VPU.  Matches ``resample`` to float32
    round-off.
    """
    import jax.numpy as jnp
    from jax import lax

    if orig_sr == target_sr:
        return jnp.asarray(x, dtype=jnp.float32)
    up, down = _ratio(orig_sr, target_sr)
    taps = (design_taps(up, down) * up).astype(np.float32)
    half = (len(taps) - 1) // 2
    n_out = resampled_length(x.shape[-1], orig_sr, target_sr)

    lhs = jnp.asarray(x, jnp.float32).reshape(1, 1, -1)
    rhs = jnp.asarray(taps[::-1].copy()).reshape(1, 1, -1)
    # Center the filter: output sample m sits at upsampled index m*down; the
    # convolution introduces a group delay of `half`, cancelled via padding.
    y = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(down,),
        padding=[(half, half + down)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=lax.Precision.HIGHEST,  # audio samples need true f32, not bf16 passes
    )[0, 0]
    return y[:n_out]
