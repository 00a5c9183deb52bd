"""Pallas TPU kernel: windowing + DFT + mel + compression from a chunk buffer.

Round-3 profile (docs/PROFILE_r03.md) of the fused chunk program showed the
two dominant non-U-Net costs are

  * window FRAMING (~14%): a vmapped gather plus 256 dynamic-update-slices
    materializing a (B, 66150) f32 window matrix in HBM, then re-reading it
    to build overlapping (B, 256, 512) frames, and
  * the mel DFT matmul (~14% at f32-HIGHEST).

This kernel removes the materialization entirely: each grid step DMAs ONE
window's samples straight out of the chunk buffer (row-aligned 2-D copy),
aligns the arbitrary sample offset with two 128x128 permutation matmuls
(lane shifts cannot have dynamic sizes, but a dynamically-built one-hot
matrix is static-shaped), splits the DFT over four K=128 sub-blocks so the
(row, 128) layout feeds the MXU without any relayout reshape, and finishes
power -> mel filterbank -> sqrt(log10(x+1)) in VMEM.

Frame 0 is the one torchaudio REFLECT-padded frame per window
(samples [-256, 256) with mirror padding); it is 1/256 of the work and
needs a reversal, so the host-side wrapper computes it with the XLA path
and concatenates.  Parity target: ops.mel.log_mel_windows
(pytorch_neural_nets.py:92-99 frontend; 259->256 frame trim).

Layout contract: the chunk buffer is viewed as (rows, 128) f32; window
start s maps to row s // 128 with lane offset s % 128.  The buffer is
padded (log_mel_windows_fused: buf_len // 128 + 1 + W_ROWS rows) so every
window's 518-row span is in bounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mel as melops

LANES = 128
W_ROWS = 518          # rows DMA'd per window: ceil(66150/128) + 1 carry row
FRAMES_MID = 255      # frames 1..255 computed in-kernel
# The mel filterbank's support ends at bin 743 (f_max = 8000 Hz of a 22050 Hz
# / 2048-pt spectrum, pytorch_neural_nets.py:98); every DFT bin >= 744 has
# zero mel weight, so the kernel computes only the first 768 (= 6 x 128
# lanes) bins -- 25% less DFT/power/mel work, EXACTLY zero numeric change
# (verified: mel_filterbank()[768:] == 0).
N_FREQS_PAD = 768


@functools.lru_cache(maxsize=2)
def _tables():
    w_full = melops.dft_matrices()           # (512, 2050) = [cos | sin]
    fb_full = melops.mel_filterbank()        # (1025, 128)
    if not np.all(fb_full[N_FREQS_PAD:, :] == 0.0):  # truncation must be exact
        raise AssertionError("mel filterbank support exceeds N_FREQS_PAD")
    w = np.concatenate(
        [w_full[:, :N_FREQS_PAD], w_full[:, 1025: 1025 + N_FREQS_PAD]], axis=1
    )                                         # (512, 2*768)
    fb = fb_full[:N_FREQS_PAD, :]             # (768, 128)
    return w.astype(np.float32), fb.astype(np.float32)


def _bf16_split(a: np.ndarray):
    """a ≈ hi + lo with both parts exactly representable in bfloat16."""
    import ml_dtypes

    hi = a.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = (a - hi).astype(ml_dtypes.bfloat16).astype(np.float32)
    return hi.astype(ml_dtypes.bfloat16), lo.astype(ml_dtypes.bfloat16)


def _permute_split(x, p_lo, p_hi, parts):
    """y = x[:-1] @ p_lo + x[1:] @ p_hi for 0/1 matrices via a multi-part
    bf16 split of x instead of f32 HIGHEST (6 MXU passes per operand).

    Every contraction row of a permutation matrix has at most one nonzero,
    so each pass is rounding-free in the f32 accumulator; the only error is
    the split itself.  parts=3 reconstructs all 24 f32 mantissa bits
    (8+8+8 — EXACT, used by the "highest" kernel; asserted in
    tests/test_pallas_frame_mel.py); parts=2 leaves ~2^-16 relative error,
    far below the bf16 DFT rounding of the kernels that use it.
    """
    def multi(a, p):
        pb = p.astype(jnp.bfloat16)
        out = jnp.zeros((a.shape[0], p.shape[1]), jnp.float32)
        rem = a
        for _ in range(parts):
            part = rem.astype(jnp.bfloat16)
            rem = rem - part.astype(jnp.float32)
            out = out + jax.lax.dot(part, pb,
                                    preferred_element_type=jnp.float32)
        return out

    return multi(x[:-1, :], p_lo) + multi(x[1:, :], p_hi)


def _dft_dot_f32(yq, q, w_refs):
    """"highest" DFT sub-block dot: full-f32 MXU passes (exact)."""
    (w_ref,) = w_refs
    return jax.lax.dot(yq, w_ref[pl.ds(q * LANES, LANES), :],
                       precision=jax.lax.Precision.HIGHEST)


def _dft_dot_bf16(yq, q, w_refs, passes):
    """bf16 DFT sub-block dot: ``passes`` one-pass bf16 dots.
    passes=3 ≈ XLA HIGH (the gated engine default, w_refs = (hi, lo));
    passes=1 is plain bf16 (mel_precision="default", w_refs = (hi,) —
    the lo table is neither shipped nor resident in VMEM)."""
    whi_ref = w_refs[0]
    w_hi = whi_ref[pl.ds(q * LANES, LANES), :]
    y_hi = yq.astype(jnp.bfloat16)
    out = jax.lax.dot(y_hi, w_hi, preferred_element_type=jnp.float32)
    if passes == 3:
        w_lo = w_refs[1][pl.ds(q * LANES, LANES), :]
        y_lo = (yq - y_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = out + jax.lax.dot(y_hi, w_lo,
                                preferred_element_type=jnp.float32)
        out = out + jax.lax.dot(y_lo, w_hi,
                                preferred_element_type=jnp.float32)
    return out


def _kernel(starts_ref, buf_hbm, *refs, parts, dft_dot):
    """One grid step = one window.  The DMA double-buffering, lane
    alignment, and power/mel epilogue are shared by every precision mode;
    only the DFT sub-block dot (``dft_dot``) and the alignment split depth
    (``parts``) vary — a single body so a fix to the DMA or alignment
    logic cannot silently diverge between modes (review r3)."""
    *w_refs, fb_ref, out_ref, xwin, sems = refs
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def issue(slot, prog):
        r0 = starts_ref[prog] // LANES
        return pltpu.make_async_copy(
            buf_hbm.at[pl.ds(r0, W_ROWS), :], xwin.at[slot], sems.at[slot]
        )

    # double buffering: program i computes on slot i%2 while i+1 streams in
    @pl.when(i == 0)
    def _first():
        issue(0, 0).start()

    @pl.when(i + 1 < n)
    def _prefetch():
        issue((i + 1) % 2, i + 1).start()

    issue(i % 2, i).wait()
    x = xwin[i % 2]                                   # (W_ROWS, 128) f32

    # lane alignment: y[r, l] = flat[o + 128 r + l] for o = start % 128.
    # Dynamic-size lane slices are illegal; instead build one-hot shift
    # matrices from the dynamic scalar o and do two small matmuls:
    #   y = x[:-1] @ P_lo + x[1:] @ P_hi
    # P_lo[l, m] = (l == m + o)        (lanes still in the same row)
    # P_hi[l, m] = (l + 128 == m + o)  (lanes carried from the next row)
    o = starts_ref[i] % LANES
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    m_idx = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    p_lo = (l_idx == m_idx + o).astype(jnp.float32)
    p_hi = (l_idx + LANES == m_idx + o).astype(jnp.float32)
    y = _permute_split(x, p_lo, p_hi, parts=parts)     # (517, 128)

    # frames 1..255: frame f covers flat[256 f : 256 f + 512] = y rows
    # [2f, 2f+4).  Split the DFT contraction into four K=128 blocks so the
    # (row, 128) layout is consumed directly (no 128->256 lane reshape):
    #   proj[f] = sum_q y[2 f + q] @ W[128 q : 128 (q+1)]
    z0 = y[0:510].reshape(FRAMES_MID, 2, LANES)        # rows 2f, 2f+1
    z1 = y[2:512].reshape(FRAMES_MID, 2, LANES)        # rows 2f+2, 2f+3
    qs = (z0[:, 0, :], z0[:, 1, :], z1[:, 0, :], z1[:, 1, :])
    proj = jnp.zeros((FRAMES_MID, 2 * N_FREQS_PAD), jnp.float32)
    for q, yq in enumerate(qs):
        proj = proj + dft_dot(yq, q, w_refs)
    re = proj[:, :N_FREQS_PAD]
    im = proj[:, N_FREQS_PAD:]
    power = re * re + im * im
    # fb matmul is 33 MF — full-f32 MXU passes cost nothing in any mode
    mel = jax.lax.dot(power, fb_ref[:],
                      precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = jnp.sqrt(jnp.log10(mel + 1.0)).astype(out_ref.dtype)


def _frame0(buf: jnp.ndarray, starts: jnp.ndarray,
            precision) -> jnp.ndarray:
    """Per-window REFLECT frame 0 → (B, 1, 128) mel via the XLA path."""
    w_full, fb = _tables()

    def one(s):
        w = jax.lax.dynamic_slice(buf, (s,), (257,))
        return jnp.concatenate([w[1:257][::-1], w[:256]])

    f0 = jax.vmap(one)(starts.astype(jnp.int32))       # (B, 512)
    proj = jnp.matmul(f0, jnp.asarray(w_full), precision=precision)
    re, im = proj[:, :N_FREQS_PAD], proj[:, N_FREQS_PAD:]
    power = re * re + im * im
    mel = jnp.matmul(power, jnp.asarray(fb), precision=precision)
    return jnp.sqrt(jnp.log10(mel + 1.0))[:, None, :]  # (B, 1, 128)


def log_mel_windows_fused(
    buf: jnp.ndarray,
    starts: jnp.ndarray,
    mode: str = "highest",
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """(buf_len,) f32 chunk buffer + (B,) starts → (B, 128, 256) log-mel.

    Drop-in for ops.mel.log_mel_windows(wave, starts) on the fused-engine
    chunk path (identical frame math; frames never materialize in HBM).
    ``mode``: "highest" = full-f32 MXU passes; "high" = bf16x3 (three
    one-pass bf16 dots, matching the gated XLA HIGH default); "default" =
    plain one-pass bf16.

    ``out_dtype=bfloat16`` moves the consumer's cast INTO the kernel —
    bit-identical to casting the f32 result afterwards (one rounding either
    way) but halves the output write and the downstream transpose.
    """
    if mode not in ("highest", "high", "default"):
        raise ValueError(
            f"mode must be 'highest', 'high' or 'default', got {mode!r}")
    B = starts.shape[0]
    starts = starts.astype(jnp.int32)
    rows_needed = buf.shape[0] // LANES + 1 + W_ROWS
    pad_to = rows_needed * LANES
    buf_p = jnp.pad(buf, (0, pad_to - buf.shape[0]))
    buf2 = buf_p.reshape(rows_needed, LANES)

    w, fb = _tables()
    if mode in ("high", "default"):
        w_hi, w_lo = _bf16_split(w)
        passes = 3 if mode == "high" else 1
        dft_dot = functools.partial(_dft_dot_bf16, passes=passes)
        kernel = functools.partial(_kernel, parts=2, dft_dot=dft_dot)
        table_args = (jnp.asarray(w_hi), jnp.asarray(fb)) if passes == 1 \
            else (jnp.asarray(w_hi), jnp.asarray(w_lo), jnp.asarray(fb))
    else:
        kernel = functools.partial(_kernel, parts=3, dft_dot=_dft_dot_f32)
        table_args = (jnp.asarray(w), jnp.asarray(fb))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]      # chunk buf (HBM)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(table_args),
        out_specs=pl.BlockSpec(
            (1, FRAMES_MID, LANES), lambda i, *_: (i, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, W_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    mid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, FRAMES_MID, LANES), out_dtype),
        interpret=interpret,
    )(starts, buf2, *table_args)                       # (B, 255, 128)

    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[mode]
    f0 = _frame0(buf_p, starts, prec).astype(out_dtype)  # (B, 1, 128)
    mel = jnp.concatenate([f0, mid], axis=1)           # (B, 256, 128)
    return jnp.transpose(mel, (0, 2, 1))               # (B, 128, 256)
