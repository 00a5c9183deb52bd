"""Score-grid → speech-interval post-processing (vectorized).

Numerics contract (SURVEY.md §2.2, NNDetector.py:103-190):
  * global grid of dt = 3/256 s bins; each window scatter-adds its 256 raw
    logits at bin round(i·0.6/(3/256)); averaged by coverage count
  * bin time = idx·(3/256), formatted "%.4f" then re-parsed with float()
    downstream (the reference passes times around as strings;
    NNDetector.py:185-187, worker.py:100) — reproduced exactly because the
    4-decimal quantization is visible in the output CSVs
  * threshold: value **> 0.1** opens/extends a region; a region's end time is
    the last above-threshold bin (NNDetector.py:117-127)
  * regions merged while gap ≤ break_duration = 0.5 s (NNDetector.py:129-138)
  * −pad_seconds shift applied by the caller (worker.py:100)

The reference implements this as a Python loop over every bin; here runs and
merges are found with numpy in O(n) vector ops, and only the (few) boundary
times get the "%.4f" string treatment.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

TIME_RESOLUTION = 3.0 / 256.0  # exact in binary


def bin_time(idx: int) -> float:
    """Reference bin→time mapping incl. its 4-decimal string round-trip."""
    return float(f"{idx * TIME_RESOLUTION:.4f}")


def window_bin_offset(window_index, step_seconds: float = 0.6) -> np.ndarray:
    """Grid bin where window i's 256 scores start: round(i·step/dt).

    Uses round-half-even like python round() / np.rint (NNDetector.py:175).
    """
    return np.rint(np.asarray(window_index, np.float64) * step_seconds / TIME_RESOLUTION).astype(
        np.int64
    )


def average_grid_host(mask_logits: np.ndarray, step_seconds: float = 0.6):
    """Host fallback of the overlap average (device version: ops.scatter).

    mask_logits: (num_windows, 256) raw logits in window order.
    Returns (sum_grid, count_grid) sized to the last covered bin.
    """
    n = mask_logits.shape[0]
    if n == 0:
        return np.zeros(0), np.zeros(0)
    offs = window_bin_offset(np.arange(n), step_seconds)
    glen = int(offs[-1]) + mask_logits.shape[1]
    s = np.zeros(glen, np.float64)
    c = np.zeros(glen, np.float64)
    frame = np.arange(mask_logits.shape[1])
    idx = (offs[:, None] + frame[None, :]).ravel()
    np.add.at(s, idx, mask_logits.astype(np.float64).ravel())
    np.add.at(c, idx, 1.0)
    return s, c


def smooth_grid(avg_values: np.ndarray, width: int) -> np.ndarray:
    """Centered running-median of the averaged score grid.

    ``width`` odd bins (evens rounded up); edges replicate.  A width-5
    median spans ~59 ms (dt = 3/256 s) — far below the 100 ms minimum
    detection length, so it cannot erase a legal event; what it removes is
    single-bin threshold flicker at event boundaries, the dominant cause
    of event fragmentation at the parity operating point (VERDICT r3 #3).
    NOT reference behavior — opt-in via EngineConfig.grid_smooth.  Note:
    with min_count masking (-inf bins) a median can resurrect an isolated
    masked bin; acceptable because both knobs are non-parity opt-ins.
    """
    if width <= 1:
        return np.asarray(avg_values)
    av = np.asarray(avg_values, np.float64)
    if len(av) == 0:
        return av
    w = min(int(width) | 1, 2 * len(av) - 1)
    pad = w // 2
    padded = np.pad(av, pad, mode="edge")
    from numpy.lib.stride_tricks import sliding_window_view

    return np.median(sliding_window_view(padded, w), axis=1)


def find_speech_regions(
    avg_values: np.ndarray,
    threshold: float = 0.1,
    break_duration: float = 0.5,
    first_bin: int = 0,
    exit_threshold: float | None = None,
    smooth_bins: int = 0,
) -> List[Tuple[float, float]]:
    """Threshold + run-find + gap-merge over the averaged grid.

    avg_values[k] is the averaged score of grid bin (first_bin + k); bins are
    contiguous (window stride ≪ window length guarantees no interior holes).
    Returns [(start_time, end_time)] with the reference's exact time
    quantization; no offset shift applied.

    ``exit_threshold`` (None = reference behavior) enables hysteresis: a
    region must contain at least one bin above ``threshold`` (the enter
    level) but extends outward over every contiguous bin above
    ``exit_threshold``.  Standard VAD dual-thresholding — the averaged
    logits ramp up/down over ~a window length at speech edges, so the
    single parity threshold clips onset/offset tails and splits events
    whose interior dips just under it; see config.EngineConfig.
    NOT the reference contract (NNDetector.py:109-127) — off by default,
    and ignored when >= threshold (no-op by definition).

    ``smooth_bins`` (0/1 = reference behavior) applies :func:`smooth_grid`
    to the grid before thresholding.
    """
    av = np.asarray(avg_values)
    if smooth_bins > 1:
        av = smooth_grid(av, smooth_bins)
    above = av > threshold
    if not above.any():
        return []
    if exit_threshold is not None and exit_threshold < threshold:
        # runs of the LOW threshold, kept only if they contain a seed bin
        # above the high threshold
        low = av > exit_threshold
        d = np.diff(low.astype(np.int8))
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1)
        if low[0]:
            starts = np.r_[0, starts]
        if low[-1]:
            ends = np.r_[ends, len(low) - 1]
        seed_csum = np.r_[0, np.cumsum(above)]
        has_seed = seed_csum[ends + 1] - seed_csum[starts] > 0
        starts, ends = starts[has_seed], ends[has_seed]
    else:
        # run boundaries
        d = np.diff(above.astype(np.int8))
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1)  # inclusive index of last above bin
        if above[0]:
            starts = np.r_[0, starts]
        if above[-1]:
            ends = np.r_[ends, len(above) - 1]

    st = np.array([bin_time(first_bin + int(i)) for i in starts])
    et = np.array([bin_time(first_bin + int(i)) for i in ends])

    # merge consecutive regions with gap ≤ break_duration. Group boundaries
    # are where a gap exceeds the threshold; O(n) (the previous per-group
    # boolean-mask scan was O(n²) — real on noisy multi-hour recordings).
    if len(st) > 1:
        new_group = np.flatnonzero(st[1:] - et[:-1] > break_duration)
        merged_s = st[np.r_[0, new_group + 1]]
        merged_e = et[np.r_[new_group, len(et) - 1]]
        return list(zip(merged_s, merged_e))
    return list(zip(st, et))


def shift_regions(regions, offset_seconds: float) -> List[Tuple[float, float]]:
    """Apply the −pad shift (worker.py:100)."""
    return [(s + offset_seconds, e + offset_seconds) for (s, e) in regions]


def filter_min_length(regions, minimum_detection_len: float = 0.1):
    """Review-stage filter: keep only length > minimum_detection_len
    (settings.py:26, review_detections.py:764-770)."""
    return [(s, e) for (s, e) in regions if (e - s) > minimum_detection_len]


def merge_intervals(intervals, gap: float = 0.3) -> List[Tuple[float, float]]:
    """Sort and merge intervals whose gap is ≤ ``gap`` seconds.

    The shared label-merge convention used by BOTH synthetic label
    generators (train/synth.py, train/synth2.py) — one implementation so
    the two eval families cannot silently desynchronize their label
    semantics (review r3 batch 6)."""
    merged: List[Tuple[float, float]] = []
    for s, e in sorted(intervals):
        if merged and s - merged[-1][1] <= gap:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged
