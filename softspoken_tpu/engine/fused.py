"""Fused on-device streaming detection: raw PCM up, score grids down.

Measured on the remote-attached TPU, the link is wildly asymmetric
(host→device ~60 MB/s, device→host ~15 MB/s with multi-second stalls), and
the 1-core host cannot resample in real-time×500.  So the entire signal
path lives in ONE jitted program per chunk:

    int16 PCM ─▶ ÷32768 ─▶ polyphase-matmul resample (io.resample) ─▶
    window slice/frame views ─▶ mel (MXU DFT matmuls) ─▶ U-Net ─▶
    overlap scatter-add grid ─▶ averaged scores

Per ~8-minute chunk the host uploads ~29 MB of int16 and downloads a
~160 KB f32 score grid; the inter-chunk grid overlap (windows straddling a
chunk boundary) is threaded through the program as a device-resident carry,
so chunking never changes results.

Numerics note: this path resamples the *zero-padded native* stream, whereas
the reference (and our host path) resamples the audio first and zero-pads in
the internal domain (worker.py:59-62).  The two differ only within a filter
length (~1.5 ms) of the ±3 s pad joins; detection intervals are unaffected
except for sub-bin effects at exactly those joins.  Use the host pipeline
for strict numeric parity.
"""

from __future__ import annotations

import logging
import os
import threading
import time
import weakref
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..io import wavio
from ..io.resample import _ratio
from . import regions as R
from .detector import DetectionResult, Detector
from .planner import num_windows_for_padded_length, window_starts

log = logging.getLogger(__name__)

CARRY = 512  # bins of inter-chunk grid overlap (needs ≥ 256 − min bin stride)


def grid_tile_period(step_seconds: float, max_p: int = 8,
                     n_check: int = 1 << 22) -> Optional[int]:
    """Smallest p such that windows i and i+p tile the score grid exactly:
    ``window_bin_offset(i+p) == window_bin_offset(i) + 256`` for every i.

    When it exists (default step 0.6 s: p = 5, since step/Δt = 256/5), the
    overlap scatter-add decomposes into p DISJOINT contiguous block writes —
    group g = windows {g, g+p, g+2p, …} covers [bins[g], bins[g]+256·n_g)
    gap-free — so the device grid update is p ``dynamic_update_slice`` ops
    instead of a serial scatter (XLA lowered the general ``.at[].add`` to a
    256-iteration DUS loop: ~11% of chunk device time, docs/PROFILE_r03.md).

    Verified over ``n_check`` windows (4M ≈ 29 days of audio at 0.6 s step);
    the run path re-verifies against the actual bins it uses.
    """
    i = np.arange(n_check, dtype=np.int64)
    bins = R.window_bin_offset(i, step_seconds)
    for p in range(1, max_p + 1):
        G = int(np.rint(p * step_seconds / R.TIME_RESOLUTION))
        if G == 256 and bool(np.all(bins[p:] == bins[:-p] + G)):
            return p
    return None


class FusedStreamingEngine:
    """One compiled chunk program per (native_sr, input kind).

    Not thread-safe per instance (owns host staging buffers).
    """

    def __init__(self, detector: Detector, native_sr: int, kind: str = "i16",
                 mesh=None):
        if kind not in ("i16", "f32", "mulaw8", "adpcm4"):
            raise ValueError(f"unknown wire kind {kind!r}")
        # weak: the engine lives in a WeakKeyDictionary keyed on the detector;
        # a strong back-reference would keep the key alive forever. The
        # detector is always alive while run() executes (the caller holds it).
        self._det_ref = weakref.ref(detector)
        self.mesh = mesh
        self.cfg = cfg = detector.cfg
        self.kind = kind
        self.native_sr = native_sr
        self.up, self.down = _ratio(native_sr, cfg.dsp.sample_rate)
        up, down = self.up, self.down

        self.chunk_w = detector.chunk_windows()
        self.B = cfg.engine.device_batch
        self.nb = self.chunk_w // self.B
        self.buf_len = detector.chunk_buffer_len()

        # local grid: window i of the chunk lands at ≤ round(i·step/dt)+1.
        # The grid MUST extend to fin+CARRY so the carry extraction
        # dynamic_slice is in-bounds: XLA clamps out-of-bounds starts, which
        # silently sourced the carry from the wrong bins (off by fin+CARRY
        # −glen). The fixture's near-uniform logits masked this; a trained
        # model's sharp logits corrupt chunk-boundary scores without it.
        step, dt = cfg.engine.step_seconds, R.TIME_RESOLUTION
        scatter_extent = int(round((self.chunk_w - 1) * step / dt)) + 256 + 2
        # fin's true upper bound includes the FINAL chunk's finalization
        # through `covered` (= last window bin + 256), not just the next
        # chunk's base: with defaults the final fin is 13312 while
        # round(chunk_w·step/dt) is only 13107, so the carry slice start
        # was clamped for >=252-window tail chunks — latent only because
        # the post-final carry is currently discarded (review r3 batch 11)
        fin_upper = max(
            int(round(self.chunk_w * step / dt)),
            int(round((self.chunk_w - 1) * step / dt)) + 256,
        ) + 2
        self.glen = max(scatter_extent, fin_upper + CARRY)
        # disjoint-group grid update (see grid_tile_period); None → general
        # scatter fallback for non-tiling step sizes
        self._tile_p = grid_tile_period(step)
        if self._tile_p is not None:
            # a full group's block must fit the grid even when DUS'd from a
            # tail chunk's phantom offset 0 (values are zero-masked there)
            n_g_max = -(-self.chunk_w // self._tile_p)
            self.glen = max(self.glen, n_g_max * 256)

        if up == 1 and down == 1:
            self.W = None
            self.pad_l = 0
            self.in_len = self.buf_len
            self.n_blocks = 0
        else:
            from ..io.resample import polyphase_block_geometry

            (self.W, self.wmin, self.n_blocks, self.n_copies,
             self.pad_l, self.in_len) = polyphase_block_geometry(
                up, down, self.buf_len
            )
            self.width = self.W.shape[0]

        if mesh is None:
            self._fn = jax.jit(self._program)
            self._arg_shardings = None
        else:
            # dp over windows: each chip gathers/scores its share of every
            # batch; GSPMD turns the shared-grid scatter-adds into psums
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            sb = NamedSharding(mesh, P(None, "data"))
            self._fn = jax.jit(
                self._program,
                in_shardings=(None, repl, repl, repl, sb, sb, sb, repl, repl),
                out_shardings=(repl, repl, repl, repl),
            )
            # shardings for the per-chunk args uploaded by the read-ahead
            # thread: (native, lo, fin, starts, bins, valid)
            self._arg_shardings = (repl, repl, repl, sb, sb, sb)
        # staging sample dtype: what prepare() fills and the wire carries.
        # mulaw8 stages int16 (decoder output) and companding to int8 happens
        # at payload build, so read_padded/alignment logic is kind-agnostic.
        # adpcm4 stages int16 too, then block-encodes the whole staging
        # buffer into a shorter uint8 wire buffer (ops/adpcm.py).
        dtype = np.float32 if kind == "f32" else np.int16
        self._dtype = dtype  # staging buffers are allocated fresh per chunk
        self._concat_fns = {}  # arity -> jitted concat (see _drain)
        if kind == "mulaw8":
            self._wire_dtype = np.int8
            self._wire_len = self.in_len
        elif kind == "adpcm4":
            from ..ops import adpcm

            self._wire_dtype = np.uint8
            self._wire_len = adpcm.wire_bytes(self.in_len)
        else:
            self._wire_dtype = dtype
            self._wire_len = self.in_len

    @property
    def det(self) -> Detector:
        d = self._det_ref()
        if d is None:  # pragma: no cover — misuse guard
            raise RuntimeError("FusedStreamingEngine outlived its Detector")
        return d

    # ------------------------------------------------------------------
    def _program(self, variables, native, lo, fin, starts, bins, valid,
                 carry_sum, carry_cnt):
        """native (in_len,) → (avg (glen,), cnt (glen,), carry', carry_cnt')."""
        if self.kind == "mulaw8":
            from ..ops.mulaw import decode_device

            x = decode_device(native)  # int8 codes -> f32 in [-1, 1]
        elif self.kind == "adpcm4":
            from ..ops.adpcm import decode_device as adpcm_decode

            x = adpcm_decode(native, self.in_len)  # u8 blocks -> f32
        else:
            x = native.astype(jnp.float32)
            if self.kind == "i16":
                x = x * (1.0 / 32768.0)

        if self.W is None:
            internal = jax.lax.dynamic_slice(x, (lo,), (self.buf_len,))
        else:
            from ..io.resample import polyphase_apply

            y = polyphase_apply(
                x, jnp.asarray(self.W), wmin=self.wmin, pad_l=self.pad_l,
                n_blocks=self.n_blocks, n_copies=self.n_copies,
                down=self.down, width=self.width,
            )
            internal = jax.lax.dynamic_slice(y, (lo,), (self.buf_len,))

        def body(_, s):
            # (B, 256) logits; det._forward is traced while the caller holds det
            return None, self.det._forward(variables, internal, s)

        _, logits = jax.lax.scan(body, None, starts,          # (nb, B, 256)
                                 unroll=self.cfg.engine.scan_unroll)
        flat = logits.reshape(self.chunk_w, 256).astype(jnp.float32)
        v = valid.reshape(self.chunk_w)
        vals = flat * v[:, None]
        cnts = jnp.broadcast_to(v[:, None], (self.chunk_w, 256))
        bins_f = bins.reshape(self.chunk_w)

        if self._tile_p is not None:
            # windows g, g+p, g+2p, … tile [bins[g], bins[g]+256·n_g)
            # contiguously and disjointly (grid_tile_period): each group is
            # ONE dynamic_update_slice into a zero grid, summed across groups.
            # Tail-chunk padding windows carry zeroed vals/cnts, so their
            # slots write zeros (a no-op) wherever the block lands.
            p = self._tile_p
            sum_g = jnp.zeros(self.glen, jnp.float32)
            cnt_g = jnp.zeros(self.glen, jnp.float32)
            for g in range(p):
                zero = jnp.zeros(self.glen, jnp.float32)
                sum_g = sum_g + jax.lax.dynamic_update_slice(
                    zero, vals[g::p].reshape(-1), (bins_f[g],))
                cnt_g = cnt_g + jax.lax.dynamic_update_slice(
                    zero, cnts[g::p].reshape(-1), (bins_f[g],))
        else:  # general step sizes: one big scatter-add
            frame_idx = jnp.arange(256, dtype=jnp.int32)
            idx = (bins_f[:, None] + frame_idx[None, :]).reshape(-1)
            sum_g = jnp.zeros(self.glen, jnp.float32).at[idx].add(vals.reshape(-1))
            cnt_g = jnp.zeros(self.glen, jnp.float32).at[idx].add(cnts.reshape(-1))
        sum_g = sum_g.at[:CARRY].add(carry_sum)
        cnt_g = cnt_g.at[:CARRY].add(carry_cnt)

        avg = sum_g / jnp.maximum(cnt_g, 1.0)
        new_carry_sum = jax.lax.dynamic_slice(sum_g, (fin,), (CARRY,))
        new_carry_cnt = jax.lax.dynamic_slice(cnt_g, (fin,), (CARRY,))
        return avg, cnt_g, new_carry_sum, new_carry_cnt

    # ------------------------------------------------------------------
    def synthetic_chunk_args(self):
        """Device-resident args for one full synthetic chunk (zeros audio,
        every window valid) — the ONE home for this layout, shared by
        device_only_rate and scripts/profile_chunk.py so the profiled
        program cannot silently diverge from the benchmarked one
        (review r3 batch 13)."""
        cfg = self.cfg
        step = cfg.engine.step_seconds
        win = cfg.samples_per_window
        starts = np.arange(self.chunk_w, dtype=np.int64) * int(
            round(cfg.dsp.sample_rate * step)
        )
        starts = np.minimum(starts, max(0, self.buf_len - win)).astype(np.int32)
        bins = R.window_bin_offset(np.arange(self.chunk_w), step).astype(np.int32)
        return (
            jax.device_put(np.zeros(self._wire_len, self._wire_dtype)),
            jnp.int32(0),
            jnp.int32(0),
            jax.device_put(starts.reshape(self.nb, self.B)),
            jax.device_put(bins.reshape(self.nb, self.B)),
            jax.device_put(np.ones((self.nb, self.B), np.float32)),
        )

    def _drain(self, handles, extra=()):
        """Fetch device arrays in ONE wire round trip.

        The remote tunnel's device→host path costs ~65-75 ms of latency per
        array regardless of size (a 12-array batched device_get measured
        0.75-0.93 s for ~600 KB total — pure round trips), so the grids are
        concatenated ON DEVICE into one buffer and downloaded once, then
        split host-side.  ``extra`` arrays (the inter-chunk carry at journal
        checkpoints) ride the same transfer.  One jitted concat per arity;
        arities repeat across files (bounded by journal drain cadence), so
        the jit cache stays small.  Returns the list of numpy arrays in
        input order (handles first, then extras).
        """
        arrs = list(handles) + list(extra)
        if not arrs:
            return []
        if len(arrs) == 1:
            return [jax.device_get(arrs[0])]
        fn = self._concat_fns.get(len(arrs))
        if fn is None:
            fn = jax.jit(lambda *xs: jnp.concatenate(xs))
            self._concat_fns[len(arrs)] = fn
        flat = jax.device_get(fn(*arrs))
        out, off = [], 0
        for a in arrs:
            n = int(a.shape[0])
            out.append(flat[off:off + n])
            off += n
        return out

    def device_only_rate(self, repeats: int = 8) -> float:
        """Audio-seconds/wall-second of the chunk program alone, with all
        inputs device-resident (no host IO, no uploads, no downloads except
        one final sync).  Isolates compute capability from the host link;
        bench.py reports it alongside the e2e number."""

        args = self.synthetic_chunk_args()
        carry_s = jnp.zeros((CARRY,), jnp.float32)
        carry_c = jnp.zeros((CARRY,), jnp.float32)
        variables = self.det.variables
        avg, _, cs, cc = self._fn(variables, *args, carry_s, carry_c)
        jax.device_get(avg)  # warm (program load/compile)
        t0 = time.perf_counter()
        for _ in range(repeats):
            # thread the carry so iterations serialize on device
            avg, _, cs, cc = self._fn(variables, *args, cs, cc)
        # force with a REAL fetch: on the remote (axon) backend
        # block_until_ready returns before execution finishes, inflating the
        # rate ~200× (measured); the final avg depends on every iteration
        # through the carry chain, so one download forces them all
        jax.device_get(avg)
        wall = time.perf_counter() - t0
        return repeats * self.chunk_w * self.cfg.engine.step_seconds / wall

    # ------------------------------------------------------------------
    def run(
        self,
        read_native: Callable[[int, int], np.ndarray],
        native_frames: int,
        progress: Optional[Callable[[float], None]] = None,
        journal=None,
        timers=None,
    ) -> DetectionResult:
        """Detect over a native-rate stream of ``native_frames`` samples.

        ``read_native(start, frames)`` returns raw samples of the engine's
        input kind (int16 or float32 mono), clamped at EOF.

        ``journal`` (engine.journal.ChunkJournal) enables chunk-granular
        resume: completed chunk grids + the inter-chunk carry persist every
        ``cfg.engine.chunk_checkpoint_every`` chunks, and a killed run
        restarts from the last checkpoint instead of from zero.

        ``timers`` (runtime.metrics.StageTimers) accumulates per-phase wall
        time (host_fill / device_put on the read-ahead thread; wait_prepare /
        dispatch / final_fetch on the caller thread) for pipeline diagnosis —
        see scripts/profile_e2e.py.
        """
        from contextlib import nullcontext

        tt = timers.time if timers is not None else (lambda _n: nullcontext())
        cfg = self.cfg
        up, down = self.up, self.down
        # from config, NOT a hardcoded 3: the final interval shift uses
        # cfg.engine.pad_seconds, and a mismatch skews every detection time
        # (default 3.0 s · up/down is exact: 66150 at 22050 Hz)
        pad_native = int(round(cfg.engine.pad_seconds * self.native_sr))
        n_nat_padded = native_frames + 2 * pad_native
        padded_len = -(-n_nat_padded * up // down) if self.W is not None else n_nat_padded

        n_windows = num_windows_for_padded_length(padded_len, cfg)
        if n_windows <= 0:
            return DetectionResult([], np.zeros(0), 0, 0.0)
        starts_g = window_starts(n_windows, cfg)
        bins_g = R.window_bin_offset(np.arange(n_windows), cfg.engine.step_seconds)
        covered = int(bins_g[-1]) + 256
        if self._tile_p is not None and n_windows > self._tile_p:
            # the compiled program assumes the disjoint-tile property for
            # THESE bins; an out-of-pattern offset would make a clamped DUS
            # silently corrupt grid scores (same failure mode as the round-2
            # carry bug) — refuse loudly instead
            p = self._tile_p
            if not bool(np.all(bins_g[p:] == bins_g[:-p] + 256)):
                raise RuntimeError(
                    "grid tile period violated by actual window offsets "
                    f"(p={p}, n_windows={n_windows}); this should be "
                    "unreachable for float64 bin math — please report")

        def read_padded(start: int, frames: int) -> np.ndarray:
            """Native padded-stream samples [start, start+frames)."""
            a0 = max(start, pad_native)
            a1 = min(start + frames, pad_native + native_frames)
            if a1 <= a0:
                return np.zeros(frames, self._dtype)
            got = read_native(a0 - pad_native, a1 - a0)
            if a0 == start and len(got) == frames:
                # interior chunk (no pad overlap, full read): hand the
                # reader's buffer straight through — the zero+copy below
                # was ~1/3 of host_fill on the 1-core host
                return got
            out = np.zeros(frames, self._dtype)
            out[a0 - start : a0 - start + len(got)] = got
            return out

        n_chunks = -(-n_windows // self.chunk_w)

        done_parts: List[np.ndarray] = []
        k0 = 0
        if journal is not None:
            # bind the journal to this exact computation before trusting it
            journal.header.update(
                n_windows=int(n_windows), n_chunks=int(n_chunks),
                chunk_w=int(self.chunk_w), glen=int(self.glen),
                kind=self.kind, native_sr=int(self.native_sr),
            )
            resume = journal.load()
            if resume is not None and resume.chunks_done < n_chunks:
                done_parts = list(resume.avg_parts)
                k0 = resume.chunks_done
                carry_sum = jax.device_put(resume.carry_sum)
                carry_cnt = jax.device_put(resume.carry_cnt)
        if k0 == 0:
            carry_sum = jnp.zeros((CARRY,), jnp.float32)
            carry_cnt = jnp.zeros((CARRY,), jnp.float32)
        every = max(1, getattr(cfg.engine, "chunk_checkpoint_every", 1) or 1)

        def prepare(ci: int):
            """Host side of chunk ci: staging fill + window metadata.

            Runs on the fill thread; returns fresh arrays (no shared
            staging) so device uploads never alias a buffer being refilled.
            The device_put happens in a SEPARATE upload stage (below) so the
            wire-side decimation FIR + compand of chunk k+1 overlaps the
            tunnel transfer of chunk k — with both on one thread the two
            serialize and the fill sits on the e2e critical path (measured
            ~30 µs/audio-s at 32 kHz, profile_e2e host_fill).
            """
            w0 = ci * self.chunk_w
            w1 = min(w0 + self.chunk_w, n_windows)
            s0 = int(starts_g[w0])
            base = int(bins_g[w0])
            # the LAST chunk must finalize through `covered` even when it is
            # exactly full (n_windows % chunk_w == 0) — gating on fullness
            # left the final ~(256 − stride) bins in the device carry,
            # truncating avg_values by ~2.4 s for exact-multiple files
            next_base = (
                int(R.window_bin_offset(np.array([w0 + self.chunk_w]),
                                        cfg.engine.step_seconds)[0])
                if ci + 1 < n_chunks
                else covered
            )
            fin = min(next_base, covered) - base

            t_fill = time.perf_counter() if timers is not None else 0.0
            # staging carries WIRE samples: int8 mu-law codes encode straight
            # into it (code 0 == silence, so the zero fill doubles as pad).
            # adpcm4 is block-coded, so it stages int16 and encodes the whole
            # buffer below.
            staging = np.zeros(
                self.in_len if self.kind == "adpcm4" else self._wire_len,
                np.int16 if self.kind == "adpcm4" else self._wire_dtype)
            if self.W is None:
                rs, lo = s0, 0
                got = read_padded(rs, min(self.in_len, n_nat_padded - rs))
                off = 0
            else:  # polyphase path: align reads to whole `down` blocks
                in_first = (s0 * down) // up
                rs = max(0, in_first - 2 * down)
                rs -= rs % down
                lo = s0 - (rs * up) // down
                # same guards as io.resample.resample_range, whose alignment
                # arithmetic this mirrors: a drift would make the device
                # dynamic_slice clamp and return shifted audio silently
                # not `assert`: these invariants guard against silently
                # shifted audio and must survive `python -O`
                if not (0 <= lo <= 4 * up):
                    raise RuntimeError(
                        f"polyphase alignment drift: lo={lo} up={up}")
                if lo + self.buf_len > self.n_blocks * up:
                    raise RuntimeError(
                        "polyphase window overruns resample blocks: "
                        f"lo={lo} buf_len={self.buf_len} "
                        f"n_blocks={self.n_blocks} up={up}")
                left = min(rs, self.pad_l)
                re = min(n_nat_padded, rs + self.in_len - self.pad_l)
                got = read_padded(rs - left, re - (rs - left))
                off = self.pad_l - left
            if self.kind == "mulaw8":
                from ..ops.mulaw import encode_i16

                # compand directly into the staging slice: one native LUT
                # pass, no intermediate int16 staging or extra copy; halves
                # the upload bytes on the link-bound path
                encode_i16(np.asarray(got), out=staging[off : off + len(got)])
            elif self.kind == "adpcm4":
                from ..ops import adpcm

                # block codec: fill the int16 staging, then one native
                # encode pass into the uint8 wire buffer (~quarter the
                # PCM16 bytes; ops/adpcm.py wire format)
                staging[off : off + len(got)] = got
                wire = np.zeros(self._wire_len, np.uint8)
                staging = adpcm.encode_i16(staging, out=wire)
            else:
                staging[off : off + len(got)] = got

            n = w1 - w0
            starts_l = np.zeros(self.chunk_w, np.int32)
            bins_l = np.zeros(self.chunk_w, np.int32)
            valid = np.zeros(self.chunk_w, np.float32)
            starts_l[:n] = (starts_g[w0:w1] - s0).astype(np.int32)
            bins_l[:n] = (bins_g[w0:w1] - base).astype(np.int32)
            valid[:n] = 1.0
            # start ALL host→device copies HERE, on the read-ahead thread,
            # as one batched device_put: the tunnel upload then overlaps
            # earlier chunks' device compute, and the main thread never pays
            # a per-chunk transfer roundtrip (the scalar lo/fin and the tiny
            # starts/bins/valid arrays each cost a tunnel dispatch when
            # uploaded individually at call time — measured ~11 ms/chunk)
            payload = [staging, np.int32(lo), np.int32(max(fin, 0)),
                       starts_l.reshape(self.nb, self.B),
                       bins_l.reshape(self.nb, self.B),
                       valid.reshape(self.nb, self.B)]
            if timers is not None:
                timers.totals["host_fill"] += time.perf_counter() - t_fill
                timers.counts["host_fill"] += 1
            return payload, fin, w1

        def upload(fill_fut):
            """Wire side of one chunk: batched device_put of the payload.

            Runs on the upload thread (single worker, submitted in chunk
            order, so transfers hit the tunnel in order); blocks on the fill
            future so a slow fill never reorders the wire.
            """
            payload, fin, w1 = fill_fut.result()
            t_put = time.perf_counter() if timers is not None else 0.0
            if self._arg_shardings is None:
                dev = jax.device_put(payload)
            else:
                dev = jax.device_put(payload, list(self._arg_shardings))
            if timers is not None:
                timers.totals["device_put"] += time.perf_counter() - t_put
                timers.counts["device_put"] += 1
            return dev, fin, w1

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        # read-ahead depth: chunks whose host fill + upload run ahead of the
        # device.  1-deep left the main thread waiting ~40 ms/chunk on
        # host_fill and the wire idle between uploads (scripts/profile_e2e.py
        # breakdown); deeper keeps the tunnel saturated.  Fill and upload are
        # SEPARATE single-worker stages: one fill worker keeps disk reads
        # sequential (RawReader's fadvise hints assume order), one upload
        # worker keeps tunnel transfers in order, and splitting them lets
        # chunk k+1's decimation FIR + compand run while chunk k is on the
        # wire (a shared worker serialized them; measured ~15-22 ms/chunk of
        # fill stacked onto the link-bound path at 32 kHz).
        depth = max(1, getattr(cfg.engine, "readahead_chunks", 4))
        pending: List[Tuple[int, object]] = []  # (fin, device avg handle)
        with ThreadPoolExecutor(max_workers=1) as fill_ex, \
                ThreadPoolExecutor(max_workers=1) as up_ex:
            futs = deque(
                up_ex.submit(upload, fill_ex.submit(prepare, ci))
                for ci in range(k0, min(k0 + depth, n_chunks)))
            for ci in range(k0, n_chunks):
                with tt("wait_prepare"):
                    dev, fin, w1 = futs.popleft().result()
                if ci + depth < n_chunks:
                    futs.append(
                        up_ex.submit(upload,
                                     fill_ex.submit(prepare, ci + depth)))
                with tt("dispatch"):
                    avg, cnt, carry_sum, carry_cnt = self._fn(
                        self.det.variables, *dev, carry_sum, carry_cnt)
                # defer downloads: keep the device handle; the drain below
                # fetches everything in ONE transfer (host syncs mid-loop
                # stall the pipeline)
                pending.append((fin, avg))
                if progress is not None:
                    progress(w1 / n_windows)
                if (journal is not None and ci + 1 < n_chunks
                        and (ci + 1 - k0) % every == 0):
                    # checkpoint: one fused download of the grids completed
                    # since the last save plus the carry (a deliberate sync
                    # point — the cost is one download per `every` chunks)
                    got = self._drain([a for _, a in pending],
                                      extra=(carry_sum, carry_cnt))
                    done_parts.extend(
                        a[:fin] for (fin, _), a in zip(pending, got[:-2]))
                    pending = []
                    journal.save(done_parts, got[-2], got[-1])

        # ONE wire transfer for every remaining grid: the down-link is
        # LATENCY-dominated, not bandwidth-dominated — a batched
        # device_get of N arrays still pays ~65-75 ms per array on the
        # remote tunnel (profile_e2e r5: 12 grids = 0.75-0.93 s, over half
        # the e2e wall), while a device-side concatenation collapses the
        # same bytes into a single round trip
        with tt("final_fetch"):
            fetched = self._drain([a for _, a in pending])
        avg_parts = done_parts + [
            a[:fin] for (fin, _), a in zip(pending, fetched)]
        avg_values = np.concatenate(avg_parts)[:covered]
        if journal is not None:
            journal.clear()
        if cfg.engine.min_count > 1:
            # coverage counts are a pure function of the window offsets
            # (NNDetector.py:153,181-183); recompute them host-side and force
            # under-covered bins below threshold, matching detector._finalize
            cnt = np.zeros(covered, np.int64)
            idx = (bins_g[:, None] + np.arange(256)[None, :]).ravel()
            np.add.at(cnt, idx[idx < covered], 1)
            avg_values = np.where(cnt >= cfg.engine.min_count, avg_values, -np.inf)
        regions = R.find_speech_regions(
            avg_values, cfg.engine.threshold, cfg.engine.break_duration,
            exit_threshold=cfg.engine.exit_threshold,
            smooth_bins=cfg.engine.grid_smooth,
        )
        regions = R.shift_regions(regions, -cfg.engine.pad_seconds)
        audio_seconds = (
            native_frames / self.native_sr
        )
        return DetectionResult(regions, avg_values, n_windows, audio_seconds)


# cache: per live detector (weak — entries die with the detector, so a new
# Detector can never alias a GC'd one's id and the cache can't grow unbounded),
# then by (native_sr, kind, mesh identity, chunk shape)
_ENGINES: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


_ENGINES_LOCK = threading.Lock()


def get_fused_engine(detector: Detector, native_sr: int, kind: str) -> FusedStreamingEngine:
    mesh = getattr(detector, "_fused_mesh", None)
    key = (native_sr, kind, detector.cfg.engine.device_batch,
           detector.cfg.engine.chunk_seconds, id(mesh) if mesh is not None else None)
    # runner-level file concurrency (runtime/workers.py) calls this from
    # worker threads; the lock keeps construction single (engine.run itself
    # is reentrant — per-run state is all local)
    with _ENGINES_LOCK:
        per_det = _ENGINES.setdefault(detector, {})
        if key not in per_det:
            per_det[key] = FusedStreamingEngine(detector, native_sr, kind, mesh=mesh)
        return per_det[key]


def _make_journal(detector: Detector, path: str, journal_dir: Optional[str]):
    """Chunk-resume sidecar bound to (file identity, weights, numerics)."""
    if not journal_dir:
        return None
    from .journal import journal_for, variables_digest

    st = os.stat(path)
    dig = getattr(detector, "_vars_digest", None)
    if dig is None:
        dig = variables_digest(detector.variables)
        detector._vars_digest = dig
    cfg = detector.cfg
    header = {
        "size": int(st.st_size), "mtime_ns": int(st.st_mtime_ns),
        "weights": dig, "step_seconds": cfg.engine.step_seconds,
        "precision": cfg.engine.precision, "sample_rate": cfg.dsp.sample_rate,
        # every numerics-affecting knob: stitching grids computed under
        # different kernels/precisions across a resume boundary would
        # silently violate journal.py's identical-computation contract.
        # "auto" values resolve per-backend, so the backend is pinned too.
        "mel_precision": cfg.engine.mel_precision,
        "mel_kernel": cfg.engine.mel_kernel,
        "pad_seconds": cfg.engine.pad_seconds,
        "decoder_upsample": cfg.engine.decoder_upsample,
        "upload_codec": getattr(cfg.engine, "upload_codec", "pcm16"),
        # resolved per (file sr, knob); pin knob + decimator impl so a
        # resume can't stitch grids whose wire streams differed (the C and
        # numpy decimators agree only to ~1 LSB — io/decimate.py)
        "wire_decimate": _wire_decimate_tag(cfg),
        "device_batch": cfg.engine.device_batch,
        "chunk_seconds": cfg.engine.chunk_seconds,
        "backend": jax.default_backend(),
    }
    return journal_for(journal_dir, path, header)


def _wire_decimate_tag(cfg: Config) -> str:
    """Journal-header tag for the wire-decimation numerics: the knob plus
    which decimator implementation would run (C kernel vs numpy fallback,
    which agree only to ~1 LSB of the int16 wire)."""
    wd = getattr(cfg.engine, "wire_decimate", "auto")
    if wd == "off":
        return "off"
    from ..io import native as _native
    from ..io.decimate import DECIM_VERSION

    # DECIM_VERSION: filter-design changes (e.g. the v2 sinc-null snap)
    # shift wire samples by ~1 LSB — a resume must not stitch across them
    return f"{wd}:v{DECIM_VERSION}:{'c' if _native.native_available() else 'np'}"


def _maybe_wire_decimate(detector: Detector, read_fn, frames: int, sr: int,
                         kind: str):
    """Wrap an int16 reader in the wire decimator when it can't matter.

    Engages only on the lossy mu-law wire (config engine.wire_decimate
    "auto"; exact wires always ship the native stream) and only when the
    native rate has an integer factor M with sr/M >= 2*dsp.f_max — content
    above f_max never reaches the mel filterbank (io/decimate.py), so the
    wire drops it on the host for 1/M the upload bytes.  Returns the
    (possibly wrapped) ``(read_fn, frames, sr)`` the engine should run at.
    """
    if kind not in ("mulaw8", "adpcm4"):
        return read_fn, frames, sr
    cfg = detector.cfg
    if getattr(cfg.engine, "wire_decimate", "auto") != "auto":
        return read_fn, frames, sr
    from ..io.decimate import WireDecimator, decim_factor

    M = decim_factor(sr, cfg.dsp.f_max)
    if M == 1:
        return read_fn, frames, sr
    d = WireDecimator(read_fn, frames, sr, M, f_max=cfg.dsp.f_max)
    return d.read, d.frames, d.sr


def _i16_kind(detector: Detector) -> str:
    """Wire kind for a 16-bit PCM source: exact int16, or 8-bit mu-law.

    upload_codec "auto" engages the compander only on TPU in fast mode —
    parity mode and CPU runs ship exact PCM16 (same policy shape as
    mel_kernel/mel_precision "auto"; evidence in ops/mulaw.py docstring).
    """
    codec = getattr(detector.cfg.engine, "upload_codec", "pcm16")
    if codec == "auto":
        codec = ("mulaw8"
                 if (detector.cfg.engine.precision != "parity"
                     and jax.default_backend() == "tpu")
                 else "pcm16")
    return codec if codec in ("mulaw8", "adpcm4") else "i16"


def _run_mono_f32_source(detector: Detector, read_f32, frames: int, sr: int,
                         progress, journal, timers=None) -> DetectionResult:
    """Run the fused engine over a mono float32 range-reader.

    One home for the host-decoded formats' wire policy (OPUS, MPEG, and the
    generic stereo-WAV/FLOAT/multichannel-FLAC/OGG/AIFF path): under the
    mu-law wire the f32→int16 rounding (≤3e-5 FS) vanishes inside the
    compander's quantization and the upload drops 4x vs shipping f32;
    exact wires (parity mode / CPU) keep float32 untouched.
    """
    kind = _i16_kind(detector)
    if kind in ("mulaw8", "adpcm4"):
        def read_i16(start: int, n: int) -> np.ndarray:
            data = read_f32(start, n)
            return np.clip(
                np.rint(data * np.float32(32768.0)), -32768, 32767
            ).astype(np.int16)

        rd, nfr, wire_sr = _maybe_wire_decimate(
            detector, read_i16, frames, sr, kind)
        engine = get_fused_engine(detector, wire_sr, kind)
        return engine.run(rd, nfr, progress, journal, timers=timers)
    engine = get_fused_engine(detector, sr, "f32")
    return engine.run(read_f32, frames, progress, journal, timers=timers)


def detect_file_fused(
    detector: Detector, path: str,
    progress: Optional[Callable[[float], None]] = None,
    journal_dir: Optional[str] = None, timers=None,
) -> DetectionResult:
    """Whole-file detection through the fused device pipeline.

    PCM16 files stream raw int16 to the device (no host decode at all);
    other formats decode+downmix on host to float32 native.  With
    ``journal_dir`` set, chunk progress persists there and a killed run
    resumes mid-file (SURVEY.md §5 failure/recovery).
    """
    from ..io.audio import probe

    inf = probe(path)
    journal = _make_journal(detector, path, journal_dir)
    if inf.subtype.startswith("FLAC"):
        from ..io.flac import SequentialMonoReader

        # mono ≤16-bit (the dominant field-recorder case) streams int16 —
        # half the upload bytes of f32 on a link-bound path, bit-identical
        # numerics (the ÷32768 on device equals the f32 scale exactly).
        # Mono 24-bit rides the same wire when the mu-law compander is on:
        # the top-16-bit truncation is far inside the compander's own
        # quantization (see SequentialMonoReader.truncate_to_i16), and the
        # upload drops 4x vs f32.  Exact wires keep f32 for >16-bit.
        kind = _i16_kind(detector)
        if inf.channels == 1 and (inf.bits_per_sample <= 16
                                  or kind in ("mulaw8", "adpcm4")):
            with SequentialMonoReader(
                path, dtype="i16",
                truncate_to_i16=inf.bits_per_sample > 16,
            ) as smr:
                rd, nfr, sr = _maybe_wire_decimate(
                    detector, smr.read, inf.frames, inf.samplerate, kind)
                engine = get_fused_engine(detector, sr, kind)
                return engine.run(rd, nfr, progress, journal, timers=timers)
        engine = get_fused_engine(detector, inf.samplerate, "f32")
        with SequentialMonoReader(path) as smr:
            return engine.run(smr.read, inf.frames, progress, journal, timers=timers)

    if (isinstance(inf, wavio.WavInfo)
            and inf.subtype == "PCM_16" and inf.channels == 1):
        kind = _i16_kind(detector)
        # persistent handle + POSIX_FADV_SEQUENTIAL: reopening per chunk
        # resets kernel readahead, and host disk read is the e2e ceiling
        reader = wavio.RawReader(path)

        def read_native(start: int, frames: int) -> np.ndarray:
            # hint the NEXT chunk so the kernel prefetches during device time
            reader.will_need(start + frames, frames)
            return reader.read_raw(start, frames).view("<i2")

        rd, nfr, sr = _maybe_wire_decimate(
            detector, read_native, inf.frames, inf.samplerate, kind)
        engine = get_fused_engine(detector, sr, kind)
        try:
            return engine.run(rd, nfr, progress, journal, timers=timers)
        finally:
            reader.close()

    if (isinstance(inf, wavio.WavInfo) and inf.channels == 1
            and inf.subtype in ("PCM_24", "PCM_32", "PCM_U8")
            and _i16_kind(detector) in ("mulaw8", "adpcm4")):
        # the lossy mu-law wire is on anyway, so 24/32-bit mono stages the
        # samples' top 16 bits (wavio.top16_from_raw: truncation ≪ the
        # compander's quantization step) instead of detouring through f32 —
        # 1 wire byte per sample where the generic path below ships 4
        reader = wavio.RawReader(path)

        def read_native_top16(start: int, frames: int) -> np.ndarray:
            reader.will_need(start + frames, frames)
            return wavio.top16_from_raw(
                reader.read_raw(start, frames), inf.subtype)

        rd, nfr, sr = _maybe_wire_decimate(
            detector, read_native_top16, inf.frames, inf.samplerate, "mulaw8")
        engine = get_fused_engine(detector, sr, "mulaw8")
        try:
            return engine.run(rd, nfr, progress, journal, timers=timers)
        finally:
            reader.close()

    if inf.subtype == "OPUS":
        # persistent forward-only handle (backward chunk overlap is served
        # from its history buffer): a per-chunk opus.read() would reset the
        # decoder + re-enter with pre-roll every chunk
        from ..io.opus import SequentialMonoReader as OpusSeq

        with OpusSeq(path) as smr:
            return _run_mono_f32_source(detector, smr.read, inf.frames,
                                        inf.samplerate, progress, journal,
                                        timers=timers)

    if inf.subtype.startswith("MPEG"):
        # one persistent handle: a per-chunk mp3.read() would re-open and
        # re-scan the whole file every chunk (the scan is what makes seeks
        # sample-accurate); rides the same wires as the generic path below
        from ..io.mp3 import SequentialMonoReader as Mp3Seq

        with Mp3Seq(path) as smr:
            return _run_mono_f32_source(detector, smr.read, inf.frames,
                                        inf.samplerate, progress, journal,
                                        timers=timers)

    from ..io import read_mono

    def read_native(start: int, frames: int) -> np.ndarray:
        data, _ = read_mono(path, start=start, frames=frames)
        return data

    return _run_mono_f32_source(detector, read_native, inf.frames,
                                inf.samplerate, progress, journal,
                                timers=timers)
