"""Device-mesh sharding for detection and training.

The reference has no distributed machinery at all (SURVEY.md §2: its only
concurrency is two Qt worker threads); its semantics are embarrassingly
parallel over windows/chunks/files.  The TPU-native equivalents here:

  * **dp over windows** (inference): window start indexes are sharded over
    the ``data`` mesh axis while the chunk waveform is replicated — each
    chip gathers and scores its own windows; there are no collectives on
    the hot path, and per-chip logits are gathered once per chunk for the
    (tiny) host-side interval merge.
  * **dp × sp for training**: batch sharded over ``data``; the mel time
    axis sharded over ``seq`` — XLA/GSPMD inserts halo exchanges for the
    3×3 convs and psums for the (synced) BatchNorm batch statistics.

Everything uses `jax.sharding.Mesh` + NamedSharding under jit; collectives
are chosen by the compiler, not hand-written (scaling-book recipe).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def shard_windows_forward(detector, mesh: Mesh):
    """Build a mesh-sharded version of the detector's window forward.

    Returns ``fn(variables, wave, starts) -> logits`` where ``starts`` is
    sharded over the ``data`` axis and ``wave`` is replicated.  The batch
    size must be a multiple of the data-axis size.
    """
    repl = NamedSharding(mesh, P())
    shard_b = NamedSharding(mesh, P("data"))
    shard_nb = NamedSharding(mesh, P(None, "data"))

    fwd = jax.jit(
        detector._forward,
        in_shardings=(None, repl, shard_b),
        out_shardings=shard_b,
    )
    fwd_chunk = jax.jit(
        detector._forward_chunk,
        in_shardings=(None, repl, shard_nb),
        out_shardings=NamedSharding(mesh, P(None, "data", None)),
    )
    return fwd, fwd_chunk


class MeshDetector:
    """Drop-in multi-chip wrapper: same Detector surface, windows sharded
    over every chip of the mesh.  Exact — per-window logits are independent
    of the sharding, and the grid average happens after the gather."""

    def __init__(self, detector, mesh: Optional[Mesh] = None):
        if getattr(detector, "_fused_mesh", None) is not None:
            # double-wrap would snapshot the FIRST wrapper's sharded fns as
            # _orig, so a non-LIFO restore() leaves the shared Detector
            # mesh-bound with _fused_mesh=None — exactly the silent state
            # restore() exists to prevent (review r3 batch 8)
            raise RuntimeError(
                "detector is already mesh-bound (wrapped by a MeshDetector "
                "that has not been restore()d); nest wrappers LIFO or "
                "restore the existing one first")
        self.det = detector
        self.mesh = mesh if mesh is not None else make_mesh()
        # the window batch is sharded ONLY over the 'data' axis (other axes
        # replicate it), so that axis size — not the total mesh size — is
        # the divisibility requirement (review r3 batch 8)
        axis_sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        if "data" not in axis_sizes:
            raise ValueError(
                f"mesh has no 'data' axis (axes: {self.mesh.axis_names}); "
                "shard_windows_forward shards windows over 'data'")
        n = int(axis_sizes["data"])
        if detector.cfg.engine.device_batch % n:
            raise ValueError(
                f"device_batch ({detector.cfg.engine.device_batch}) must be a "
                f"multiple of the mesh 'data' axis size ({n})"
            )
        fwd, fwd_chunk = shard_windows_forward(detector, self.mesh)
        # route the detector's chunk executor through the sharded forwards
        self._orig = (detector._fwd, detector._fwd_chunk)
        detector._fwd = fwd
        detector._fwd_chunk = fwd_chunk
        # the fused streaming pipeline shards its batches over the same mesh
        detector._fused_mesh = self.mesh

    def restore(self) -> None:
        """Undo the rerouting: the wrapped Detector goes back to its
        single-device forwards (review r3: the mutation used to be
        irreversible — dropping the wrapper left the shared Detector
        silently mesh-bound, inheriting batch-multiple requirements and a
        stale fused-engine cache key)."""
        if self._orig is None:
            return
        self.det._fwd, self.det._fwd_chunk = self._orig
        self.det._fused_mesh = None
        self._orig = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.restore()

    def __getattr__(self, name):
        return getattr(self.det, name)
