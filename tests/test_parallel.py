import os
import jax
import numpy as np
import pytest

from softspoken_tpu import Config, ckpt
from softspoken_tpu.engine import Detector
from softspoken_tpu.parallel import MeshDetector, make_mesh

CFG = Config().with_engine(precision="parity", device_batch=8, chunk_seconds=12.0)


def test_mesh_shapes():
    m = make_mesh(("data",))
    assert m.devices.shape == (8,)
    m2 = make_mesh(("data", "seq"), shape=(4, 2))
    assert dict(zip(m2.axis_names, m2.devices.shape)) == {"data": 4, "seq": 2}


@pytest.mark.slow
def test_sharded_detection_matches_single_device():
    """Windows sharded over 8 virtual chips must bit-match the single-device
    run (SURVEY.md §4: sharded run equals unsharded)."""
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.4, 0.4, 22050 * 20).astype(np.float32)

    single = Detector(CFG, variables=ckpt.fixture_variables(seed=0))
    res_single = single.detect_waveform(audio)

    sharded_det = Detector(CFG, variables=ckpt.fixture_variables(seed=0))
    mesh = make_mesh(("data",))
    wrapped = MeshDetector(sharded_det, mesh)
    res_mesh = wrapped.detect_waveform(audio)

    assert res_mesh.num_windows == res_single.num_windows
    np.testing.assert_allclose(
        res_mesh.avg_values, res_single.avg_values, rtol=1e-5, atol=1e-6
    )
    assert res_mesh.intervals == res_single.intervals


@pytest.mark.slow
def test_sharded_fused_matches_single_device(tmp_path):
    from softspoken_tpu.engine.fused import detect_file_fused
    from softspoken_tpu.io import wavio

    rng = np.random.default_rng(4)
    p = str(tmp_path / "f.wav")
    wavio.write(p, rng.uniform(-0.4, 0.4, 22050 * 15).astype(np.float32), 22050,
                subtype="PCM_16")

    single = Detector(CFG, variables=ckpt.fixture_variables(seed=0))
    res_single = detect_file_fused(single, p)

    det2 = Detector(CFG, variables=ckpt.fixture_variables(seed=0))
    MeshDetector(det2, make_mesh(("data",)))
    res_mesh = detect_file_fused(det2, p)

    assert res_mesh.num_windows == res_single.num_windows
    np.testing.assert_allclose(res_mesh.avg_values, res_single.avg_values, atol=2e-3)
    assert res_mesh.intervals == res_single.intervals


def test_mesh_detector_rejects_bad_batch():
    det = Detector(
        Config().with_engine(precision="parity", device_batch=6, chunk_seconds=12.0),
        variables=ckpt.fixture_variables(seed=0),
    )
    with pytest.raises(ValueError):
        MeshDetector(det, make_mesh(("data",)))


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles_on_cpu():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 256)


# ---------------------------------------------------------------------------
# round 2: multi-host helpers (parallel/distributed.py)
# ---------------------------------------------------------------------------

def test_partition_files_deterministic_and_complete():
    from softspoken_tpu.parallel import partition_files

    files = [f"/x/rec{i:02d}.wav" for i in range(11)][::-1]  # unsorted input
    n = 4
    parts = [partition_files(files, process_id=p, num_processes=n) for p in range(n)]
    # complete, disjoint cover
    all_assigned = sorted(sum(parts, []))
    assert all_assigned == sorted(files)
    assert sum(len(p) for p in parts) == len(files)
    # deterministic: independent of input order
    parts2 = [partition_files(sorted(files), process_id=p, num_processes=n)
              for p in range(n)]
    assert parts == parts2
    # balanced within one file
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 1


def test_partition_files_rebalances_on_host_count():
    from softspoken_tpu.parallel import partition_files

    files = [f"r{i}.wav" for i in range(10)]
    for n in (1, 2, 3, 5):
        parts = [partition_files(files, process_id=p, num_processes=n)
                 for p in range(n)]
        assert sorted(sum(parts, [])) == sorted(files)


def test_init_distributed_single_process_noop(monkeypatch):
    """Single host, no cluster: auto-detection raises and we fall back to
    single-process quietly (review r3: an early return used to skip
    auto-detection entirely, breaking SLURM/OpenMPI ranks)."""
    import jax

    from softspoken_tpu.parallel import init_distributed

    def no_cluster(**kw):
        raise RuntimeError("no cluster detected")

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setattr(jax.distributed, "initialize", no_cluster)
    init_distributed()                  # must not raise
    init_distributed(num_processes=1)   # ditto


def test_init_distributed_attempts_cluster_autodetect(monkeypatch):
    """With no explicit config, jax.distributed's own auto-detection gets
    its chance (SLURM / OpenMPI / cloud-TPU)."""
    import jax

    from softspoken_tpu.parallel import init_distributed

    called = []
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    init_distributed()
    assert called == [{}]


def test_init_distributed_passes_explicit_arguments(monkeypatch):
    import jax

    from softspoken_tpu.parallel import init_distributed

    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    init_distributed("10.0.0.1:1234", num_processes=2, process_id=1)
    assert called == [{
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 2,
        "process_id": 1,
    }]


@pytest.mark.slow
def test_two_process_distributed_bootstrap_and_collective(tmp_path):
    """REAL multi-process jax.distributed: two OS processes bootstrap via the
    coordinator, form a 4-device global CPU mesh, split the file list
    disjointly, and agree on a cross-process jitted psum (Gloo over
    loopback — the same code path a multi-host pod takes over DCN)."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"OK pid={pid}" in out
    files0 = outs[0].split("files=")[1].split()[0].split(",")
    files1 = outs[1].split("files=")[1].split()[0].split(",")
    assert not set(files0) & set(files1)
    assert sorted(files0 + files1) == [f"f{i:02d}.wav" for i in range(7)]


@pytest.mark.slow
def test_two_process_distributed_cli_detect(tmp_path):
    """Full multi-host CLI flow: two OS processes run `detect --distributed`
    over the same 3-file list, bootstrap via the coordinator, each process
    detects its round-robin share, and the per-process CSVs disjointly
    cover every file."""
    import json as _json
    import socket
    import subprocess
    import sys as _sys

    from softspoken_tpu.io import wavio

    rng = np.random.default_rng(5)
    files = []
    for i in range(3):
        audio = (0.3 * rng.standard_normal(2 * 22050)).astype(np.float32)
        p = str(tmp_path / f"rec{i}.wav")
        wavio.write(p, audio, 22050, subtype="PCM_16")
        files.append(p)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        _json.dump({"engine": {"precision": "parity", "device_batch": 4,
                               "chunk_seconds": 12.0}}, f)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out_csv = str(tmp_path / "dets.csv")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [_sys.executable, "-m", "softspoken_tpu", "--config", cfg_path,
             "detect", "--files", *files, "--out", out_csv, "--random-init",
             "--streaming", "--distributed",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True, cwd=str(tmp_path),
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"

    import pandas as pd

    seen = {}
    for pid in range(2):
        part = str(tmp_path / f"dets.p{pid}.csv")
        assert os.path.exists(part), outs[pid][-2000:]
        df = pd.read_csv(part)
        seen[pid] = set(df["file_name"])
    assert not seen[0] & seen[1]
    assert seen[0] | seen[1] == {f"rec{i}.wav" for i in range(3)}


def test_mesh_detector_restore_unwraps():
    """MeshDetector.restore() (and the context-manager form) puts the
    wrapped Detector back on its single-device forwards (review r3: the
    rerouting used to be irreversible)."""
    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector

    det = Detector(Config().with_engine(precision="parity", device_batch=8),
                   variables=ckpt.fixture_variables(seed=0))
    orig_fwd, orig_chunk = det._fwd, det._fwd_chunk
    with MeshDetector(det, make_mesh(("data",))) as w:
        assert det._fwd is not orig_fwd
        assert det._fused_mesh is w.mesh
    assert det._fwd is orig_fwd and det._fwd_chunk is orig_chunk
    assert det._fused_mesh is None
    w.restore()  # idempotent


def test_init_distributed_explicit_single_skips_autodetect(monkeypatch):
    """num_processes=1 is an explicit request: inside a SLURM allocation,
    auto-detection would block on the other ranks (review r3 batch 8)."""
    import jax

    from softspoken_tpu.parallel import init_distributed

    def slurm_cluster(**kw):
        raise AssertionError("initialize() must not be called")

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setattr(jax.distributed, "initialize", slurm_cluster)
    init_distributed(num_processes=1)   # must not touch initialize()


def test_mesh_detector_data_axis_divisibility():
    """device_batch divides the DATA axis, not the total mesh size: a
    (4,2) data×seq mesh with device_batch=4 is valid (review r3 batch 8)."""
    det = Detector(
        Config().with_engine(precision="parity", device_batch=4,
                             chunk_seconds=12.0),
        variables=ckpt.fixture_variables(seed=0),
    )
    m = make_mesh(("data", "seq"), shape=(4, 2))
    with MeshDetector(det, m):
        pass  # constructing is the assertion (total size 8 would reject)


def test_mesh_detector_refuses_double_wrap():
    det = Detector(CFG, variables=ckpt.fixture_variables(seed=0))
    with MeshDetector(det):
        with pytest.raises(RuntimeError, match="already mesh-bound"):
            MeshDetector(det)
    # after restore, wrapping again is fine
    with MeshDetector(det):
        pass


def test_merge_partition_stores(tmp_path):
    """detect --distributed writes per-process stores; the merge gathers
    them into the main store downstream stages read (review r3 batch 10)."""
    from softspoken_tpu.parallel import merge_partition_stores
    from softspoken_tpu.project.store import DetectionStore

    main_path = str(tmp_path / "det.csv")
    # rank stores: p0 detected a.wav (2 rows) + processed quiet b.wav;
    # p1 detected c.wav (1 row)
    p0 = DetectionStore(str(tmp_path / "det.p0.csv"))
    p0.append_intervals("/x/a.wav", [(1.0, 2.0), (3.0, 4.0)])
    p0.mark_processed("/x/a.wav")
    p0.mark_processed("/x/b.wav")
    p0.save()
    p1 = DetectionStore(str(tmp_path / "det.p1.csv"))
    p1.append_intervals("/x/c.wav", [(0.5, 0.9)])
    p1.mark_processed("/x/c.wav")
    p1.save()

    out = merge_partition_stores(main_path)
    assert out["partitions"] == 2 and out["files"] == 3 and out["rows"] == 3

    main = DetectionStore(main_path)
    assert len(main.df) == 3
    assert main.processed_files() == {"/x/a.wav", "/x/b.wav", "/x/c.wav"}
    assert list(main.df["ID"]) == [1, 2, 3]  # IDs rebased sequentially
    # partitions consumed
    assert not os.path.exists(str(tmp_path / "det.p0.csv"))
    # idempotent re-run
    out2 = merge_partition_stores(main_path)
    assert out2["partitions"] == 0 and len(DetectionStore(main_path).df) == 3
