import numpy as np
import pytest

from softspoken_tpu import ckpt
from softspoken_tpu.models import SpecUNet2D


def test_orbax_roundtrip(tmp_path):
    variables = ckpt.fixture_variables(seed=2)
    path = str(tmp_path / "ckpt")
    ckpt.save(path, variables, epoch=7)
    restored, epoch = ckpt.load(path)
    assert epoch == 7
    for a, b in zip(
        sorted(_leaves(variables)), sorted(_leaves(restored))
    ):
        assert a[0] == b[0]
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_load_any_dispatch(tmp_path):
    # missing → (None, -1), the random-init degrade path
    v, e = ckpt.load_any(str(tmp_path / "nope"))
    assert v is None and e == -1

    variables = ckpt.fixture_variables(seed=1)
    path = str(tmp_path / "c2")
    ckpt.save(path, variables, epoch=3)
    v2, e2 = ckpt.load_any(path)
    assert e2 == 3 and v2 is not None


def test_pth_roundtrip(tmp_path):
    """The reference checkpoint format {'model_state_dict','epoch'}
    (NNDetector.py:47-49) converts losslessly."""
    import torch

    sd = ckpt.fixture_state_dict(seed=4)
    pth = str(tmp_path / "model_checkpoint.pth")
    torch.save({"model_state_dict": {k: torch.as_tensor(v) for k, v in sd.items()},
                "epoch": 12}, pth)
    variables, epoch = ckpt.load_pth(pth)
    assert epoch == 12
    direct = ckpt.convert_torch_state_dict(sd)
    for (ka, va), (kb, vb) in zip(sorted(_leaves(variables)), sorted(_leaves(direct))):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # converted variables drive the model
    out = SpecUNet2D().apply(variables, np.zeros((1, 128, 256, 1), np.float32))
    assert out[1].shape == (1, 256)


def _leaves(tree, prefix=""):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out += _leaves(v, prefix + k + "/")
        else:
            out.append((prefix + k, v))
    return out


# ---------------------------------------------------------------------------
# Torch-free .pth reading (VERDICT r2 #4): the zip/pickle format is read by
# ckpt.pth_reader with stdlib+numpy only.  _write_synthetic_pth builds a real
# torch-format archive with NOTHING but zipfile + hand-emitted pickle opcodes,
# so this round-trips even in images where torch does not exist.
# ---------------------------------------------------------------------------

import struct
import sys
import zipfile


def _pk_int(n: int) -> bytes:
    return b"J" + struct.pack("<i", n)


def _pk_str(s: str) -> bytes:
    b = s.encode()
    return b"X" + struct.pack("<I", len(b)) + b


def _pk_global(module: str, name: str) -> bytes:
    return b"c" + module.encode() + b"\n" + name.encode() + b"\n"


def _pk_tuple(*items: bytes) -> bytes:
    return b"(" + b"".join(items) + b"t"


def _write_synthetic_pth(path: str, sd, epoch: int, extra_items=None) -> None:
    """torch.save-compatible zip archive, stdlib only (no torch import).

    ``extra_items`` are picklable non-tensor values appended at the top
    level (the way real checkpoints carry metrics next to the state dict);
    their opcodes come from a real pickle.dumps with PROTO/STOP stripped.
    """
    contiguous_strides = lambda shape: [
        int(np.prod(shape[i + 1:], dtype=np.int64)) for i in range(len(shape))
    ]
    body = b"\x80\x02" + b"}" + b"("  # PROTO 2, EMPTY_DICT, MARK
    body += _pk_str("model_state_dict") + b"}" + b"("
    storages = {}
    for i, (key, arr) in enumerate(sd.items()):
        arr = np.ascontiguousarray(arr, np.float32)
        skey = str(i)
        storages[skey] = arr.tobytes()
        pid = _pk_tuple(
            _pk_str("storage"), _pk_global("torch", "FloatStorage"),
            _pk_str(skey), _pk_str("cpu"), _pk_int(arr.size),
        )
        tensor = (
            _pk_global("torch._utils", "_rebuild_tensor_v2")
            + _pk_tuple(
                pid + b"Q",  # BINPERSID
                _pk_int(0),
                _pk_tuple(*[_pk_int(d) for d in arr.shape]),
                _pk_tuple(*[_pk_int(s) for s in contiguous_strides(arr.shape)]),
                b"\x89",  # NEWFALSE (requires_grad)
                _pk_global("collections", "OrderedDict") + b")R",
            )
            + b"R"
        )
        body += _pk_str(key) + tensor
    body += b"u"  # SETITEMS → model_state_dict
    body += _pk_str("epoch") + _pk_int(epoch)
    if extra_items:
        import pickle as _p

        for key, value in extra_items.items():
            frag = _p.dumps(value, protocol=2)
            assert frag[:2] == b"\x80\x02" and frag[-1:] == b"."
            body += _pk_str(key) + frag[2:-1]
    body += b"u" + b"."
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("archive/data.pkl", body)
        z.writestr("archive/byteorder", "little")
        for skey, raw in storages.items():
            z.writestr(f"archive/data/{skey}", raw)


def test_pth_reader_matches_real_torch(tmp_path):
    torch = pytest.importorskip("torch")
    from softspoken_tpu.ckpt import pth_reader

    sd = ckpt.fixture_state_dict(seed=6)
    pth = str(tmp_path / "real.pth")
    torch.save({"model_state_dict": {k: torch.as_tensor(v) for k, v in sd.items()},
                "epoch": 9}, pth)
    got_sd, epoch = pth_reader.load_checkpoint(pth)
    assert epoch == 9
    assert set(got_sd) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(got_sd[k]), np.asarray(sd[k]))


def test_synthetic_pth_without_torch(tmp_path, monkeypatch):
    """stdlib-written .pth → load_pth → orbax → Detector, torch blocked."""
    sd = {k: v for k, v in ckpt.fixture_state_dict(seed=8).items()}
    pth = str(tmp_path / "synth.pth")
    _write_synthetic_pth(pth, sd, epoch=21)

    # make `import torch` fail so a silent torch dependency cannot hide
    monkeypatch.setitem(sys.modules, "torch", None)
    variables, epoch = ckpt.load_pth(pth)
    assert epoch == 21
    direct = ckpt.convert_torch_state_dict(
        {k: np.ascontiguousarray(v, np.float32) for k, v in sd.items()})
    for (ka, va), (kb, vb) in zip(sorted(_leaves(variables)),
                                  sorted(_leaves(direct))):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    out_dir = str(tmp_path / "orbax_out")
    ckpt.save(out_dir, variables, epoch)
    restored, re_epoch = ckpt.load(out_dir)
    assert re_epoch == 21
    out = SpecUNet2D().apply(restored, np.zeros((1, 128, 256, 1), np.float32))
    assert out[1].shape == (1, 256)


def test_pth_reader_blocks_malicious_globals(tmp_path):
    """Arbitrary-code pickles are rejected, not executed.

    UnsupportedPthError (not UnpicklingError) so load_pth can still hand
    unusual-but-benign files to torch.load(weights_only=True), which applies
    its own (equivalent) global blocking.
    """
    from softspoken_tpu.ckpt import pth_reader

    evil = b"\x80\x02" + _pk_global("os", "system") + _pk_tuple(_pk_str("true")) + b"R."
    with zipfile.ZipFile(str(tmp_path / "evil.pth"), "w") as z:
        z.writestr("archive/data.pkl", evil)
    with pytest.raises(pth_reader.UnsupportedPthError):
        pth_reader.load(str(tmp_path / "evil.pth"))


def test_pth_with_numpy_scalar_extras_loads_torch_free(tmp_path, monkeypatch):
    """Real checkpoints often carry e.g. {'best_f1': np.float64(...)} next
    to the state dict; the numpy data constructors are safelisted so the
    torch-free reader handles them instead of bailing (and previously the
    bail was an UnpicklingError that also skipped the torch fallback)."""
    import pickle as _p

    sd = ckpt.fixture_state_dict(seed=11)
    pth = str(tmp_path / "extras.pth")
    _write_synthetic_pth(
        pth, sd, epoch=3,
        extra_items={"best_f1": np.float64(0.4875),
                     "val_losses": np.asarray([0.5, 0.25, 0.125])})

    monkeypatch.setitem(sys.modules, "torch", None)  # torch-free or bust
    variables, epoch = ckpt.load_pth(pth)
    assert epoch == 3
    assert _leaves(variables)  # the state dict converted despite extras

    from softspoken_tpu.ckpt import pth_reader
    obj = pth_reader.load(pth)
    assert float(obj["best_f1"]) == 0.4875
    np.testing.assert_array_equal(obj["val_losses"],
                                  np.asarray([0.5, 0.25, 0.125]))


def _write_view_pth(path: str, numel: int, offset, size, stride) -> None:
    """Archive with ONE tensor whose view params are attacker-controlled."""
    storage = np.arange(numel, dtype=np.float32)
    pid = _pk_tuple(
        _pk_str("storage"), _pk_global("torch", "FloatStorage"),
        _pk_str("0"), _pk_str("cpu"), _pk_int(numel),
    )
    tensor = (
        _pk_global("torch._utils", "_rebuild_tensor_v2")
        + _pk_tuple(
            pid + b"Q",
            _pk_int(offset),
            _pk_tuple(*[_pk_int(d) for d in size]),
            _pk_tuple(*[_pk_int(s) for s in stride]),
            b"\x89",
            _pk_global("collections", "OrderedDict") + b")R",
        )
        + b"R"
    )
    body = (b"\x80\x02" + b"}" + b"(" + _pk_str("t") + tensor + b"u" + b".")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("archive/data.pkl", body)
        z.writestr("archive/data/0", storage.tobytes())


def test_pth_reader_rejects_out_of_bounds_views(tmp_path):
    """size/stride/offset come from the pickle: unvalidated as_strided reads
    arbitrary memory (a crafted archive segfaulted the reader — review r3).
    Every malformed view must raise UnsupportedPthError, never crash."""
    from softspoken_tpu.ckpt import pth_reader

    cases = [
        (8, 0, (4, 4), (10 ** 9, 1)),   # wild stride → OOB read
        (8, 0, (4, 4), (4, 1)),         # needs 16 elements, storage has 8
        (8, -4, (2,), (1,)),            # negative offset
        (8, 0, (4,), (-1,)),            # negative stride
        (8, 9, (), ()),                 # scalar past the end
        (8, 0, (2, 2), (1,)),           # rank mismatch
    ]
    for numel, off, size, stride in cases:
        p = str(tmp_path / f"bad_{off}_{size}_{stride}.pth")
        _write_view_pth(p, numel, off, size, stride)
        with pytest.raises(pth_reader.UnsupportedPthError):
            pth_reader.load(p)

    # a well-formed non-contiguous view (e.g. a transpose) still loads
    ok = str(tmp_path / "ok.pth")
    _write_view_pth(ok, 6, 0, (3, 2), (1, 3))  # transpose of (2,3)
    got = pth_reader.load(ok)["t"]
    np.testing.assert_array_equal(
        got, np.arange(6, dtype=np.float32).reshape(2, 3).T)


def test_pth_reader_wraps_corrupt_archives(tmp_path):
    """Missing storage entries / truncated pickles surface as
    UnsupportedPthError so convert.py's torch.load(weights_only=True)
    fallback gets its chance (review r3: KeyError/EOFError escaped)."""
    from softspoken_tpu.ckpt import pth_reader

    # storage entry data/0 missing from the archive
    p1 = str(tmp_path / "nostorage.pth")
    _write_view_pth(p1, 8, 0, (8,), (1,))
    p1b = str(tmp_path / "nostorage2.pth")
    with zipfile.ZipFile(p1) as zin, zipfile.ZipFile(p1b, "w") as zout:
        for n in zin.namelist():
            if not n.endswith("data/0"):
                zout.writestr(n, zin.read(n))
    with pytest.raises(pth_reader.UnsupportedPthError):
        pth_reader.load(p1b)

    # truncated data.pkl
    p2 = str(tmp_path / "trunc.pth")
    with zipfile.ZipFile(p1) as zin, zipfile.ZipFile(p2, "w") as zout:
        for n in zin.namelist():
            raw = zin.read(n)
            zout.writestr(n, raw[: len(raw) // 2] if n.endswith("data.pkl")
                          else raw)
    with pytest.raises(pth_reader.UnsupportedPthError):
        pth_reader.load(p2)


def test_load_any_recovers_stranded_old_backup(tmp_path):
    """save() renames the previous checkpoint to .old before installing the
    new one; a kill between the renames strands it.  load_any must recover
    the backup instead of silently degrading to random init (review r3)."""
    import os

    target = str(tmp_path / "model_checkpoint")
    ckpt.save(target, ckpt.fixture_variables(seed=3), epoch=7)
    # simulate the crash window: checkpoint moved aside, new one never landed
    os.rename(target, target + ".old")
    variables, epoch = ckpt.load_any(target)
    assert epoch == 7 and variables is not None
    assert os.path.isdir(target)          # backup reinstated
    assert not os.path.exists(target + ".old")


def test_load_any_recovers_stranded_new_save(tmp_path):
    """A kill between save()'s two renames strands the fully-committed new
    checkpoint in '<path>.new-*'; load_any must recover THAT (the newest
    work), not the stale .old (review r3 batch 10)."""
    import os

    from softspoken_tpu import ckpt

    path = str(tmp_path / "model_checkpoint")
    v_old = ckpt.fixture_variables(seed=0)
    ckpt.save(path, v_old, epoch=10)
    os.rename(path, f"{path}.old")
    v_new = ckpt.fixture_variables(seed=1)
    ckpt.save(path, v_new, epoch=20)
    # simulate the crash window: new save committed as .new-*, previous
    # checkpoint already renamed to .old, nothing at `path`
    os.rename(path, f"{path}.new-123-456789")

    variables, epoch = ckpt.load_any(path)
    assert epoch == 20  # the NEW checkpoint won
    assert os.path.isdir(path)
    import glob

    assert glob.glob(f"{path}.new-*") == []   # strays swept
    assert not os.path.isdir(f"{path}.old")


def _write_shared_storage_pth(path: str) -> None:
    """Two tensors viewing ONE storage (weight tying): offsets 0 and 4."""
    storage = np.arange(8, dtype=np.float32)
    pid = _pk_tuple(
        _pk_str("storage"), _pk_global("torch", "FloatStorage"),
        _pk_str("0"), _pk_str("cpu"), _pk_int(8),
    )

    def tensor(offset, size):
        return (
            _pk_global("torch._utils", "_rebuild_tensor_v2")
            + _pk_tuple(
                pid + b"Q",
                _pk_int(offset),
                _pk_tuple(_pk_int(size)),
                _pk_tuple(_pk_int(1)),
                b"\x89",
                _pk_global("collections", "OrderedDict") + b")R",
            )
            + b"R"
        )

    body = (b"\x80\x02" + b"}" + b"("
            + _pk_str("a") + tensor(0, 4)
            + _pk_str("b") + tensor(4, 4)
            + b"u" + b".")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("archive/data.pkl", body)
        z.writestr("archive/data/0", storage.tobytes())


def test_pth_reader_shared_storage_views(tmp_path):
    """Tied tensors referencing the same storage key load correctly and
    read the zip entry once (pickle never memoizes persistent ids;
    review r3 batch 17)."""
    from softspoken_tpu.ckpt import pth_reader

    p = str(tmp_path / "tied.pth")
    _write_shared_storage_pth(p)
    got = pth_reader.load(p)
    np.testing.assert_array_equal(got["a"], np.arange(4, dtype=np.float32))
    np.testing.assert_array_equal(got["b"],
                                  np.arange(4, 8, dtype=np.float32))
    # both views share one cached base buffer — a single read of data/0
    assert got["a"].base is not None and got["b"].base is not None


# ---------------------------------------------------------------------------
# Legacy (pre-zipfile) .pth: the round-4 VERDICT item — a field user's old
# checkpoint (torch < 1.6, or _use_new_zipfile_serialization=False) must
# load torch-free.  NNDetector.py:42-53 is the contract.
# ---------------------------------------------------------------------------


def _write_legacy_pth(path: str, sd, epoch: int) -> None:
    """torch legacy-format stream, stdlib only (no torch import).

    Layout per torch/serialization.py _legacy_save: magic pickle, protocol
    pickle, sys-info pickle, object pickle (storages as 6-element
    persistent ids with view_metadata=None), key-manifest pickle, then per
    storage an int64 element count + raw little-endian bytes.
    """
    import pickle as _p

    contiguous_strides = lambda shape: [
        int(np.prod(shape[i + 1:], dtype=np.int64)) for i in range(len(shape))
    ]
    body = b"\x80\x02" + b"}" + b"("
    body += _pk_str("model_state_dict") + b"}" + b"("
    storages = {}
    for i, (key, arr) in enumerate(sd.items()):
        arr = np.ascontiguousarray(arr, np.float32)
        skey = str(i)
        storages[skey] = arr
        pid = _pk_tuple(
            _pk_str("storage"), _pk_global("torch", "FloatStorage"),
            _pk_str(skey), _pk_str("cpu"), _pk_int(arr.size),
            b"N",  # view_metadata=None — the legacy pid's 6th element
        )
        tensor = (
            _pk_global("torch._utils", "_rebuild_tensor_v2")
            + _pk_tuple(
                pid + b"Q",
                _pk_int(0),
                _pk_tuple(*[_pk_int(d) for d in arr.shape]),
                _pk_tuple(*[_pk_int(s) for s in contiguous_strides(arr.shape)]),
                b"\x89",
                _pk_global("collections", "OrderedDict") + b")R",
            )
            + b"R"
        )
        body += _pk_str(key) + tensor
    body += b"u"
    body += _pk_str("epoch") + _pk_int(epoch)
    body += b"u" + b"."

    with open(path, "wb") as f:
        f.write(_p.dumps(0x1950A86A20F9469CFC6C, protocol=2))
        f.write(_p.dumps(1001, protocol=2))
        f.write(_p.dumps({"protocol_version": 1001, "little_endian": True,
                          "type_sizes": {"short": 2, "int": 4, "long": 4}},
                         protocol=2))
        f.write(body)
        f.write(_p.dumps(sorted(storages, key=int), protocol=2))
        for skey in sorted(storages, key=int):
            arr = storages[skey]
            f.write(struct.pack("<q", arr.size))
            f.write(arr.astype("<f4").tobytes())


def test_legacy_pth_without_torch(tmp_path, monkeypatch):
    """stdlib-written LEGACY .pth → load_pth → Flax variables, torch blocked."""
    sd = ckpt.fixture_state_dict(seed=11)
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    pth = str(tmp_path / "legacy.pth")
    _write_legacy_pth(pth, sd, epoch=33)

    monkeypatch.setitem(sys.modules, "torch", None)
    variables, epoch = ckpt.load_pth(pth)
    assert epoch == 33
    direct = ckpt.convert_torch_state_dict(
        {k: np.ascontiguousarray(v, np.float32) for k, v in sd.items()})
    got, want = sorted(_leaves(variables)), sorted(_leaves(direct))
    assert [k for k, _ in got] == [k for k, _ in want]
    for (_, va), (_, vb) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_legacy_pth_matches_real_torch(tmp_path):
    """Real torch writes the legacy stream (shared storages + transposed
    views included); the torch-free reader must reproduce torch.load."""
    torch = pytest.importorskip("torch")
    from softspoken_tpu.ckpt import pth_reader

    base = torch.arange(24, dtype=torch.float32)
    ck = {
        "model_state_dict": {
            "tied_a": base.view(4, 6),
            "tied_b": base[6:18].view(3, 4),       # same storage, offset 6
            "noncontig": torch.randn(6, 4).t(),    # stride-swapped view
            "plain": torch.randn(5, 7),
            "ints": torch.arange(10, dtype=torch.int64),
        },
        "epoch": 12,
        "metrics": [1.5, "best"],
    }
    pth = str(tmp_path / "legacy_real.pth")
    torch.save(ck, pth, _use_new_zipfile_serialization=False)

    got = pth_reader.load(pth)
    assert got["epoch"] == 12 and got["metrics"] == [1.5, "best"]
    for k, t in ck["model_state_dict"].items():
        np.testing.assert_array_equal(
            np.asarray(got["model_state_dict"][k]), t.numpy())


def test_legacy_pth_reject_paths(tmp_path):
    from softspoken_tpu.ckpt import pth_reader

    sd = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    good = str(tmp_path / "good.pth")
    _write_legacy_pth(good, sd, epoch=1)
    raw = open(good, "rb").read()

    # truncated mid-payload
    trunc = str(tmp_path / "trunc.pth")
    open(trunc, "wb").write(raw[:-8])
    with pytest.raises(pth_reader.UnsupportedPthError):
        pth_reader.load(trunc)

    # wrong magic: not the torch legacy stream
    import pickle as _p
    bad = str(tmp_path / "bad.pth")
    open(bad, "wb").write(_p.dumps(123456, protocol=2) + raw[15:])
    with pytest.raises(pth_reader.UnsupportedPthError):
        pth_reader.load(bad)

    # arbitrary-code global inside the object pickle is blocked
    evil_obj = (b"\x80\x02" + _pk_global("os", "system")
                + _pk_tuple(_pk_str("true")) + b"R.")
    evil = str(tmp_path / "evil.pth")
    with open(evil, "wb") as f:
        f.write(_p.dumps(0x1950A86A20F9469CFC6C, protocol=2))
        f.write(_p.dumps(1001, protocol=2))
        f.write(_p.dumps({"little_endian": True}, protocol=2))
        f.write(evil_obj)
        f.write(_p.dumps([], protocol=2))
    with pytest.raises(pth_reader.UnsupportedPthError):
        pth_reader.load(evil)
