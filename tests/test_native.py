"""Native C++ PNG loader: build, PIL bit-parity, batch API, fallbacks."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from enph459_super_resolution_tpu.native import png_loader


@pytest.fixture(scope="module")
def native_lib():
    if not png_loader.available():
        if shutil.which("g++") is None:
            pytest.skip("no g++ toolchain")
        subprocess.run(
            [sys.executable, "-m",
             "enph459_super_resolution_tpu.native.build"], check=True)
        png_loader._TRIED = False
        png_loader._LIB = None
    if not png_loader.available():
        pytest.skip("native lib unavailable")
    return png_loader


def _write_png(path, arr):
    Image.fromarray(arr).save(path)


def test_single_decode_bit_parity(native_lib, tmp_path):
    rng = np.random.default_rng(0)
    for name, arr in [
        ("gray.png", rng.integers(0, 256, (37, 53), dtype=np.uint8)),
        ("rgb.png", rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)),
    ]:
        p = str(tmp_path / name)
        _write_png(p, arr)
        got = native_lib.load(p)
        want = np.asarray(Image.open(p))
        assert np.array_equal(got, want), name


def test_16bit_png_scaled(native_lib, tmp_path):
    arr = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 1024)
    p = str(tmp_path / "g16.png")
    Image.fromarray(arr, mode="I;16").save(p)
    got = native_lib.load(p)
    assert got.dtype == np.uint8 and got.shape == (8, 8)


def test_batch_decode_order_and_failures(native_lib, tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    arrays = []
    for i in range(6):
        arr = rng.integers(0, 256, (16 + i, 20, ), dtype=np.uint8)
        p = str(tmp_path / f"img{i}.png")
        _write_png(p, arr)
        paths.append(p)
        arrays.append(arr)
    paths.insert(3, str(tmp_path / "missing.png"))
    out = native_lib.load_batch(paths, n_threads=4)
    assert out[3] is None
    kept = out[:3] + out[4:]
    for got, want in zip(kept, arrays):
        assert np.array_equal(got, want)


def test_non_png_falls_back():
    assert png_loader.load("/tmp/whatever.jpg") is None


def test_session_loader_uses_batch_path(native_lib, reference_root):
    """End-to-end: corner_rep session load through the native batch path
    equals the recorded frames regardless of decoder."""
    import os as _os
    from enph459_super_resolution_tpu.data import load_corner_rep_sessions

    session = _os.path.join(
        reference_root, "rgb_cal_target/data/"
        "cal_target_color_tilt0.28000deg_settle20ms")
    units = load_corner_rep_sessions(session, bayer_red=True,
                                     average_reps=True)
    assert units[0].frames.shape == (4, 768, 1024)
    assert np.isfinite(units[0].frames).all()


@pytest.mark.parametrize("shape", [(64, 80), (48, 56, 3)])
def test_native_writer_lossless_roundtrip(native_lib, tmp_path, shape):
    """srpng_write -> PIL decode is bit-exact (PNG is lossless; only the
    encode speed differs from PIL)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    p = str(tmp_path / "w.png")
    assert native_lib.save(p, img)
    assert np.array_equal(np.asarray(Image.open(p)), img)


def test_save_png_native_path_and_fallback(native_lib, tmp_path, monkeypatch):
    """data.io.save_png writes identical pixels through the native writer
    and through the PIL fallback."""
    from enph459_super_resolution_tpu.data.io import save_png

    img = np.random.default_rng(6).uniform(-20, 280, (32, 40))  # float: clip
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    save_png(img, p1)
    monkeypatch.setattr(native_lib, "save", lambda *a, **k: False)
    save_png(img, p2)
    a, b = np.asarray(Image.open(p1)), np.asarray(Image.open(p2))
    assert np.array_equal(a, b)
    assert a.dtype == np.uint8 and a.max() <= 255


def test_native_loader_corrupt_file_returns_none(native_lib, tmp_path):
    """A truncated/garbage PNG exercises the libpng longjmp error path
    (the serve-mode mid-write case): load must return None cleanly, not
    crash the process."""
    # valid 8-byte PNG signature followed by garbage -> errors inside
    # png_read_info/png_read_image, i.e. through setjmp/longjmp
    p = str(tmp_path / "corrupt.png")
    with open(p, "wb") as fp:
        fp.write(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    assert native_lib.load(p) is None
    # repeated failures must not accumulate state or crash
    for _ in range(5):
        assert native_lib.load(p) is None
