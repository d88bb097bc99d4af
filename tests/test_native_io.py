"""Native C++ decode library (tpu_inspect.native) parity vs cv2.

The library must either reproduce cv2.imread(IMREAD_UNCHANGED) bit-exactly
(PNG/TIFF, uint8/uint16, gray/BGR/BGRA) or decline (return None) so the
caller falls back — never a third behavior.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpu_inspect import native
from tpu_inspect.imageio import load_gray


@pytest.fixture(scope="module")
def lib_ok():
    if native.get_lib() is None:
        pytest.skip("native build unavailable (no g++/libpng/libtiff)")
    return True


def _roundtrip(tmp_path, name, img):
    p = str(tmp_path / name)
    assert cv2.imwrite(p, img)
    ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    got = native.decode(p)
    return ref, got


@pytest.mark.parametrize("ext", ["png", "tif"])
def test_gray_u8(lib_ok, tmp_path, ext):
    img = np.random.RandomState(0).randint(0, 256, (37, 53), dtype=np.uint8)
    ref, got = _roundtrip(tmp_path, f"g8.{ext}", img)
    assert got is not None and got.dtype == np.uint8
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("ext", ["png", "tif"])
def test_gray_u16(lib_ok, tmp_path, ext):
    img = np.random.RandomState(1).randint(0, 65536, (25, 31), dtype=np.uint16)
    ref, got = _roundtrip(tmp_path, f"g16.{ext}", img)
    assert got is not None and got.dtype == np.uint16
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("ext", ["png", "tif"])
def test_bgr_u8(lib_ok, tmp_path, ext):
    img = np.random.RandomState(2).randint(0, 256, (20, 24, 3), dtype=np.uint8)
    ref, got = _roundtrip(tmp_path, f"c8.{ext}", img)
    assert got is not None and got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_bgra_u8(lib_ok, tmp_path):
    img = np.random.RandomState(3).randint(0, 256, (20, 24, 4), dtype=np.uint8)
    ref, got = _roundtrip(tmp_path, "c8a.png", img)
    assert got is not None and got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_bgr_u16_png(lib_ok, tmp_path):
    img = np.random.RandomState(4).randint(
        0, 65536, (15, 18, 3), dtype=np.uint16
    )
    ref, got = _roundtrip(tmp_path, "c16.png", img)
    assert got is not None and got.dtype == np.uint16
    np.testing.assert_array_equal(got, ref)


def test_float_tiff_declines(lib_ok, tmp_path):
    img = np.random.RandomState(5).rand(9, 11).astype(np.float32)
    p = str(tmp_path / "f32.tif")
    assert cv2.imwrite(p, img)
    assert native.decode(p) is None  # -> cv2 fallback
    # and the public loader still handles it (min-max normalize path)
    out = load_gray(p)
    assert out.dtype == np.uint8 and out.shape == img.shape


def test_load_gray_uses_native_and_matches(lib_ok, tmp_path):
    rng = np.random.RandomState(6)
    img16 = rng.randint(0, 65536, (30, 40), dtype=np.uint16)
    p = str(tmp_path / "m16.tif")
    assert cv2.imwrite(p, img16)
    out = load_gray(p)
    np.testing.assert_array_equal(out, (img16 / 256).astype(np.uint8))


def test_unknown_container_declines(lib_ok, tmp_path):
    p = str(tmp_path / "x.bmp")
    assert cv2.imwrite(p, np.zeros((4, 4), np.uint8))
    assert native.decode(p) is None


def test_encode_png_gray_roundtrip(lib_ok, tmp_path):
    img = np.random.RandomState(7).randint(0, 256, (21, 33), dtype=np.uint8)
    p = str(tmp_path / "enc.png")
    assert native.encode_png_gray(p, img)
    np.testing.assert_array_equal(cv2.imread(p, cv2.IMREAD_UNCHANGED), img)
    np.testing.assert_array_equal(native.decode(p), img)


def test_export_masks_uses_native(lib_ok, tmp_path):
    from tpu_inspect.persistence import export_masks_and_csv

    masks = [
        (np.random.RandomState(i).rand(16, 20) > 0.5).astype(np.uint8) * 255
        for i in range(3)
    ]
    masks[1] = None
    csv_path = export_masks_and_csv(masks, tmp_path)
    for i in (0, 2):
        back = cv2.imread(str(tmp_path / f"mask_{i:04d}.png"),
                          cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(back, masks[i])
    assert "masks_summary.csv" in csv_path


# ---------------------------------------------------------------------------
# StreamLoader: threaded prefetch decode (native data-loader runtime)
# ---------------------------------------------------------------------------


def test_stream_loader_order_and_parity(lib_ok, tmp_path):
    """Many mixed-format frames, more threads than capacity: frames must
    come back strictly in path order, each bit-exact vs the one-shot
    decoder."""
    rng = np.random.RandomState(8)
    paths, refs = [], []
    for i in range(20):
        if i % 3 == 0:
            img = rng.randint(0, 65536, (11 + i, 13, ), dtype=np.uint16)
            p = str(tmp_path / f"s{i:02d}.tif")
        elif i % 3 == 1:
            img = rng.randint(0, 256, (9, 10 + i, 3), dtype=np.uint8)
            p = str(tmp_path / f"s{i:02d}.png")
        else:
            img = rng.randint(0, 256, (8 + i, 7), dtype=np.uint8)
            p = str(tmp_path / f"s{i:02d}.png")
        assert cv2.imwrite(p, img)
        paths.append(p)
        refs.append(cv2.imread(p, cv2.IMREAD_UNCHANGED))
    out = list(native.StreamLoader(paths, capacity=2, threads=4))
    assert len(out) == len(paths)
    for got, ref in zip(out, refs):
        assert got is not None
        np.testing.assert_array_equal(got, ref)


def test_stream_loader_declined_frames_yield_none(lib_ok, tmp_path):
    """Frames the native decoder declines (unknown container, corrupt file)
    come back as None at their position; the rest still decode."""
    ok1 = str(tmp_path / "a.png")
    bad = str(tmp_path / "b.png")  # PNG extension, garbage bytes
    bmp = str(tmp_path / "c.bmp")  # unsupported container
    ok2 = str(tmp_path / "d.tif")
    img1 = np.random.RandomState(9).randint(0, 256, (6, 7), dtype=np.uint8)
    img2 = np.random.RandomState(10).randint(0, 65536, (5, 8), dtype=np.uint16)
    assert cv2.imwrite(ok1, img1)
    with open(bad, "wb") as f:
        f.write(b"not a png at all")
    assert cv2.imwrite(bmp, np.zeros((4, 4), np.uint8))
    assert cv2.imwrite(ok2, img2)
    out = list(native.StreamLoader([ok1, bad, bmp, ok2], capacity=3, threads=2))
    np.testing.assert_array_equal(out[0], img1)
    assert out[1] is None
    assert out[2] is None
    np.testing.assert_array_equal(out[3], img2)


def test_stream_loader_empty_and_close(lib_ok):
    assert list(native.StreamLoader([])) == []
    # abandoning a partially consumed loader must not hang or leak the pool
    ldr = native.StreamLoader([], capacity=1, threads=1)
    ldr.close()
    ldr.close()  # idempotent


def test_load_gray_stream_matches_load_gray(lib_ok, tmp_path):
    from tpu_inspect.imageio import load_gray_stream

    rng = np.random.RandomState(11)
    paths = []
    imgs = [
        rng.randint(0, 256, (12, 14), dtype=np.uint8),          # gray u8 png
        rng.randint(0, 65536, (10, 9), dtype=np.uint16),        # u16 tif (/256)
        rng.randint(0, 256, (8, 11, 3), dtype=np.uint8),        # BGR png
        rng.rand(7, 7).astype(np.float32),                      # float tif (minmax, cv2 fallback)
    ]
    for i, (img, ext) in enumerate(zip(imgs, ["png", "tif", "png", "tif"])):
        p = str(tmp_path / f"lg{i}.{ext}")
        assert cv2.imwrite(p, img)
        paths.append(p)
    got = list(load_gray_stream(paths, capacity=2, threads=2))
    for g, p in zip(got, paths):
        np.testing.assert_array_equal(g, load_gray(p))


def test_stream_loader_unreadable_file_yields_none(lib_ok, tmp_path):
    missing = str(tmp_path / "never_written.png")
    out = list(native.StreamLoader([missing]))
    assert out == [None]


def test_stream_loader_close_while_iterating(lib_ok, tmp_path):
    """close() with the iterator suspended must yield None for the rest,
    never touch the destroyed native loader."""
    imgs = [
        np.random.RandomState(20 + i).randint(0, 256, (6, 7), dtype=np.uint8)
        for i in range(4)
    ]
    paths = []
    for i, img in enumerate(imgs):
        p = str(tmp_path / f"cl{i}.png")
        assert cv2.imwrite(p, img)
        paths.append(p)
    ldr = native.StreamLoader(paths, capacity=2, threads=2)
    it = iter(ldr)
    first = next(it)
    np.testing.assert_array_equal(first, imgs[0])
    ldr.close()
    rest = list(it)
    assert rest == [None, None, None]


def test_stream_loader_stress_many_small(lib_ok, tmp_path):
    """Tight bound (capacity=1) with more workers than slots: no deadlock,
    order preserved over many frames."""
    rng = np.random.RandomState(30)
    paths, refs = [], []
    for i in range(60):
        img = rng.randint(0, 256, (5 + (i % 7), 6), dtype=np.uint8)
        p = str(tmp_path / f"st{i:03d}.png")
        assert cv2.imwrite(p, img)
        paths.append(p)
        refs.append(img)
    out = list(native.StreamLoader(paths, capacity=1, threads=8))
    assert len(out) == 60
    for got, ref in zip(out, refs):
        np.testing.assert_array_equal(got, ref)


def test_stream_loader_destroy_without_consuming(lib_ok, tmp_path):
    """close() immediately after creation (workers possibly mid-decode)
    must join cleanly and free buffered frames."""
    rng = np.random.RandomState(31)
    paths = []
    for i in range(8):
        img = rng.randint(0, 256, (64, 64), dtype=np.uint8)
        p = str(tmp_path / f"dw{i}.png")
        assert cv2.imwrite(p, img)
        paths.append(p)
    for _ in range(5):  # repeat to give races a chance
        ldr = native.StreamLoader(paths, capacity=4, threads=4)
        ldr.close()
