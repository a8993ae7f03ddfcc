"""Native PNG writer tests: byte-correct PNGs, async pool semantics, fallback."""

import numpy as np
import pytest
from PIL import Image

from cfgpp_tpu.native import AsyncPngWriter, native_available, save_png_native

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native imageio unavailable (no g++/zlib)")


def test_save_png_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(37, 53, 3).astype(np.float32)   # odd sizes on purpose
    path = tmp_path / "x.png"
    assert save_png_native(path, img)
    back = np.asarray(Image.open(path))
    want = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(back, want)


def test_async_pool_writes_all(tmp_path):
    rng = np.random.RandomState(1)
    imgs = [rng.rand(16, 16, 3).astype(np.float32) for _ in range(20)]
    with AsyncPngWriter(n_threads=4) as w:
        assert w.is_native
        for i, img in enumerate(imgs):
            w.submit(tmp_path / f"{i:03d}.png", img)
        assert w.wait() == 0
        for i, img in enumerate(imgs):
            back = np.asarray(Image.open(tmp_path / f"{i:03d}.png"))
            want = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
            np.testing.assert_array_equal(back, want)


def test_pool_reusable_after_wait(tmp_path):
    with AsyncPngWriter(n_threads=2) as w:
        w.submit(tmp_path / "a.png", np.zeros((8, 8, 3), np.float32))
        assert w.wait() == 0
        w.submit(tmp_path / "b.png", np.ones((8, 8, 3), np.float32))
        assert w.wait() == 0
    assert (tmp_path / "a.png").exists() and (tmp_path / "b.png").exists()


def test_uint8_input(tmp_path):
    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    path = tmp_path / "u8.png"
    assert save_png_native(path, img)
    np.testing.assert_array_equal(np.asarray(Image.open(path)), img)


def test_async_reader_parity_and_window(tmp_path):
    """Native decoder pool returns bit-exact pixels in submission order,
    with the bounded prefetch window; non-PNG falls back to PIL."""
    import numpy as np
    from PIL import Image

    from cfgpp_tpu.native import AsyncPngReader
    rng = np.random.default_rng(7)
    paths, refs = [], []
    for i in range(10):
        a = rng.integers(0, 255, (16 + i, 24, 3), np.uint8)
        p = tmp_path / f"{i:03d}.png"
        Image.fromarray(a).save(p)
        paths.append(p)
        refs.append(a)
    # one JPEG in the middle exercises the per-file PIL fallback
    jpg = tmp_path / "005x.jpg"
    Image.fromarray(refs[5]).save(jpg, quality=95)
    paths[5] = jpg

    with AsyncPngReader(paths, n_threads=2, window=3) as r:
        for i, ref in enumerate(refs):
            got = r.get(i)
            assert got.shape == ref.shape
            if i != 5:  # jpeg is lossy; just check it decoded
                np.testing.assert_array_equal(got, ref)


def test_async_reader_roundtrip_with_writer(tmp_path):
    """Writer pool output must decode bit-exact through the reader pool."""
    import numpy as np

    from cfgpp_tpu.native import AsyncPngReader, AsyncPngWriter
    rng = np.random.default_rng(9)
    imgs = [rng.random((20, 20, 3)).astype(np.float32) for _ in range(4)]
    paths = [tmp_path / f"w{i}.png" for i in range(4)]
    with AsyncPngWriter(2) as w:
        for p, im in zip(paths, imgs):
            w.submit(p, im)
    with AsyncPngReader(paths) as r:
        for i, im in enumerate(imgs):
            expect = (np.clip(im, 0, 1) * 255.0 + 0.5).astype(np.uint8)
            np.testing.assert_array_equal(r.get(i), expect)
