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
