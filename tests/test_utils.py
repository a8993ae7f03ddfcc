"""utils tests: image IO, grid, gif, fft, logging helpers."""

import numpy as np
from PIL import Image

from cfgpp_tpu.utils import (
    create_workdir,
    fft2d,
    ifft2d,
    load_image,
    make_gif,
    normalize,
    save_floats,
    save_image,
)


def test_save_and_load_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    p = tmp_path / "x.png"
    save_image(img, p)
    back = load_image(p, size=16, centered=False)
    assert back.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(back[0] / 255.0, img, atol=1 / 255 + 1e-6)


def test_load_image_centered(tmp_path):
    img = np.ones((8, 8, 3), np.float32)
    p = tmp_path / "w.png"
    save_image(img, p)
    arr = load_image(p, size=8, centered=True)
    np.testing.assert_allclose(arr, 1.0, atol=0.02)   # [0,1] -> [-1,1]


def test_batch_grid(tmp_path):
    imgs = np.random.RandomState(1).rand(4, 8, 8, 3).astype(np.float32)
    p = tmp_path / "grid.png"
    save_image(imgs, p, nrow=2)
    g = np.asarray(Image.open(p))
    assert g.shape == (2 * 8 + 2, 2 * 8 + 2, 3)   # 2x2 grid, pad 2


def test_normalize():
    x = np.asarray([1.0, 3.0])
    np.testing.assert_allclose(normalize(x), [0.0, 1.0])
    np.testing.assert_allclose(normalize(np.zeros(3)), np.zeros(3))


def test_fft_roundtrip():
    x = np.random.RandomState(2).rand(1, 8, 8, 1)
    np.testing.assert_allclose(ifft2d(fft2d(x)).real, x, atol=1e-12)


def test_make_gif(tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f"{i}.png"
        save_image(np.full((8, 8, 3), i / 3.0, np.float32), p)
        paths.append(p)
    gif = tmp_path / "out.gif"
    make_gif(paths, gif)
    im = Image.open(gif)
    assert im.n_frames == 3


def test_workdir_and_floats(tmp_path):
    w = create_workdir(tmp_path / "wd")
    assert (w / "result").is_dir()
    save_floats([1.5, 2.0], tmp_path / "f.txt")
    assert (tmp_path / "f.txt").read_text() == "1.5\n2.0\n"
