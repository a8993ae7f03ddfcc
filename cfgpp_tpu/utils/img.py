"""Image IO helpers (host side).

Parity surface with the reference's `utils/img_util.py` (save/normalize/
to-numpy/fft helpers), NHWC-first and PIL-backed instead of torchvision.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def to_np(x) -> np.ndarray:
    return np.asarray(x)


def normalize(img: np.ndarray) -> np.ndarray:
    """Min-max normalize to [0, 1]."""
    img = np.asarray(img, np.float32)
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo) if hi > lo else np.zeros_like(img)


def _grid(imgs: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """[B,H,W,C] -> single grid image [H',W',C] (torchvision make_grid-alike)."""
    b, h, w, c = imgs.shape
    ncol = min(nrow, b)
    nr = (b + ncol - 1) // ncol
    grid = np.zeros((nr * (h + pad) - pad, ncol * (w + pad) - pad, c), imgs.dtype)
    for i in range(b):
        r, col = divmod(i, ncol)
        grid[r * (h + pad): r * (h + pad) + h, col * (w + pad): col * (w + pad) + w] = imgs[i]
    return grid


def save_image(img, path, normalize_img: bool = False, nrow: int = 8) -> None:
    """Save float images in [0,1] (NHWC, [H,W,C], or [H,W]) as PNG."""
    from PIL import Image

    arr = np.asarray(img, np.float32)
    if arr.ndim == 4:
        arr = _grid(arr, nrow=nrow) if arr.shape[0] > 1 else arr[0]
    if normalize_img:
        arr = normalize(arr)
    arr = np.clip(arr, 0.0, 1.0)
    arr = (arr * 255.0 + 0.5).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


def load_image(path, size: int = 512, centered: bool = True) -> np.ndarray:
    """PIL -> [1,H,W,3] float32; centered=True maps to [-1,1]
    (examples/inversion.py:16-22 semantics, NHWC)."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size))
    arr = np.asarray(img, np.float32)
    if centered:
        arr = arr / 127.5 - 1.0
    return arr[None]


def fft2d(x: np.ndarray) -> np.ndarray:
    """Centered 2D FFT over the spatial dims of NHWC (legacy parity helper)."""
    return np.fft.fftshift(np.fft.fft2(x, axes=(1, 2)), axes=(1, 2))


def ifft2d(x: np.ndarray) -> np.ndarray:
    return np.fft.ifft2(np.fft.ifftshift(x, axes=(1, 2)), axes=(1, 2))
