"""Logging / workdir / seeding helpers (parity: utils/log_util.py)."""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional, Sequence


def get_logger(name: str = "cfgpp_tpu", level: int = logging.INFO,
               logfile: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    fmt = logging.Formatter("%(asctime)s [%(levelname)s] %(name)s: %(message)s")
    if not logger.handlers:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    # honor level/logfile on EVERY call: a get_logger(name) early in the
    # process must not freeze the config against later, more specific calls
    logger.setLevel(level)
    if logfile and not any(
            isinstance(h, logging.FileHandler)
            and getattr(h, "baseFilename", None) == str(Path(logfile).absolute())
            for h in logger.handlers):
        fh = logging.FileHandler(logfile)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def create_workdir(workdir) -> Path:
    """Make <workdir>/result (log_util.py:44-45)."""
    p = Path(workdir)
    p.joinpath("result").mkdir(parents=True, exist_ok=True)
    return p


def set_seed(seed: int):
    """Seed story: JAX has no global RNG; every stochastic engine entry point
    takes an explicit seed and threads jax.random keys.  This helper seeds
    numpy (host-side shuffling) and returns the root key for convenience.
    Note: torch/CUDA RNG parity with the reference is impossible by
    construction — tests inject noise instead (SURVEY.md §7 'RNG parity')."""
    import numpy as np
    np.random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)


def make_gif(image_paths: Sequence, save_path, duration: int = 100) -> None:
    """Stitch saved PNG frames into a GIF (log_util.py:28-37 parity)."""
    from PIL import Image

    frames = [Image.open(p) for p in image_paths]
    if not frames:
        return
    frames[0].save(save_path, save_all=True, append_images=frames[1:],
                   duration=duration, loop=0)


def save_floats(values: Sequence[float], path) -> None:
    with open(path, "w") as f:
        for v in values:
            f.write(f"{float(v)}\n")
