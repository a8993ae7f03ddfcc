"""Orbax bundle checkpoint round-trip + profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgpp_tpu.engine import ModelBundle
from cfgpp_tpu.weights.checkpoint import load_bundle, save_bundle

pytestmark = pytest.mark.slow  # >60s-class integration module: run via the full suite (pytest tests/ -q); the default dev selection is -m "not slow" (see pyproject)


def test_bundle_checkpoint_roundtrip(tmp_path):
    b1 = ModelBundle.random_init("tiny_sdxl", seed=1, dtype=jnp.float32,
                                 param_dtype=jnp.float32)
    save_bundle(b1, tmp_path / "ckpt")

    b2 = ModelBundle.random_init("tiny_sdxl", seed=2, dtype=jnp.float32,
                                 param_dtype=jnp.float32)
    # different seeds -> at least one param leaf differs before restore
    # (leaf 0 may be a zero-init bias, so check across the whole tree)
    diffs = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(b1.unet_params),
                             jax.tree.leaves(b2.unet_params))]
    assert any(diffs)

    b2 = load_bundle(b2, tmp_path / "ckpt")
    for a, b in zip(jax.tree.leaves(b1.unet_params), jax.tree.leaves(b2.unet_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(b1.text_params_2), jax.tree.leaves(b2.text_params_2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bundle_checkpoint_name_mismatch(tmp_path):
    b1 = ModelBundle.random_init("tiny_sd", dtype=jnp.float32, param_dtype=jnp.float32)
    save_bundle(b1, tmp_path / "ckpt")
    b2 = ModelBundle.random_init("tiny_sdxl", dtype=jnp.float32, param_dtype=jnp.float32)
    with pytest.raises(ValueError, match="checkpoint is for"):
        load_bundle(b2, tmp_path / "ckpt")


def test_step_timer():
    from cfgpp_tpu.utils.profiling import StepTimer

    t = StepTimer()
    x = jnp.ones((64, 64))
    f = jax.jit(lambda a: a @ a)
    for _ in range(3):
        t.time_fn("matmul", f, x)
    s = t.summary()["matmul"]
    assert s["count"] == 3 and s["mean_ms"] > 0
    assert "matmul" in t.report()
