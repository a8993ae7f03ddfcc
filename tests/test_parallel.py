"""Data-parallel sharded generation tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgpp_tpu.engine import DiffusionEngine, ModelBundle
from cfgpp_tpu.parallel import batch_sharding, make_mesh, shard_batch

pytestmark = pytest.mark.slow  # >60s-class integration module: run via the full suite (pytest tests/ -q); the default dev selection is -m "not slow" (see pyproject)


@pytest.fixture(scope="module")
def engine():
    bundle = ModelBundle.random_init("tiny_sd", dtype=jnp.float32,
                                     param_dtype=jnp.float32)
    return DiffusionEngine(bundle, solver="ddim_cfg++", nfe=2)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    x = jnp.zeros((8, 4))
    xs = shard_batch(x, mesh)
    assert xs.sharding == batch_sharding(mesh)


def test_sample_batch_sharded_matches_unsharded(engine):
    prompts = [f"prompt {i}" for i in range(8)]
    imgs_plain = engine.sample_batch("", prompts, cfg_guidance=0.6, seed=1,
                                     resolution=16)
    mesh = make_mesh()
    imgs_mesh = engine.sample_batch("", prompts, cfg_guidance=0.6, seed=1,
                                    resolution=16, mesh=mesh)
    assert imgs_mesh.shape == (8, 16, 16, 3)
    np.testing.assert_allclose(imgs_plain, imgs_mesh, atol=1e-5)


def test_per_sample_rng_independent_of_batch(engine):
    """Image i must be identical whether generated in a batch of 4 or alone."""
    prompts = [f"p{i}" for i in range(4)]
    batch = engine.sample_batch("", prompts, cfg_guidance=0.6, seed=3,
                                resolution=16, sample_indices=[0, 1, 2, 3])
    solo = engine.sample_batch("", [prompts[2]], cfg_guidance=0.6, seed=3,
                               resolution=16, sample_indices=[2])
    np.testing.assert_allclose(batch[2], solo[0], atol=1e-5)


def test_sample_batch_inversion_requires_src(engine):
    eng = DiffusionEngine(engine.bundle, solver="ddim_inversion_cfg++", nfe=2)
    with pytest.raises(ValueError, match="src_imgs"):
        eng.sample_batch("", ["x"], cfg_guidance=1.0)


def test_sample_batch_sharded_reconstruction(engine):
    """Batched inversion (reconstruction) sharded over the 8-device mesh
    matches the unsharded run AND the per-image engine.sample path."""
    eng = DiffusionEngine(engine.bundle, solver="ddim_inversion_cfg++", nfe=2)
    rng = np.random.default_rng(0)
    srcs = rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    prompts = [f"prompt {i}" for i in range(8)]

    plain = eng.sample_batch("", prompts, cfg_guidance=1.0, seed=5,
                             resolution=16, src_imgs=srcs)
    mesh = make_mesh()
    sharded = eng.sample_batch("", prompts, cfg_guidance=1.0, seed=5,
                               resolution=16, src_imgs=srcs, mesh=mesh)
    assert sharded.shape == (8, 16, 16, 3)
    np.testing.assert_allclose(plain, sharded, atol=1e-5)
    # each global shard lives on its own device (structural DP check)
    dev_img = eng.sample_batch("", prompts, cfg_guidance=1.0, seed=5,
                               resolution=16, src_imgs=srcs, mesh=mesh,
                               as_numpy=False)
    assert len(dev_img.sharding.device_set) == 8


def test_sample_batch_edit_sharded(engine):
    """Batched word-swap editing over the mesh runs and is finite."""
    eng = DiffusionEngine(engine.bundle, solver="ddim_edit_cfg++", nfe=2)
    rng = np.random.default_rng(1)
    srcs = rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    src_prompts = [f"a photo of a cat {i}" for i in range(8)]
    tgt_prompts = [f"a photo of a dog {i}" for i in range(8)]
    mesh = make_mesh()
    out = eng.sample_batch("", tgt_prompts, cfg_guidance=1.0, seed=7,
                           resolution=16, src_imgs=srcs,
                           src_prompts=src_prompts, mesh=mesh)
    assert out.shape == (8, 16, 16, 3)
    assert bool(np.isfinite(out).all())


def test_sample_batch_sharded_device_placement(engine):
    """T2I sharded output is actually distributed (one shard per device),
    catching replication regressions structurally, not just numerically."""
    prompts = [f"prompt {i}" for i in range(8)]
    mesh = make_mesh()
    img = engine.sample_batch("", prompts, cfg_guidance=0.6, seed=1,
                              resolution=16, mesh=mesh, as_numpy=False)
    assert len(img.sharding.device_set) == 8


def test_batched_inversion_rng_independent_of_batch(engine):
    """Reconstruction of image i must be identical whether it rides in a
    batch of 4 or alone: the VAE-encode noise draw is keyed per global
    sample index (fold_in tag 2), like init (0) and ancestral (1) noise."""
    eng = DiffusionEngine(engine.bundle, solver="ddim_inversion_cfg++", nfe=2)
    rng = np.random.default_rng(2)
    srcs = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    prompts = [f"p{i}" for i in range(4)]
    batch = eng.sample_batch("", prompts, cfg_guidance=1.0, seed=9,
                             resolution=16, src_imgs=srcs,
                             sample_indices=[0, 1, 2, 3])
    solo = eng.sample_batch("", [prompts[1]], cfg_guidance=1.0, seed=9,
                            resolution=16, src_imgs=srcs[1:2],
                            sample_indices=[1])
    np.testing.assert_allclose(batch[1], solo[0], atol=1e-5)
