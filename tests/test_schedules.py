"""Schedule-table golden tests.

Golden values are pinned from the SD/SDXL scheduler configs and well-known
constants of the scaled-linear schedule (e.g. sigma_max = 14.6146, which the
reference itself hardcodes as the default k-diffusion init sigma,
latent_diffusion.py:203).
"""

import numpy as np

from cfgpp_tpu.schedules import (
    alphas_cumprod_table,
    get_ancestral_step,
    get_sigmas_karras,
    leading_timesteps,
    make_ddim_schedule,
    sigma_to_t_linear,
    timestep_log_nearest,
    trailing_timesteps,
)


def test_alphas_cumprod_endpoints():
    abar = alphas_cumprod_table()
    assert abar.shape == (1000,)
    np.testing.assert_allclose(abar[0], 1.0 - 0.00085, rtol=1e-12)
    # known SD constant: final alpha-bar ~ 0.004682
    assert 0.00466 < abar[-1] < 0.00469
    assert np.all(np.diff(abar) < 0)


def test_ve_sigma_range_matches_reference_constant():
    sched = make_ddim_schedule(50)
    sig = sched.sigmas_ve
    # the reference hardcodes sigma_max as 14.6146 (latent_diffusion.py:203)
    np.testing.assert_allclose(sig.max(), 14.6146, atol=2e-4)
    np.testing.assert_allclose(sig.min(), np.sqrt(0.00085 / (1 - 0.00085)), rtol=1e-10)


def test_leading_timesteps_50():
    ts = leading_timesteps(50)
    assert ts[0] == 981 and ts[-1] == 1
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_leading_timesteps_25():
    ts = leading_timesteps(25)
    assert ts[0] == 961 and ts[-1] == 1
    assert np.all(np.diff(ts) == -40)


def test_trailing_timesteps_lightning_4step():
    ts = trailing_timesteps(4)
    np.testing.assert_array_equal(ts, [999, 749, 499, 249])


def test_shifted_alpha_table_reproduces_reference_indexing():
    """The reference prepends 1.0 and indexes with raw t: alpha(t) == abar[t-1]."""
    sched = make_ddim_schedule(50)
    for t in (981, 961, 21, 1):
        np.testing.assert_allclose(sched.alpha(t), sched.alphas_cumprod[t - 1], rtol=1e-12)
    # guarded lookup below zero -> final_alpha_cumprod = abar[0] (set_alpha_to_one=False)
    np.testing.assert_allclose(sched.alpha(1 - sched.skip), sched.alphas_cumprod[0], rtol=1e-12)


def test_uneven_nfe():
    """NFE that doesn't divide 1000: leading spacing truncates (1000//30=33)."""
    ts = leading_timesteps(30)
    assert len(ts) == 30
    assert ts[0] == 29 * 33 + 1 == 958 and ts[-1] == 1
    sched = make_ddim_schedule(30)
    assert sched.skip == 33
    # all alpha lookups (incl. t - skip) stay in range or hit the guard
    for t in ts:
        sched.alpha(int(t))
        sched.alpha(int(t) - sched.skip)


def test_karras_sigmas():
    sig = get_sigmas_karras(50, 0.0292, 14.6146)
    assert sig.shape == (51,)
    np.testing.assert_allclose(sig[0], 14.6146, rtol=1e-10)
    np.testing.assert_allclose(sig[-1], 0.0)
    # ramp endpoint: last nonzero sigma is NOT sigma_min (ramp excludes 1.0)
    assert sig[-2] > 0.0292
    assert np.all(np.diff(sig) < 0)


def test_ancestral_step():
    down, up = get_ancestral_step(2.0, 1.0, eta=1.0)
    # sigma_up = min(1, sqrt(1*(4-1)/4)) = sqrt(3)/2 ; down = sqrt(1-3/4)
    np.testing.assert_allclose(up, np.sqrt(3.0) / 2.0, rtol=1e-12)
    np.testing.assert_allclose(down, 0.5, rtol=1e-12)
    down, up = get_ancestral_step(2.0, 1.0, eta=0.0)
    assert (down, up) == (1.0, 0.0)
    # final step: sigma_to = 0 -> no noise
    down, up = get_ancestral_step(1.0, 0.0)
    assert down == 0.0 and up == 0.0


def test_timestep_lookups_roundtrip():
    sched = make_ddim_schedule(50)
    sig = sched.sigmas_ve
    log_sig = np.log(sig)
    # exact table entries must map back to their own index
    for t in (0, 123, 500, 999):
        assert timestep_log_nearest(sig[t], log_sig) == t
        assert sigma_to_t_linear(sig[t], sig, quantize=True) == t
    # interpolated variant lands between neighbours
    mid = 0.5 * (sig[100] + sig[101])
    frac = sigma_to_t_linear(mid, sig, quantize=False)
    assert 100.0 <= float(frac) <= 101.0


def test_sdxl_dpm2m_vp_sigma_construction():
    """latent_sdxl.py:878-879: sigmas from the PREPENDED table at raw timesteps."""
    sched = make_ddim_schedule(25)
    alphas = sched.alphas_ext[sched.timesteps]
    np.testing.assert_allclose(alphas[0], sched.alphas_cumprod[960], rtol=1e-12)
    sig = np.sqrt((1 - alphas) / alphas)
    assert sig[0] > sig[-1] > 0
