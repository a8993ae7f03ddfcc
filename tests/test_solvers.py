"""Solver-algebra parity tests.

Each reference solver loop is re-implemented here as an independent numpy
float64 oracle, written directly from the reference's update equations
(latent_diffusion.py / latent_sdxl.py, cited per oracle).  A deterministic
synthetic epsilon-model drives both the oracle and the fused `lax.scan`
sampler; trajectories must match to float32 tolerance.

Ancestral noise: the oracle consumes the exact noise sequence the sampler
draws (jax.random.fold_in(key, i)), so stochastic solvers are tested bitwise
on the same noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgpp_tpu.schedules import make_ddim_schedule
from cfgpp_tpu.schedules.karras import (
    calculate_input_scale,
    get_ancestral_step,
    get_sigmas_karras,
    timestep_log_nearest,
)
from cfgpp_tpu.solvers import get_solver_spec, run_inversion, run_solver

SHAPE = (1, 8, 8, 4)
NFE = 10


# A mildly nonlinear, CONTRACTIVE synthetic model: float32-vs-float64
# rounding must not be amplified across steps (a chaotic map would turn
# rounding noise into false failures), while distinct linear terms still
# catch any swapped/mixed coefficient in the solver algebra.

def eps_pair_np(z, t):
    tt = np.float32(t) * np.float32(0.001)
    eps_uc = np.float32(0.05) * z + np.sin(tt) + np.float32(0.02) * np.sin(z)
    eps_c = np.float32(-0.03) * z + np.cos(np.float32(2.0) * tt) + np.float32(0.01) * np.cos(z)
    return eps_uc, eps_c


def eps_pair_jax(z, t):
    tt = t.astype(jnp.float32) * 0.001
    eps_uc = 0.05 * z + jnp.sin(tt) + 0.02 * jnp.sin(z)
    eps_c = -0.03 * z + jnp.cos(2.0 * tt) + 0.01 * jnp.cos(z)
    return eps_uc, eps_c


def mix(eu, ec, w):
    return eu + w * (ec - eu)


def run_jax(name, family, nfe, zT, w, key=None, spacing="leading"):
    """zT is the raw standard-normal draw; apply the plan's init scale the
    way engine.init_latent does (latent_diffusion.py:198-205)."""
    spec = get_solver_spec(name, family)
    sched = make_ddim_schedule(nfe, timestep_spacing=spacing)
    plan = spec.plan_fn(sched)
    z_init = jnp.asarray(zT, jnp.float32) * plan.init_scale
    out, _ = run_solver(spec, plan, eps_pair_jax, z_init, w, noise_key=key)
    return np.asarray(out), plan


def noise_seq(key, n, shape):
    return [np.asarray(jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32))
            for i in range(n)]


@pytest.fixture
def zT():
    return np.asarray(jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.float32), np.float64)


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def oracle_ddim(sched, zT, w, cfgpp):
    """latent_diffusion.py:274-286 (CFG) / :654-666 (CFG++)."""
    zt = zT.copy()
    for t in sched.timesteps:
        at, at_prev = sched.alpha(int(t)), sched.alpha(int(t) - sched.skip)
        eu, ec = eps_pair_np(zt, t)
        eh = mix(eu, ec, w)
        z0t = (zt - np.sqrt(1 - at) * eh) / np.sqrt(at)
        zt = np.sqrt(at_prev) * z0t + np.sqrt(1 - at_prev) * (eu if cfgpp else eh)
    return z0t


def kdiff_denoised(x, sigma, t, w):
    """latent_diffusion.py:229-241."""
    eu, ec = eps_pair_np(x * calculate_input_scale(sigma), t)
    eh = mix(eu, ec, w)
    return x - eh * sigma, x - eu * sigma


def oracle_euler(sched, zT, w, cfgpp, sigmas=None, log_sig=None):
    """latent_diffusion.py:324-333 / :701-710."""
    sig_tab = sched.sigmas_ve
    log_sig = np.log(sig_tab) if log_sig is None else log_sig
    if sigmas is None:
        sigmas = get_sigmas_karras(sched.num_inference_steps, sig_tab.min(), sig_tab.max())
    x = zT * np.sqrt(sigmas[0] ** 2 + 1)
    for i in range(len(sigmas) - 1):
        sigma = sigmas[i]
        t = timestep_log_nearest(sigma, log_sig)
        den, unc = kdiff_denoised(x, sigma, t, w)
        d = (x - (unc if cfgpp else den)) / sigma
        x = den + d * sigmas[i + 1]
    return den


def oracle_euler_a(sched, zT, w, cfgpp, noises):
    """latent_diffusion.py:367-379 / :744-755."""
    sig_tab = sched.sigmas_ve
    log_sig = np.log(sig_tab)
    sigmas = get_sigmas_karras(sched.num_inference_steps, sig_tab.min(), sig_tab.max())
    x = zT * np.sqrt(sigmas[0] ** 2 + 1)
    for i in range(len(sigmas) - 1):
        sigma = sigmas[i]
        t = timestep_log_nearest(sigma, log_sig)
        down, up = get_ancestral_step(sigmas[i], sigmas[i + 1])
        den, unc = kdiff_denoised(x, sigma, t, w)
        d = (x - (unc if cfgpp else den)) / sigma
        x = den + d * down
        if sigmas[i + 1] > 0:
            x = x + noises[i] * up
    return den


def oracle_dpm2s(sched, zT, w, cfgpp, noises):
    """latent_diffusion.py:410-438 / :786-814."""
    sig_tab = sched.sigmas_ve
    log_sig = np.log(sig_tab)
    sigmas = get_sigmas_karras(sched.num_inference_steps, sig_tab.min(), sig_tab.max())
    x = zT * np.sqrt(sigmas[0] ** 2 + 1)
    for i in range(len(sigmas) - 1):
        sigma = sigmas[i]
        nt = timestep_log_nearest(sigma, log_sig)
        den, unc = kdiff_denoised(x, sigma, nt, w)
        down, up = get_ancestral_step(sigmas[i], sigmas[i + 1])
        if down == 0:
            d = (x - (unc if cfgpp else den)) / sigmas[i]
            x = den + d * down
        else:
            t, t_next = -np.log(sigmas[i]), -np.log(down)
            h = t_next - t
            s = t + 0.5 * h
            sigma_s = np.exp(-s)
            x_2 = (sigma_s / sigmas[i]) * x - np.expm1(-h * 0.5) * (unc if cfgpp else den)
            t2 = timestep_log_nearest(sigma_s, log_sig)
            den2, unc2 = kdiff_denoised(x_2, sigma_s, t2, w)
            if cfgpp:
                x = den2 - np.exp(-h) * unc2 + (np.exp(-t_next) / np.exp(-t)) * x
            else:
                x = (np.exp(-t_next) / np.exp(-t)) * x - np.expm1(-h) * den2
        if sigmas[i + 1] > 0:
            x = x + noises[i] * up
    return x


def oracle_dpm2m(sched, zT, w, cfgpp, sigmas=None, t_models=None, c_ins=None,
                 diff_uses_uncond=False, init_scale=None):
    """latent_diffusion.py:472-490 / :848-866; latent_sdxl.py:890-919."""
    sig_tab = sched.sigmas_ve
    log_sig = np.log(sig_tab)
    if sigmas is None:
        sigmas = get_sigmas_karras(sched.num_inference_steps, sig_tab.min(), sig_tab.max())
    n = len(sigmas) - 1
    if t_models is None:
        t_models = [timestep_log_nearest(sigmas[i], log_sig) for i in range(n)]
    if c_ins is None:
        c_ins = [calculate_input_scale(sigmas[i]) for i in range(n)]
    x = zT * (np.sqrt(sigmas[0] ** 2 + 1) if init_scale is None else init_scale)
    old = None
    for i in range(n):
        sigma = sigmas[i]
        eu, ec = eps_pair_np(x * c_ins[i], t_models[i])
        eh = mix(eu, ec, w)
        den = x - eh * sigma
        unc = x - eu * sigma
        t, t_next = -np.log(sigmas[i]), -np.log(sigmas[i + 1]) if sigmas[i + 1] > 0 else np.inf
        h = t_next - t
        if old is None or sigmas[i + 1] == 0:
            x = den + (x - (unc if cfgpp else den)) / sigmas[i] * sigmas[i + 1]
        else:
            h_last = t + np.log(sigmas[i - 1])
            r = h_last / h
            exp_term = unc if cfgpp else den
            diff_cur = unc if (cfgpp and diff_uses_uncond) else den
            extra1 = -np.exp(-h) * exp_term - np.expm1(-h) * (diff_cur - old) / (2 * r)
            x = den + extra1 + np.exp(-h) * x
        old = unc if cfgpp else den
    return x


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

TOL = dict(rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("name,cfgpp,w", [("ddim", False, 7.5), ("ddim_cfg++", True, 0.6)])
def test_ddim(zT, name, cfgpp, w):
    sched = make_ddim_schedule(NFE)
    got, _ = run_jax(name, "sd", NFE, zT, w)
    want = oracle_ddim(sched, zT, w, cfgpp)
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("name,cfgpp", [("euler", False), ("euler_cfg++", True)])
def test_euler(zT, name, cfgpp):
    sched = make_ddim_schedule(NFE)
    got, _ = run_jax(name, "sd", NFE, zT, 3.0)
    want = oracle_euler(sched, zT, 3.0, cfgpp)
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("name,cfgpp", [("euler_a", False), ("euler_a_cfg++", True)])
def test_euler_ancestral(zT, name, cfgpp):
    sched = make_ddim_schedule(NFE)
    key = jax.random.PRNGKey(7)
    got, _ = run_jax(name, "sd", NFE, zT, 3.0, key=key)
    want = oracle_euler_a(sched, zT, 3.0, cfgpp, noise_seq(key, NFE, SHAPE))
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("name,cfgpp", [("dpm++_2s_a", False), ("dpm++_2s_a_cfg++", True)])
def test_dpm2s(zT, name, cfgpp):
    sched = make_ddim_schedule(NFE)
    key = jax.random.PRNGKey(9)
    got, _ = run_jax(name, "sd", NFE, zT, 3.0, key=key)
    want = oracle_dpm2s(sched, zT, 3.0, cfgpp, noise_seq(key, NFE, SHAPE))
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("name,cfgpp", [("dpm++_2m", False), ("dpm++_2m_cfg++", True)])
def test_dpm2m(zT, name, cfgpp):
    sched = make_ddim_schedule(NFE)
    got, _ = run_jax(name, "sd", NFE, zT, 3.0)
    want = oracle_dpm2m(sched, zT, 3.0, cfgpp)
    np.testing.assert_allclose(got, want, **TOL)


def test_sdxl_euler_cfgpp_vp_sigmas(zT):
    """latent_sdxl.py:776-777: sigmas from actual DDIM timesteps, not Karras."""
    sched = make_ddim_schedule(NFE)
    got, plan = run_jax("euler_cfg++", "sdxl", NFE, zT, 3.0)
    sig_tab = sched.sigmas_ve
    sigmas = np.concatenate([sig_tab[sched.timesteps], [0.0]])
    want = oracle_euler(sched, zT, 3.0, cfgpp=True, sigmas=sigmas)
    np.testing.assert_allclose(got, want, **TOL)


def test_sdxl_dpm2m_cfgpp(zT):
    """latent_sdxl.py:860-930: VP sigmas, n-1 steps, uncond difference term."""
    sched = make_ddim_schedule(NFE)
    got, plan = run_jax("dpm++_2m_cfgpp", "sdxl", NFE, zT, 3.0)
    alphas = sched.alphas_ext[sched.timesteps]
    sigmas = np.sqrt((1 - alphas) / alphas)        # NO appended zero; n-1 steps
    from cfgpp_tpu.schedules.karras import sigma_to_t_linear
    n = len(sigmas) - 1
    t_models = [sigma_to_t_linear(sigmas[i], sched.sigmas_ve, quantize=True) for i in range(n)]
    c_ins = list(np.sqrt(alphas[:n]))
    want = oracle_dpm2m(sched, zT, 3.0, cfgpp=True, sigmas=sigmas, t_models=t_models,
                        c_ins=c_ins, diff_uses_uncond=True, init_scale=sigmas[0])
    np.testing.assert_allclose(got, want, **TOL)


def test_lightning_asserts_w1(zT):
    with pytest.raises(ValueError, match="lightning"):
        run_jax("ddim_cfg++_lightning", "sdxl", 4, zT, 2.0, spacing="trailing")


def test_lightning_trailing_ddim(zT):
    """ddim_cfg++_lightning: trailing spacing [999,749,499,249], w=1."""
    sched = make_ddim_schedule(4, timestep_spacing="trailing")
    np.testing.assert_array_equal(sched.timesteps, [999, 749, 499, 249])
    got, _ = run_jax("ddim_cfg++_lightning", "sdxl", 4, zT, 1.0, spacing="trailing")
    want = oracle_ddim(sched, zT, 1.0, cfgpp=True)
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("cfgpp", [False, True])
def test_inversion_roundtrip_structure(zT, cfgpp):
    """Inversion oracle: latent_diffusion.py:160-182 (CFG) / :888-910 (CFG++)."""
    from cfgpp_tpu.solvers.plans import plan_ddim_inversion
    name = "ddim_inversion_cfg++" if cfgpp else "ddim_inversion"
    spec = get_solver_spec(name, "sd")
    sched = make_ddim_schedule(NFE)
    plan = plan_ddim_inversion(sched)
    z0 = zT * 0.2
    got = np.asarray(run_inversion(spec, plan, eps_pair_jax, jnp.asarray(z0, jnp.float32), 1.0))

    zt = z0.copy()
    for t in sched.timesteps[::-1]:
        at, at_prev = sched.alpha(int(t)), sched.alpha(int(t) - sched.skip)
        eu, ec = eps_pair_np(zt, t)
        eh = mix(eu, ec, 1.0)
        if cfgpp:
            z0t = (zt - np.sqrt(1 - at_prev) * eu) / np.sqrt(at_prev)
        else:
            z0t = (zt - np.sqrt(1 - at_prev) * eh) / np.sqrt(at_prev)
        zt = np.sqrt(at) * z0t + np.sqrt(1 - at) * eh
    np.testing.assert_allclose(got, zt, **TOL)


def test_registry_names_cover_reference():
    from cfgpp_tpu.solvers import list_solvers
    sd_expected = {"ddim", "euler", "euler_a", "dpm++_2s_a", "dpm++_2m",
                   "ddim_inversion", "ddim_edit", "ddim_cfg++", "euler_cfg++",
                   "euler_a_cfg++", "dpm++_2s_a_cfg++", "dpm++_2m_cfg++",
                   "ddim_inversion_cfg++", "ddim_edit_cfg++"}
    sdxl_expected = {"ddim", "euler", "ddim_lightning", "euler_lightning",
                     "ddim_edit", "ddim_cfg++", "euler_cfg++",
                     "euler_cfg++_lightning", "ddim_cfg++_lightning",
                     "dpm++_2m_cfgpp", "dpm++_2m_cfgpp_lightning",
                     "ddim_edit_cfg++"}
    assert sd_expected <= set(list_solvers("sd"))
    assert sdxl_expected <= set(list_solvers("sdxl"))


def test_trajectory_shapes(zT):
    spec = get_solver_spec("ddim_cfg++", "sd")
    sched = make_ddim_schedule(NFE)
    plan = spec.plan_fn(sched)
    out, (z0s, zts) = run_solver(spec, plan, eps_pair_jax, jnp.asarray(zT, jnp.float32),
                                 0.6, return_trajectory=True)
    assert z0s.shape == (NFE,) + SHAPE and zts.shape == (NFE,) + SHAPE
    np.testing.assert_allclose(np.asarray(out), np.asarray(z0s[-1]), rtol=0, atol=0)
