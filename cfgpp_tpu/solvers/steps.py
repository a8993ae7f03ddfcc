"""Pure per-step solver math (device side).

Every function here is a `lax.scan` body fragment: it takes the current
carry, one row of the plan's coefficient table, the epsilon function (the
batched cond/uncond UNet call), and returns the next carry plus the
``(z0t, zt)`` aux pair the reference exposes to callbacks.

Guidance is a *parameter* of each step, not a class hierarchy:

* CFG   :  eps_hat = eps_uc + w (eps_c - eps_uc) drives BOTH the Tweedie
           estimate and the renoising / ODE derivative.
* CFG++ :  eps_hat drives Tweedie, but renoising (DDIM) / the derivative
           (k-diffusion) uses the UNCONDITIONAL eps.
           (reference: latent_diffusion.py:666 vs :286, :708, :751, :804,
           :863-866; latent_sdxl.py:744, :794, :916)

All math is float32; the UNet itself runs bf16 internally.  `eps_fn` has
signature ``eps_fn(z, t) -> (eps_uc, eps_c)`` with z shaped [B, H, W, C].
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax.numpy as jnp

Array = jnp.ndarray
EpsFn = Callable[[Array, Array], Tuple[Array, Array]]


def cfg_mix(eps_uc: Array, eps_c: Array, w) -> Array:
    """Classifier-free guidance mix (latent_diffusion.py:280)."""
    return eps_uc + w * (eps_c - eps_uc)


# ---------------------------------------------------------------------------
# DDIM family (VP space)
# ---------------------------------------------------------------------------

def ddim_step(eps_fn: EpsFn, w, c: Dict[str, Array], zt: Array, *, cfgpp: bool):
    """One DDIM step.  cfgpp=False -> latent_diffusion.py:274-286;
    cfgpp=True  -> :654-666 (renoise with eps_uc)."""
    eps_uc, eps_c = eps_fn(zt, c["t"])
    eps_hat = cfg_mix(eps_uc, eps_c, w)
    at, at_prev = c["at"], c["at_prev"]
    z0t = (zt - jnp.sqrt(1.0 - at) * eps_hat) / jnp.sqrt(at)
    renoise = eps_uc if cfgpp else eps_hat
    zt_next = jnp.sqrt(at_prev) * z0t + jnp.sqrt(1.0 - at_prev) * renoise
    return zt_next, z0t


def ddim_inversion_step(eps_fn: EpsFn, w, c: Dict[str, Array], zt: Array, *, cfgpp: bool):
    """One forward (z0 -> zT) inversion step.

    cfgpp=False -> latent_diffusion.py:172-180 (z0t from eps_hat);
    cfgpp=True  -> :900-908 (z0t from eps_uc, renoise with eps_hat)."""
    eps_uc, eps_c = eps_fn(zt, c["t"])
    eps_hat = cfg_mix(eps_uc, eps_c, w)
    at, at_prev = c["at"], c["at_prev"]
    tweedie_eps = eps_uc if cfgpp else eps_hat
    z0t = (zt - jnp.sqrt(1.0 - at_prev) * tweedie_eps) / jnp.sqrt(at_prev)
    zt_next = jnp.sqrt(at) * z0t + jnp.sqrt(1.0 - at) * eps_hat
    return zt_next, z0t


# ---------------------------------------------------------------------------
# k-diffusion family (VE cast)
# ---------------------------------------------------------------------------

def _denoised_pair(eps_fn: EpsFn, w, x: Array, c: Dict[str, Array]):
    """kdiffusion_x_to_denoised (latent_diffusion.py:235-241)."""
    eps_uc, eps_c = eps_fn(x * c["c_in"], c["t"])
    eps_hat = cfg_mix(eps_uc, eps_c, w)
    denoised = x - eps_hat * c["sigma"]
    uncond_denoised = x - eps_uc * c["sigma"]
    return denoised, uncond_denoised


def euler_step(eps_fn: EpsFn, w, c, x: Array, *, cfgpp: bool):
    """Karras Euler.  latent_diffusion.py:324-333 (CFG), :701-710 (CFG++)."""
    denoised, uncond = _denoised_pair(eps_fn, w, x, c)
    d_src = uncond if cfgpp else denoised
    d = (x - d_src) / c["sigma"]
    x_next = denoised + d * c["sigma_next"]
    return x_next, denoised


def euler_ancestral_step(eps_fn: EpsFn, w, c, x: Array, noise: Array, *, cfgpp: bool):
    """Euler ancestral.  latent_diffusion.py:367-379 (CFG), :744-755 (CFG++)."""
    denoised, uncond = _denoised_pair(eps_fn, w, x, c)
    d_src = uncond if cfgpp else denoised
    d = (x - d_src) / c["sigma"]
    x_next = denoised + d * c["sigma_down"]
    x_next = jnp.where(c["sigma_next"] > 0, x_next + noise * c["sigma_up"], x_next)
    return x_next, denoised


def dpmpp_2s_ancestral_step(eps_fn: EpsFn, w, c, x: Array, noise: Array, *, cfgpp: bool):
    """DPM-Solver++(2S) ancestral body (two model calls).

    latent_diffusion.py:410-438 (CFG), :786-814 (CFG++).  Only used for steps
    where sigma_down > 0; the last step is the eulerized tail (see plans)."""
    denoised, uncond = _denoised_pair(eps_fn, w, x, c)
    mid_src = uncond if cfgpp else denoised
    x_2 = c["ratio_s"] * x - c["em1_r"] * mid_src

    c_mid = {"c_in": c["c_in_s"], "t": c["t2"], "sigma": c["sigma_s"]}
    denoised_2, uncond_2 = _denoised_pair(eps_fn, w, x_2, c_mid)
    if cfgpp:
        # latent_sdxl-style CFG++ update (latent_diffusion.py:811)
        x_next = denoised_2 - c["exp_neg_h"] * uncond_2 + c["exp_neg_h"] * x
    else:
        x_next = c["exp_neg_h"] * x - c["em1"] * denoised_2
    x_next = x_next + noise * c["sigma_up"]
    return x_next, denoised


def dpmpp_2s_tail_step(eps_fn: EpsFn, w, tail: Dict[str, float], x: Array, *, cfgpp: bool):
    """Final 2S step: sigma_down == 0 so x = denoised (+ d*0)."""
    c = {"c_in": tail["c_in"], "t": jnp.asarray(tail["t"], jnp.int32), "sigma": tail["sigma"]}
    denoised, _ = _denoised_pair(eps_fn, w, x, c)
    return denoised, denoised


def dpmpp_2m_step(eps_fn: EpsFn, w, c, carry, *, cfgpp: bool, diff_cfgpp_uses_uncond: bool = False):
    """DPM-Solver++(2M) multistep.

    carry = (x, old_denoised).  CFG: latent_diffusion.py:472-490.
    CFG++ (SD): :848-866 — extra1 uses UNCOND denoised for the exp term but
    the difference term is (denoised - old) with old = previous UNCOND.
    CFG++ (SDXL `dpm++_2m_cfgpp`): latent_sdxl.py:916 uses
    (uncond_denoised - old) instead; enabled via diff_cfgpp_uses_uncond."""
    x, old_denoised = carry
    denoised, uncond = _denoised_pair(eps_fn, w, x, c)

    d_src = uncond if cfgpp else denoised
    euler_x = denoised + (x - d_src) / c["sigma"] * c["sigma_next"]

    exp_term = uncond if cfgpp else denoised
    diff_cur = uncond if (cfgpp and diff_cfgpp_uses_uncond) else denoised
    extra1 = -c["exp_neg_h"] * exp_term - c["em1_over_2r"] * (diff_cur - old_denoised)
    x_2m = denoised + extra1 + c["exp_neg_h"] * x

    x_next = jnp.where(c["use_2m"] > 0, x_2m, euler_x)
    new_old = uncond if cfgpp else denoised
    return (x_next, new_old), denoised
