"""Generic sampling loop: plan + step fn -> `lax.scan`.

This is the model-agnostic core: given an epsilon function (any callable with
the UNet signature), a solver spec, and a schedule, it runs the whole reverse
(or inversion) process as one fused scan.  The engine wraps this with text
encoding / VAE decode / jit; tests drive it with synthetic eps functions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cfgpp_tpu.schedules.ddim import DDIMSchedule
from cfgpp_tpu.solvers import steps
from cfgpp_tpu.solvers.plans import SolverPlan
from cfgpp_tpu.solvers.registry import SolverSpec


def _as_device_coeffs(plan: SolverPlan):
    return {k: jnp.asarray(v) for k, v in plan.coeffs.items()}


def init_latent(plan: SolverPlan, key: jax.Array, shape, dtype=jnp.float32):
    """Draw zT.  VP solvers: standard normal (latent_diffusion.py:198-200);
    VE solvers: scaled by plan.init_scale (:201-205 / latent_sdxl.py:884)."""
    return jax.random.normal(key, shape, dtype) * plan.init_scale


def run_solver(
    spec: SolverSpec,
    plan: SolverPlan,
    eps_fn,
    zT: jnp.ndarray,
    cfg_guidance: float,
    noise_key: Optional[jax.Array] = None,
    return_trajectory: bool = False,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Run the full reverse process.  Returns (final_latent, trajectory).

    ``trajectory`` is (z0t_steps, zt_steps) stacked over steps when
    ``return_trajectory`` (the fused equivalent of the reference's per-step
    callback taps), else None.
    """
    if spec.lightning and cfg_guidance != 1.0:
        raise ValueError("CFG should be turned off (cfg_guidance=1) in the lightning version")

    w = jnp.float32(cfg_guidance)
    coeffs = _as_device_coeffs(plan)
    cfgpp = spec.cfgpp
    needs_noise = plan.needs_noise
    if needs_noise and noise_key is None:
        raise ValueError(f"solver {spec.name} is ancestral and needs a noise key")

    idx = jnp.arange(plan.n_steps, dtype=jnp.int32)
    xs = (idx, coeffs)

    def step_noise(i, like):
        key = jax.random.fold_in(noise_key, i)
        return jax.random.normal(key, like.shape, like.dtype)

    kind = spec.kind

    if kind == "ddim":
        def body(zt, x):
            i, c = x
            zt_next, z0t = steps.ddim_step(eps_fn, w, c, zt, cfgpp=cfgpp)
            return zt_next, (z0t, zt_next)
        carry0 = zT
    elif kind == "euler":
        def body(xc, x):
            i, c = x
            x_next, denoised = steps.euler_step(eps_fn, w, c, xc, cfgpp=cfgpp)
            return x_next, (denoised, x_next)
        carry0 = zT
    elif kind == "euler_a":
        def body(xc, x):
            i, c = x
            noise = step_noise(i, xc)
            x_next, denoised = steps.euler_ancestral_step(eps_fn, w, c, xc, noise, cfgpp=cfgpp)
            return x_next, (denoised, x_next)
        carry0 = zT
    elif kind == "dpm2s":
        def body(xc, x):
            i, c = x
            noise = step_noise(i, xc)
            x_next, denoised = steps.dpmpp_2s_ancestral_step(eps_fn, w, c, xc, noise, cfgpp=cfgpp)
            return x_next, (denoised, x_next)
        carry0 = zT
    elif kind == "dpm2m":
        def body(carry, x):
            i, c = x
            carry_next, denoised = steps.dpmpp_2m_step(
                eps_fn, w, c, carry, cfgpp=cfgpp,
                diff_cfgpp_uses_uncond=spec.diff_cfgpp_uses_uncond,
            )
            return carry_next, (denoised, carry_next[0])
        carry0 = (zT, jnp.zeros_like(zT))
    else:
        raise ValueError(f"unknown solver kind {kind}")

    carry, (traj_z0, traj_zt) = jax.lax.scan(body, carry0, xs)

    if kind == "dpm2m":
        x_final = carry[0]
    else:
        x_final = carry

    if kind == "dpm2s":
        # Eulerized final step outside the scan (sigma_down == 0).
        x_final, denoised = steps.dpmpp_2s_tail_step(eps_fn, w, plan.tail_coeffs, x_final, cfgpp=cfgpp)

    if plan.final == "z0":
        final = traj_z0[-1]
    else:
        final = x_final

    if return_trajectory:
        return final, (traj_z0, traj_zt)
    return final, None


def run_inversion(
    spec: SolverSpec,
    plan: SolverPlan,
    eps_fn,
    z0: jnp.ndarray,
    cfg_guidance: float,
) -> jnp.ndarray:
    """DDIM inversion: z0 -> zT over reversed timesteps.

    CFG: latent_diffusion.py:160-182.  CFG++: :888-910.  ``plan`` must come
    from `plans.plan_ddim_inversion`.
    """
    w = jnp.float32(cfg_guidance)
    coeffs = _as_device_coeffs(plan)

    def body(zt, c):
        zt_next, z0t = steps.ddim_inversion_step(eps_fn, w, c, zt, cfgpp=spec.cfgpp)
        return zt_next, None

    zT, _ = jax.lax.scan(body, z0, coeffs)
    return zT
