"""Per-solver coefficient planning.

A *plan* is everything a solver scan needs, precomputed on the host in
float64 and stacked into per-step arrays: model-facing timesteps, alpha/sigma
pairs, DPM exponential-integrator coefficients, ancestral splits, ...

This deliberately separates the subtle schedule math (host, numpy, testable
against the reference formulas) from the device loop (a dumb `lax.scan` over
the stacked arrays).  Reference counterparts are cited per field.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from cfgpp_tpu.schedules.ddim import DDIMSchedule
from cfgpp_tpu.schedules.karras import (
    calculate_input_scale,
    get_ancestral_step,
    get_sigmas_karras,
    sigma_to_t_linear,
    timestep_log_nearest,
)


@dataclasses.dataclass(frozen=True)
class SolverPlan:
    """Stacked per-step coefficients for a sampling loop.

    ``coeffs`` maps name -> float32/int32 array of leading dim ``n_steps``;
    the engine feeds it to `lax.scan` as xs.  ``init`` describes how zT is
    drawn; ``init_scale`` multiplies the standard normal draw.
    """

    n_steps: int
    coeffs: Dict[str, np.ndarray]
    init: str                    # "vp_normal" | "ve_scaled"
    init_scale: float            # 1.0 for VP; sqrt(sig0^2+1) or sig0 for VE
    needs_noise: bool            # ancestral solvers draw per-step gaussians
    final: str                   # which aux to decode at the end: "z0" | "x"
    # Optional euler-ized last step executed outside the scan (DPM++ 2S).
    tail_coeffs: Optional[Dict[str, float]] = None


def _f32(**kw) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in kw.items():
        arr = np.asarray(v)
        out[k] = arr.astype(np.int32) if np.issubdtype(arr.dtype, np.integer) else arr.astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# DDIM family (VP space).  Reference: latent_diffusion.py:247-299, 621-679.
# ---------------------------------------------------------------------------

def plan_ddim(schedule: DDIMSchedule) -> SolverPlan:
    ts = schedule.timesteps
    at = np.array([schedule.alpha(int(t)) for t in ts])
    at_prev = np.array([schedule.alpha(int(t) - schedule.skip) for t in ts])
    return SolverPlan(
        n_steps=len(ts),
        coeffs=_f32(t=ts, at=at, at_prev=at_prev),
        init="vp_normal",
        init_scale=1.0,
        needs_noise=False,
        final="z0",
    )


def plan_ddim_inversion(schedule: DDIMSchedule) -> SolverPlan:
    """Forward (z0 -> zT) loop over reversed timesteps. latent_diffusion.py:160-182."""
    ts = schedule.timesteps[::-1].copy()
    at = np.array([schedule.alpha(int(t)) for t in ts])
    at_prev = np.array([schedule.alpha(int(t) - schedule.skip) for t in ts])
    return SolverPlan(
        n_steps=len(ts),
        coeffs=_f32(t=ts, at=at, at_prev=at_prev),
        init="vp_normal",      # unused: inversion starts from an encoded image
        init_scale=1.0,
        needs_noise=False,
        final="x",
    )


# ---------------------------------------------------------------------------
# k-diffusion family (VE cast).  Reference: latent_diffusion.py:302-503.
# ---------------------------------------------------------------------------

def _karras_base(schedule: DDIMSchedule):
    total_sigmas = schedule.sigmas_ve
    log_sigmas = np.log(total_sigmas)
    sigmas = get_sigmas_karras(
        schedule.num_inference_steps, float(total_sigmas.min()), float(total_sigmas.max())
    )
    return total_sigmas, log_sigmas, sigmas


def plan_euler(schedule: DDIMSchedule) -> SolverPlan:
    total_sigmas, log_sigmas, sigmas = _karras_base(schedule)
    n = schedule.num_inference_steps
    sig, sig_next = sigmas[:n], sigmas[1 : n + 1]
    return SolverPlan(
        n_steps=n,
        coeffs=_f32(
            t=timestep_log_nearest(sig, log_sigmas),
            sigma=sig,
            sigma_next=sig_next,
            c_in=calculate_input_scale(sig),
        ),
        init="ve_scaled",
        init_scale=float(np.sqrt(sigmas[0] ** 2 + 1.0)),  # latent_diffusion.py:201-205
        needs_noise=False,
        final="z0",   # reference decodes `denoised` (latent_diffusion.py:344)
    )


def plan_euler_ancestral(schedule: DDIMSchedule) -> SolverPlan:
    total_sigmas, log_sigmas, sigmas = _karras_base(schedule)
    n = schedule.num_inference_steps
    sig, sig_next = sigmas[:n], sigmas[1 : n + 1]
    downs, ups = zip(*(get_ancestral_step(float(a), float(b)) for a, b in zip(sig, sig_next)))
    return SolverPlan(
        n_steps=n,
        coeffs=_f32(
            t=timestep_log_nearest(sig, log_sigmas),
            sigma=sig,
            sigma_next=sig_next,
            sigma_down=np.array(downs),
            sigma_up=np.array(ups),
            c_in=calculate_input_scale(sig),
        ),
        init="ve_scaled",
        init_scale=float(np.sqrt(sigmas[0] ** 2 + 1.0)),
        needs_noise=True,
        final="z0",
    )


def plan_dpmpp_2s_ancestral(schedule: DDIMSchedule) -> SolverPlan:
    """DPM-Solver++(2S) ancestral.  latent_diffusion.py:393-451, 769-827.

    The scan covers steps 0..n-2 (full 2S body, 2 model calls); the final step
    has sigma_down == 0 and collapses to `x = denoised`, run outside the scan
    (`tail_coeffs`).  This avoids compiling the UNet twice under a lax.cond.
    """
    total_sigmas, log_sigmas, sigmas = _karras_base(schedule)
    n = schedule.num_inference_steps
    sig, sig_next = sigmas[:n], sigmas[1 : n + 1]
    downs, ups = zip(*(get_ancestral_step(float(a), float(b)) for a, b in zip(sig, sig_next)))
    downs, ups = np.array(downs), np.array(ups)

    body = slice(0, n - 1)
    t_log = -np.log(sig[body])
    t_next = -np.log(downs[body])
    h = t_next - t_log
    s = t_log + 0.5 * h
    sigma_s = np.exp(-s)
    return SolverPlan(
        n_steps=n - 1,
        coeffs=_f32(
            t=timestep_log_nearest(sig[body], log_sigmas),
            t2=timestep_log_nearest(sigma_s, log_sigmas),
            sigma=sig[body],
            sigma_s=sigma_s,
            c_in=calculate_input_scale(sig[body]),
            c_in_s=calculate_input_scale(sigma_s),
            ratio_s=sigma_s / sig[body],                  # sigma_fn(s)/sigma_fn(t)
            em1_r=np.expm1(-h * 0.5),
            exp_neg_h=np.exp(-h),
            em1=np.expm1(-h),
            sigma_up=ups[body],
        ),
        init="ve_scaled",
        init_scale=float(np.sqrt(sigmas[0] ** 2 + 1.0)),
        needs_noise=True,
        final="x",
        tail_coeffs={
            "t": int(np.ravel(timestep_log_nearest(sig[-1], log_sigmas))[0]),
            "sigma": float(sig[-1]),
            "c_in": float(np.ravel(calculate_input_scale(sig[-1]))[0]),
        },
    )


def plan_dpmpp_2m(schedule: DDIMSchedule) -> SolverPlan:
    """DPM-Solver++(2M) multistep on Karras sigmas.  latent_diffusion.py:454-503, 830-879."""
    total_sigmas, log_sigmas, sigmas = _karras_base(schedule)
    n = schedule.num_inference_steps
    return _plan_2m_from_sigmas(sigmas, n, timestep_log_nearest(sigmas[:n], log_sigmas),
                                calculate_input_scale(sigmas[:n]),
                                init_scale=float(np.sqrt(sigmas[0] ** 2 + 1.0)))


def _plan_2m_from_sigmas(sigmas, n, t_model, c_in, init_scale) -> SolverPlan:
    sig, sig_next = sigmas[:n], sigmas[1 : n + 1]
    with np.errstate(divide="ignore"):
        t_log = -np.log(sig)
        t_log_next = -np.log(np.where(sig_next > 0, sig_next, 1.0))
    h = t_log_next - t_log
    # r = h_last / h ; first step has no h_last -> euler branch selected anyway.
    h_last = np.concatenate([[1.0], t_log[1:] - t_log[:-1]])
    r = h_last / np.where(h != 0, h, 1.0)
    use_2m = (np.arange(n) > 0) & (sig_next > 0)
    return SolverPlan(
        n_steps=n,
        coeffs=_f32(
            t=t_model,
            sigma=sig,
            sigma_next=sig_next,
            c_in=c_in,
            exp_neg_h=np.where(use_2m, np.exp(-h), 0.0),
            em1_over_2r=np.where(use_2m, np.expm1(-h) / (2.0 * r), 0.0),
            use_2m=use_2m.astype(np.float32),
        ),
        init="ve_scaled",
        init_scale=init_scale,
        needs_noise=False,
        final="x",
    )


def plan_dpmpp_2m_vp_sdxl(schedule: DDIMSchedule) -> SolverPlan:
    """SDXL `dpm++_2m_cfgpp`: VP-native sigmas from the DDIM timesteps.

    latent_sdxl.py:860-930 — sigmas come from the (prepended) alpha table at
    the scheduler timesteps, NO appended zero, and the loop runs
    `timesteps[:-1]` (n-1 steps).  x initialises to randn * sigmas[0], and
    the model t is the LINEAR-sigma quantized lookup (sigma_to_t).
    """
    ts = schedule.timesteps
    alphas = schedule.alphas_ext[ts]                      # latent_sdxl.py:878
    sigmas = np.sqrt((1.0 - alphas) / alphas)
    total_sigmas = schedule.sigmas_ve
    n = len(ts) - 1                                       # loops timesteps[:-1]
    t_model = sigma_to_t_linear(sigmas[:n], total_sigmas, quantize=True)
    c_in = np.sqrt(alphas[:n])                            # latent_sdxl.py:895
    return _plan_2m_from_sigmas(sigmas, n, t_model, c_in,
                                init_scale=float(sigmas[0]))


def plan_euler_vp_sigmas_sdxl(schedule: DDIMSchedule) -> SolverPlan:
    """SDXL `euler_cfg++`: sigmas from actual DDIM timesteps (latent_sdxl.py:776-777)."""
    total_sigmas = schedule.sigmas_ve
    log_sigmas = np.log(total_sigmas)
    ts = schedule.timesteps
    sigmas = np.concatenate([total_sigmas[ts], [0.0]])
    n = len(ts)
    sig, sig_next = sigmas[:n], sigmas[1 : n + 1]
    return SolverPlan(
        n_steps=n,
        coeffs=_f32(
            t=timestep_log_nearest(sig, log_sigmas),
            sigma=sig,
            sigma_next=sig_next,
            c_in=calculate_input_scale(sig),
        ),
        init="ve_scaled",
        init_scale=float(np.sqrt(sigmas[0] ** 2 + 1.0)),
        needs_noise=False,
        final="z0",
    )
