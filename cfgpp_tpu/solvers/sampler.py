"""Generic sampling loop: plan + step fn -> `lax.scan`.

This is the model-agnostic core: given an epsilon function (any callable with
the UNet signature), a solver spec, and a schedule, it runs the whole reverse
(or inversion) process as one fused scan.  The engine wraps this with text
encoding / VAE decode / jit; tests drive it with synthetic eps functions.

Two execution modes:
* `run_solver` — the fused fast path (one lax.scan; optionally returns the
  stacked (z0t, zt) trajectory, the scan-compatible equivalent of the
  reference's per-step callbacks).
* `run_solver_unrolled` — a Python-loop debug mode sharing the exact same
  step bodies, for callbacks that MUTATE latents mid-run the way the
  reference's can (`latent_diffusion.py:288-294`).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from cfgpp_tpu.solvers import steps
from cfgpp_tpu.solvers.plans import SolverPlan
from cfgpp_tpu.solvers.registry import SolverSpec


def _as_device_coeffs(plan: SolverPlan):
    return {k: jnp.asarray(v) for k, v in plan.coeffs.items()}


def init_latent(plan: SolverPlan, key: jax.Array, shape, dtype=jnp.float32):
    """Draw zT.  VP solvers: standard normal (latent_diffusion.py:198-200);
    VE solvers: scaled by plan.init_scale (:201-205 / latent_sdxl.py:884)."""
    return jax.random.normal(key, shape, dtype) * plan.init_scale


def init_latent_per_sample(plan: SolverPlan, keys: jax.Array, shape,
                           dtype=jnp.float32):
    """Batch init with one key per sample ([B,2] uint32): element i's latent
    depends only on its own key, not on batch size or position."""
    single = shape[1:]
    draw = jax.vmap(lambda k: jax.random.normal(k, single, dtype))
    return draw(keys) * plan.init_scale


def _make_body(spec: SolverSpec, plan: SolverPlan, eps_fn, w, noise_key):
    """Build (body, carry0_fn, extract_x) for the solver kind.

    body(carry, (i, coeffs_i)) -> (carry, (z0t, zt)); carry0_fn(zT) makes the
    initial carry; extract_x(carry) reads the running latent back out.
    """

    def step_noise(i, like):
        if noise_key is not None and noise_key.ndim == 2:
            # per-sample keys [B, 2]: each batch element's noise stream is
            # independent of batch composition (reproducible sharded runs)
            def per(k):
                return jax.random.normal(jax.random.fold_in(k, i),
                                         like.shape[1:], like.dtype)
            return jax.vmap(per)(noise_key)
        key = jax.random.fold_in(noise_key, i)
        return jax.random.normal(key, like.shape, like.dtype)

    kind, cfgpp = spec.kind, spec.cfgpp

    if kind == "ddim":
        def body(zt, x):
            i, c = x
            zt_next, z0t = steps.ddim_step(eps_fn, w, c, zt, cfgpp=cfgpp)
            return zt_next, (z0t, zt_next)
        return body, lambda z: z, lambda c: c
    if kind == "euler":
        def body(xc, x):
            i, c = x
            x_next, den = steps.euler_step(eps_fn, w, c, xc, cfgpp=cfgpp)
            return x_next, (den, x_next)
        return body, lambda z: z, lambda c: c
    if kind == "euler_a":
        def body(xc, x):
            i, c = x
            x_next, den = steps.euler_ancestral_step(eps_fn, w, c, xc,
                                                     step_noise(i, xc), cfgpp=cfgpp)
            return x_next, (den, x_next)
        return body, lambda z: z, lambda c: c
    if kind == "dpm2s":
        def body(xc, x):
            i, c = x
            x_next, den = steps.dpmpp_2s_ancestral_step(eps_fn, w, c, xc,
                                                        step_noise(i, xc), cfgpp=cfgpp)
            return x_next, (den, x_next)
        return body, lambda z: z, lambda c: c
    if kind == "dpm2m":
        def body(carry, x):
            i, c = x
            carry_next, den = steps.dpmpp_2m_step(
                eps_fn, w, c, carry, cfgpp=cfgpp,
                diff_cfgpp_uses_uncond=spec.diff_cfgpp_uses_uncond)
            return carry_next, (den, carry_next[0])
        return body, lambda z: (z, jnp.zeros_like(z)), lambda c: c[0]
    raise ValueError(f"unknown solver kind {kind}")


def _check_guidance(spec: SolverSpec, plan: SolverPlan, cfg_guidance, noise_key):
    # Lightning distillation is only valid at w==1 (latent_sdxl.py:851): the
    # assert must actually run, so a traced cfg_guidance is rejected here —
    # callers pass the (mandatory) concrete 1.0 instead, which also spares
    # the graph a dead operand.  The engine does exactly that after its own
    # host-side validation.
    if spec.lightning:
        try:
            val = float(cfg_guidance)
        except (TypeError, jax.errors.TracerArrayConversionError,
                jax.errors.ConcretizationTypeError) as err:
            raise ValueError(
                "lightning solvers need a concrete cfg_guidance (=1.0) so "
                "the w==1 assert can run; got a traced value") from err
        if val != 1.0:
            raise ValueError(
                "CFG should be turned off (cfg_guidance=1) in the lightning version")
    if plan.needs_noise and noise_key is None:
        raise ValueError(f"solver {spec.name} is ancestral and needs a noise key")


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

    API contract: ``cfg_guidance`` may be a traced scalar (one compiled graph
    serves all guidance scales) EXCEPT for lightning specs, which require a
    concrete python float 1.0 so the w==1 distillation assert actually runs
    (see _check_guidance; the engine substitutes the literal after its own
    host-side validation)."""
    _check_guidance(spec, plan, cfg_guidance, noise_key)
    w = jnp.float32(cfg_guidance)
    coeffs = _as_device_coeffs(plan)
    body, carry0, extract = _make_body(spec, plan, eps_fn, w, noise_key)

    idx = jnp.arange(plan.n_steps, dtype=jnp.int32)
    carry, (traj_z0, traj_zt) = jax.lax.scan(body, carry0(zT), (idx, coeffs))
    x_final = extract(carry)

    if spec.kind == "dpm2s":
        # Eulerized final step outside the scan (sigma_down == 0).
        x_final, _ = steps.dpmpp_2s_tail_step(eps_fn, w, plan.tail_coeffs, x_final,
                                              cfgpp=spec.cfgpp)

    final = traj_z0[-1] if plan.final == "z0" else x_final
    return (final, (traj_z0, traj_zt)) if return_trajectory else (final, None)


def run_solver_unrolled(
    spec: SolverSpec,
    plan: SolverPlan,
    eps_fn,
    zT: jnp.ndarray,
    cfg_guidance: float,
    noise_key: Optional[jax.Array] = None,
    callback: Optional[Callable] = None,
    decode_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Python-loop debug mode: full reference callback parity incl. mutation.

    ``callback(step, t, {"z0t","zt","decode"})`` may return mutated latents,
    which are fed back into the loop exactly as the reference does."""
    _check_guidance(spec, plan, cfg_guidance, noise_key)
    w = jnp.float32(cfg_guidance)
    coeffs = _as_device_coeffs(plan)
    body, carry0, extract = _make_body(spec, plan, eps_fn, w, noise_key)

    carry = carry0(zT)
    z0t = zT
    for i in range(plan.n_steps):
        ci = {k: v[i] for k, v in coeffs.items()}
        carry, (z0t, zt) = body(carry, (jnp.int32(i), ci))
        if callback is not None:
            kw = callback(i, int(plan.coeffs["t"][i]),
                          {"z0t": z0t, "zt": zt, "decode": decode_fn})
            z0t, zt = kw["z0t"], kw["zt"]
            if spec.kind == "dpm2m":
                carry = (zt, carry[1])
            else:
                carry = zt

    x_final = extract(carry)
    if spec.kind == "dpm2s":
        x_final, _ = steps.dpmpp_2s_tail_step(eps_fn, w, plan.tail_coeffs, x_final,
                                              cfgpp=spec.cfgpp)
    return z0t if plan.final == "z0" else x_final


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
        zt_next, _ = steps.ddim_inversion_step(eps_fn, w, c, zt, cfgpp=spec.cfgpp)
        return zt_next, None

    zT, _ = jax.lax.scan(body, z0, coeffs)
    return zT
