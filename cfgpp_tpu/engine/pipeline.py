"""DiffusionEngine: jit-compiled end-to-end text-to-image pipelines.

The TPU-native equivalent of the reference's solver `.sample()` methods
(`latent_diffusion.py:254-299`, `latent_sdxl.py:200-266`): tokenize (host)
-> text encode -> lax.scan solver loop with cond/uncond fused into one
batch-2B UNet call -> VAE decode, all inside ONE jit per
(solver, NFE, resolution, batch, guidance-mode) tuple, cached.

Guidance batching matches `predict_noise` (`latent_diffusion.py:131-158`):
a single UNet call on the stacked [uncond; cond] batch, with degenerate
single-branch calls when w==0, or when w==1 under plain CFG (CFG++ still
needs the true unconditional eps for renoising, so it always runs dual).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cfgpp_tpu.engine.bundle import ModelBundle
from cfgpp_tpu.schedules.ddim import make_ddim_schedule
from cfgpp_tpu.solvers.plans import plan_ddim_inversion
from cfgpp_tpu.solvers.registry import get_solver_spec
from cfgpp_tpu.solvers.sampler import (
    init_latent,
    init_latent_per_sample,
    run_inversion,
    run_solver,
    run_solver_unrolled,
)


def _needs_branches(cfgpp: bool, w: float) -> Tuple[bool, bool]:
    """(needs_uncond, needs_cond).  latent_diffusion.py:144-158 semantics."""
    if w == 0.0:
        return True, False
    if w == 1.0 and not cfgpp:
        return False, True
    return True, True


class DiffusionEngine:
    """One (model bundle, solver, NFE) sampling engine with compile caching."""

    def __init__(self, bundle: ModelBundle, solver: str = "ddim_cfg++",
                 nfe: int = 50):
        self.bundle = bundle
        self.solver_name = solver
        self.nfe = nfe
        self.spec = get_solver_spec(solver, bundle.family)
        self.schedule = make_ddim_schedule(
            nfe, timestep_spacing=self.spec.timestep_spacing)
        self.plan = self.spec.plan_fn(self.schedule)
        self.inv_plan = plan_ddim_inversion(self.schedule)
        self._cache: Dict[Any, Callable] = {}

    # ------------------------------------------------------------------ host
    def tokenize(self, prompts: Sequence[str]) -> jnp.ndarray:
        return jnp.asarray(self.bundle.tokenizer(list(prompts)))

    def tokenize_2(self, prompts: Sequence[str]) -> jnp.ndarray:
        return jnp.asarray(self.bundle.tokenizer_2(list(prompts)))

    def default_resolution(self) -> int:
        return self.bundle.config.default_resolution

    def latent_shape(self, batch: int, resolution: int) -> Tuple[int, int, int, int]:
        s = resolution // self.bundle.vae_scale_factor
        return (batch, s, s, self.bundle.latent_channels)

    def make_add_time_ids(self, batch: int,
                          original_size: Tuple[int, int],
                          crops_coords_top_left: Tuple[int, int],
                          target_size: Tuple[int, int]) -> np.ndarray:
        """latent_sdxl.py:187-198 incl. the add_embedding width validation."""
        ids = list(original_size) + list(crops_coords_top_left) + list(target_size)
        cfg = self.bundle.config.unet
        expected = cfg.projection_class_embeddings_input_dim
        passed = cfg.addition_time_embed_dim * len(ids) + \
            self.bundle.config.text_encoder_2.projection_dim
        if expected != passed:
            raise ValueError(
                f"Model expects an added time embedding vector of length {expected}, "
                f"but a vector of {passed} was created.")
        return np.tile(np.asarray(ids, np.float32)[None], (batch, 1))

    # ------------------------------------------------------- embedding (jit)
    def _text_embed_sd(self, params, ids):
        out = self.bundle.text_encoder.apply(params, ids)
        return out.last_hidden_state

    def _text_embed_sdxl(self, params, params2, ids1, ids2, clip_skip=None):
        """Dual-encoder embed (latent_sdxl.py:96-128): penultimate (or
        clip_skip-selected) hidden states concatenated on the feature dim;
        pooled ALWAYS from encoder-2."""
        o1 = self.bundle.text_encoder.apply(params, ids1, clip_skip)
        o2 = self.bundle.text_encoder_2.apply(params2, ids2, clip_skip)
        embeds = jnp.concatenate(
            [o1.penultimate_hidden_state, o2.penultimate_hidden_state], axis=-1)
        return embeds, o2.pooled_output

    # ------------------------------------------------------------ eps closure
    def _make_eps_fn(self, unet_params, uc, c, w,
                     added_uc: Optional[Tuple] = None,
                     added_c: Optional[Tuple] = None,
                     mode: Optional[Tuple[bool, bool]] = None):
        """Batched cond/uncond epsilon function for the scan body.

        ``w`` may be a traced scalar; only ``mode`` (which branches run) is
        static, so sweeping guidance scales reuses one compiled graph."""
        unet = self.bundle.unet
        needs_uc, needs_c = mode if mode is not None else _needs_branches(
            self.spec.cfgpp, float(w))
        is_v = self.bundle.config.unet.prediction_type == "v_prediction"
        abar = jnp.asarray(self.schedule.alphas_cumprod, jnp.float32)

        def kv_cache(ctx):
            # hoist the cross-attn kv projections (context-only, constant
            # across the scan) out of the per-step loop; ~140 context
            # matmuls/step disappear.  CFGPP_NO_KV_CACHE=1 disables (A/B).
            import os
            if os.environ.get("CFGPP_NO_KV_CACHE") == "1":
                return None
            from cfgpp_tpu.models.unet import precompute_cross_kv
            return precompute_cross_kv(unet_params, self.bundle.config.unet,
                                       ctx, quant=unet.quant,
                                       dtype=unet.dtype)

        def apply(z, t, ctx, added, cross_kv=None):
            args = (z, t, ctx) + (added if added is not None else ())
            out = unet.apply(unet_params, *args, cross_kv=cross_kv)
            if is_v:
                # v -> eps at the model boundary (SD2.x-768v):
                # eps = sqrt(abar_t) v + sqrt(1-abar_t) x_t
                a = jnp.take(abar, jnp.clip(t, 0, abar.shape[0] - 1))
                a = a.reshape((-1,) + (1,) * (z.ndim - 1))
                out = jnp.sqrt(a) * out + jnp.sqrt(1.0 - a) * z.astype(jnp.float32)
            return out

        if needs_uc and needs_c:
            ctx = jnp.concatenate([uc, c], axis=0)
            added = None
            if added_uc is not None:
                added = tuple(jnp.concatenate([a, b], axis=0)
                              for a, b in zip(added_uc, added_c))
            ckv = kv_cache(ctx)

            def eps_fn(z, t):
                b = z.shape[0]
                z2 = jnp.concatenate([z, z], axis=0)
                t2 = jnp.broadcast_to(t, (2 * b,))
                out = apply(z2, t2, ctx, added, ckv)
                return out[:b], out[b:]
            return eps_fn

        ctx = uc if needs_uc else c
        added = added_uc if needs_uc else added_c
        ckv = kv_cache(ctx)

        def eps_fn(z, t):
            out = apply(z, jnp.broadcast_to(t, (z.shape[0],)), ctx, added, ckv)
            return out, out
        return eps_fn

    # ------------------------------------------------------------- vae (jit)
    def _decode(self, vae_params, z):
        scale = self.bundle.config.vae.scaling_factor

        def one(zi):
            img = self.bundle.vae.apply(vae_params, (zi / scale).astype(jnp.float32),
                                        method=self.bundle.vae.decode)
            return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

        # Decode per-image for every batch: VAE decoder intermediates at
        # 1024^2 are ~1GB/image (bf16) — multi-image decode OOMs HBM once
        # model params are resident (batch-2 whole-batch decode OOMed the
        # int8 sweep, where bf16 + int8 UNet copies coexist), and the r5
        # sweep measured per-image FASTER anyway: chunk-2/chunk-4 decode
        # is 2.2x worse per image from activation spill
        # (evidence/vae_decode_r5.json via tools/bench_vae_decode.py).
        if z.shape[0] > 1:
            return jax.lax.map(lambda zi: one(zi[None])[0], z)
        return one(z)

    def _encode(self, vae_params, img, key):
        """VAE encode + reparameterized draw.  ``key`` may be per-sample
        keys [B, 2]: each image's noise then depends only on its own key,
        keeping batched inversion identical across batch sizes/shardings
        (the same contract init/ancestral noise follow)."""
        scale = self.bundle.config.vae.scaling_factor
        vae32 = self.bundle.vae_encode  # fp32 compute: encode is off the hot
        # path and feeds the parity-sensitive inversion source latents
        mean, logvar = vae32.apply(vae_params, img.astype(jnp.float32),
                                   method=vae32.encode)
        std = jnp.exp(0.5 * logvar)
        if key.ndim == 2:
            noise = jax.vmap(lambda k, m: jax.random.normal(k, m.shape, m.dtype))(
                key, mean)
        else:
            noise = jax.random.normal(key, mean.shape, mean.dtype)
        return (mean + std * noise) * scale

    def decode_fn(self) -> Callable:
        """Host-callable jitted decoder (the `decode` passed to callbacks).
        Params are passed as arguments, not baked as jit constants; the
        jit wrapper is cached on the engine so repeated sample() calls
        reuse one trace (a fresh jax.jit(self._decode) per call would
        retrace the VAE decode every time)."""
        if not hasattr(self, "_decode_jit"):
            self._decode_jit = jax.jit(self._decode)
        jitted = self._decode_jit
        vae_params = self.bundle.vae_params
        return lambda z: jitted(vae_params, z)

    # ---------------------------------------------------------------- sample
    def sample(
        self,
        prompt: Sequence,
        cfg_guidance: float = 7.5,
        seed: int = 42,
        prompt_2: Optional[Sequence] = None,
        resolution: Optional[int] = None,
        src_img: Optional[jnp.ndarray] = None,
        callback_fn: Optional[Callable] = None,
        unrolled: bool = False,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        clip_skip: Optional[int] = None,
        init_latent_override: Optional[jnp.ndarray] = None,
        return_trajectory: bool = False,
        latent_init: Optional[str] = None,
        src_latent_override: Optional[jnp.ndarray] = None,
    ) -> np.ndarray:
        """Generate images.  ``prompt`` is [null, cond] (or [null, src, tgt]
        for edit solvers), mirroring the reference CLIs.  Each conditional
        entry may also be a LIST of B strings — the whole request then runs
        as one fused batch-B graph (latent_diffusion.py:254-299 semantics at
        any batch; noise draws use one seed-keyed stream over the [B, ...]
        shape, so batch=1 reproduces the historical single-prompt draws).
        Returns float32 NHWC images in [0, 1].

        ``latent_init``: inversion solvers accept "ddim" (default — invert
        with the real null prompt) or "npi" (negative-prompt inversion,
        latent_diffusion.py:195-197: the conditional embedding serves as
        the null prompt with w=1, collapsing to a single-branch forward).
        """
        null_p = prompt[0]
        conds = prompt[1:3] if self.spec.edit else prompt[1:2]
        batch = max((len(p) if isinstance(p, (list, tuple)) else 1)
                    for p in conds)
        cond_slots = [list(p) if isinstance(p, (list, tuple)) else [p] * batch
                      for p in conds]
        if any(len(s) != batch for s in cond_slots):
            raise ValueError("prompt lists must share one batch size")
        cond_slots_2 = None
        if prompt_2 is not None:
            null_p = (null_p, prompt_2[0])
            conds2 = prompt_2[1:3] if self.spec.edit else prompt_2[1:2]
            cond_slots_2 = [list(p) if isinstance(p, (list, tuple)) else [p] * batch
                            for p in conds2]
            if any(len(s2) != batch for s2 in cond_slots_2):
                raise ValueError("prompt_2 lists must share the prompt "
                                 "batch size")

        key = jax.random.PRNGKey(seed)
        keys = jax.random.split(key, 3)  # (init, noise, enc)
        return self._run(
            null_prompt=null_p, cond_slots=cond_slots,
            cond_slots_2=cond_slots_2, batch=batch,
            cfg_guidance=cfg_guidance, keys=keys, resolution=resolution,
            src_imgs=src_img, callback_fn=callback_fn, unrolled=unrolled,
            original_size=original_size,
            crops_coords_top_left=crops_coords_top_left,
            target_size=target_size, clip_skip=clip_skip,
            init_latent_override=init_latent_override,
            return_trajectory=return_trajectory, latent_init=latent_init,
            src_latent_override=src_latent_override)

    def sample_batch(
        self,
        null_prompt: str,
        prompts: Sequence[str],
        cfg_guidance: float = 7.5,
        seed: int = 42,
        resolution: Optional[int] = None,
        sample_indices: Optional[Sequence[int]] = None,
        mesh=None,
        null_prompt_2: Optional[str] = None,
        prompts_2: Optional[Sequence[str]] = None,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        as_numpy: bool = True,
        to_uint8: bool = False,
        src_imgs: Optional[jnp.ndarray] = None,
        src_prompts: Optional[Sequence[str]] = None,
        callback_fn: Optional[Callable] = None,
    ) -> np.ndarray:
        """Batched generation: one fused run over B prompts, optionally
        sharded data-parallel over a device mesh (the TPU replacement for
        the reference's serial MS-COCO loop, examples/text_to_mscoco.py:54-62).

        Supports plain T2I solvers AND inversion/edit solvers: pass
        ``src_imgs`` [B,H,W,3] in [-1,1] for inversion (reconstruction of
        B images in one fused run), plus ``src_prompts`` for word-swap edit
        solvers (``prompts`` are then the edit targets).

        ``sample_indices`` keys each sample's noise stream by its GLOBAL
        index, so results are identical across batch sizes / shardings.
        ``as_numpy=False`` returns the device array WITHOUT blocking, so a
        caller can dispatch the next batch before pulling this one to host
        (the MS-COCO loop overlaps device compute with host image IO).
        ``to_uint8`` converts to uint8 ON DEVICE: 4x less host transfer
        (the PNG writer wants uint8 anyway).
        """
        if self.spec.edit and src_prompts is None:
            raise ValueError(f"edit solver {self.solver_name} needs src_prompts")
        batch = len(prompts)
        idx = np.asarray(sample_indices if sample_indices is not None
                         else np.arange(batch), np.uint32)
        base = jax.random.PRNGKey(seed)
        sample_keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.asarray(idx))

        cond_slots = ([list(src_prompts), list(prompts)] if self.spec.edit
                      else [list(prompts)])
        cond_slots_2 = None
        null_p: Any = null_prompt
        if prompts_2 is not None or null_prompt_2 is not None:
            null_p = (null_prompt, null_prompt_2 if null_prompt_2 is not None
                      else null_prompt)
            ps2 = list(prompts_2) if prompts_2 is not None else list(prompts)
            cond_slots_2 = ([list(src_prompts), ps2] if self.spec.edit
                            else [ps2])

        # per-sample keys for init, ancestral noise AND the encode draw:
        # batched inversion stays identical across batch sizes / shardings
        return self._run(
            null_prompt=null_p, cond_slots=cond_slots,
            cond_slots_2=cond_slots_2, batch=batch,
            cfg_guidance=cfg_guidance,
            keys=(sample_keys, sample_keys, sample_keys),
            resolution=resolution, src_imgs=src_imgs, mesh=mesh,
            original_size=original_size,
            crops_coords_top_left=crops_coords_top_left,
            target_size=target_size, callback_fn=callback_fn,
            callback_sample_indices=idx.tolist(),
            as_numpy=as_numpy, to_uint8=to_uint8)

    def _run(
        self,
        *,
        null_prompt,
        cond_slots: Sequence[Sequence[str]],
        cond_slots_2: Optional[Sequence[Sequence[str]]],
        batch: int,
        cfg_guidance: float,
        keys: Tuple,
        resolution: Optional[int],
        src_imgs: Optional[jnp.ndarray] = None,
        mesh=None,
        callback_fn: Optional[Callable] = None,
        callback_sample_indices: Optional[Sequence[int]] = None,
        unrolled: bool = False,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        clip_skip: Optional[int] = None,
        init_latent_override: Optional[jnp.ndarray] = None,
        return_trajectory: bool = False,
        latent_init: Optional[str] = None,
        src_latent_override: Optional[jnp.ndarray] = None,
        as_numpy: bool = True,
        to_uint8: bool = False,
    ):
        """THE runner code path: every public API (single-prompt, batched,
        sharded, inversion, edit, trajectory/callback) assembles inputs here.

        ``null_prompt`` is a string, or an (encoder-1, encoder-2) pair.
        ``keys`` is the (init, noise, enc) key triple — scalar keys for the
        seed-keyed stream, or the same per-sample [B, 2] array thrice for
        global-index-keyed batches.
        """
        family = self.bundle.family
        res = resolution or self.default_resolution()
        if self.spec.lightning and float(cfg_guidance) != 1.0:
            raise ValueError(
                "CFG should be turned off (cfg_guidance=1) in the lightning version")
        if latent_init not in (None, "ddim", "npi"):
            raise ValueError(f"unknown latent_init {latent_init!r}")
        if latent_init == "npi" and not self.spec.inversion:
            raise ValueError("latent_init='npi' requires an inversion solver")

        null1 = null_prompt[0] if isinstance(null_prompt, tuple) else null_prompt
        ids_uc = self.tokenize([null1] * batch)
        ids_cs = [self.tokenize(list(slot)) for slot in cond_slots]

        kwargs: Dict[str, Any] = {}
        if family == "sdxl":
            null2 = null_prompt[1] if isinstance(null_prompt, tuple) else null_prompt
            slots2 = cond_slots_2 if cond_slots_2 is not None else cond_slots
            kwargs["ids2_uc"] = self.tokenize_2([null2] * batch)
            kwargs["ids2_cs"] = [self.tokenize_2(list(s)) for s in slots2]
            osz = original_size or (res, res)
            tsz = target_size or (res, res)
            kwargs["time_ids"] = jnp.asarray(
                self.make_add_time_ids(batch, osz, crops_coords_top_left, tsz))

        if init_latent_override is not None:
            # cross-framework parity harness: inject the exact zT a reference
            # implementation drew, bypassing jax.random
            kwargs["zT_override"] = jnp.asarray(init_latent_override, jnp.float32)
        if src_latent_override is not None:
            # parity harness for inversion solvers: inject the reference's
            # ENCODED latent (its VAE sample draw cannot be replayed in jax)
            kwargs["z0_override"] = jnp.asarray(src_latent_override, jnp.float32)

        if self.spec.inversion:
            if src_imgs is None:
                raise ValueError(f"solver {self.solver_name} needs src_imgs")
            src_batch = jnp.asarray(src_imgs, jnp.float32)
            if src_batch.shape[0] != batch:
                raise ValueError(
                    f"{src_batch.shape[0]} src imgs vs batch {batch}")
        else:
            src_batch = jnp.zeros((batch, 8, 8, 3), jnp.float32)  # placeholder

        k_init, k_noise, k_enc = keys
        if mesh is not None:
            from cfgpp_tpu.parallel import shard_batch
            ids_uc = shard_batch(ids_uc, mesh)
            ids_cs = shard_batch(ids_cs, mesh)
            kwargs = shard_batch(kwargs, mesh)
            src_batch = shard_batch(src_batch, mesh)
            if k_init.ndim == 2:
                k_init = k_noise = k_enc = shard_batch(k_init, mesh)

        if return_trajectory and unrolled:
            raise ValueError(
                "return_trajectory is not available in unrolled mode (the "
                "unrolled runner exists for MUTATING callbacks and keeps no "
                "trajectory); drop unrolled=True to capture one")
        with_traj = (callback_fn is not None or return_trajectory) and not unrolled
        runner = self._get_runner(
            mode=_needs_branches(self.spec.cfgpp, float(cfg_guidance)),
            batch=batch, res=res, n_cond=len(ids_cs), with_traj=with_traj,
            unrolled=unrolled, clip_skip=clip_skip, latent_init=latent_init)

        w_arr = jnp.float32(cfg_guidance)
        if unrolled:
            img, traj = runner(w_arr, ids_uc, ids_cs, src_batch, k_init,
                               k_noise, k_enc, kwargs, callback_fn)
        else:
            img, traj = runner(w_arr, ids_uc, ids_cs, src_batch, k_init,
                               k_noise, k_enc, kwargs)

        if callback_fn is not None and not unrolled:
            self._replay_callbacks(callback_fn, traj,
                                   sample_indices=callback_sample_indices)
        if to_uint8:
            img = self._to_uint8(img)
        if return_trajectory:
            return np.asarray(img), jax.tree.map(np.asarray, traj)
        return np.asarray(img) if as_numpy else img

    # ------------------------------------------------------------- internals
    def _get_runner(self, mode: Tuple[bool, bool], batch: int, res: int,
                    n_cond: int, with_traj: bool, unrolled: bool,
                    clip_skip: Optional[int] = None,
                    latent_init: Optional[str] = None):
        if clip_skip is not None and self.bundle.family != "sdxl":
            # the reference supports clip_skip only on the SDXL dual-encoder
            # path (latent_sdxl.py:88-92); silently ignoring it here would
            # return final-layer embeddings while the caller believes the
            # tap moved
            raise ValueError("clip_skip is an SDXL-only option "
                             "(latent_sdxl.py:88-92); the SD family always "
                             "uses the final layer")
        cache_key = (mode, batch, res, n_cond, with_traj, unrolled, clip_skip,
                     latent_init)
        if cache_key in self._cache:
            return self._cache[cache_key]

        spec, plan, bundle = self.spec, self.plan, self.bundle
        family = bundle.family

        def embed(params, ids_uc, ids_cs, kwargs):
            if family == "sdxl":
                uc, pool_uc = self._text_embed_sdxl(
                    params["text"], params["text2"], ids_uc, kwargs["ids2_uc"],
                    clip_skip)
                cs, pool_cs = [], []
                for i1, i2 in zip(ids_cs, kwargs["ids2_cs"]):
                    c, pc = self._text_embed_sdxl(params["text"], params["text2"],
                                                  i1, i2, clip_skip)
                    cs.append(c)
                    pool_cs.append(pc)
                return uc, cs, pool_uc, pool_cs
            uc = self._text_embed_sd(params["text"], ids_uc)
            cs = [self._text_embed_sd(params["text"], i) for i in ids_cs]
            return uc, cs, None, None

        def added_for(pool_uc, pool_c, kwargs):
            if family != "sdxl":
                return None, None
            t_ids = kwargs["time_ids"]
            return (pool_uc, t_ids), (pool_c, t_ids)

        def core(params, w, ids_uc, ids_cs, src_img, k_init, k_noise, k_enc,
                 kwargs, callback_fn=None):
            if spec.lightning:
                # host-validated to be exactly 1.0; use the literal so the
                # in-solver w==1 assert runs on a concrete value
                w = 1.0
            uc, cs, pool_uc, pool_cs = embed(params, ids_uc, ids_cs, kwargs)
            # sampling conditioning: edit solvers invert with src (cs[0]) and
            # resample with tgt (cs[-1]); plain solvers use cs[0].
            c_sample = cs[-1]
            pool_sample = pool_cs[-1] if pool_cs else None
            added_uc, added_c = added_for(pool_uc, pool_sample, kwargs)
            eps_fn = self._make_eps_fn(params["unet"], uc, c_sample, w,
                                       added_uc, added_c, mode=mode)

            if spec.inversion:
                enc_key = k_enc
                if k_enc.ndim == 2:   # per-sample keys: tag 2 (init=0, noise=1)
                    enc_key = jax.vmap(lambda k: jax.random.fold_in(k, 2))(k_enc)
                z0 = kwargs["z0_override"] if "z0_override" in kwargs else \
                    self._encode(params["vae"], src_img, enc_key)
                if latent_init == "npi":
                    # negative-prompt inversion: c doubles as the null
                    # prompt at w=1, so eps_c == eps_uc and one branch
                    # suffices (latent_diffusion.py:195-197)
                    _, added_c_inv = added_for(
                        pool_uc, pool_cs[0] if pool_cs else None, kwargs)
                    inv_eps = self._make_eps_fn(
                        params["unet"], cs[0], cs[0], 1.0,
                        added_c_inv, added_c_inv, mode=(True, False))
                    zT = run_inversion(spec, self.inv_plan, inv_eps, z0,
                                       jnp.float32(1.0))
                else:
                    added_uc_inv, added_c_inv = added_for(
                        pool_uc, pool_cs[0] if pool_cs else None, kwargs)
                    inv_eps = self._make_eps_fn(params["unet"], uc, cs[0], w,
                                                added_uc_inv, added_c_inv,
                                                mode=mode)
                    zT = run_inversion(spec, self.inv_plan, inv_eps, z0, w)
            elif "zT_override" in kwargs:
                zT = kwargs["zT_override"]
            elif k_init.ndim == 2:
                # per-sample keys [B,2]: batched/sharded generation
                init_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(k_init)
                zT = init_latent_per_sample(plan, init_keys,
                                            self.latent_shape(batch, res))
            else:
                zT = init_latent(plan, k_init, self.latent_shape(batch, res))
            noise_key = k_noise
            if plan.needs_noise and k_noise.ndim == 2:
                noise_key = jax.vmap(lambda k: jax.random.fold_in(k, 1))(k_noise)

            if unrolled:
                final = run_solver_unrolled(
                    spec, plan, eps_fn, zT, w,
                    noise_key=noise_key if plan.needs_noise else None,
                    callback=callback_fn, decode_fn=self.decode_fn())
                traj = None
            else:
                final, traj = run_solver(
                    spec, plan, eps_fn, zT, w,
                    noise_key=noise_key if plan.needs_noise else None,
                    return_trajectory=with_traj)
            img = self._decode(params["vae"], final)
            return img, traj

        # Params are ARGUMENTS of the jitted function, never closure
        # captures: closed-over arrays get baked into the executable as
        # constants (gigabytes duplicated in HBM + enormous compile times).
        # They are also fetched from the bundle at CALL time, so loading new
        # weights into the bundle takes effect without invalidating runners.
        if unrolled:
            def runner(w, ids_uc, ids_cs, src_img, k_init, k_noise, k_enc,
                       kwargs, callback_fn=None):
                return core(self._live_params(), w, ids_uc, ids_cs, src_img,
                            k_init, k_noise, k_enc, kwargs, callback_fn)
        else:
            jit_core = jax.jit(core)

            def runner(w, ids_uc, ids_cs, src_img, k_init, k_noise, k_enc, kwargs):
                return jit_core(self._live_params(), w, ids_uc, ids_cs, src_img,
                                k_init, k_noise, k_enc, kwargs)
        self._cache[cache_key] = runner
        return runner

    def _to_uint8(self, img):
        if not hasattr(self, "_u8_fn"):
            self._u8_fn = jax.jit(
                lambda x: (x * 255.0 + 0.5).astype(jnp.uint8))
        return self._u8_fn(img)

    def _live_params(self):
        return self.bundle.params()

    def _replay_callbacks(self, callback_fn, traj, sample_indices=None):
        """Post-hoc callback replay over the fused trajectory (non-mutating).

        ``sample_indices``: global per-sample indices for batched runs —
        passed through to callbacks so draw_* can write per-sample subdirs
        (the batched equivalent of the reference's per-prompt record/ dirs,
        examples/text_to_mscoco.py:43-45)."""
        z0s, zts = traj
        decode = self.decode_fn()
        ts = self.plan.coeffs["t"]
        for i in range(self.plan.n_steps):
            kw = {"z0t": z0s[i], "zt": zts[i], "decode": decode}
            if sample_indices is not None:
                kw["sample_indices"] = sample_indices
            callback_fn(i, int(ts[i]), kw)
