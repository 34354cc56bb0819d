"""StableDiffusionE4TPipeline — TPU-native E4T sampling.

Functional redesign of the reference pipeline
(/root/reference/e4t/pipeline_stable_diffusion_e4t.py:30-250). Per denoise
step the reference runs: UNet encoder-half -> full ViT-H -> CLIP text ->
batch-doubled full UNet, re-evaluating all 96 weight-offset hypernetworks
inside every attention call. Here the whole loop is ONE jitted lax.scan
with three structural speedups that are mathematically identity-preserving:

1. Weight offsets folded into effective UNet kernels once per call
   (models/weight_offsets.py) — not per attention call per step.
2. The ViT-H image branch hoisted out of the loop (its input image is
   constant across steps; only the fusion head sees per-step UNet feats).
3. The text-encoder "" (uncond) states computed once, reused as both the
   E4T conditioning input and the CFG uncond branch — exactly the
   reference's semantics (pipeline:81,201).

CFG batch doubling, per-step E4T word-embedding injection, and scheduler
numerics follow the reference loop (pipeline:181-222) step for step.
"""
from __future__ import annotations

import dataclasses
import os as _os
from typing import Any, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from e4t_diffusion_tpu.models.unet import (
    UNet2DConditionModel, UNetConfig, pool_encoder_features)
from e4t_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from e4t_diffusion_tpu.models.clip_text import (
    CLIPTextModel, CLIPTextConfig, embed_tokens)
from e4t_diffusion_tpu.models.e4t_encoder import E4TEncoder, E4TEncoderConfig
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.diffusion.schedulers import (
    NoiseScheduleConfig, DDIMScheduler, SCHEDULER_MAPPING)


@dataclasses.dataclass
class E4TModules:
    """Model bundle: modules (static) + params (pytrees)."""
    unet: UNet2DConditionModel
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    e4t_encoder: E4TEncoder

    @classmethod
    def create(cls,
               unet_config: UNetConfig = None,
               vae_config: VAEConfig = None,
               text_config: CLIPTextConfig = None,
               e4t_config: E4TEncoderConfig = None,
               dtype=jnp.float32) -> "E4TModules":
        return cls(
            unet=UNet2DConditionModel(unet_config or UNetConfig(), dtype=dtype),
            vae=AutoencoderKL(vae_config or VAEConfig(), dtype=dtype),
            text_encoder=CLIPTextModel(text_config or CLIPTextConfig(),
                                       dtype=dtype),
            e4t_encoder=E4TEncoder(e4t_config or E4TEncoderConfig(),
                                   dtype=dtype),
        )

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "E4TModules":
        """Matched tiny configs for tests: UNet tap dim feeds the encoder."""
        ucfg = UNetConfig.tiny()
        tcfg = CLIPTextConfig.tiny()
        tap_dim = 32 + 32 + 32 + 64 + 64  # conv_in + block res + mid (tiny)
        ecfg = E4TEncoderConfig.tiny(word_embedding_dim=tcfg.hidden_size,
                                     unet_feature_dim=tap_dim)
        return cls(
            unet=UNet2DConditionModel(ucfg, dtype=dtype),
            vae=AutoencoderKL(VAEConfig.tiny(), dtype=dtype),
            text_encoder=CLIPTextModel(tcfg, dtype=dtype),
            e4t_encoder=E4TEncoder(ecfg, dtype=dtype),
        )


def preprocess_image(image) -> np.ndarray:
    """PIL / uint8 HWC array -> float32 NCHW in [-1, 1]
    (/root/reference/e4t/pipeline_stable_diffusion_e4t.py:12-27)."""
    arr = np.asarray(image)
    if arr.ndim == 3:
        arr = arr[None]
    arr = arr.astype(np.float32) / 255.0
    arr = arr.transpose(0, 3, 1, 2)
    return 2.0 * arr - 1.0


def _tree_max_into(full: dict, partial) -> dict:
    """Elementwise-max a possibly PARTIAL calib tree into ``full``.

    The non-CFG tap call early-exits after the UNet mid block, so its
    calib collection covers only the encoder-half sites; the cond pass
    covers every site. Walking ``partial`` (instead of tree_map over
    both) makes the merge total-vs-partial safe."""
    out = dict(full)
    for k, v in partial.items():
        if isinstance(v, dict) or hasattr(v, "items"):
            out[k] = _tree_max_into(full[k], v)
        else:
            out[k] = jnp.maximum(full[k], v)
    return out


def _build_denoise_loop(modules: E4TModules, scheduler, num_steps: int,
                        guidance_scale: float, domain_embed_scale: float,
                        eta: float, collect_calib: bool,
                        collect_traj: bool = False):
    """The ONE denoise-loop construction, shared by sampling
    (make_sample_fn), activation-range calibration (make_calibration_fn)
    and trajectory capture (make_trajectory_fn) so they can never
    diverge. Returns ``run_loop(params_eff, text_params, e4t_params,
    latents, pixel_values, inputs_embeds, placeholder_idx, uncond_ids,
    class_embed, noise_rng) -> (final_latents, extra)`` where
    ``params_eff`` are the fully folded (and possibly quantized) UNet
    kernels. With ``collect_calib`` the UNet applies run with a mutable
    ``calib`` collection (sown by the quant drop-ins) and the per-site
    abs-max is max-reduced across both CFG passes and all steps in the
    scan carry (``extra`` = the amax tree). With ``collect_traj`` the
    scan stacks the post-step latents (``extra`` shaped
    ``(num_steps, B, 4, h, w)``) — the per-step record used for the
    int8-vs-bf16 divergence study (scripts/int8_quality.py). Otherwise
    ``extra`` is None."""
    assert not (collect_calib and collect_traj)
    do_cfg = guidance_scale > 1.0
    state0 = scheduler.init(num_steps)
    timesteps = state0["timesteps"]
    stochastic = getattr(scheduler, "stochastic", False) or eta > 0.0
    step_kwargs = {"eta": eta} if (eta > 0.0
                                   and isinstance(scheduler, DDIMScheduler)
                                   ) else {}

    def run_loop(params_eff, text_params, e4t_params, latents, pixel_values,
                 inputs_embeds, placeholder_idx, uncond_ids, class_embed,
                 noise_rng):
        # ---- hoisted (once per sampling run) --------------------------
        if hasattr(scheduler, "init_noise_sigma"):
            latents = latents * scheduler.init_noise_sigma(state0).astype(
                latents.dtype)
        uncond_states, _ = modules.text_encoder.apply(
            {"params": text_params}, uncond_ids)
        bsz = latents.shape[0]
        uncond_b = jnp.broadcast_to(
            uncond_states, (bsz, *uncond_states.shape[1:]))
        pixel_b = jnp.broadcast_to(pixel_values,
                                   (bsz, *pixel_values.shape[1:]))
        clip_feats = modules.e4t_encoder.apply(
            {"params": e4t_params}, pixel_b,
            method=E4TEncoder.encode_image)

        state = state0
        if hasattr(scheduler, "init_carry"):
            state = scheduler.init_carry(state0, latents.shape, latents.dtype)

        def unet_apply(x, t_b, ctx, **kwargs):
            if collect_calib:
                out, v = modules.unet.apply({"params": params_eff}, x, t_b,
                                            ctx, mutable=["calib"], **kwargs)
                return out, v["calib"]
            return modules.unet.apply({"params": params_eff}, x, t_b, ctx,
                                      **kwargs), None

        if collect_calib:
            # collection structure without FLOPs, to seed the scan carry
            # (the cond pass covers every site each step, so the full-
            # forward tree is the right superset)
            shapes = jax.eval_shape(
                lambda p, x, t, c: modules.unet.apply(
                    {"params": p}, x, t, c, mutable=["calib"]),
                params_eff, latents, jnp.zeros((bsz,), jnp.int32), uncond_b)
            amax0 = jax.tree_util.tree_map(
                lambda l: jnp.zeros(l.shape, jnp.float32),
                shapes[1]["calib"])
            carry0 = (state, latents, amax0)
        else:
            carry0 = (state, latents)

        def body(carry, i):
            if collect_calib:
                state, latents, amax = carry
            else:
                state, latents = carry
            t = timesteps[i]
            t_b = jnp.broadcast_to(t, (bsz,))
            latents_in = scheduler.scale_model_input(state, i, latents)

            # E4T tap on the "" states (reference pipeline:191). Under CFG
            # the uncond full pass shares its down+mid computation with the
            # tap, so one "with_eps" call yields both eps_uncond and the tap
            # — mathematically identical to the reference's separate
            # encoder-half + batch-doubled full pass, one encoder-half
            # cheaper per step.
            if do_cfg:
                (eps_u, tap), c1 = unet_apply(
                    latents_in, t_b, uncond_b,
                    return_encoder_outputs="with_eps")
            else:
                tap, c1 = unet_apply(latents_in, t_b, uncond_b,
                                     return_encoder_outputs=True)
            unet_feats = pool_encoder_features(tap)
            domain_embed = modules.e4t_encoder.apply(
                {"params": e4t_params}, clip_feats, unet_feats,
                method=E4TEncoder.fuse)
            word = class_embed[None] + domain_embed_scale * domain_embed
            embeds = jnp.broadcast_to(
                inputs_embeds, (bsz, *inputs_embeds.shape[1:]))
            embeds = embeds.at[jnp.arange(bsz), placeholder_idx].set(
                word.astype(embeds.dtype))
            cond_states, _ = modules.text_encoder.apply(
                {"params": text_params}, inputs_embeds=embeds)

            eps_c, c2 = unet_apply(latents_in, t_b,
                                   cond_states.astype(uncond_b.dtype))
            if do_cfg:
                eps = eps_u + guidance_scale * (eps_c - eps_u)
            else:
                eps = eps_c
            if collect_calib:
                # c1 is PARTIAL in the non-CFG case (the tap call
                # early-exits after the mid block); c2 is always total
                amax = _tree_max_into(_tree_max_into(amax, c2), c1)
            noise = (jax.random.normal(jax.random.fold_in(noise_rng, i),
                                       latents.shape, latents.dtype)
                     if stochastic else None)
            state, latents = scheduler.step(state, i, eps, latents,
                                            noise=noise, **step_kwargs)
            next_carry = ((state, latents, amax) if collect_calib
                          else (state, latents))
            return next_carry, (latents if collect_traj else None)

        final, ys = jax.lax.scan(body, carry0, jnp.arange(len(timesteps)))
        if collect_calib:
            _, latents, amax = final
            return latents, amax
        _, latents = final
        return latents, (ys if collect_traj else None)

    return run_loop


def _static_exclude_for(latents, act_pc: bool = False) -> Optional[tuple]:
    """Default for which UNet sites keep DYNAMIC activation scales under
    static-act int8 (quant.UNET_STATIC_EXCLUDE rationale): ALL serving
    regimes get the quality exclusions.

    History: round 4 measured the exclusions latency-hostile at batch-1
    512px (0.519 vs 0.944 img/s all-static) and batch-2 1024px (0.143
    vs 0.180) and made this regime-aware (exclusions only at batch >= 4
    / 512px). Round-5 re-measurement on a healthy relay OVERTURNED
    those rows: batch-1 512px exclusions 0.9422 img/s (== 0.944
    all-static, noise), DPM++-20 batch-1 2.1984 (fastest int8 config
    measured, beating static_pc 2.1476 and bf16 2.0839). The round-4
    latency rows were degraded-window artifacts (CLAUDE.md
    "Environment degradation mode" was active that session). The
    ~7 excluded sites' abs-max reductions fuse into the surrounding
    ops at every measured batch/resolution; exclusions are free
    everywhere, so their near-dynamic quality bound (DDIM-50 rel-L2
    0.0570, DPM++-20 0.0691 vs 0.1057/0.2380 all-static) is a free
    win everywhere. docs/KERNELS.md has the full story.

    E4T_INT8_STATIC_EXCLUDE (set, possibly empty) overrides — returns
    None so quantize_params reads it. act_pc (the explicit --int8_pc_act
    flavor) serves every site on its per-channel static scale: the
    measured static_pc bounds (KERNELS.md table) are for that exact
    config, and mixing dynamic sites into it would re-measure as a new
    flavor. Shapes are static at trace time, so this costs nothing in
    the jit.
    """
    if "E4T_INT8_STATIC_EXCLUDE" in _os.environ:
        return None
    if act_pc:
        return ()
    from e4t_diffusion_tpu.ops.quant import UNET_STATIC_EXCLUDE

    return UNET_STATIC_EXCLUDE


def _serving_int8_mode(int8, batch: int, height: int, width: int):
    """Serving default for the static-int8 FLAVOR. ``int8="static"``
    now serves per-tensor static + the dynamic-scale quality exclusions
    in EVERY regime (``_static_exclude_for``): round-5 re-measurement
    overturned the round-4 rows that made the exclusions look
    latency-hostile at small batch / hi-res (see _static_exclude_for),
    so the regime-aware upgrade to ``"static_pc"`` that round 5
    introduced for those regimes is retired the same day — exclusions
    dominate static_pc on both axes wherever both were measured
    (batch-1 512px DDIM-50: 0.9422 vs 0.943 img/s with bound 0.0570 vs
    0.0970; batch-1 DPM++-20: 2.1984 vs 2.1476 with 0.0691 vs 0.1827).

    ``static_pc`` remains an explicit flavor (--int8_pc_act /
    E4T_INT8_ACT_PC / E4T_BENCH_INT8=static_pc) — measured bounds in
    docs/KERNELS.md; it is the better ALL-STATIC config (no dynamic
    reductions anywhere, −23% DPM++ error vs per-tensor all-static)
    for deployments that pin E4T_INT8_STATIC_EXCLUDE= empty.

    The batch/height/width arguments are kept so any future
    regime-dependent flavor choice lands here again with its call
    sites already wired.
    """
    del batch, height, width  # no measured regime dependence (round 5)
    if int8 != "static":
        return int8
    if "E4T_INT8_ACT_PC" in _os.environ:
        from e4t_diffusion_tpu.ops.quant import env_truthy

        return "static_pc" if env_truthy("E4T_INT8_ACT_PC") else "static"
    return int8


def make_sample_fn(modules: E4TModules, scheduler, num_inference_steps: int,
                   guidance_scale: float, domain_embed_scale: float,
                   return_latents: bool = False, eta: float = 0.0,
                   tp_mesh=None, int8: Union[bool, str] = False,
                   int8_aux: Union[bool, str] = False,
                   int8_attn: Union[bool, str] = False,
                   lora_scale: Optional[float] = None):
    """Build the jit-compiled end-to-end sampling function.

    Static: modules, scheduler, step count, guidance, embed scale.
    Traced: all params, latents, pixel values, prompt embeddings.
    ``tp_mesh``: a (dp, tp) mesh for parallel serving — UNet params
    sharded via parallel.mesh.tensor_parallel_specs; flash attention
    runs head-sharded under shard_map
    (ops/attention.head_sharded_attention).
    ``int8``: quantize the offset-folded UNet kernels to int8 once per
    run and serve the UNet matmul/conv path on the int8 MXU
    (ops/quant.py); composes with dp and tp meshes — quantization runs
    INSIDE the jit on the already-sharded folded kernels, and XLA
    partitions the per-channel scale reductions exactly (column-sharded
    kernels reduce shard-locally; row-sharded ones all-reduce-max over
    the input axis). ``int8="static"`` additionally uses calibrated
    static activation scales — the jitted fn then takes an extra
    trailing argument, the ``act_amax`` tree from
    ``make_calibration_fn`` — and skips the per-call activation abs-max
    reductions (~3 ms/UNet-fwd measured). ``int8="static_pc"``: same
    trailing argument and zero-reduction serving cost, but PER-CHANNEL
    calibrated activation scales, folded into the kernels' contraction
    axis before weight quantization (quant.quantize_params act_pc) —
    channel outliers keep their own range, so no static-exclude sites
    are needed in any regime (quality: scripts/int8_quality.py
    static_pc rows).
    ``int8_aux``: also quantize the once-per-run auxiliary towers — the
    ViT-H image encoder and the VAE decode path (decoder +
    post_quant_conv; the pixel-head conv_in/conv_out stay fp via
    quant.DEFAULT_EXCLUDE) — with dynamic activation scales. These sites
    run once per sampling run (ViT 36.6 ms, VAE decode 141 ms measured),
    so no calibration is needed: the per-call abs-max cost is amortized
    over the whole run, unlike the in-scan UNet where it costs
    ~3 ms/fwd. Independent of ``int8`` (the UNet knob).
    ``int8_aux="static"``: the aux towers use calibrated static
    activation scales too — the jitted fn takes a further trailing
    argument, the tree from ``make_aux_calibration_fn`` — removing the
    per-site abs-max reductions from the towers (the VAE decoder's are
    full reads of up-to-512x512 activations; the ViT's ~130 sites are
    latency-bound). This is the per-run-latency knob (round 4).
    ``int8_attn``: run the flash-attention inner matmuls (QK^T, and p@v
    with mode "qkpv") on the int8 MXU too
    (ops/attention.int8_flash_attention) — True is mode "qk". Covers the
    flash-dispatched self-attention sites (4096/d40, 1024/d80 at 512px);
    einsum sites stay full precision. Independent of ``int8`` (which
    quantizes the matmul/conv kernels AROUND attention).
    ``lora_scale``: when set, the jitted fn takes a LoRA bank
    (models/lora.py) as a further trailing argument, folded into the
    effective kernels after the offsets (kernel*(1+O) + scale*down@up —
    the reference's LoRACrossAttnProcessor math, zero cost in the scan).
    Trailing-argument order: (act_amax?, aux_amax?, lora_bank?).
    """
    static_act = int8 in ("static", "static_pc")
    aux_static = int8_aux == "static"
    if int8:
        from e4t_diffusion_tpu.models.unet import _fused_qkv_enabled

        assert not _fused_qkv_enabled(), \
            "E4T_FUSED_QKV reads raw kernel leaves"
    run_loop = _build_denoise_loop(modules, scheduler, num_inference_steps,
                                   guidance_scale, domain_embed_scale, eta,
                                   collect_calib=False)

    @jax.jit
    def sample(unet_params, offsets, vae_params, text_params, e4t_params,
               latents, pixel_values, inputs_embeds, placeholder_idx,
               uncond_ids, class_embed, noise_rng, *extra):
        import contextlib

        from e4t_diffusion_tpu.ops.attention import head_sharded_attention

        with (head_sharded_attention(tp_mesh) if tp_mesh is not None
              else contextlib.nullcontext()):
            return _sample_body(
                unet_params, offsets, vae_params, text_params, e4t_params,
                latents, pixel_values, inputs_embeds, placeholder_idx,
                uncond_ids, class_embed, noise_rng, extra)

    def _sample_body(unet_params, offsets, vae_params, text_params,
                     e4t_params, latents, pixel_values, inputs_embeds,
                     placeholder_idx, uncond_ids, class_embed, noise_rng,
                     extra):
        n_expected = (int(static_act) + int(aux_static)
                      + int(lora_scale is not None))
        assert len(extra) == n_expected, \
            f"expected {n_expected} trailing args (act_amax? aux_amax? " \
            f"lora_bank? per make_sample_fn flags), got {len(extra)}"
        it = iter(extra)
        act_amax = next(it) if static_act else None
        aux_amax = next(it) if aux_static else None
        lora_bank = next(it) if lora_scale is not None else None
        if int8_aux:
            from e4t_diffusion_tpu.ops.quant import (DEFAULT_EXCLUDE,
                                                     quantize_params)

            aux = aux_amax or {}
            e4t_params = {
                **e4t_params,
                "clip_vision": quantize_params(
                    e4t_params["clip_vision"],
                    act_amax=aux.get("e4t", {}).get("clip_vision")),
            }
            vae_params = quantize_params(
                vae_params, act_amax=aux.get("vae"),
                exclude=DEFAULT_EXCLUDE + ("encoder", "quant_conv"))
        params_eff = wo.fold_offset_bank(unet_params, offsets)
        if lora_bank is not None:
            from e4t_diffusion_tpu.models import lora as lora_mod

            params_eff = lora_mod.fold_lora_bank(params_eff, lora_bank,
                                                 lora_scale)
        if int8:
            # quantize the folded kernels ONCE per run, outside the scan
            from e4t_diffusion_tpu.ops.quant import quantize_params

            params_eff = quantize_params(
                params_eff, act_amax=act_amax,
                act_pc=(int8 == "static_pc"),
                # quality exclusions in every regime (none under the
                # per-channel flavor); env overrides for sweeps
                static_exclude=_static_exclude_for(
                    latents, act_pc=(int8 == "static_pc")))

        latents, _ = run_loop(params_eff, text_params, e4t_params, latents,
                              pixel_values, inputs_embeds, placeholder_idx,
                              uncond_ids, class_embed, noise_rng)
        if return_latents:
            return latents
        scaling = modules.vae.config.scaling_factor
        images = modules.vae.apply({"params": vae_params},
                                   latents / scaling,
                                   method=AutoencoderKL.decode)
        images = jnp.clip(images / 2.0 + 0.5, 0.0, 1.0)
        return images

    if not int8_attn:
        return sample
    from e4t_diffusion_tpu.ops.attention import int8_flash_attention

    attn_mode = "qk" if int8_attn is True else int8_attn

    def run(*args):
        # trace-time flag (like quant.calibration_trace): wrapping every
        # call keeps retraces inside the context
        with int8_flash_attention(attn_mode):
            return sample(*args)

    return run


@jax.jit
def _to_uint8(images):
    """PNG bytes ON DEVICE (a tiny separate program, so np/pil output
    types share ONE compiled sampler): the host fetch is 4x smaller
    than f32, with the same rounding as the old host-side path."""
    return jnp.round(images.astype(jnp.float32) * 255.0).astype(jnp.uint8)


def make_calibration_fn(modules: E4TModules, scheduler, num_calib_steps: int,
                        guidance_scale: float, domain_embed_scale: float,
                        eta: float = 0.0,
                        lora_scale: Optional[float] = None,
                        tp_mesh=None,
                        return_final_latents: bool = False):
    """Activation-range calibration for static-act int8 serving
    (ops/quant.py): a jitted full-precision ``num_calib_steps`` sampling
    run built from the SAME loop body as make_sample_fn
    (_build_denoise_loop, collect_calib=True). Returns the amax tree to
    pass as the trailing argument of an ``int8="static"`` sample fn.

    A short trajectory (8 steps default) spans the full sigma range, so
    the recorded ranges cover the 50-step serving run; activations that
    still exceed them clip (margin knob: E4T_INT8_CALIB_HEADROOM, see
    quantize_params). ``tp_mesh``: pass the serving mesh so attention
    runs under the same shard_map specs as serving (required for
    dp-sharded calibration inputs). ``return_final_latents``: also
    return the run's final latents — representative VAE-decode inputs
    for the aux-tower calibration (make_aux_calibration_fn), which would
    otherwise only see initial noise."""
    run_loop = _build_denoise_loop(modules, scheduler, num_calib_steps,
                                   guidance_scale, domain_embed_scale, eta,
                                   collect_calib=True)

    @jax.jit
    def calibrate(unet_params, offsets, text_params, e4t_params,
                  latents, pixel_values, inputs_embeds, placeholder_idx,
                  uncond_ids, class_embed, noise_rng, *extra):
        import contextlib

        from e4t_diffusion_tpu.ops.attention import head_sharded_attention

        assert len(extra) == int(lora_scale is not None), \
            "pass the LoRA bank iff lora_scale is set"
        params_eff = wo.fold_offset_bank(unet_params, offsets)
        if lora_scale is not None:
            from e4t_diffusion_tpu.models import lora as lora_mod

            # calibrate on the same effective kernels serving will use
            params_eff = lora_mod.fold_lora_bank(params_eff, extra[0],
                                                 lora_scale)
        with (head_sharded_attention(tp_mesh) if tp_mesh is not None
              else contextlib.nullcontext()):
            final, amax = run_loop(params_eff, text_params, e4t_params,
                                   latents, pixel_values, inputs_embeds,
                                   placeholder_idx, uncond_ids, class_embed,
                                   noise_rng)
        return (amax, final) if return_final_latents else amax

    def run(*args):
        from e4t_diffusion_tpu.ops import quant

        # the flag is read at TRACE time; wrapping every call keeps any
        # retrace inside the context (normal programs stay byte-identical
        # — the persistent compile cache is unaffected by calibration)
        with quant.calibration_trace():
            return calibrate(*args)

    return run


def make_aux_calibration_fn(modules: E4TModules):
    """Activation-range calibration for the auxiliary towers
    (``int8_aux="static"``): one ViT-H encode + one VAE decode with the
    quant drop-ins sowing their per-site abs-max. Returns a jitted
    ``fn(e4t_params, vae_params, pixel_values, latents) -> {"e4t": tree,
    "vae": tree}`` whose result is the ``aux_amax`` trailing argument of
    make_sample_fn.

    ``latents``: representative decode inputs. Initial-noise latents are
    fine — SD's variance-preserving schedule keeps denoised latents at
    the same scale (the int8 trajectory study measures final-latent
    norms within ~10% of the prior's), and E4T_INT8_CALIB_HEADROOM adds
    margin on top.
    """

    @jax.jit
    def calibrate(e4t_params, vae_params, pixel_values, latents):
        _, v_vit = modules.e4t_encoder.apply(
            {"params": e4t_params}, pixel_values,
            method=E4TEncoder.encode_image, mutable=["calib"])
        scaling = modules.vae.config.scaling_factor
        _, v_vae = modules.vae.apply(
            {"params": vae_params}, latents / scaling,
            method=AutoencoderKL.decode, mutable=["calib"])
        return {"e4t": v_vit["calib"], "vae": v_vae["calib"]}

    def run(*args):
        from e4t_diffusion_tpu.ops import quant

        with quant.calibration_trace():
            return calibrate(*args)

    return run


def make_trajectory_fn(modules: E4TModules, scheduler,
                       num_inference_steps: int, guidance_scale: float,
                       domain_embed_scale: float, eta: float = 0.0,
                       int8: Union[bool, str] = False,
                       int8_attn: Union[bool, str] = False):
    """Per-step latent capture: the SAME denoise loop as make_sample_fn
    (shared _build_denoise_loop) but the scan stacks every post-step
    latent. Returns a jitted fn with make_sample_fn's argument order
    (plus the trailing ``act_amax`` when ``int8="static"``) that yields
    ``(num_steps, B, 4, h, w)`` latents — the record behind the
    int8-vs-bf16 divergence study (scripts/int8_quality.py), mirroring
    the quality question the reference leaves to its fp16 autocast
    serving path (/root/reference/inference.py:139-149)."""
    static_act = int8 in ("static", "static_pc")
    run_loop = _build_denoise_loop(modules, scheduler, num_inference_steps,
                                   guidance_scale, domain_embed_scale, eta,
                                   collect_calib=False, collect_traj=True)

    @jax.jit
    def trajectory(unet_params, offsets, text_params, e4t_params,
                   latents, pixel_values, inputs_embeds, placeholder_idx,
                   uncond_ids, class_embed, noise_rng, *extra):
        assert len(extra) == int(static_act), \
            "pass act_amax iff int8='static'"
        params_eff = wo.fold_offset_bank(unet_params, offsets)
        if int8:
            from e4t_diffusion_tpu.ops.quant import quantize_params

            params_eff = quantize_params(
                params_eff, act_amax=extra[0] if static_act else None,
                act_pc=(int8 == "static_pc"),
                static_exclude=_static_exclude_for(
                    latents, act_pc=(int8 == "static_pc")))
        _, traj = run_loop(params_eff, text_params, e4t_params, latents,
                           pixel_values, inputs_embeds, placeholder_idx,
                           uncond_ids, class_embed, noise_rng)
        return traj

    if not int8_attn:
        return trajectory
    from e4t_diffusion_tpu.ops.attention import int8_flash_attention

    attn_mode = "qk" if int8_attn is True else int8_attn

    def run(*args):
        with int8_flash_attention(attn_mode):
            return trajectory(*args)

    return run


class StableDiffusionE4TPipeline:
    """Host-side orchestration: tokenize, seed, call the jitted sampler.

    Mirrors the reference pipeline's construction contract
    (/root/reference/e4t/pipeline_stable_diffusion_e4t.py:30-62): registers
    the placeholder token, resolves the domain-class embedding, caches
    domain_embed_scale from the e4t config.
    """

    def __init__(self, modules: E4TModules, params: dict, tokenizer,
                 e4t_config, scheduler=None,
                 already_added_placeholder_token: bool = False,
                 tp_mesh=None, int8: Union[bool, str] = False,
                 int8_aux: Union[bool, str] = False,
                 int8_attn: Union[bool, str] = False,
                 lora_bank=None, lora_scale: float = 1.0,
                 dp_shard_batch: bool = False, act_scales=None):
        self.modules = modules
        self.params = params  # {"unet","offsets","vae","text","e4t"}
        self.tp_mesh = tp_mesh  # (dp, tp) mesh for tensor-parallel serving
        # multi-chip data-parallel serving: shard the sampling batch over
        # the mesh's dp axis (params replicated / tp-sharded; flash
        # attention's shard_map batch specs are dp-aware). Requires
        # tp_mesh (a (dp, tp) mesh — tp may be 1) and batch % dp == 0.
        self.dp_shard_batch = dp_shard_batch and tp_mesh is not None
        # int8 UNet serving (ops/quant.py): False | True (dynamic act
        # scales) | "static" (activation ranges calibrated once, on the
        # first __call__, then reused for every later prompt).
        # ``act_scales``: a pre-recorded amax tree
        # (quant.load_act_scales) — deployments that share it quantize
        # identically instead of each re-calibrating.
        self.int8 = int8
        # int8_aux: also serve the ViT tower + VAE decode path int8
        # (False | True: dynamic act scales | "static": calibrated once
        # on the first __call__; see make_sample_fn)
        self.int8_aux = int8_aux
        self._aux_amax = None
        # int8_attn: flash-attention inner matmuls on the int8 MXU
        # (False | True=="qk" | "qkpv"; ops/attention.int8_flash_attention)
        self.int8_attn = int8_attn
        self._act_amax = act_scales
        # LoRA adapters (models/lora.py), folded after the offsets
        self.lora_bank = lora_bank
        self.lora_scale = lora_scale if lora_bank is not None else None
        self.tokenizer = tokenizer
        self.e4t_config = e4t_config
        self.scheduler = scheduler or DDIMScheduler(NoiseScheduleConfig())
        if not already_added_placeholder_token:
            n = tokenizer.add_tokens(e4t_config.placeholder_token)
            if n == 0:
                raise ValueError(
                    f"The tokenizer already contains the token "
                    f"{e4t_config.placeholder_token}.")
        self.placeholder_token = e4t_config.placeholder_token
        self.placeholder_token_id = tokenizer.convert_tokens_to_ids(
            e4t_config.placeholder_token)
        class_ids = tokenizer(e4t_config.domain_class_token,
                              add_special_tokens=False,
                              padding=None)["input_ids"][0]
        assert len(class_ids) == 1, "domain_class_token must be 1 token"
        self.class_token_id = class_ids[0]
        self.domain_embed_scale = e4t_config.domain_embed_scale
        self._fn_cache = {}

    def _prepare_prompt(self, prompt: str):
        tok = self.tokenizer
        input_ids = tok(prompt, padding="max_length", truncation=True,
                        max_length=tok.model_max_length)["input_ids"][0]
        try:
            idx = input_ids.index(self.placeholder_token_id)
        except ValueError:
            raise ValueError(
                f"Your prompt may not have the placeholder_token="
                f"{self.placeholder_token}")
        uncond_ids = tok("", padding="max_length", truncation=True,
                         max_length=tok.model_max_length)["input_ids"][0]
        return np.asarray(input_ids), idx, np.asarray(uncond_ids)

    def __call__(self, prompt: Union[str, Sequence[str]], image,
                 num_inference_steps: int = 50,
                 guidance_scale: float = 7.5,
                 negative_prompt: Optional[str] = None,
                 num_images_per_prompt: int = 1,
                 eta: float = 0.0,
                 height: Optional[int] = None,
                 width: Optional[int] = None,
                 seed: Optional[int] = None,
                 latents: Optional[np.ndarray] = None,
                 domain_embed_scale: Optional[float] = None,
                 scheduler_type: Optional[str] = None,
                 output_type: str = "np"):
        """``prompt`` may be a list of DISTINCT prompts (beyond reference
        parity): they are batched into ONE sampling run with per-sample
        prompt embeddings and placeholder indices — N prompts cost one
        batch-N run, the batch-8 serving sweet spot, instead of N runs.
        Per-sample compute is batch-independent (per-sample GroupNorm/
        attention), and each prompt's block gets the SAME seed-derived
        initial noise its standalone run would draw, so for
        deterministic schedulers batched output == per-prompt runs
        (tests/test_pipeline.py). Stochastic schedulers (euler_ancestral
        / DDPM / eta>0) fold per-batch noise indices and so deviate from
        standalone runs — seed-reproducible, just not run-splittable."""
        # reference parity (/root/reference/e4t/pipeline_stable_diffusion_e4t.py:151)
        assert negative_prompt is None, "negative_prompt is not supported"
        modules = self.modules
        ucfg = modules.unet.config
        vae_scale = 2 ** (len(modules.vae.config.block_out_channels) - 1)
        height = height or ucfg.sample_size * vae_scale
        width = width or ucfg.sample_size * vae_scale
        des = (self.domain_embed_scale if domain_embed_scale is None
               else domain_embed_scale)
        scheduler = self.scheduler
        if scheduler_type is not None:
            scheduler = SCHEDULER_MAPPING[scheduler_type](NoiseScheduleConfig())

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        prepared = [self._prepare_prompt(p) for p in prompts]
        uncond_ids = prepared[0][2]
        # (n_prompts, L) ids and (n_prompts,) placeholder positions,
        # repeated per image; single-prompt runs keep the (1, L) layout
        # so their compiled programs are unchanged
        input_ids = np.stack([ids for ids, _, _ in prepared])
        ph_idx_np = np.repeat([i for _, i, _ in prepared],
                              num_images_per_prompt)
        pixel = preprocess_image(image)

        b = len(prompts) * num_images_per_prompt
        if latents is None:
            rng = jax.random.PRNGKey(0 if seed is None else seed)
            shape1 = (num_images_per_prompt, ucfg.in_channels,
                      height // vae_scale, width // vae_scale)
            if len(prompts) > 1:
                # same per-prompt noise as a standalone run with this
                # seed (a standalone call draws the identical (per,...)
                # normal from the same key), tiled across prompts
                latents = jnp.tile(jax.random.normal(rng, shape1,
                                                     jnp.float32),
                                   (len(prompts), 1, 1, 1))
            else:
                latents = jax.random.normal(rng, shape1, jnp.float32)
        latents = jnp.asarray(latents)

        # resolve the static-int8 flavor at call time (the calibration
        # tree carries both per-tensor and per-channel ranges, so one
        # pipeline can serve either). The resolved mode AND the
        # trace-time exclusion env must be part of the cache key:
        # E4T_INT8_ACT_PC / E4T_INT8_STATIC_EXCLUDE are documented
        # sweep knobs that may flip between calls on a live pipeline,
        # and a stale cached program would silently serve the old
        # flavor (round-5 review finding).
        int8_mode = _serving_int8_mode(self.int8, b, height, width)
        key = (scheduler.__class__.__name__, num_inference_steps,
               float(guidance_scale), float(des), b, float(eta),
               height, width, output_type == "latent", self.lora_scale,
               int8_mode,
               _os.environ.get("E4T_INT8_STATIC_EXCLUDE"))
        if key not in self._fn_cache:
            self._fn_cache[key] = make_sample_fn(
                modules, scheduler, num_inference_steps, guidance_scale, des,
                return_latents=(output_type == "latent"), eta=eta,
                tp_mesh=self.tp_mesh, int8=int8_mode,
                int8_aux=self.int8_aux, int8_attn=self.int8_attn,
                lora_scale=self.lora_scale)
        fn = self._fn_cache[key]

        text_params = self.params["text"]
        if len(prompts) > 1:  # per-sample embeddings, repeated per image
            input_ids = np.repeat(input_ids, num_images_per_prompt, axis=0)
        inputs_embeds = embed_tokens(text_params, jnp.asarray(input_ids))
        class_embed = embed_tokens(
            text_params, jnp.asarray([self.class_token_id]))[0]

        noise_rng = jax.random.PRNGKey(
            (0 if seed is None else seed) ^ 0x5DEECE66D)
        ph_idx_dev = jnp.asarray(ph_idx_np, jnp.int32)
        if self.dp_shard_batch:
            from e4t_diffusion_tpu.parallel import mesh as pmesh

            dp = self.tp_mesh.shape[pmesh.DATA_AXIS]
            if b % dp != 0:
                raise ValueError(
                    f"data-parallel serving needs batch ({b}) divisible "
                    f"by the dp mesh axis ({dp}); adjust "
                    f"num_images_per_prompt / the prompt batch")
            bs = pmesh.batch_sharding(self.tp_mesh)
            latents = jax.device_put(latents, bs)
            ph_idx_dev = jax.device_put(ph_idx_dev, bs)
            if inputs_embeds.shape[0] == b:  # per-sample prompt embeds
                inputs_embeds = jax.device_put(inputs_embeds, bs)
        common = (latents, jnp.asarray(pixel), inputs_embeds,
                  ph_idx_dev,
                  jnp.asarray(uncond_ids)[None], class_embed, noise_rng)
        lora_extra = (self.lora_bank,) if self.lora_bank is not None else ()
        extra = ()
        calib_latents = latents  # best available VAE-decode calib input
        if self.int8 in ("static", "static_pc"):
            if self._act_amax is None:
                import os

                calib_steps = int(
                    os.environ.get("E4T_INT8_CALIB_STEPS", "8"))
                want_final = (self.int8_aux == "static"
                              and self._aux_amax is None)
                cfn = make_calibration_fn(modules, scheduler, calib_steps,
                                          guidance_scale, des, eta=eta,
                                          lora_scale=self.lora_scale,
                                          tp_mesh=self.tp_mesh,
                                          return_final_latents=want_final)
                out = cfn(
                    self.params["unet"], self.params["offsets"],
                    text_params, self.params["e4t"], *common, *lora_extra)
                if want_final:
                    # denoised latents from the calibration run: the
                    # representative VAE-decode range (initial noise
                    # under-covers it — CFG-amplified latents clip)
                    self._act_amax, calib_latents = out
                else:
                    self._act_amax = out
            extra = (self._act_amax,)
        if self.int8_aux == "static":
            if self._aux_amax is None:
                acfn = make_aux_calibration_fn(modules)
                self._aux_amax = acfn(self.params["e4t"],
                                      self.params["vae"],
                                      jnp.asarray(pixel), calib_latents)
            extra = (*extra, self._aux_amax)
        images = fn(self.params["unet"], self.params["offsets"],
                    self.params["vae"], text_params, self.params["e4t"],
                    *common, *extra, *lora_extra)
        if output_type == "pil":  # round to uint8 on device (4x fetch)
            from PIL import Image

            arr = np.asarray(jax.device_get(_to_uint8(images)))
            return [Image.fromarray(a) for a in arr.transpose(0, 2, 3, 1)]
        return np.asarray(jax.device_get(images))
