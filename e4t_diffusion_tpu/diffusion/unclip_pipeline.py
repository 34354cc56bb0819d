"""Stable-unCLIP image-variation pipeline (img2img embeds flavor), TPU-native.

Replaces the reference's use of diffusers ``StableUnCLIPImg2ImgPipeline``
(/root/reference/scripts/image_variation_augmentation.py:95-99) for the
offline image-variation data augmentation that built the published
FFHQ+CelebA-HQ model (reference README.md:23).

Flow (diffusers pipeline_stable_unclip_img2img semantics):

1. CLIP-preprocess the input image (224px bicubic + CLIP normalize) and
   encode with the ViT-H image encoder -> 1024-dim ``image_embeds``.
2. Noise-augment the embeds at ``noise_level`` and append the noise-level
   embedding -> 2048-dim class conditioning (models/unclip.py); under CFG
   the uncond branch uses zeros.
3. Text-encode the prompt ("" for pure variations) with the SD2 OpenCLIP-H
   text encoder; CFG pairs it with the "" encoding.
4. Denoise 96x96 latents with the SD2-unCLIP UNet (v-prediction,
   DPM-Solver++ by default) in ONE jitted lax.scan — the conditioning is
   hoisted: image encoder, noise aug, and text encoder all run once, not
   per step (they are step-independent, unlike the E4T loop).
5. VAE-decode to 768px images.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from e4t_diffusion_tpu.models.unet import UNet2DConditionModel, UNetConfig
from e4t_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from e4t_diffusion_tpu.models.clip_text import CLIPTextModel, CLIPTextConfig
from e4t_diffusion_tpu.models.unclip import (
    CLIPVisionModelWithProjection, CLIPVisionProjectionConfig,
    StableUnCLIPImageNormalizer, noise_image_embeddings,
    UNCLIP_NOISE_AUG_SCHEDULE)
from e4t_diffusion_tpu.models.e4t_encoder_legacy import CLIPVisionConfig
from e4t_diffusion_tpu.ops.resize import clip_preprocess
from e4t_diffusion_tpu.diffusion.schedulers import (
    NoiseScheduleConfig, DPMSolverMultistepScheduler, SCHEDULER_MAPPING)


@dataclasses.dataclass
class UnCLIPModules:
    """Module bundle for the Stable-unCLIP img2img stack."""
    unet: UNet2DConditionModel
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    image_encoder: CLIPVisionModelWithProjection
    noise_aug_schedule: NoiseScheduleConfig = UNCLIP_NOISE_AUG_SCHEDULE

    @classmethod
    def create(cls, unet_config: UNetConfig = None,
               vae_config: VAEConfig = None,
               text_config: CLIPTextConfig = None,
               image_config: CLIPVisionProjectionConfig = None,
               dtype=jnp.float32) -> "UnCLIPModules":
        return cls(
            unet=UNet2DConditionModel(unet_config or UNetConfig.sd2_unclip(),
                                      dtype=dtype),
            vae=AutoencoderKL(vae_config or VAEConfig(sample_size=768),
                              dtype=dtype),
            text_encoder=CLIPTextModel(text_config or CLIPTextConfig.sd2(),
                                       dtype=dtype),
            image_encoder=CLIPVisionModelWithProjection(
                image_config or CLIPVisionProjectionConfig(), dtype=dtype),
        )

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "UnCLIPModules":
        """Matched tiny configs: projection_dim feeds the UNet class
        projection (2 * projection_dim input)."""
        icfg = CLIPVisionProjectionConfig.tiny()
        ucfg = dataclasses.replace(
            UNetConfig.tiny(cross_attention_dim=32),
            use_linear_projection=True,
            class_embed_type="projection",
            projection_class_embeddings_input_dim=2 * icfg.projection_dim,
        )
        return cls(
            unet=UNet2DConditionModel(ucfg, dtype=dtype),
            vae=AutoencoderKL(VAEConfig.tiny(), dtype=dtype),
            text_encoder=CLIPTextModel(CLIPTextConfig.tiny(), dtype=dtype),
            image_encoder=CLIPVisionModelWithProjection(icfg, dtype=dtype),
        )


def make_unclip_sample_fn(modules: UnCLIPModules, scheduler,
                          num_inference_steps: int, guidance_scale: float,
                          return_latents: bool = False):
    """Build the jitted Stable-unCLIP img2img sampler.

    Traced args: params dict, latents, preprocessed CLIP pixels, prompt
    ids, uncond ids, noise_level (B,), aug noise rng.
    """
    do_cfg = guidance_scale > 1.0
    state0 = scheduler.init(num_inference_steps)
    timesteps = state0["timesteps"]
    stochastic = getattr(scheduler, "stochastic", False)

    @jax.jit
    def sample(params, latents, clip_pixels, prompt_ids, uncond_ids,
               noise_level, rng):
        # ---- hoisted conditioning (step-independent) ------------------
        bsz = latents.shape[0]
        image_embeds = modules.image_encoder.apply(
            {"params": params["image_encoder"]}, clip_pixels)
        image_embeds = jnp.broadcast_to(
            image_embeds, (bsz, image_embeds.shape[-1]))
        aug_noise = jax.random.normal(
            rng, image_embeds.shape, jnp.float32)
        class_cond = noise_image_embeddings(
            image_embeds, noise_level, aug_noise,
            params["image_normalizer"],
            schedule=modules.noise_aug_schedule)

        prompt_states, _ = modules.text_encoder.apply(
            {"params": params["text"]}, prompt_ids)
        prompt_states = jnp.broadcast_to(
            prompt_states, (bsz, *prompt_states.shape[1:]))
        if do_cfg:
            uncond_states, _ = modules.text_encoder.apply(
                {"params": params["text"]}, uncond_ids)
            uncond_states = jnp.broadcast_to(
                uncond_states, (bsz, *uncond_states.shape[1:]))
            # uncond image conditioning = zeros (diffusers _encode_image)
            context = jnp.concatenate([uncond_states, prompt_states], axis=0)
            class_labels = jnp.concatenate(
                [jnp.zeros_like(class_cond), class_cond], axis=0)
        else:
            context = prompt_states
            class_labels = class_cond
        context = context.astype(latents.dtype)

        if hasattr(scheduler, "init_noise_sigma"):
            latents = latents * scheduler.init_noise_sigma(state0).astype(
                latents.dtype)
        state = state0
        if hasattr(scheduler, "init_carry"):
            state = scheduler.init_carry(state0, latents.shape, latents.dtype)

        def body(carry, i):
            state, latents = carry
            t = timesteps[i]
            latents_in = scheduler.scale_model_input(state, i, latents)
            if do_cfg:
                latents_in = jnp.concatenate([latents_in, latents_in], axis=0)
            t_b = jnp.broadcast_to(t, (latents_in.shape[0],))
            pred = modules.unet.apply(
                {"params": params["unet"]}, latents_in, t_b, context,
                class_labels=class_labels)
            if do_cfg:
                pred_u, pred_c = jnp.split(pred, 2, axis=0)
                pred = pred_u + guidance_scale * (pred_c - pred_u)
            noise = (jax.random.normal(jax.random.fold_in(rng, i + 1),
                                       latents.shape, latents.dtype)
                     if stochastic else None)
            state, latents = scheduler.step(state, i, pred, latents,
                                            noise=noise)
            return (state, latents), None

        (state, latents), _ = jax.lax.scan(
            body, (state, latents), jnp.arange(len(timesteps)))

        if return_latents:
            return latents
        scaling = modules.vae.config.scaling_factor
        images = modules.vae.apply({"params": params["vae"]},
                                   latents / scaling,
                                   method=AutoencoderKL.decode)
        return jnp.clip(images / 2.0 + 0.5, 0.0, 1.0)

    return sample


class StableUnCLIPImg2ImgPipeline:
    """Host-side orchestration: tokenize, preprocess, call the sampler.

    params layout: {"unet", "vae", "text", "image_encoder",
    "image_normalizer"}.
    """

    def __init__(self, modules: UnCLIPModules, params: dict, tokenizer,
                 scheduler=None,
                 schedule_config: Optional[NoiseScheduleConfig] = None):
        self.modules = modules
        self.params = params
        self.tokenizer = tokenizer
        self.scheduler = scheduler or DPMSolverMultistepScheduler(
            schedule_config or NoiseScheduleConfig(
                prediction_type="v_prediction"))
        self._fn_cache = {}

    def _tokenize(self, text: str) -> np.ndarray:
        tok = self.tokenizer
        ids = tok(text, padding="max_length", truncation=True,
                  max_length=tok.model_max_length)["input_ids"][0]
        return np.asarray(ids)

    def __call__(self, image, prompt: str = "",
                 num_inference_steps: int = 20,
                 guidance_scale: float = 10.0,
                 noise_level: int = 0,
                 num_images_per_prompt: int = 1,
                 height: Optional[int] = None,
                 width: Optional[int] = None,
                 seed: Optional[int] = None,
                 latents: Optional[np.ndarray] = None,
                 output_type: str = "pil"):
        modules = self.modules
        ucfg = modules.unet.config
        vae_scale = 2 ** (len(modules.vae.config.block_out_channels) - 1)
        height = height or ucfg.sample_size * vae_scale
        width = width or ucfg.sample_size * vae_scale

        # image -> [-1, 1] NCHW -> CLIP 224 preprocess (on device)
        arr = np.asarray(image).astype(np.float32) / 255.0
        if arr.ndim == 3:
            arr = arr[None]
        # Center-crop to square before the CLIP resize: diffusers'
        # CLIPImageProcessor resizes the shortest side then center-crops,
        # so a straight anisotropic resize of a non-square input would
        # diverge from StableUnCLIPImg2ImgPipeline preprocessing.
        ih, iw = arr.shape[1:3]
        if ih != iw:
            s = min(ih, iw)
            y0, x0 = (ih - s) // 2, (iw - s) // 2
            arr = arr[:, y0:y0 + s, x0:x0 + s]
        pixels = jnp.asarray(arr.transpose(0, 3, 1, 2) * 2.0 - 1.0)
        clip_pixels = clip_preprocess(
            pixels, modules.image_encoder.config.vision.image_size)

        b = num_images_per_prompt
        rng = jax.random.PRNGKey(0 if seed is None else seed)
        if latents is None:
            latents = jax.random.normal(
                rng, (b, ucfg.in_channels, height // vae_scale,
                      width // vae_scale), jnp.float32)
        latents = jnp.asarray(latents)

        key = (num_inference_steps, float(guidance_scale), b,
               height, width, output_type == "latent")
        if key not in self._fn_cache:
            self._fn_cache[key] = make_unclip_sample_fn(
                modules, self.scheduler, num_inference_steps, guidance_scale,
                return_latents=(output_type == "latent"))
        fn = self._fn_cache[key]

        images = fn(self.params, latents, clip_pixels,
                    jnp.asarray(self._tokenize(prompt))[None],
                    jnp.asarray(self._tokenize(""))[None],
                    jnp.full((b,), noise_level, jnp.int32),
                    jax.random.fold_in(rng, 0x51AB1E))
        images = np.asarray(jax.device_get(images))
        if output_type == "latent":
            return images
        if output_type == "pil":
            from PIL import Image

            arr = (images.transpose(0, 2, 3, 1) * 255).round().astype(np.uint8)
            return [Image.fromarray(a) for a in arr]
        return images
