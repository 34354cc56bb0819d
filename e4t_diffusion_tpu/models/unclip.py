"""Stable-unCLIP image-conditioning components, TPU-native.

The reference outsources image-variation augmentation to diffusers'
``StableUnCLIPImg2ImgPipeline``
(/root/reference/scripts/image_variation_augmentation.py:95-99, used to
build the published FFHQ+CelebA-HQ training set, reference README.md:23).
This module provides the conditioning stack for that pipeline natively:

- ``CLIPVisionModelWithProjection``: the HF-layout CLIP ViT-H image
  encoder plus the visual projection producing 1024-dim image embeds.
- ``StableUnCLIPImageNormalizer``: learned mean/std scaling applied around
  the embedding noise augmentation (diffusers
  stable_unclip_image_normalizer.StableUnCLIPImageNormalizer).
- ``noise_image_embeddings``: the DDPM noise augmentation of the image
  embedding at ``noise_level``, concatenated with the sinusoidal embedding
  of the noise level (diffusers pipeline_stable_unclip_img2img
  ``noise_image_embeddings``) — the 2048-dim vector the SD2-unCLIP UNet
  consumes through its projection class embedding.

All functions are jit-friendly: noise_level is a traced int32 array, the
schedule tables are precomputed host-side constants.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from e4t_diffusion_tpu.models.e4t_encoder_legacy import (
    CLIPVisionConfig, CLIPVisionModel)
from e4t_diffusion_tpu.models.unet import get_timestep_embedding
from e4t_diffusion_tpu.diffusion.schedulers import (
    NoiseScheduleConfig, alphas_cumprod)


@dataclasses.dataclass(frozen=True)
class CLIPVisionProjectionConfig:
    vision: CLIPVisionConfig = dataclasses.field(
        default_factory=CLIPVisionConfig.vit_h)
    projection_dim: int = 1024

    @classmethod
    def tiny(cls) -> "CLIPVisionProjectionConfig":
        return cls(vision=CLIPVisionConfig.tiny(), projection_dim=16)


class CLIPVisionModelWithProjection(nn.Module):
    """HF CLIPVisionModelWithProjection: post-layernormed CLS token through
    a bias-free projection -> ``image_embeds`` (1024-dim for ViT-H)."""
    config: CLIPVisionProjectionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision_model = CLIPVisionModel(self.config.vision,
                                            dtype=self.dtype)
        self.visual_projection = nn.Dense(self.config.projection_dim,
                                          use_bias=False, dtype=self.dtype)

    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        pooled, _ = self.vision_model(pixel_values)
        return self.visual_projection(pooled)


class StableUnCLIPImageNormalizer(nn.Module):
    """Learned mean/std of the CLIP embedding space; the noise augmentation
    runs in the normalized space (scale -> add_noise -> unscale)."""
    embedding_dim: int = 1024

    def setup(self):
        self.mean = self.param("mean", nn.initializers.zeros,
                               (self.embedding_dim,))
        self.std = self.param("std", nn.initializers.ones,
                              (self.embedding_dim,))

    def scale(self, embeds: jax.Array) -> jax.Array:
        return (embeds - self.mean) / self.std

    def unscale(self, embeds: jax.Array) -> jax.Array:
        return embeds * self.std + self.mean

    def __call__(self, embeds: jax.Array) -> jax.Array:  # pragma: no cover
        return self.scale(embeds)


# stabilityai/stable-diffusion-2-1-unclip image_noising_scheduler config
UNCLIP_NOISE_AUG_SCHEDULE = NoiseScheduleConfig(
    num_train_timesteps=1000, beta_schedule="squaredcos_cap_v2",
    beta_start=0.0001, beta_end=0.02)


def noise_image_embeddings(
    image_embeds: jax.Array,
    noise_level: jax.Array,
    noise: jax.Array,
    normalizer_params: Dict,
    schedule: NoiseScheduleConfig = UNCLIP_NOISE_AUG_SCHEDULE,
) -> jax.Array:
    """Noise-augment image embeddings and append the noise-level embedding.

    Mirrors diffusers StableUnCLIPImg2ImgPipeline.noise_image_embeddings:
    scale by the learned normalizer, DDPM-forward to ``noise_level``,
    unscale, then concat ``get_timestep_embedding(noise_level, dim,
    flip_sin_to_cos=True, downscale_freq_shift=0)``.

    image_embeds: (B, D); noise_level: (B,) int32; noise: (B, D).
    Returns (B, 2*D).
    """
    mean = normalizer_params["mean"].astype(jnp.float32)
    std = normalizer_params["std"].astype(jnp.float32)
    x = (image_embeds.astype(jnp.float32) - mean) / std

    acp = jnp.asarray(alphas_cumprod(schedule), jnp.float32)
    a = acp[noise_level][:, None]
    x = a ** 0.5 * x + (1.0 - a) ** 0.5 * noise.astype(jnp.float32)

    x = x * std + mean
    level_embed = get_timestep_embedding(
        noise_level, x.shape[-1], flip_sin_to_cos=True,
        downscale_freq_shift=0.0)
    return jnp.concatenate([x, level_embed.astype(x.dtype)], axis=-1)
