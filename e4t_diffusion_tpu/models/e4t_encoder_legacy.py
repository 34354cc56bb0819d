"""E4TEncoderLegacy — the reference's first-generation encoder.

Re-implementation of /root/reference/e4t/encoder.py:11-75: an HF
CLIPVisionModel backbone (openai/clip-vit-large-patch14 by default) with
``output_hidden_states``; takes every 2nd layer's hidden state (starting
after the embedding output), the CLS token of each, applies the backbone's
OWN post_layernorm (shared weights, encoder.py:65), a shared linear,
averages over layers, then concatenates with LeakyReLU'd spatially-pooled
UNet block features and projects to the word-embedding dim.

Note the legacy head expects ONE pooled feature per UNet block
(sum(block_out_channels) total), not the full 10,880-dim tap of the
current encoder. Kept for checkpoint compatibility with early E4T runs;
the CLIs use the current E4TEncoder.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from e4t_diffusion_tpu.models.clip_text import (
    CLIPTextConfig, CLIPEncoderLayer)
from e4t_diffusion_tpu.ops.resize import clip_preprocess


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """HF CLIPVisionModel geometry (defaults: openai ViT-L/14)."""
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"  # openai towers; laion ViT-H uses "gelu"

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @classmethod
    def vit_h(cls) -> "CLIPVisionConfig":
        """laion/CLIP-ViT-H-14 in HF layout (the Stable-unCLIP
        image_encoder backbone)."""
        return cls(hidden_size=1280, num_layers=32, num_heads=16,
                   intermediate_size=5120, hidden_act="gelu")

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(hidden_size=32, num_layers=4, num_heads=4,
                   intermediate_size=64, image_size=28, patch_size=14)


class CLIPVisionModel(nn.Module):
    """HF-style CLIP vision transformer returning all hidden states."""
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.patch_embedding = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=False, dtype=self.dtype)
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02),
            (cfg.hidden_size,))
        self.position_embedding = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (cfg.num_positions, cfg.hidden_size))
        # HF's (sic) spelling of the pre layernorm
        self.pre_layrnorm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                         dtype=self.dtype)
        layer_cfg = CLIPTextConfig(
            hidden_size=cfg.hidden_size, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
            layer_norm_eps=cfg.layer_norm_eps, hidden_act=cfg.hidden_act)
        self.layers = [CLIPEncoderLayer(layer_cfg, dtype=self.dtype,
                                        causal=False, name=f"layers_{i}")
                       for i in range(cfg.num_layers)]
        self.post_layernorm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                           dtype=self.dtype)

    def __call__(self, pixel_values: jax.Array) -> Tuple[jax.Array, list]:
        cfg = self.config
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)
        x = self.patch_embedding(x)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = jnp.broadcast_to(self.class_embedding.astype(self.dtype),
                               (b, 1, cfg.hidden_size))
        x = (jnp.concatenate([cls, x], axis=1)
             + self.position_embedding[None].astype(self.dtype))
        x = self.pre_layrnorm(x)
        hidden_states = [x]
        for layer in self.layers:
            x = layer(x)
            hidden_states.append(x)
        pooled = self.post_layernorm(x[:, 0])
        return pooled, hidden_states


@dataclasses.dataclass(frozen=True)
class E4TEncoderLegacyConfig:
    word_embedding_dim: int = 768
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    vision: CLIPVisionConfig = dataclasses.field(
        default_factory=CLIPVisionConfig)

    @classmethod
    def tiny(cls) -> "E4TEncoderLegacyConfig":
        return cls(word_embedding_dim=32, block_out_channels=(32, 64),
                   vision=CLIPVisionConfig.tiny())


def _leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.01)


class E4TEncoderLegacy(nn.Module):
    config: E4TEncoderLegacyConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.clip_vision = CLIPVisionModel(cfg.vision, dtype=self.dtype)
        self.linear = nn.Dense(cfg.vision.hidden_size, dtype=self.dtype)
        self.final_linear = nn.Dense(cfg.word_embedding_dim,
                                     dtype=self.dtype)

    def __call__(self, x: jax.Array,
                 unet_down_block_samples: Sequence[jax.Array]) -> jax.Array:
        x = clip_preprocess(x, self.config.vision.image_size)
        _, hidden_states = self.clip_vision(x)
        # "take every 2nd layer" AFTER dropping the embedding output
        # (/root/reference/e4t/encoder.py:61-62), CLS state through the
        # backbone's post_layernorm (shared weights, :65)
        selected = hidden_states[1:][1::2]
        feats = [self.linear(self.clip_vision.post_layernorm(h[:, 0, :]))
                 for h in selected]
        clip_h = jnp.mean(jnp.stack(feats), axis=0)

        pooled = [_leaky_relu(s.mean(axis=(1, 2)))
                  for s in unet_down_block_samples]  # NHWC pooling
        pooled = [_leaky_relu(clip_h)] + pooled
        h = jnp.concatenate(pooled, axis=1)
        return self.final_linear(h)
