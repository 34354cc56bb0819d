"""AutoencoderKL (SD v1 VAE) in flax.linen, TPU-first (NHWC internals).

The reference uses diffusers' AutoencoderKL unmodified
(/root/reference/pretrain_e4t.py:237, tuning_e4t.py:102): encode to a
diagonal Gaussian over 4-channel latents (scaling_factor 0.18215), decode
back to RGB. Re-implemented natively; module naming mirrors the diffusers
state dict for mechanical checkpoint conversion.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from e4t_diffusion_tpu.ops.quant import Conv as QConv, Dense as QDense
from e4t_diffusion_tpu.models.norm import group_norm_act


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    sample_size: int = 512
    scaling_factor: float = 0.18215

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(16, 32), layers_per_block=1,
                   norm_num_groups=4, sample_size=32)


class VAEResnetBlock(nn.Module):
    """ResnetBlock2D without time embedding (VAE variant, eps=1e-6)."""
    out_channels: int
    use_shortcut: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = group_norm_act(x, groups=self.groups, eps=1e-6,
                           dtype=self.dtype, name="norm1", act="silu")
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = group_norm_act(h, groups=self.groups, eps=1e-6,
                           dtype=self.dtype, name="norm2", act="silu")
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if self.use_shortcut:
            x = QConv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    """Single-head self-attention over spatial positions (diffusers v0.14
    AttentionBlock with num_head_channels=None)."""
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = group_norm_act(x, groups=self.groups, eps=1e-6,
                           dtype=self.dtype, name="group_norm")
        x = x.reshape(b, h * w, c)
        q = QDense(c, dtype=self.dtype, name="query")(x)
        k = QDense(c, dtype=self.dtype, name="key")(x)
        v = QDense(c, dtype=self.dtype, name="value")(x)
        scale = 1.0 / math.sqrt(c)
        attn = jnp.einsum("bqc,bkc->bqk", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        x = jnp.einsum("bqk,bkc->bqc", attn, v)
        x = QDense(c, dtype=self.dtype, name="proj_attn")(x)
        return x.reshape(b, h, w, c) + residual


class VAEDownsample(nn.Module):
    """Conv stride-2 with asymmetric (0,1) padding (diffusers VAE)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return QConv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class VAEUpsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return QConv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class VAEMidBlock(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = VAEResnetBlock(self.channels, False, self.groups,
                           dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttentionBlock(self.channels, self.groups, dtype=self.dtype,
                              name="attentions_0")(x)
        x = VAEResnetBlock(self.channels, False, self.groups,
                           dtype=self.dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = QConv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        out_ch = cfg.block_out_channels[0]
        for bi, ch in enumerate(cfg.block_out_channels):
            in_ch, out_ch = out_ch, ch
            is_final = bi == len(cfg.block_out_channels) - 1
            for li in range(cfg.layers_per_block):
                use_sc = (in_ch if li == 0 else out_ch) != out_ch
                x = VAEResnetBlock(out_ch, use_sc, cfg.norm_num_groups,
                                   dtype=self.dtype,
                                   name=f"down_blocks_{bi}_resnets_{li}")(x)
            if not is_final:
                x = VAEDownsample(out_ch, dtype=self.dtype,
                                  name=f"down_blocks_{bi}_downsamplers_0")(x)
        x = VAEMidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                        dtype=self.dtype, name="mid_block")(x)
        x = group_norm_act(x, groups=cfg.norm_num_groups, eps=1e-6,
                           dtype=self.dtype, name="conv_norm_out",
                           act="silu")
        x = QConv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        rev = list(reversed(cfg.block_out_channels))
        x = QConv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        x = VAEMidBlock(rev[0], cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_block")(x)
        out_ch = rev[0]
        for bi, ch in enumerate(rev):
            in_ch, out_ch = out_ch, ch
            is_final = bi == len(rev) - 1
            for li in range(cfg.layers_per_block + 1):
                use_sc = (in_ch if li == 0 else out_ch) != out_ch
                x = VAEResnetBlock(out_ch, use_sc, cfg.norm_num_groups,
                                   dtype=self.dtype,
                                   name=f"up_blocks_{bi}_resnets_{li}")(x)
            if not is_final:
                x = VAEUpsample(out_ch, dtype=self.dtype,
                                name=f"up_blocks_{bi}_upsamplers_0")(x)
        x = group_norm_act(x, groups=cfg.norm_num_groups, eps=1e-6,
                           dtype=self.dtype, name="conv_norm_out",
                           act="silu")
        x = QConv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    """encode(x_nchw) -> (mean, logvar) over latents; decode(z_nchw) -> rgb.

    Latents keep the reference's NCHW convention at the API boundary; use
    ``sample_latent`` + config.scaling_factor the way the train loops do
    (/root/reference/pretrain_e4t.py:598-599).
    """
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = QConv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = QConv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x):
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        moments = self.quant_conv(self.encoder(x))
        moments = jnp.transpose(moments, (0, 3, 1, 2))
        mean, logvar = jnp.split(moments, 2, axis=1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def decode(self, z):
        z = jnp.transpose(z, (0, 2, 3, 1)).astype(self.dtype)
        x = self.decoder(self.post_quant_conv(z))
        return jnp.transpose(x, (0, 3, 1, 2))

    def __call__(self, x, rng):
        mean, logvar = self.encode(x)
        z = sample_latent(mean, logvar, rng)
        return self.decode(z), mean, logvar


def sample_latent(mean: jax.Array, logvar: jax.Array, rng: jax.Array) -> jax.Array:
    """Reparameterized draw from the diagonal Gaussian posterior."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
