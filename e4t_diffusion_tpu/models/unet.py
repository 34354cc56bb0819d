"""Stable Diffusion v1 UNet (UNet2DConditionModel) in flax.linen, TPU-first.

Functional re-design of the reference's forked diffusers UNet
(/root/reference/e4t/models/unet_2d_condition.py:30-562 and the block zoo in
unet_2d_blocks.py) with the E4T additions:

- ``return_encoder_outputs``: early exit after the mid block returning the
  down-block residual samples + mid output (the 10,880-dim E4T feature tap,
  /root/reference/e4t/models/unet_2d_condition.py:517-521).
- attention projections are plain kernels; the E4T weight offsets are
  folded in *outside* the module (see models/weight_offsets.py), so the
  module itself stays a pure function of (params, inputs).

TPU-first choices: NHWC activations internally (XLA:TPU's native conv
layout; NCHW only at the API boundary for reference parity), attention via
the Pallas flash kernel dispatcher, no attention slicing (flash covers all
sequence sizes), static shapes throughout so the whole denoise loop jits
into one XLA program.

Module names mirror diffusers' state-dict naming (dots -> per-level module
nesting) so the torch->flax checkpoint converter is mechanical and key
parity can be asserted strictly (/root/reference/e4t/utils.py:121-125).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from e4t_diffusion_tpu.ops.attention import dot_product_attention
from e4t_diffusion_tpu.ops.quant import (  # int8-capable drop-ins
    Conv as QConv, Dense as QDense)
from e4t_diffusion_tpu.models.norm import (  # shared GN(+SiLU) dispatcher
    FusedGroupNormAct, group_norm_act)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD v1 UNet hyperparameters (defaults = SD v1-4/v1-5)."""
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    center_input_sample: bool = False
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    mid_block_type: str = "UNetMidBlock2DCrossAttn"
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # Number of heads (diffusers v0.14 naming quirk): int = same for all
    # blocks (SD v1), or a per-block tuple (SD v2: (5, 10, 20, 20)).
    attention_head_dim: Union[int, Tuple[int, ...]] = 8
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    # SD v2 family options
    use_linear_projection: bool = False
    # None | "projection" (Stable-unCLIP: a TimestepEmbedding-shaped MLP
    # over projection_class_embeddings_input_dim-dim class_labels, added
    # to the time embedding)
    class_embed_type: Optional[str] = None
    projection_class_embeddings_input_dim: Optional[int] = None

    def heads_for_block(self, block_index: int) -> int:
        if isinstance(self.attention_head_dim, int):
            return self.attention_head_dim
        return self.attention_head_dim[block_index]

    @classmethod
    def sd2(cls, sample_size: int = 96) -> "UNetConfig":
        """Stable Diffusion v2.x UNet (768px family): 64-dim heads, linear
        transformer projections, OpenCLIP-H 1024-dim text context."""
        return cls(
            sample_size=sample_size,
            attention_head_dim=(5, 10, 20, 20),
            cross_attention_dim=1024,
            use_linear_projection=True,
        )

    @classmethod
    def sd2_unclip(cls) -> "UNetConfig":
        """stabilityai/stable-diffusion-2-1-unclip UNet: SD v2 plus a
        projection class embedding over the noise-augmented CLIP image
        embedding concat its noise-level embedding (1024 + 1024)."""
        return dataclasses.replace(
            cls.sd2(sample_size=96),
            class_embed_type="projection",
            projection_class_embeddings_input_dim=2048,
        )

    @classmethod
    def tiny(cls, cross_attention_dim: int = 32) -> "UNetConfig":
        """Small config for tests."""
        return cls(
            sample_size=8,
            block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1,
            attention_head_dim=4,
            cross_attention_dim=cross_attention_dim,
            norm_num_groups=8,
        )


def get_timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jax.Array:
    """Sinusoidal timestep embeddings, matching diffusers' formulation."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        x = QDense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = QDense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class ResnetBlock2D(nn.Module):
    out_channels: int
    use_shortcut: bool
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = group_norm_act(x, groups=self.groups, eps=self.eps,
                           dtype=self.dtype, name="norm1", act="silu")
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = QDense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = group_norm_act(h, groups=self.groups, eps=self.eps,
                           dtype=self.dtype, name="norm2", act="silu")
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if self.use_shortcut:
            x = QConv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


def _fused_qkv_enabled() -> bool:
    import os
    return os.environ.get("E4T_FUSED_QKV", "0") not in ("0", "false", "")


class _ProjKernel(nn.Module):
    """Bias-free projection kernel parameter under the same tree path as
    an nn.Dense (``<name>/kernel``), so checkpoints/offset-fold/TP specs
    are identical whether projections run separately or fused."""
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_dim, self.out_dim), jnp.float32)


class Attention(nn.Module):
    """Multi-head attention with plain q/k/v/out kernels.

    Offset-free by construction: W_eff folding happens on the param pytree
    (models/weight_offsets.py) before apply.

    E4T_FUSED_QKV=1 computes the q/k/v projections as one matmul against
    the trace-time-concatenated kernels (x @ [Wq|Wk|Wv]; k/v only for
    cross-attention). Parameters stay separate per projection, so both
    modes consume the same checkpoints (tests/test_fused_qkv.py).
    Measured on v5e (2026-08-16): SLOWER than separate projections
    (full UNet fwd 57.9 ms vs 55.5 at batch 8) — XLA does not hoist the
    kernel concats out of the denoise scan, so they cost weight-sized
    HBM traffic every step. Kept off by default as a documented negative
    result; revisit only if XLA gains loop-invariant param hoisting.
    """
    heads: int
    dim_head: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        is_self = context is None
        context = x if context is None else context
        inner = self.heads * self.dim_head
        if _fused_qkv_enabled():
            wq = _ProjKernel(x.shape[-1], inner, name="to_q")()
            wk = _ProjKernel(context.shape[-1], inner, name="to_k")()
            wv = _ProjKernel(context.shape[-1], inner, name="to_v")()
            if is_self:
                qkv = x @ jnp.concatenate([wq, wk, wv],
                                          axis=1).astype(self.dtype)
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = x @ wq.astype(self.dtype)
                kv = context @ jnp.concatenate([wk, wv],
                                               axis=1).astype(self.dtype)
                k, v = jnp.split(kv, 2, axis=-1)
        else:
            q = QDense(inner, use_bias=False, dtype=self.dtype,
                         name="to_q")(x)
            k = QDense(inner, use_bias=False, dtype=self.dtype,
                         name="to_k")(context)
            v = QDense(inner, use_bias=False, dtype=self.dtype,
                         name="to_v")(context)
        b, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, sk, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, sk, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        o = dot_product_attention(q, k, v, scale=1.0 / math.sqrt(self.dim_head))
        o = o.transpose(0, 2, 1, 3).reshape(b, sq, inner)
        o = QDense(self.out_dim, dtype=self.dtype, name="to_out_0")(o)
        return o


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward with geglu activation)."""
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        proj = QDense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        hidden, gate = jnp.split(proj, 2, axis=-1)
        x = hidden * jax.nn.gelu(gate, approximate=False)
        x = QDense(self.dim, dtype=self.dtype, name="net_2")(x)
        return x


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = Attention(self.heads, self.dim_head, self.dim, dtype=self.dtype,
                      name="attn1")(h) + x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = Attention(self.heads, self.dim_head, self.dim, dtype=self.dtype,
                      name="attn2")(h, context) + x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(h) + x
        return x


class Transformer2DModel(nn.Module):
    """Spatial transformer: GN -> proj in -> blocks -> proj out + residual.

    ``use_linear_projection`` (SD v2, diffusers transformer_2d
    use_linear_projection) swaps the 1x1 convs for Dense layers applied
    after flattening — mathematically identical on TPU (a 1x1 conv IS a
    matmul over NHWC), kept distinct only for checkpoint-layout parity.
    """
    heads: int
    dim_head: int
    depth: int = 1
    groups: int = 32
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        x = group_norm_act(x, groups=self.groups, eps=1e-6,
                           dtype=self.dtype, name="norm")
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = QDense(inner, dtype=self.dtype, name="proj_in")(x)
        else:
            x = QConv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, inner)
        for i in range(self.depth):
            x = BasicTransformerBlock(inner, self.heads, self.dim_head,
                                      dtype=self.dtype,
                                      name=f"transformer_blocks_{i}")(x, context)
        if self.use_linear_projection:
            x = QDense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, inner)
            x = QConv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class Downsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return QConv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return QConv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class CrossAttnDownBlock2D(nn.Module):
    out_channels: int
    in_channels: int
    num_layers: int
    heads: int
    add_downsample: bool
    groups: int
    eps: float
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        res = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlock2D(self.out_channels, in_ch != self.out_channels,
                              self.groups, self.eps, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb)
            x = Transformer2DModel(self.heads, self.out_channels // self.heads,
                                   groups=self.groups,
                                   use_linear_projection=self.use_linear_projection,
                                   dtype=self.dtype,
                                   name=f"attentions_{i}")(x, context)
            res.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            res.append(x)
        return x, res


class DownBlock2D(nn.Module):
    out_channels: int
    in_channels: int
    num_layers: int
    add_downsample: bool
    groups: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        res = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlock2D(self.out_channels, in_ch != self.out_channels,
                              self.groups, self.eps, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb)
            res.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            res.append(x)
        return x, res


class UNetMidBlock2DCrossAttn(nn.Module):
    channels: int
    heads: int
    groups: int
    eps: float
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        x = ResnetBlock2D(self.channels, False, self.groups, self.eps,
                          dtype=self.dtype, name="resnets_0")(x, temb)
        x = Transformer2DModel(self.heads, self.channels // self.heads,
                               groups=self.groups,
                               use_linear_projection=self.use_linear_projection,
                               dtype=self.dtype,
                               name="attentions_0")(x, context)
        x = ResnetBlock2D(self.channels, False, self.groups, self.eps,
                          dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class CrossAttnUpBlock2D(nn.Module):
    out_channels: int
    prev_output_channel: int
    num_layers: int
    heads: int
    add_upsample: bool
    groups: int
    eps: float
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, temb, context):
        for i in range(self.num_layers):
            in_ch = (self.prev_output_channel if i == 0 else self.out_channels)
            skip = res_samples.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(self.out_channels, True, self.groups, self.eps,
                              dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            x = Transformer2DModel(self.heads, self.out_channels // self.heads,
                                   groups=self.groups,
                                   use_linear_projection=self.use_linear_projection,
                                   dtype=self.dtype,
                                   name=f"attentions_{i}")(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class UpBlock2D(nn.Module):
    out_channels: int
    prev_output_channel: int
    num_layers: int
    add_upsample: bool
    groups: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, temb):
        for i in range(self.num_layers):
            skip = res_samples.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(self.out_channels, True, self.groups, self.eps,
                              dtype=self.dtype, name=f"resnets_{i}")(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class UNet2DConditionModel(nn.Module):
    """The full conditioned UNet.

    __call__(sample_nchw, timesteps, encoder_hidden_states,
             return_encoder_outputs=False)
      -> eps prediction (NCHW), or the E4T tap: a list of spatially
         mean-pooled down-block features + mid output whose concatenation
         is 10,880-dim for SD v1
         (/root/reference/e4t/models/unet_2d_condition.py:581-586).
    """
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 return_encoder_outputs: bool = False,
                 class_labels: Optional[jax.Array] = None):
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # NCHW (API parity with the reference) -> NHWC (TPU-native)
        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)
        context = encoder_hidden_states.astype(self.dtype)

        if cfg.center_input_sample:
            x = 2.0 * x - 1.0

        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            cfg.flip_sin_to_cos, cfg.freq_shift).astype(self.dtype)
        temb = TimestepEmbedding(cfg.block_out_channels[0] * 4,
                                 dtype=self.dtype,
                                 name="time_embedding")(t_emb)

        if cfg.class_embed_type == "projection":
            # Stable-unCLIP conditioning: class_labels is a continuous
            # (B, projection_class_embeddings_input_dim) vector (noised CLIP
            # image embedding ++ its noise-level embedding), lifted by a
            # TimestepEmbedding-shaped MLP and added to the time embedding.
            if class_labels is None:
                raise ValueError(
                    "class_labels required when class_embed_type='projection'")
            cemb = TimestepEmbedding(cfg.block_out_channels[0] * 4,
                                     dtype=self.dtype,
                                     name="class_embedding")(
                class_labels.astype(self.dtype))
            temb = temb + cemb
        elif cfg.class_embed_type is not None:
            raise ValueError(f"Unsupported class_embed_type "
                             f"{cfg.class_embed_type}")

        x = QConv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)

        ulp = cfg.use_linear_projection
        down_res = [x]
        out_ch = cfg.block_out_channels[0]
        for bi, btype in enumerate(cfg.down_block_types):
            in_ch, out_ch = out_ch, cfg.block_out_channels[bi]
            is_final = bi == len(cfg.down_block_types) - 1
            if btype == "CrossAttnDownBlock2D":
                x, res = CrossAttnDownBlock2D(
                    out_ch, in_ch, cfg.layers_per_block,
                    cfg.heads_for_block(bi),
                    add_downsample=not is_final, groups=cfg.norm_num_groups,
                    eps=cfg.norm_eps, use_linear_projection=ulp,
                    dtype=self.dtype,
                    name=f"down_blocks_{bi}")(x, temb, context)
            elif btype == "DownBlock2D":
                x, res = DownBlock2D(
                    out_ch, in_ch, cfg.layers_per_block,
                    add_downsample=not is_final, groups=cfg.norm_num_groups,
                    eps=cfg.norm_eps, dtype=self.dtype,
                    name=f"down_blocks_{bi}")(x, temb)
            else:
                raise ValueError(f"Unsupported down block {btype}")
            down_res.extend(res)

        x = UNetMidBlock2DCrossAttn(
            cfg.block_out_channels[-1],
            cfg.heads_for_block(len(cfg.block_out_channels) - 1),
            cfg.norm_num_groups, cfg.norm_eps, use_linear_projection=ulp,
            dtype=self.dtype, name="mid_block")(x, temb, context)

        if return_encoder_outputs is True:
            # E4T tap: all down-block residuals + mid output (NHWC), to be
            # spatially mean-pooled by the E4T encoder. Matches the CompVis
            # convention (/root/reference/e4t/models/unet_2d_condition.py:517-521).
            return down_res + [x]
        # "with_eps": full forward AND the tap. Used by the sampler's
        # uncond-pass fusion: under CFG the uncond branch's down+mid
        # computation is bit-identical to the reference's separate
        # encoder-half tap pass (same latents/timestep/"" context), so the
        # tap comes for free (pipeline.py).
        tap = (list(down_res) + [x]
               if return_encoder_outputs == "with_eps" else None)

        rev_channels = list(reversed(cfg.block_out_channels))
        prev_ch = cfg.block_out_channels[-1]
        for bi, btype in enumerate(cfg.up_block_types):
            out_ch = rev_channels[bi]
            is_final = bi == len(cfg.up_block_types) - 1
            n_layers = cfg.layers_per_block + 1
            res = down_res[-n_layers:]
            down_res = down_res[:-n_layers]
            if btype == "CrossAttnUpBlock2D":
                x = CrossAttnUpBlock2D(
                    out_ch, prev_ch, n_layers,
                    cfg.heads_for_block(len(cfg.block_out_channels) - 1 - bi),
                    add_upsample=not is_final, groups=cfg.norm_num_groups,
                    eps=cfg.norm_eps, use_linear_projection=ulp,
                    dtype=self.dtype,
                    name=f"up_blocks_{bi}")(x, res, temb, context)
            elif btype == "UpBlock2D":
                x = UpBlock2D(
                    out_ch, prev_ch, n_layers,
                    add_upsample=not is_final, groups=cfg.norm_num_groups,
                    eps=cfg.norm_eps, dtype=self.dtype,
                    name=f"up_blocks_{bi}")(x, res, temb)
            else:
                raise ValueError(f"Unsupported up block {btype}")
            prev_ch = out_ch

        x = group_norm_act(x, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                           dtype=self.dtype, name="conv_norm_out", act="silu")
        x = QConv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        eps = jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW
        if tap is not None:
            return eps, tap
        return eps


def tap_feature_dim(config: UNetConfig) -> int:
    """Channel count of the pooled E4T tap: conv_in + every down-block
    residual (+downsampler) + mid output. 10,880 for SD v1
    (/root/reference/e4t/models/unet_2d_condition.py:581-586)."""
    total = config.block_out_channels[0]  # conv_in
    for bi, _ in enumerate(config.down_block_types):
        ch = config.block_out_channels[bi]
        total += config.layers_per_block * ch
        if bi != len(config.down_block_types) - 1:  # downsampler output
            total += ch
    total += config.block_out_channels[-1]  # mid
    return total


def pool_encoder_features(down_block_samples: Sequence[jax.Array]) -> jax.Array:
    """Spatial mean-pool + concat the E4T tap -> (B, 10880) for SD v1.

    Mirrors /root/reference/e4t/encoder.py:147-148 (NHWC here, so pool over
    axes 1, 2).
    """
    pooled = [s.mean(axis=(1, 2)) for s in down_block_samples]
    return jnp.concatenate(pooled, axis=-1)
