"""OpenCLIP vision transformer (ViT-H-14 tower) in flax.linen, TPU-first.

Re-implementation of the vision tower the reference builds via
open_clip.create_model_and_transforms("ViT-H-14", pretrained=...) with the
text transformer deleted, ``output_tokens=True`` and the final projection
removed (/root/reference/e4t/encoder.py:91-96).

Output contract (matches open_clip VisionTransformer.forward with
output_tokens and proj=None): ``(pooled, tokens)`` where pooled is
ln_post(cls_token) and tokens are the 256 *un-normalized* patch tokens —
the E4T encoder slices tokens[:, 1::2] and prepends pooled
(/root/reference/e4t/encoder.py:154-156).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from e4t_diffusion_tpu.ops.attention import dot_product_attention
from e4t_diffusion_tpu.ops.quant import Conv as QConv, Dense as QDense


def _gelu_tanh_env() -> bool:
    """E4T_VIT_GELU=tanh: serve the ViT MLP with tanh-approximate GELU.

    Measured on v5e (scripts/bench_vit.py, batch 8, 2026-08-19): the
    tower's exact-erf GELU costs 6.3 ms of 25.6 (25%) — 337M
    transcendental evals per batch-8 encode — and the tanh approximation
    recovers it (19.4 ms, 53%->70% MFU). Off by default: open_clip uses
    exact erf (/root/reference/e4t/encoder.py:91-96 builds the tower via
    open_clip) and the oracle parity tests pin it. Trace-time env knob,
    like E4T_FUSED_QKV; quality bound in tests/test_vit_gelu_knob.py.
    """
    import os

    return os.environ.get("E4T_VIT_GELU", "") == "tanh"


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    mlp_dim: int = 5120
    layer_norm_eps: float = 1e-5
    # tanh-approximate GELU: a serving-latency knob candidate (open_clip
    # uses exact erf; parity tests pin exact, so this stays opt-in until
    # measured AND quality-bounded). scripts/bench_vit.py measures it.
    gelu_approximate: bool = False
    # attribution-only ablations (scripts/bench_vit.py): timing deltas
    # for the MFU floor analysis, never used in serving
    ablate_attn: bool = False
    ablate_ln: bool = False

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return self.grid * self.grid + 1

    @classmethod
    def vit_h_14(cls) -> "ViTConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ViTConfig":
        return cls(image_size=28, patch_size=14, width=32, num_layers=2,
                   num_heads=4, mlp_dim=64)


class ViTBlock(nn.Module):
    config: ViTConfig
    dtype: jnp.dtype = jnp.float32
    causal: bool = False  # text towers (CLIP scoring) reuse this block

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        d, h = cfg.width, cfg.num_heads
        hd = d // h

        r = x if cfg.ablate_ln else nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln_1")(x)
        # packed qkv projection (open_clip/torch MultiheadAttention layout)
        qkv = QDense(3 * d, dtype=self.dtype, name="attn_in_proj")(r)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s = x.shape[0], x.shape[1]
        if cfg.ablate_attn:
            o = v  # projections kept, softmax-attention matmuls skipped
        else:
            q = q.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
            k = k.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
            v = v.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
            o = dot_product_attention(q, k, v, scale=1.0 / math.sqrt(hd),
                                      causal=self.causal)
            o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + QDense(d, dtype=self.dtype, name="attn_out_proj")(o)

        r = x if cfg.ablate_ln else nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln_2")(x)
        r = QDense(cfg.mlp_dim, dtype=self.dtype, name="mlp_c_fc")(r)
        r = jax.nn.gelu(r, approximate=cfg.gelu_approximate
                        or _gelu_tanh_env())
        r = QDense(d, dtype=self.dtype, name="mlp_c_proj")(r)
        return x + r


class VisionTransformer(nn.Module):
    """__call__(pixels_nchw_preprocessed) -> (pooled, tokens)."""
    config: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        # NCHW -> NHWC patches via strided conv (no bias, open_clip conv1)
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        x = QConv(cfg.width, (cfg.patch_size, cfg.patch_size),
                  strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                  use_bias=False, dtype=self.dtype, name="conv1")(x)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.width)  # (B, grid^2, width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(cfg.width ** -0.5),
            (cfg.width,))
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(cfg.width ** -0.5),
            (cfg.num_tokens, cfg.width))

        cls = jnp.broadcast_to(class_embedding.astype(self.dtype),
                               (b, 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + positional_embedding[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="ln_pre")(x)
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, dtype=self.dtype, name=f"resblocks_{i}")(x)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="ln_post")(x[:, 0])
        tokens = x[:, 1:]
        return pooled, tokens
