"""CLIP text encoder (SD v1 / openai ViT-L-14 text tower) in flax.linen.

Re-implementation of the reference's forked HF CLIPTextModel
(/root/reference/e4t/models/modeling_clip.py:9-82) whose single change is
accepting pre-computed ``inputs_embeds`` so the E4T domain embedding can be
written into the placeholder token's slot before encoding.

Reference quirk preserved deliberately (SURVEY.md §7.3.7): the fork's
pooled output is always hidden_state[:, 0] (modeling_clip.py:72), not the
eot-argmax pooling of stock CLIP. The pooled output is unused by the E4T
flow; we return it for API parity.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from e4t_diffusion_tpu.ops.attention import einsum_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"  # SD v1 / openai CLIP; SD v2 uses "gelu"

    @classmethod
    def sd2(cls) -> "CLIPTextConfig":
        """SD v2.x text encoder (OpenCLIP ViT-H text tower in HF layout,
        truncated to the penultimate layer: num_hidden_layers=23)."""
        return cls(hidden_size=1024, num_layers=23, num_heads=16,
                   intermediate_size=4096, hidden_act="gelu")

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(vocab_size=1000, hidden_size=32, num_layers=2,
                   num_heads=4, intermediate_size=64,
                   max_position_embeddings=16)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    causal: bool = True

    @nn.compact
    def __call__(self, x, causal: bool = None):
        if causal is None:
            causal = self.causal
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_heads
        hd = d // h
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        b, s = x.shape[0], x.shape[1]
        q = q.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        o = einsum_attention(q, k, v, scale=1.0 / math.sqrt(hd), causal=causal)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(o)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    causal: bool = True

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, dtype=self.dtype, causal=self.causal,
                              name="self_attn")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = (quick_gelu(h) if cfg.hidden_act == "quick_gelu"
             else jax.nn.gelu(h, approximate=False))
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """__call__(input_ids=None, inputs_embeds=None) ->
    (last_hidden_state, pooled)."""
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Optional[jax.Array] = None,
                 inputs_embeds: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        if input_ids is None and inputs_embeds is None:
            raise ValueError("You have to specify input_ids or inputs_embeds")

        token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size))
        position_embedding = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size))

        if inputs_embeds is None:
            inputs_embeds = jnp.take(token_embedding, input_ids, axis=0)
        seq = inputs_embeds.shape[1]
        x = (inputs_embeds + position_embedding[None, :seq]).astype(self.dtype)

        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        pooled = x[:, 0]  # reference quirk: token-0 pooling
        return x, pooled


def get_input_embeddings(params) -> jax.Array:
    """The (vocab, hidden) token embedding table."""
    return params["token_embedding"]


def embed_tokens(params, input_ids: jax.Array) -> jax.Array:
    """Raw (pre-position) token embeddings, the reference's
    text_encoder.get_input_embeddings()(input_ids)."""
    return jnp.take(params["token_embedding"], input_ids, axis=0)


def resize_token_embeddings(params, new_size: int, rng=None):
    """Grow the vocab (placeholder-token registration,
    /root/reference/pretrain_e4t.py:254-259). New rows ~ N(0, 0.02); their
    values never influence the E4T flow (the placeholder slot is
    overwritten by the predicted domain embedding before encoding)."""
    import flax.core

    params = flax.core.unfreeze(params)
    table = params["token_embedding"]
    old = table.shape[0]
    if new_size <= old:
        return params
    if rng is None:
        rng = jax.random.PRNGKey(0)
    new_rows = 0.02 * jax.random.normal(
        rng, (new_size - old, table.shape[1]), table.dtype)
    params["token_embedding"] = jnp.concatenate([table, new_rows], axis=0)
    return params
