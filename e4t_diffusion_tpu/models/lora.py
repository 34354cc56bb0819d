"""LoRA attention adapters as a parameter functor.

Reference semantics (/root/reference/e4t/models/cross_attention.py:325-395
LoRACrossAttnProcessor / LoRALinearLayer, and its xformers twin at
:541-592): per attention site, rank-r adapters on the q/k/v/out
projections, applied additively AFTER the multiplicative weight offset:

    y = x @ (W * (1 + O)) + scale * (x @ down @ up)        [+ bias]

``down``: (in, r), init N(0, 1/r); ``up``: (r, out), init 0 — so a fresh
bank is an exact no-op. (In the reference the processors are dead code —
no E4T CLI installs them; PARITY.md. Here they are a live serving
feature: ``inference.py --lora_weights``.)

TPU-first design (same argument as models/weight_offsets.py): the
adapters are input-independent, so instead of two extra matmuls per
projection per call we FOLD them once per sampling run into the
effective kernels, after the offset fold:

    kernel_eff = kernel * (1 + O) + scale * down @ up

which is bit-for-bit the reference math (both terms are linear in x).
Zero marginal cost inside the denoise scan; composes with int8 serving
because quantization runs on the fully folded kernels.

Checkpoint interchange follows the diffusers-0.14 ``save_attn_procs``
layout the reference ecosystem uses: keys
``<torch attention path>.processor.to_{q,k,v,out}_lora.{down,up}.weight``
with torch (out, in) weight layout.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from e4t_diffusion_tpu.models import weight_offsets as wo

PyTree = Any

# bank leaf name -> UNet projection module name (flax side)
_LORA_TO_PROJ = {
    "to_q_lora": "to_q",
    "to_k_lora": "to_k",
    "to_v_lora": "to_v",
    "to_out_lora": "to_out_0",
}


def init_lora_layer(key, in_features: int, out_features: int, rank: int,
                    dtype=jnp.float32) -> Dict:
    """One adapter: down ~ N(0, 1/rank) (in, r), up = 0 (r, out) — the
    reference's LoRALinearLayer init (cross_attention.py:332-336), in
    JAX (in, out) kernel layout."""
    if rank > min(in_features, out_features):
        raise ValueError(
            f"LoRA rank {rank} must be <= {min(in_features, out_features)}")
    return {
        "down": jax.random.normal(key, (in_features, rank), dtype) / rank,
        "up": jnp.zeros((rank, out_features), dtype),
    }


def init_lora_bank(key, unet_config, rank: int = 4,
                   dtype=jnp.float32) -> Dict:
    """Full bank: {site-path joined by '.': {to_q_lora, to_k_lora,
    to_v_lora, to_out_lora}} over the same attention sites as the
    weight-offset bank (the reference attaches one LoRACrossAttnProcessor
    wherever it attaches offsets). Dims per reference
    (cross_attention.py:355-359): q (hidden, hidden), k/v (cross-or-
    hidden, hidden), out (hidden, hidden); hidden == query_dim for SD."""
    sites = wo.attention_sites(unet_config)
    keys = jax.random.split(key, len(sites) * 4).reshape(len(sites), 4, -1)
    bank = {}
    for (path, qdim, kvdim), ks in zip(sites, keys):
        inner = qdim
        bank[".".join(path)] = {
            "to_q_lora": init_lora_layer(ks[0], qdim, inner, rank, dtype),
            "to_k_lora": init_lora_layer(ks[1], kvdim, inner, rank, dtype),
            "to_v_lora": init_lora_layer(ks[2], kvdim, inner, rank, dtype),
            "to_out_lora": init_lora_layer(ks[3], inner, qdim, rank, dtype),
        }
    return bank


def fold_lora_bank(unet_params: PyTree, bank: Dict,
                   scale: float = 1.0) -> PyTree:
    """Return UNet params with ``kernel + scale * down @ up`` at every
    adapted projection. Call AFTER fold_offset_bank — additive-after-
    multiplicative is the reference's operand order
    (cross_attention.py:369-371,382-384,392). Pure function: safe to
    differentiate through or to hoist out of a sampling scan."""
    import flax.core

    params = flax.core.unfreeze(unet_params)
    for name, layers in bank.items():
        attn = params
        for p in name.split("."):
            attn = attn[p]
        for lora_key, proj in _LORA_TO_PROJ.items():
            layer = layers[lora_key]
            kernel = attn[proj]["kernel"]
            delta = (layer["down"].astype(jnp.float32)
                     @ layer["up"].astype(jnp.float32))
            attn[proj]["kernel"] = kernel + jnp.asarray(
                scale, jnp.float32).astype(kernel.dtype) * delta.astype(
                    kernel.dtype)
    return params


# ---- torch interchange (diffusers-0.14 attn-procs layout) -------------

def _site_to_torch(site: str) -> str:
    """flax site path -> torch module path: the flax tree flattens list
    indices into names (down_blocks_0 / attentions_1), torch keeps them
    as separate path components (down_blocks.0.attentions.1)."""
    out = []
    for part in site.split("."):
        head, _, tail = part.rpartition("_")
        if tail.isdigit() and head in ("down_blocks", "up_blocks",
                                       "attentions", "transformer_blocks",
                                       "mid_block"):
            out.extend([head, tail])
        elif part == "mid_block":
            out.append(part)
        else:
            out.append(part)
    return ".".join(out)


def lora_to_torch(bank: Dict) -> Dict:
    """Bank -> diffusers-0.14 ``save_attn_procs`` state dict:
    ``<torch site>.processor.<adapter>.{down,up}.weight`` with (out, in)
    torch layout (transpose of the JAX (in, out) kernels)."""
    import numpy as np

    sd = {}
    for site, layers in bank.items():
        tsite = _site_to_torch(site)
        for lora_key, layer in layers.items():
            for leaf in ("down", "up"):
                sd[f"{tsite}.processor.{lora_key}.{leaf}.weight"] = (
                    np.asarray(layer[leaf], np.float32).T)
    return sd


def lora_from_torch(state_dict: Dict, unet_config) -> Dict:
    """Strict inverse of lora_to_torch: consumes exactly the diffusers
    key set for this UNet's attention sites (missing or extra keys
    raise), returns the JAX bank."""
    sites = [".".join(p) for p, _, _ in wo.attention_sites(unet_config)]
    expected = {f"{_site_to_torch(s)}.processor.{k}.{leaf}.weight"
                for s in sites for k in _LORA_TO_PROJ for leaf in ("down",
                                                                   "up")}
    got = set(state_dict)
    if got != expected:
        missing = sorted(expected - got)[:5]
        extra = sorted(got - expected)[:5]
        raise ValueError(f"LoRA state dict key mismatch: "
                         f"missing={missing} extra={extra} "
                         f"(counts: {len(expected)} expected, {len(got)} got)")
    bank = {}
    for s in sites:
        tsite = _site_to_torch(s)
        bank[s] = {
            k: {leaf: jnp.asarray(
                state_dict[f"{tsite}.processor.{k}.{leaf}.weight"]).T
                for leaf in ("down", "up")}
            for k in _LORA_TO_PROJ
        }
    return bank
