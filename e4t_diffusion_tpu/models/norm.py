"""Shared GroupNorm(+SiLU) dispatcher for the UNet and VAE towers.

Default path is the exact flax ops the call sites always traced
(nn.GroupNorm then nn.silu). E4T_FUSED_GN=1 routes VMEM-resident slices
through the one-read Pallas kernel (ops/groupnorm.py), which now carries
a custom VJP (backward = analytic flax-equivalent path), so the flag is
safe in both serving and training traces.

Reference counterpart: torch.nn.GroupNorm throughout the diffusers
blocks the reference forks (/root/reference/e4t/models/unet_2d_blocks.py
resnet norm1/norm2; diffusers AutoencoderKL resnets).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from e4t_diffusion_tpu.ops import groupnorm as gnops


class FusedGroupNormAct(nn.Module):
    """Pallas fused GroupNorm(+act) with nn.GroupNorm's param layout
    ("scale"/"bias" directly under this module's name), so checkpoints,
    converters and TP specs are identical in both modes."""
    num_groups: int
    epsilon: float
    act: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return gnops.fused_group_norm(
            x.astype(self.dtype), scale, bias, groups=self.num_groups,
            eps=self.epsilon, act=self.act)


def group_norm_act(x, *, groups, eps, dtype, name, act=None):
    """GroupNorm + optional SiLU at a UNet/VAE call site.

    Routes VMEM-resident slices through the fused Pallas kernel when
    E4T_FUSED_GN=1; otherwise (or for non-fitting slices, e.g. the VAE's
    512x512 stages) traces the byte-identical flax path.
    """
    if gnops.fused_gn_enabled() and gnops.fused_gn_fits(x.shape, x.dtype):
        return FusedGroupNormAct(num_groups=groups, epsilon=eps, act=act,
                                 dtype=dtype, name=name)(x)
    h = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=dtype,
                     name=name)(x)
    return nn.silu(h) if act == "silu" else h
