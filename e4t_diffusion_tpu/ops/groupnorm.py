"""Fused GroupNorm(+SiLU) Pallas TPU kernel — one HBM read, one write.

Why: XLA lowers GroupNorm to a stats fusion (full read of x) plus a
normalize(+activation) fusion (second full read, one write), and the
following conv then reads the result. The UNet has ~46 GroupNorm sites
per forward (2 per resnet, 1 per transformer block, conv_norm_out); at
batch 16 (CFG-doubled serving batch 8) the extra stats read is ~0.9 GB
of HBM traffic per UNet forward (~1.1 ms at the v5e's ~819 GB/s). This
kernel keeps the per-sample (HW, C) slice VMEM-resident and does both
passes on-chip: grid over batch, phase 1 accumulates per-channel
sum/sum-of-squares in f32 over row chunks, phase 2 applies the affine
normalize (+ optional SiLU) and writes once.

Group reductions ride the MXU via a (C, G) one-hot membership matrix
(sum_g = sum_c @ mask, broadcast back with mask.T) so no lane-dimension
reshapes are needed (C is the lane axis; C/G can be as small as 10 for
SD-v1's 320-channel/32-group sites, which a (G, C/G) reshape would make
the minor axis — a Mosaic anti-pattern).

Carries a custom VJP (analytic flax-equivalent backward), so
E4T_FUSED_GN=1 is safe in serving AND training traces. MEASURED
NEGATIVE on v5e (round 4: UNet fwd 59.9 vs 55.9 ms at batch 8 — XLA's
fused fast-variance GroupNorm already hits the 2R+1W traffic floor;
full roofline in docs/KERNELS.md), so it stays OFF by default and is
kept as flag-gated infrastructure for hardware where the fusion
economics differ. Falls back to the caller's flax path for slices that
don't fit VMEM or off-TPU. Reference counterpart: the
torch.nn.GroupNorm calls inside the diffusers blocks the reference
forks (/root/reference/e4t/models/unet_2d_blocks.py — resnet norm1/
norm2, attention GroupNorm); numerics matched against flax
nn.GroupNorm in tests/test_groupnorm.py.

KEEP KERNEL BODIES BYTE-STABLE where possible (see ops/flash_kernels.py
header); append new code at the end of the file.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    env = os.environ.get("E4T_PALLAS_INTERPRET", "auto")
    if env == "auto":
        return jax.default_backend() != "tpu"
    return env not in ("0", "false", "False")


def fused_gn_enabled() -> bool:
    return os.environ.get("E4T_FUSED_GN", "0").lower() not in (
        "0", "false", "")


# Per-sample VMEM budget for the resident slice: in (bf16/f32) + out +
# chunk-sized f32 temps. 6 MB of payload keeps the whole program under
# ~12 MB of the core's ~16 MB VMEM with headroom for double buffering.
_VMEM_PAYLOAD_BYTES = 6 * 1024 * 1024
_ROW_CHUNK = 512


def fused_gn_fits(shape, dtype) -> bool:
    """True if an NHWC slice of `shape` can run in the resident kernel."""
    n, h, w, c = shape
    hw = h * w
    itemsize = jnp.dtype(dtype).itemsize
    if hw * c * itemsize * 2 > _VMEM_PAYLOAD_BYTES:
        return False
    # phase loops need a whole number of row chunks
    chunk = hw if hw <= _ROW_CHUNK else _ROW_CHUNK
    return hw % chunk == 0


def _gn_kernel(x_ref, scale_ref, bias_ref, mask_ref, o_ref,
               *, eps: float, groups: int, act: str | None,
               hw: int, chunk: int):
    c = x_ref.shape[-1]
    nchunks = hw // chunk

    def stats_body(i, carry):
        s, ss = carry
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return (s + jnp.sum(xc, axis=0, keepdims=True),
                ss + jnp.sum(xc * xc, axis=0, keepdims=True))

    zero = jnp.zeros((1, c), jnp.float32)
    s, ss = jax.lax.fori_loop(0, nchunks, stats_body, (zero, zero))

    mask = mask_ref[...]  # (c, groups) one-hot group membership
    count = jnp.float32(hw * c // groups)
    sg = jnp.dot(s, mask, preferred_element_type=jnp.float32) / count
    ssg = jnp.dot(ss, mask, preferred_element_type=jnp.float32) / count
    var = ssg - sg * sg
    inv = jax.lax.rsqrt(var + eps)
    # broadcast group stats back to channels and fold the affine params:
    # y = x * a + b with a = inv*scale, b = bias - mean*inv*scale
    inv_c = jnp.dot(inv, mask.T, preferred_element_type=jnp.float32)
    mean_c = jnp.dot(sg, mask.T, preferred_element_type=jnp.float32)
    a = inv_c * scale_ref[...]
    b = bias_ref[...] - mean_c * a

    def write_body(i, _):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xc * a + b
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, write_body, 0)


def _fused_group_norm_impl(x, scale, bias, *, groups: int, eps: float,
                           act: str | None = None):
    """Raw kernel invocation (no VJP) — see fused_group_norm below."""
    n, h, w, c = x.shape
    hw = h * w
    chunk = hw if hw <= _ROW_CHUNK else _ROW_CHUNK
    xf = x.reshape(n, hw, c)
    mask = jnp.repeat(jnp.eye(groups, dtype=jnp.float32),
                      c // groups, axis=0)  # (c, groups)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps, groups=groups, act=act,
                          hw=hw, chunk=chunk),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * hw * c,
            bytes_accessed=2 * n * hw * c * x.dtype.itemsize,
            transcendentals=n * hw * c if act == "silu" else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_use_interpret(),
    )(xf, scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32), mask)
    return out.reshape(n, h, w, c)


def _gn_reference(x, scale, bias, groups: int, eps: float,
                  act: str | None):
    """Pure-jnp GroupNorm(+SiLU), numerically matching the kernel.

    f32 stats over (HW, C/G) per (sample, group), fast-variance form
    (E[x^2]-E[x]^2) — the same formulation as the kernel and flax's
    use_fast_variance path. Used only for the custom-VJP backward.
    """
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
    mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c) * scale.astype(jnp.float32) + \
        bias.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_gn_vjp(x, scale, bias, groups, eps, act):
    return _fused_group_norm_impl(x, scale, bias, groups=groups, eps=eps,
                                  act=act)


def _fused_gn_fwd(x, scale, bias, groups, eps, act):
    return (_fused_group_norm_impl(x, scale, bias, groups=groups, eps=eps,
                                   act=act),
            (x, scale, bias))


def _fused_gn_bwd(groups, eps, act, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _gn_reference(xx, ss, bb, groups, eps, act),
        x, scale, bias)
    return vjp(g)


_fused_gn_vjp.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def fused_group_norm(x, scale, bias, *, groups: int, eps: float,
                     act: str | None = None):
    """GroupNorm(+activation) over NHWC `x`, one read + one write of HBM.

    scale/bias: (C,) f32 affine params (flax nn.GroupNorm layout).
    Caller is responsible for checking fused_gn_fits().

    Differentiable: forward runs the Pallas kernel; backward is the
    analytic GN(+SiLU) VJP via jax.vjp of a pure-jnp reference (XLA
    fuses it), so E4T_FUSED_GN=1 is safe inside training traces.
    """
    return _fused_gn_vjp(x, scale, bias, groups, eps, act)
