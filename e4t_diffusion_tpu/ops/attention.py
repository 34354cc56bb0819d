"""Attention ops: Pallas TPU flash attention + XLA einsum, auto-dispatched.

TPU-native replacement for the reference's attention-kernel zoo
(xformers memory_efficient_attention, torch SDPA, sliced attention:
/root/reference/e4t/models/cross_attention.py:285-322,447-538,595-651).
Two implementations cover every regime in this stack (UNet spatial
self-attention <= 64^2 = 4096 tokens at 512px, cross-attention kv = 77
text tokens, ViT 257 tokens, causal 77-token CLIP text), so no attention
slicing is needed:

- einsum_attention: XLA-fused softmax attention; fastest while the f32
  score tensor traffic is cheap, and the only masked/causal path.
- flash_attention: Pallas online-softmax kernel, fwd (kv-resident when k/v
  fit VMEM, (bh,nq,nk) grid otherwise) + custom-VJP bwd (residency-based
  at in-VMEM sizes, blocked grids beyond). Used above the score-size
  dispatch threshold and for all training traces (flash_threshold(0))
  where einsum's backward peaks don't fit. For head_dim below the
  128-lane tile (the SD UNet's d=40/d=80 sites) the forward uses a
  transposed-accumulator variant that pads d to the 8-sublane tile
  instead of 128 lanes, cutting the p@v MXU cost up to 3.2x.

Interface: tensors are (batch, heads, seq, head_dim) ["BHSD"].
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

_LANES = 128
_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Reference einsum attention (CPU tests / tiny sequences / causal masks)
# ---------------------------------------------------------------------------

def einsum_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
) -> jax.Array:
    """Plain softmax attention, numerically the parity baseline.

    Matches the math of the reference CrossAttnProcessor
    (/root/reference/e4t/models/cross_attention.py:285-322): fp32 softmax,
    output cast back to q.dtype.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    dtype = q.dtype
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if causal:
        qlen, klen = s.shape[-2], s.shape[-1]
        mask = jnp.tril(jnp.ones((qlen, klen), dtype=bool), k=klen - qlen)
        s = jnp.where(mask, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(dtype), v)
    return out

# Kernel machinery lives in flash_kernels.py — a byte-stable module — so
# edits here (dispatch, thresholds, sharding contexts) never shift the
# Mosaic source-location metadata and invalidate cached executables.
from e4t_diffusion_tpu.ops.flash_kernels import (  # noqa: F401
    _KVRES_MAX_ELEMS,
    _QRES_MAX_ELEMS,
    _flash_attention_lowdim_padded,
    _flash_attention_padded,
    _flash_fwd_lowdim_int8,
    _flash_fwd_shortseq_mh,
    _round_up,
    _use_interpret,
)


import os as _os

# v5e block sweep on the 4096-token d=40 site (scripts/bench_attention.py,
# 2026-08-16, relay-sync-corrected): 512/512 5.07 ms -> 1024/1024 4.71 ->
# 2048/512 4.53 ms/call; 2048/2048 and 4096/1024 overflow VMEM. block_q
# dominates (fewer grid rows over the resident kv); block_k is neutral
# 512..2048, so keep 512 for VMEM headroom.
_DEF_BLOCK_Q = int(_os.environ.get("E4T_FLASH_BLOCK_Q", "2048"))
_DEF_BLOCK_K = int(_os.environ.get("E4T_FLASH_BLOCK_K", "512"))


# ---------------------------------------------------------------------------
# int8 flash attention (serving-only): trace-time context + quantization
# ---------------------------------------------------------------------------
# While the context is active, the low-head-dim flash route (the SD
# UNet's 4096-token d=40 and 1024-token d=80 self-attention — every
# flash-dispatched serving site at 512px) quantizes q/k (and optionally
# v) per head to int8 and runs the inner matmuls on the 2x-rate int8 MXU
# via _flash_fwd_lowdim_int8. k is mean-centered over tokens first: a
# per-head constant key shift moves every score in a q-row by the same
# amount, so the softmax is EXACTLY invariant while the k quantization
# range tightens (k channel means dominate its abs-max in transformer
# blocks). Forward-only — training steps must not trace under this
# context (the int8 kernel has no vjp). Sites that dispatch to einsum or
# the d>=128 flash path fall through to full precision unchanged.

import contextlib

_INT8_FLASH_CTX: list = []


@contextlib.contextmanager
def int8_flash_attention(mode: str = "qk"):
    """mode "qk": int8 QK^T only, p@v stays bf16 (near-lossless).
    mode "qkpv": p@v on the int8 MXU too (p has the static scale 1/127
    since p in [0,1] after the online-max subtraction; v per-head int8).
    Quality bound at SD-v1 geometry: scripts/int8_quality.py."""
    assert mode in ("qk", "qkpv"), mode
    _INT8_FLASH_CTX.append(mode)
    try:
        yield
    finally:
        _INT8_FLASH_CTX.pop()


def _int8_lowdim_path(qf, kf, vf, scale, block_q, block_k, mode):
    """Quantize (XLA, fused elementwise + per-head reductions) and call
    the int8 kernel. qf: (BH, Sq_pad, D_sub), kf/vf: (BH, Sk, D_sub)."""
    bh, sq, d = qf.shape
    sk = kf.shape[1]
    sk_pad = _round_up(sk, block_k)
    f32 = jnp.float32
    q32 = qf.astype(f32)
    k32 = kf.astype(f32) - jnp.mean(kf.astype(f32), axis=1, keepdims=True)
    qs = jnp.maximum(jnp.max(jnp.abs(q32), axis=(1, 2)), 1e-8) / 127.0
    ks = jnp.maximum(jnp.max(jnp.abs(k32), axis=(1, 2)), 1e-8) / 127.0
    qi = jnp.clip(jnp.round(q32 / qs[:, None, None]),
                  -127, 127).astype(jnp.int8)
    ki = jnp.clip(jnp.round(k32 / ks[:, None, None]),
                  -127, 127).astype(jnp.int8)
    pv_int8 = mode == "qkpv"
    if pv_int8:
        v32 = vf.astype(f32)
        vs = jnp.maximum(jnp.max(jnp.abs(v32), axis=(1, 2)), 1e-8) / 127.0
        vi = jnp.clip(jnp.round(v32 / vs[:, None, None]),
                      -127, 127).astype(jnp.int8)
        v_c = vs / 127.0
        vt = jnp.swapaxes(vi, 1, 2)
    else:
        v_c = jnp.ones((bh,), f32)
        vt = jnp.swapaxes(vf, 1, 2)
    if sk_pad != sk:
        ki = jnp.pad(ki, ((0, 0), (0, sk_pad - sk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, sk_pad - sk)))
    sc = jnp.stack([qs * ks * scale, v_c], axis=1)  # (bh, 2) SMEM scalars
    qt = jnp.swapaxes(qi, 1, 2)
    ot, _ = _flash_fwd_lowdim_int8(qt, ki, vt, sc, qf.dtype,
                                   block_q, block_k, sk, pv_int8)
    return jnp.swapaxes(ot, 1, 2)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = None,
    block_k: int = None,
) -> jax.Array:
    """Flash attention on (B, H, S, D) tensors. No mask support (see module
    docstring — nothing in this stack needs masks at flash sizes; the causal
    77-token CLIP text path uses einsum_attention)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if block_q is None:
        block_q = _DEF_BLOCK_Q
    if block_k is None:
        block_k = _DEF_BLOCK_K
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    d_pad = _round_up(d, _LANES)
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    sq_pad = _round_up(sq, block_q)

    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)

    # Low-head-dim route: transposed-accumulator kernel (sublane-padded d)
    # whenever head_dim is below the lane tile and k/v fit VMEM. The
    # residency bound uses the TRUE resident footprint sk_pad * d_sub —
    # the transposed kernel keeps k (sk_pad, d_sub) and v_T (d_sub,
    # sk_pad) in VMEM, NOT 128-lane-padded tensors — so 768px (9216
    # tokens) and 1024px (16384 tokens) d=40 self-attention stay on this
    # kernel instead of falling to the lane-padded path (~2.4 MB k+v at
    # 16384 tokens; the f32 score tile at block 2048/512 adds ~8 MB,
    # within the 16 MB scoped-VMEM budget). Measured on v5e
    # (scripts/bench_attention.py hi-res shapes, bh=64, 2026-08-18):
    # 9216 tokens 38.2 -> 24.2 ms, 16384 tokens 116.3 -> 54.9 ms vs the
    # lane-padded kernel these shapes previously routed to.
    d_sub = _round_up(d, 8)
    if (d_sub < _LANES
            and _round_up(sk, block_k) * d_sub <= _KVRES_MAX_ELEMS):
        if d_sub != d:
            qf = jnp.pad(qf, ((0, 0), (0, 0), (0, d_sub - d)))
            kf = jnp.pad(kf, ((0, 0), (0, 0), (0, d_sub - d)))
            vf = jnp.pad(vf, ((0, 0), (0, 0), (0, d_sub - d)))
        if sq_pad != sq:
            qf = jnp.pad(qf, ((0, 0), (0, sq_pad - sq), (0, 0)))
        if _INT8_FLASH_CTX:
            out = _int8_lowdim_path(qf, kf, vf, scale, block_q, block_k,
                                    _INT8_FLASH_CTX[-1])
        else:
            out = _flash_attention_lowdim_padded(qf, kf, vf, scale,
                                                 block_q, block_k)
        return out[:, :sq, :d].reshape(b, h, sq, d)

    if d_pad != d:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, d_pad - d)))
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, d_pad - d)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, d_pad - d)))
    if sq_pad != sq:
        qf = jnp.pad(qf, ((0, 0), (0, sq_pad - sq), (0, 0)))

    out = _flash_attention_padded(qf, kf, vf, scale, block_q, block_k)
    out = out[:, :sq, :d].reshape(b, h, sq, d)
    return out


# Above this many bytes for the materialized (B,H,Sq,Sk) f32 score matrix,
# dispatch to the flash kernel; below it XLA's fused einsum attention is
# faster on TPU. v5e progression (512px SD UNet fwd, batch 8, inside one
# jit): v1 (bh,nq,nk)-grid flash was invocation-bound (189 ms vs 131 ms
# all-einsum); the kv-resident kernel flipped the 4096-token sites to
# flash (65.5 ms at a 1 GiB threshold); the transposed-accumulator
# low-head-dim variant cut that to 61.3 ms; and routing the 1024-token
# d=80 sites (268 MB of f32 scores each — einsum is HBM-bound there) to
# the same kernel landed 59.0 ms at a 128 MB threshold. Below ~128 MB
# (256-token sites, 77-token cross-attention) einsum's fused score
# traffic stays cheaper than kernel invocation overhead.
_FLASH_SCORE_BYTES = int(
    __import__("os").environ.get("E4T_FLASH_THRESHOLD_BYTES", 128 * 1024 ** 2))
_THRESHOLD_OVERRIDE: list = []


import contextlib


_HEAD_SHARD_CTX: list = []


@contextlib.contextmanager
def head_sharded_attention(mesh, axis: str = "tp"):
    """Run flash attention under shard_map over ``axis`` (heads sharded)
    while this context is active.

    A Pallas kernel is a custom call the XLA SPMD partitioner cannot
    split, so under tensor parallelism a plain flash call would be
    all-gathered onto every shard. Attention is embarrassingly parallel
    over heads, so shard_map with the head axis on ``axis`` runs each
    shard's kernel locally with zero collectives (forward AND backward —
    custom_vjp composes with shard_map). Falls through to the unsharded
    call when the head count does not divide the axis size.
    """
    _HEAD_SHARD_CTX.append((mesh, axis))
    try:
        yield
    finally:
        _HEAD_SHARD_CTX.pop()


def _maybe_head_sharded_flash(q, k, v, scale):
    if _HEAD_SHARD_CTX:
        mesh, axis = _HEAD_SHARD_CTX[-1]
        size = mesh.shape[axis]
        if size > 1 and q.shape[1] % size == 0:
            from jax.sharding import PartitionSpec as P

            # Shard the batch dim over the data axis too: in training the
            # batch IS dp-sharded, and a P(None, tp, ...) in_spec would
            # force an all-gather of q/k/v over dp with every dp group
            # redundantly computing global-batch attention (dp× FLOPs and
            # activation HBM inside the remat'd backward). With the batch
            # axis in the spec each (dp, tp) shard handles only its own
            # batch slice — zero collectives on the dp-sharded path.
            batch_axis = next(
                (a for a in mesh.shape
                 if a != axis and mesh.shape[a] > 1
                 and q.shape[0] % mesh.shape[a] == 0), None)
            spec = P(batch_axis, axis, None, None)
            fn = jax.shard_map(
                functools.partial(flash_attention, scale=scale),
                mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
                check_vma=False)
            return fn(q, k, v)
    return flash_attention(q, k, v, scale=scale)


@contextlib.contextmanager
def flash_threshold(score_bytes: Optional[int]):
    """Trace-time override of the einsum/flash dispatch threshold.

    Training steps trace under ``flash_threshold(0)`` (all-flash): the
    einsum path's score tensors in the backward pass inflate peak HBM,
    while the kernel keeps it flat (training/train_step.py)."""
    if score_bytes is None:
        yield
        return
    _THRESHOLD_OVERRIDE.append(score_bytes)
    try:
        yield
    finally:
        _THRESHOLD_OVERRIDE.pop()


# Packed-heads short-sequence route (the ViT-H 257-token / d=80 sites).
# einsum there is HBM-bound on its materialized f32 scores and the
# per-head flash kernel is invocation-bound (flash_kernels.py shortseq
# comment). E4T_SHORTSEQ_MH_ATTN: 0 disables, an integer sets the
# heads-per-cell pack size. Trace-time, like the other E4T_* knobs, so
# flipping it only retraces programs that contain a qualifying site
# (every hoisted-ViT serving program — hence measured before defaulting).
_SHORTSEQ_MH_G = int(_os.environ.get("E4T_SHORTSEQ_MH_ATTN", "0"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def shortseq_mh_attention(q, k, v, scale):
    """Forward via the packed-heads kernel; backward recomputes through
    einsum_attention's VJP (exact softmax-attention gradients — fine at
    short-seq sizes, where the f32 score tensor is small and transient
    under remat)."""
    return _shortseq_mh_impl(q, k, v, scale)


def _shortseq_mh_impl(q, k, v, scale):
    b, h, s, d = q.shape
    bh = b * h
    d_sub = _round_up(d, 8)
    s_pad = _round_up(s, _LANES)
    qf = q.reshape(bh, s, d)
    kf = k.reshape(bh, s, d)
    vf = v.reshape(bh, s, d)
    if d_sub != d:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, d_sub - d)))
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, d_sub - d)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, d_sub - d)))
    if s_pad != s:
        qf = jnp.pad(qf, ((0, 0), (0, s_pad - s), (0, 0)))
        kf = jnp.pad(kf, ((0, 0), (0, s_pad - s), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, s_pad - s), (0, 0)))
    g = max(gg for gg in (_SHORTSEQ_MH_G, 8, 4, 2, 1)
            if gg <= _SHORTSEQ_MH_G and bh % gg == 0)
    ot = _flash_fwd_shortseq_mh(jnp.swapaxes(qf, 1, 2), kf,
                                jnp.swapaxes(vf, 1, 2), scale, s, g)
    return jnp.swapaxes(ot, 1, 2)[:, :s, :d].reshape(b, h, s, d)


def _shortseq_mh_fwd(q, k, v, scale):
    return _shortseq_mh_impl(q, k, v, scale), (q, k, v)


def _shortseq_mh_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: einsum_attention(q_, k_, v_, scale=scale),
        q, k, v)
    return vjp(g)


shortseq_mh_attention.defvjp(_shortseq_mh_fwd, _shortseq_mh_bwd)


def _use_shortseq_mh(q, k, bias, causal) -> bool:
    return (
        _SHORTSEQ_MH_G > 0
        and jax.default_backend() == "tpu"
        and bias is None
        and not causal
        and q.shape[2] == k.shape[2]       # self-attention
        and 128 < q.shape[2] <= 512        # short seq, above one lane tile
        and _round_up(q.shape[3], 8) < _LANES  # low head dim
        and (q.shape[0] * q.shape[1]) % 2 == 0
    )


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Dispatcher: einsum attention for small/medium score matrices,
    Pallas flash attention for large ones (memory-bound regime), and the
    packed-heads kernel for short low-head-dim self-attention (ViT).

    q/k/v: (batch, heads, seq, head_dim).
    """
    if use_flash is None and _use_shortseq_mh(q, k, bias, causal):
        return shortseq_mh_attention(
            q, k, v, scale if scale is not None
            else 1.0 / math.sqrt(q.shape[-1]))
    if use_flash is None:
        score_bytes = q.shape[0] * q.shape[1] * q.shape[2] * k.shape[2] * 4
        threshold = (_THRESHOLD_OVERRIDE[-1] if _THRESHOLD_OVERRIDE
                     else _FLASH_SCORE_BYTES)
        use_flash = (
            jax.default_backend() == "tpu"
            and bias is None
            and not causal
            and q.shape[2] >= 128
            and score_bytes > threshold
        )
    if use_flash and bias is None and not causal:
        return _maybe_head_sharded_flash(q, k, v, scale)
    return einsum_attention(q, k, v, scale=scale, bias=bias, causal=causal)
