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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG_INF = -1e30


def _use_interpret() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CPU test meshes)."""
    import os
    env = os.environ.get("E4T_PALLAS_INTERPRET", "auto")
    if env == "auto":
        return jax.default_backend() != "tpu"
    return env not in ("0", "false", "False")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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


# ---------------------------------------------------------------------------
# Pallas flash attention — forward
# ---------------------------------------------------------------------------

def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                      m_scr, l_scr, acc_scr,
                      *, scale: float, kv_len: int, block_k: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_k)

    if kv_len % block_k != 0:
        # mask out zero-padded kv columns in the last block
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[:, :1]                      # (block_q, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_next)                    # (block_q, block_k)
    l_cur = jnp.sum(p, axis=1, keepdims=True)
    alpha = jnp.exp(m_prev - m_next)           # (block_q, 1)
    l_next = alpha * l_prev + l_cur

    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)

    @pl.when(j == nk - 1)
    def _():
        l = l_scr[:, :1]
        inv = jnp.where(l > 0.0, 1.0 / l, 0.0)
        o_ref[0] = (acc_scr[:] * inv).astype(o_ref.dtype)
        lse = m_scr[:, :1] + jnp.log(jnp.maximum(l, 1e-37))
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_fwd(q, k, v, scale, block_q, block_k):
    """q: (BH, Sq, D), k/v: (BH, Sk, D); D, Sq, Sk already padded."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    nq, nk = sq // block_q, pl.cdiv(sk, block_k)
    sk_pad = _round_up(sk, block_k)
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))

    grid = (bh, nq, nk)
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale, kv_len=sk,
                          block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(q, k, v)
    return out, lse[:, :, 0]


# KV-resident forward: k/v live in VMEM for the whole row of q blocks and
# the kv loop runs INSIDE the kernel. The (bh, nq, nk) grid variant pays a
# kernel-invocation + scratch round-trip per kv block (16k invocations for
# the 4096-token UNet sites), which is overhead-bound; with kv resident the
# grid is (bh, nq) and the MXU stays busy. Applicable while
# kv_pad * d_pad * bf16 * 2 fits VMEM (seq <= 8192 at d=128 — everything in
# this stack).
_KVRES_MAX_ELEMS = 8192 * 128
# q-side residency bound for the backward (q/do in compute dtype plus two
# f32 128-lane lse/delta tensors live in VMEM simultaneously)
_QRES_MAX_ELEMS = 4096 * 128


def _flash_fwd_kvres_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                            *, scale: float, kv_len: int, block_k: int):
    q = q_ref[0]                      # (block_q, d)
    sk_pad = k_ref.shape[1]
    nk = sk_pad // block_k
    bq, d = q.shape

    def body(j, carry):
        m, l, acc = carry
        off = j * block_k
        k = k_ref[0, pl.ds(off, block_k), :]
        v = v_ref[0, pl.ds(off, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if kv_len % block_k != 0:
            col = off + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        acc_next = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_next, l_next, acc_next

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    inv = jnp.where(l > 0.0, 1.0 / l, 0.0)
    o_ref[0] = (acc * inv).astype(o_ref.dtype)
    lse = m + jnp.log(jnp.maximum(l, 1e-37))
    lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_fwd_kvres(q, k, v, scale, block_q, block_k):
    bh, sq, d = q.shape
    sk = k.shape[1]
    sk_pad = _round_up(sk, block_k)
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))
    nq = sq // block_q
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kvres_kernel, scale=scale, kv_len=sk,
                          block_k=block_k),
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, _LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(q, k, v)
    return out, lse[:, :, 0]


# Low-head-dim forward: transposed accumulator layout. For d < 128 the
# standard layout pads head_dim to the 128-lane tile, so the p@v matmul
# pays for a full 128-wide output (3.2x waste at d=40, the 4096-token SD
# UNet sites). Keeping the accumulator TRANSPOSED — acc_T (d, block_q) =
# v_T (d, block_k) @ p_T (block_k, block_q) — moves the small dimension to
# the MXU's sublane axis (pads to 8, not 128): at d=40 the pv pass drops
# from 64x4 to 5x4x4 tile-units per block. The qk^T pass is computed
# directly in transposed form s_T = k @ q_T (same cost as before; the
# online softmax reduces over the sublane axis instead of lanes).

def _flash_fwd_lowdim_kernel(qt_ref, k_ref, vt_ref, ot_ref, lse_ref,
                             *, scale: float, kv_len: int, block_k: int):
    qt = qt_ref[0]                    # (d, block_q)
    sk_pad = k_ref.shape[1]
    nk = sk_pad // block_k
    d, bq = qt.shape

    def body(j, carry):
        m, l, acc = carry             # m,l: (1, bq); acc: (d, bq)
        off = j * block_k
        k = k_ref[0, pl.ds(off, block_k), :]    # (block_k, d)
        vt = vt_ref[0, :, pl.ds(off, block_k)]  # (d, block_k)
        st = jax.lax.dot_general(
            k, qt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (block_k, bq)
        if kv_len % block_k != 0:
            row = off + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
            st = jnp.where(row < kv_len, st, _NEG_INF)
        m_cur = jnp.max(st, axis=0, keepdims=True)       # (1, bq)
        m_next = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_next)
        pt = jnp.exp(st - m_next)                        # (block_k, bq)
        l_next = alpha * l + jnp.sum(pt, axis=0, keepdims=True)
        acc_next = acc * alpha + jax.lax.dot_general(
            vt, pt.astype(vt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (d, bq)
        return m_next, l_next, acc_next

    m0 = jnp.full((1, bq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, bq), jnp.float32)
    acc0 = jnp.zeros((d, bq), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    inv = jnp.where(l > 0.0, 1.0 / l, 0.0)
    ot_ref[0] = (acc * inv).astype(ot_ref.dtype)
    lse = m + jnp.log(jnp.maximum(l, 1e-37))
    lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_fwd_lowdim(q, k, v, scale, block_q, block_k):
    """q: (BH, Sq, D), k/v: (BH, Sk, D) with D a multiple of 8 (< 128).
    Returns (out (BH, Sq, D), lse (BH, Sq))."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    sk_pad = _round_up(sk, block_k)
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))
    qt = jnp.swapaxes(q, 1, 2)  # (BH, D, Sq)
    vt = jnp.swapaxes(v, 1, 2)  # (BH, D, Sk_pad)
    nq = sq // block_q
    ot, lse = pl.pallas_call(
        functools.partial(_flash_fwd_lowdim_kernel, scale=scale, kv_len=sk,
                          block_k=block_k),
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, sk_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, sq), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, sq), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(qt, k, vt)
    return jnp.swapaxes(ot, 1, 2), lse[:, 0, :]


# ---------------------------------------------------------------------------
# Pallas flash attention — backward
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dq_scr,
                         *, scale: float, kv_len: int, block_k: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]      # (block_q, 1)
    delta = delta_ref[0][:, :1]  # (block_q, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if kv_len % block_k != 0:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse)  # (block_q, block_k)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_scr, dv_scr,
                          *, scale: float, kv_len: int, block_k: int):
    i = pl.program_id(2)  # q-block index iterates innermost
    nq = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if kv_len % block_k != 0:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse)  # (block_q, block_k)

    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (block_k, d)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale  # (block_q, block_k)
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (block_k, d)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# Residency-based backward (mirrors the forward's kv-resident design):
# dq with k/v resident in VMEM over a (bh, nq) grid, dk/dv with q/do/lse
# resident over a (bh, nk) grid. The blocked (bh, nq, nk)-grid fallback
# kernels below pay a kernel invocation + scratch round-trip per inner
# block, which is overhead-bound at this stack's sizes; residency keeps
# the MXU busy. Applicable while the resident tensors fit VMEM.

def _flash_bwd_dq_kvres_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref,
                               delta_ref, dq_ref,
                               *, scale: float, kv_len: int, block_k: int):
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]
    sk_pad = k_ref.shape[1]
    nk = sk_pad // block_k
    bq, d = q.shape

    def body(j, acc):
        off = j * block_k
        k = k_ref[0, pl.ds(off, block_k), :]
        v = v_ref[0, pl.ds(off, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if kv_len % block_k != 0:
            col = off + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return acc + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, nk, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = acc.astype(dq_ref.dtype)


def _flash_bwd_dkv_qres_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref,
                               delta_ref, dk_ref, dv_ref,
                               *, scale: float, kv_len: int,
                               block_q: int, block_k: int):
    j = pl.program_id(1)
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]
    sq = q_ref.shape[1]
    nq = sq // block_q
    d = k.shape[1]

    def body(i, carry):
        dk, dv = carry
        off = i * block_q
        q = q_ref[0, pl.ds(off, block_q), :]
        do = do_ref[0, pl.ds(off, block_q), :]
        lse = lse_ref[0, pl.ds(off, block_q), :][:, :1]
        delta = delta_ref[0, pl.ds(off, block_q), :][:, :1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if kv_len % block_k != 0:
            col = (j * block_k
                   + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(col < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse)  # (block_q, block_k)
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((k.shape[0], d), jnp.float32)
    dv0 = jnp.zeros((v.shape[0], d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_resident(q, k, v, g, lse_b, delta_b, scale, block_q, block_k,
                        sk):
    """dq kv-resident + dk/dv q-resident; q/k/v already padded."""
    bh, sq, d = q.shape
    sk_pad = k.shape[1]
    nq, nk = sq // block_q, sk_pad // block_k

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kvres_kernel, scale=scale,
                          kv_len=sk, block_k=block_k),
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(q, k, v, g, lse_b, delta_b)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_qres_kernel, scale=scale,
                          kv_len=sk, block_q=block_q, block_k=block_k),
        grid=(bh, nk),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, _LANES), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, _LANES), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_pad, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(q, k, v, g, lse_b, delta_b)
    return dq, dk, dv


# Backward blocks are clamped independently of the forward: the bwd
# kernels carry more resident state (q+do+lse+delta on the q side, plus
# f32 score/ds tiles), so the forward-optimal block_q=2048 overflows the
# 16MB scoped-VMEM stack (measured: 17.88M at the lane-padded d=128
# 4096-token site). 512 is the validated training configuration.
_DEF_BWD_BLOCK_Q = int(
    __import__("os").environ.get("E4T_FLASH_BWD_BLOCK_Q", "512"))
_DEF_BWD_BLOCK_K = int(
    __import__("os").environ.get("E4T_FLASH_BWD_BLOCK_K", "512"))


def _flash_bwd(res, g, scale, block_q, block_k):
    q, k, v, out, lse = res
    bh, sq, d = q.shape
    # sq/sk are padded to multiples of the (larger) forward blocks, so
    # clamping to a divisor keeps the grids exact
    if block_q > _DEF_BWD_BLOCK_Q and block_q % _DEF_BWD_BLOCK_Q == 0:
        block_q = _DEF_BWD_BLOCK_Q
    if block_k > _DEF_BWD_BLOCK_K and block_k % _DEF_BWD_BLOCK_K == 0:
        block_k = _DEF_BWD_BLOCK_K
    sk = k.shape[1]
    sk_pad = _round_up(sk, block_k)
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))
    nq, nk = sq // block_q, sk_pad // block_k

    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)
    lse_b = jnp.broadcast_to(lse[..., None], (bh, sq, _LANES))
    delta_b = jnp.broadcast_to(delta[..., None], (bh, sq, _LANES))

    # Residency dispatch: k/v resident for dq and q/do/lse/delta resident
    # for dk/dv while they fit VMEM (the q side carries two f32 128-lane
    # tensors, so it gets a tighter bound).
    if sk_pad * d <= _KVRES_MAX_ELEMS and sq * d <= _QRES_MAX_ELEMS:
        dq, dk, dv = _flash_bwd_resident(q, k, v, g, lse_b, delta_b, scale,
                                         block_q, block_k, sk)
        if sk_pad != sk:
            dk = dk[:, :sk]
            dv = dv[:, :sk]
        return dq, dk, dv

    common_in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, _LANES), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, _LANES), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
    ]

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, kv_len=sk,
                          block_k=block_k),
        grid=(bh, nq, nk),
        in_specs=common_in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(q, k, v, g, lse_b, delta_b)

    # dk/dv: swap loop order — kv blocks outer, q blocks inner.
    dkv_in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, _LANES), lambda b, j, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, _LANES), lambda b, j, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, kv_len=sk,
                          block_k=block_k),
        grid=(bh, nk, nq),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(q, k, v, g, lse_b, delta_b)
    if sk_pad != sk:
        dk = dk[:, :sk]
        dv = dv[:, :sk]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper over padded (BH, S, D) layout
# ---------------------------------------------------------------------------

def _fwd_dispatch(q, k, v, scale, block_q, block_k):
    """Pick the kv-resident forward when k/v fit in VMEM."""
    sk_pad = _round_up(k.shape[1], block_k)
    if sk_pad * q.shape[2] <= _KVRES_MAX_ELEMS:
        return _flash_fwd_kvres(q, k, v, scale, block_q, block_k)
    return _flash_fwd(q, k, v, scale, block_q, block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_padded(q, k, v, scale, block_q, block_k):
    out, _ = _fwd_dispatch(q, k, v, scale, block_q, block_k)
    return out


def _flash_attention_padded_fwd(q, k, v, scale, block_q, block_k):
    out, lse = _fwd_dispatch(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


def _flash_attention_padded_bwd(scale, block_q, block_k, res, g):
    return _flash_bwd(res, g, scale, block_q, block_k)


_flash_attention_padded.defvjp(_flash_attention_padded_fwd,
                               _flash_attention_padded_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_lowdim_padded(q, k, v, scale, block_q, block_k):
    out, _ = _flash_fwd_lowdim(q, k, v, scale, block_q, block_k)
    return out


def _flash_attention_lowdim_fwd(q, k, v, scale, block_q, block_k):
    out, lse = _flash_fwd_lowdim(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


def _flash_attention_lowdim_bwd(scale, block_q, block_k, res, g):
    # backward reuses the standard kernels on lane-padded residuals; the
    # zero-padded tail contributes nothing (delta and scores unchanged)
    q, k, v, out, lse = res
    d = q.shape[-1]
    dpad = _round_up(d, _LANES)
    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, dpad - d)))
    dq, dk, dv = _flash_bwd(
        (pad(q), pad(k), pad(v), pad(out), lse), pad(g),
        scale, block_q, block_k)
    return dq[..., :d], dk[..., :d], dv[..., :d]


_flash_attention_lowdim_padded.defvjp(_flash_attention_lowdim_fwd,
                                      _flash_attention_lowdim_bwd)


import os as _os

# v5e block sweep on the 4096-token d=40 site (scripts/bench_attention.py,
# 2026-08-16, relay-sync-corrected): 512/512 5.07 ms -> 1024/1024 4.71 ->
# 2048/512 4.53 ms/call; 2048/2048 and 4096/1024 overflow VMEM. block_q
# dominates (fewer grid rows over the resident kv); block_k is neutral
# 512..2048, so keep 512 for VMEM headroom.
_DEF_BLOCK_Q = int(_os.environ.get("E4T_FLASH_BLOCK_Q", "2048"))
_DEF_BLOCK_K = int(_os.environ.get("E4T_FLASH_BLOCK_K", "512"))


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
    # whenever head_dim is below the lane tile and k/v fit VMEM.
    d_sub = _round_up(d, 8)
    if (d_sub < _LANES
            and _round_up(sk, block_k) * _LANES <= _KVRES_MAX_ELEMS):
        if d_sub != d:
            qf = jnp.pad(qf, ((0, 0), (0, 0), (0, d_sub - d)))
            kf = jnp.pad(kf, ((0, 0), (0, 0), (0, d_sub - d)))
            vf = jnp.pad(vf, ((0, 0), (0, 0), (0, d_sub - d)))
        if sq_pad != sq:
            qf = jnp.pad(qf, ((0, 0), (0, sq_pad - sq), (0, 0)))
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
    Pallas flash attention for large ones (memory-bound regime).

    q/k/v: (batch, heads, seq, head_dim).
    """
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
