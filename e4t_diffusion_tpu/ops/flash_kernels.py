"""Pallas TPU flash-attention kernels (fwd + bwd custom-VJP plumbing).

KEEP THIS MODULE BYTE-STABLE. The Mosaic lowering of these kernels embeds
source line numbers in the serialized kernel payload, so ANY line shift
here changes the compiled HLO and invalidates every persistent-cache
entry that contains a flash call (full-size train-step recompiles cost
15-17 min on the v5e relay — CLAUDE.md). Dispatch logic, thresholds,
block-size defaults and context managers live in ops/attention.py, which
may change freely; only kernel bodies and their pallas_call wrappers
belong here. Append new kernels at the END of the file.

Split out of ops/attention.py (round-2); see that module's docstring for
the design narrative and the reference mapping
(/root/reference/e4t/models/cross_attention.py:285-322,447-538,595-651).
"""
from __future__ import annotations

import functools

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


# ---------------------------------------------------------------------------
# int8 flash attention — forward-only serving kernel (round 3, appended)
# ---------------------------------------------------------------------------
# Runs the attention inner matmuls on the 2x-rate int8 MXU
# (SageAttention-style): q/k are quantized per-head to int8 outside the
# kernel (k mean-centered over tokens first — a per-head constant shift
# of every key moves each score row by a j-invariant amount, so the
# softmax is EXACTLY invariant while the quantization range tightens),
# QK^T accumulates in int32, and the online softmax stays f32 on the
# VPU. With ``pv_int8`` the p@v pass is also int8: p in [0, 1] after the
# online-max subtraction, so its scale is the static 1/127 and only v
# needs a per-head scale. Forward-only (no vjp) — serving path; training
# never enters the int8-attention context (ops/attention.py).
# Quality bound at SD-v1 geometry: scripts/int8_quality.py --attn modes.

def _flash_fwd_lowdim_int8_kernel(qt_ref, k_ref, vt_ref, sc_ref,
                                  ot_ref, lse_ref,
                                  *, kv_len: int, block_k: int,
                                  pv_int8: bool):
    qt = qt_ref[0]                    # (d, block_q) int8
    sk_pad = k_ref.shape[1]
    nk = sk_pad // block_k
    d, bq = qt.shape
    # per-head scale scalars from SMEM (a VMEM (1,1) tile cannot
    # broadcast over both sublanes and lanes in Mosaic); the (BH, 2)
    # array is passed UNBLOCKED and indexed by the grid's head index
    b = pl.program_id(0)
    qk_c = sc_ref[b, 0]               # q_scale * k_scale * softmax scale
    v_c = sc_ref[b, 1]                # v_scale / 127 (pv_int8) or 1.0

    def body(j, carry):
        m, l, acc = carry             # m,l: (1, bq); acc: (d, bq) f32
        off = j * block_k
        k = k_ref[0, pl.ds(off, block_k), :]    # (block_k, d) int8
        st = jax.lax.dot_general(
            k, qt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        st = st * qk_c                           # (block_k, bq)
        if kv_len % block_k != 0:
            row = off + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
            st = jnp.where(row < kv_len, st, _NEG_INF)
        m_cur = jnp.max(st, axis=0, keepdims=True)       # (1, bq)
        m_next = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_next)
        pt = jnp.exp(st - m_next)                        # (block_k, bq)
        l_next = alpha * l + jnp.sum(pt, axis=0, keepdims=True)
        vt = vt_ref[0, :, pl.ds(off, block_k)]  # (d, block_k) int8|bf16
        if pv_int8:
            pt_q = jnp.round(pt * 127.0).astype(jnp.int8)
            contrib = jax.lax.dot_general(
                vt, pt_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            contrib = jax.lax.dot_general(
                vt, pt.astype(vt.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return m_next, l_next, acc * alpha + contrib

    m0 = jnp.full((1, bq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, bq), jnp.float32)
    acc0 = jnp.zeros((d, bq), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    inv = jnp.where(l > 0.0, 1.0 / l, 0.0)
    ot_ref[0] = (acc * (inv * v_c)).astype(ot_ref.dtype)
    lse = m + jnp.log(jnp.maximum(l, 1e-37))
    lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_fwd_lowdim_int8(qt, k, vt, sc, out_dtype, block_q, block_k,
                           kv_len, pv_int8):
    """qt: (BH, D, Sq) int8; k: (BH, Sk_pad, D) int8; vt: (BH, D, Sk_pad)
    int8 (pv_int8) or compute dtype; sc: (BH, 2) f32 per-head scale
    scalars, routed to SMEM. Sq/Sk already padded; D a multiple of 8
    (< 128). Returns (out_T (BH, D, Sq), lse (BH, 8, Sq))."""
    bh, d, sq = qt.shape
    sk_pad = k.shape[1]
    nq = sq // block_q
    return pl.pallas_call(
        functools.partial(_flash_fwd_lowdim_int8_kernel, kv_len=kv_len,
                          block_k=block_k, pv_int8=pv_int8),
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, sk_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, sq), out_dtype),
            jax.ShapeDtypeStruct((bh, 8, sq), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk_pad * d,
            bytes_accessed=qt.size + k.size + vt.size,
            transcendentals=bh * sq * sk_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(qt, k, vt, sc)


# ---------------------------------------------------------------------------
# Packed-heads short-sequence attention (round 5, appended)
# ---------------------------------------------------------------------------
# The ViT-H 257-token / d=80 self-attention (bh = 16*batch) is too small
# for either existing path: einsum materializes the (bh, 257, 257) f32
# scores in HBM (~34 MB/layer at batch 8 — HBM-bound, measured 4.8 ms of
# the 25.6 ms tower, scripts/bench_vit.py), while the lowdim flash kernel
# runs bh grid cells whose per-cell MXU work (~0.1 us) is dwarfed by the
# per-cell DMA/setup overhead (measured 32.2 ms tower). This kernel packs
# ``g`` heads into ONE grid cell (statically unrolled), keeps the whole
# kv resident, and — because the full score row is in registers — uses a
# single-pass softmax (no online max/rescale carries). Scores never touch
# HBM; per-layer traffic drops to the q/k/v/out tensors themselves.
# Transposed layout like the lowdim kernel: d on sublanes (80 = 10x8
# clean), tokens on lanes (257 -> 384, the unavoidable 128-lane pad).
# Forward-only: the wrapper in ops/attention.py recomputes via
# einsum_attention for the backward (training quality path unchanged).

def _shortseq_mh_kernel(qt_ref, k_ref, vt_ref, ot_ref,
                        *, scale: float, kv_len: int, g: int):
    s_pad = k_ref.shape[1]
    for h in range(g):  # static unroll: no dynamic leading-dim indexing
        qt = qt_ref[h]                  # (d, s_pad)
        k = k_ref[h]                    # (s_pad, d)
        st = jax.lax.dot_general(
            k, qt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (s_pad, s_pad)
        if kv_len != s_pad:
            row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
            st = jnp.where(row < kv_len, st, _NEG_INF)
        m = jnp.max(st, axis=0, keepdims=True)           # (1, s_pad)
        p = jnp.exp(st - m)
        l = jnp.sum(p, axis=0, keepdims=True)
        vt = vt_ref[h]                  # (d, s_pad)
        acc = jax.lax.dot_general(
            vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (d, s_pad)
        ot_ref[h] = (acc * (1.0 / l)).astype(ot_ref.dtype)


def _flash_fwd_shortseq_mh(qt, k, vt, scale, kv_len, g):
    """qt/vt: (BH, D, S_pad), k: (BH, S_pad, D); D multiple of 8 (< 128),
    S_pad a multiple of 128, g divides BH. Returns out_T (BH, D, S_pad)."""
    bh, d, s_pad = qt.shape
    return pl.pallas_call(
        functools.partial(_shortseq_mh_kernel, scale=scale, kv_len=kv_len,
                          g=g),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, d, s_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s_pad, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, d, s_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, d, s_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d, s_pad), qt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s_pad * kv_len * d,
            bytes_accessed=(qt.size + k.size + vt.size) * qt.dtype.itemsize,
            transcendentals=bh * s_pad * kv_len,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_use_interpret(),
    )(qt, k, vt)
