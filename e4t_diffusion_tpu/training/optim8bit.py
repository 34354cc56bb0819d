"""Block-quantized 8-bit AdamW — the TPU-native bitsandbytes equivalent.

The reference offers bitsandbytes AdamW8bit via --use_8bit_adam
(/root/reference/pretrain_e4t.py:380-387) to fit fine-tuning in 16GB GPUs.
This is the same memory trade on TPU: both Adam moments are stored as int8
with per-block (default 256) absmax scales (~1.03 bytes/param/moment vs 4),
dequantized/requantized inside the update.

Two details matter at the 1.2B-trainable-param scale of phase-2 tuning:

1. Codebooks are LOGARITHMIC (bitsandbytes' "dynamic map" idea): linear
   8-bit codes collapse small entries within a block to zero, which
   under-estimates Adam's second moment and diverges. Codes span 7 decades
   below the block absmax (<=6.6% / 3.2% relative error for mu / nu).
2. Updates for large leaves run CHUNKED under lax.map so the f32
   dequantize/requantize temporaries stay bounded (~a few MB) instead of
   materializing full-leaf f32 copies (an 806MB temp per op for the E4T
   encoder's stacked per-index linears alone).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

DEFAULT_BLOCK = 256
# blocks per lax.map chunk: 4096*256 elems = 4MB f32 temps per op
_CHUNK_BLOCKS = 4096
_DECADES = 7.0


class _Quantized(NamedTuple):
    q: jax.Array       # int8 payload, (n_blocks, block)
    scale: jax.Array   # f32 per-block absmax, (n_blocks, 1)


def _pad_len(n: int, block: int) -> int:
    return (n + block - 1) // block * block


def _q_blocks(flat2d: jax.Array, signed: bool) -> _Quantized:
    """Quantize (m, block) f32 -> log-codebook int8 + per-block scale."""
    absmax = jnp.max(jnp.abs(flat2d), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax, 1.0).astype(jnp.float32)
    mag = jnp.abs(flat2d) / scale
    logm = jnp.log10(jnp.maximum(mag, 1e-30)) / _DECADES  # in [-inf, 0]
    if signed:
        c = jnp.round(jnp.clip(127.0 + 126.0 * logm, 0.0, 127.0))
        c = jnp.where(mag > 0, jnp.maximum(c, 1.0), 0.0)
        q = (jnp.sign(flat2d) * c).astype(jnp.int8)
    else:
        c = jnp.round(jnp.clip(255.0 + 254.0 * logm, 0.0, 255.0))
        c = jnp.where(mag > 0, jnp.maximum(c, 1.0), 0.0)
        q = (c - 128.0).astype(jnp.int8)  # bias into int8 range
    return _Quantized(q, scale)


def _dq_blocks(qv: _Quantized, signed: bool) -> jax.Array:
    q = qv.q.astype(jnp.float32)
    if signed:
        c = jnp.abs(q)
        val = jnp.sign(q) * jnp.power(10.0, _DECADES * (c - 127.0) / 126.0)
    else:
        c = q + 128.0
        val = jnp.power(10.0, _DECADES * (c - 255.0) / 254.0)
    return jnp.where(c > 0, val, 0.0) * qv.scale


def _quantize(x: jax.Array, block: int, signed: bool) -> _Quantized:
    flat = x.reshape(-1).astype(jnp.float32)
    pad = _pad_len(flat.shape[0], block) - flat.shape[0]
    return _q_blocks(jnp.pad(flat, (0, pad)).reshape(-1, block), signed)


def _dequantize(qv: _Quantized, shape, signed: bool) -> jax.Array:
    flat = _dq_blocks(qv, signed)
    n = 1
    for s in shape:
        n *= s
    return flat.reshape(-1)[:n].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jax.Array
    mu: optax.Params   # pytree of _Quantized
    nu: optax.Params


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8,
                       block: int = DEFAULT_BLOCK
                       ) -> optax.GradientTransformation:
    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: _quantize(jnp.zeros_like(p, jnp.float32), block, True),
            params)
        nu = jax.tree_util.tree_map(
            lambda p: _quantize(jnp.zeros_like(p, jnp.float32), block, False),
            params)
        return Adam8bitState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        count = state.count + 1
        b1c = 1 - b1 ** count.astype(jnp.float32)
        b2c = 1 - b2 ** count.astype(jnp.float32)

        def adam_core(g2d, mu_q, nu_q):
            """(m, block) slabs -> (step_slab, mu_q', nu_q')."""
            g2d = g2d.astype(jnp.float32)  # per-slab upcast (bf16 grads)
            mu = _dq_blocks(mu_q, True)
            nu = _dq_blocks(nu_q, False)
            mu = b1 * mu + (1 - b1) * g2d
            nu = b2 * nu + (1 - b2) * g2d * g2d
            step = (mu / b1c) / (jnp.sqrt(nu / b2c) + eps)
            return step, _q_blocks(mu, True), _q_blocks(nu, False)

        def upd(g, mu_q, nu_q):
            shape, n = g.shape, g.size
            flat = g.reshape(-1)
            pad = _pad_len(n, block) - n
            g2d = jnp.pad(flat, (0, pad)).reshape(-1, block)
            nb = g2d.shape[0]
            if nb <= _CHUNK_BLOCKS:
                step2d, mu2, nu2 = adam_core(g2d, mu_q, nu_q)
            else:
                # chunk the blocks so f32 temporaries stay bounded
                nb_pad = _pad_len(nb, _CHUNK_BLOCKS)
                extra = nb_pad - nb

                def padb(x, fill=0):
                    return jnp.pad(x, ((0, extra), (0, 0)),
                                   constant_values=fill)

                nc = nb_pad // _CHUNK_BLOCKS

                def chunked(x):
                    return x.reshape(nc, _CHUNK_BLOCKS, x.shape[-1])

                carry = (chunked(padb(g2d)),
                         _Quantized(chunked(padb(mu_q.q)),
                                    chunked(padb(mu_q.scale, 1))),
                         _Quantized(chunked(padb(nu_q.q)),
                                    chunked(padb(nu_q.scale, 1))))

                def body(args):
                    gc, muc, nuc = args
                    return adam_core(gc, muc, nuc)

                step_c, mu_c, nu_c = jax.lax.map(body, carry)
                step2d = step_c.reshape(nb_pad, block)[:nb]
                mu2 = _Quantized(mu_c.q.reshape(nb_pad, block)[:nb],
                                 mu_c.scale.reshape(nb_pad, 1)[:nb])
                nu2 = _Quantized(nu_c.q.reshape(nb_pad, block)[:nb],
                                 nu_c.scale.reshape(nb_pad, 1)[:nb])
            step = step2d.reshape(-1)[:n].reshape(shape).astype(g.dtype)
            return step, mu2, nu2

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [upd(g, m, n) for g, m, n in zip(flat_u, flat_mu, flat_nu)]
        steps = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return steps, Adam8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 1e-2,
               block: int = DEFAULT_BLOCK) -> optax.GradientTransformation:
    """AdamW with 8-bit moment storage (bitsandbytes AdamW8bit stand-in)."""
    return optax.chain(
        scale_by_adam_8bit(b1, b2, eps, block),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
