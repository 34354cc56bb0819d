"""E4T weight-offset hypernetworks as a parameter functor.

Reference semantics (/root/reference/e4t/weightoffsets.py:5-23): per
attention projection, a no-input hypernetwork
    scalar v -> linear1: 1->row, linear2: 1->col  (rank-1 seed vx vy^T)
    -> linear_column: row->row applied column-wise
    -> linear_row: col->col applied row-wise
producing a full (out_features, in_features) offset O_t applied
multiplicatively: W_eff = W * (1 + O_t)
(/root/reference/e4t/models/cross_attention.py:297,305-307).

TPU-first design decision (SURVEY.md §7.1): the offsets are
*input-independent* — they depend only on their own parameters — so instead
of owning them as submodules recomputed on every attention call (7
processors × 96 modules per UNet forward in the reference), we keep them in
a separate pytree ("bank") keyed by attention-site path and FOLD them into
the UNet kernels:
  - once per sampling run at inference,
  - inside the differentiated loss during training (so gradients flow to
    offset params in phase 1 and to both W and offsets in phase 2 tuning).
This is mathematically identical to the reference.

Layout note: flax Dense kernels are (in, out) = the transpose of torch
Linear weights. ``compute_offset`` returns the (in, out)-layout offset so
``kernel_eff = kernel * (1 + O)`` matches the reference's
``W_eff = W * (1 + O_t)`` exactly.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

PyTree = Any

# pytree key (kept "wo"-prefixed so the artifact filter `"wo" in key`
# from the reference checkpoint format applies unchanged:
# /root/reference/e4t/utils.py:129-131)
WO_KEYS = ("wo_q", "wo_k", "wo_v")


def _torch_linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) on weight,
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on bias — both reduce to the same
    bound. Matters for training parity: at fan_in=1 the seed vectors start
    at O(1) magnitude, so initial offsets perturb W by ~20% (see SURVEY
    §2.2); a 'sensible' small init would train differently.
    Returns kernel in JAX (in, out) layout.
    """
    kkey, bkey = jax.random.split(key)
    bound = 1.0 / (fan_in ** 0.5)
    kernel = jax.random.uniform(kkey, (fan_in, fan_out), dtype, -bound, bound)
    bias = jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound)
    return {"kernel": kernel, "bias": bias}


def init_weight_offset(key, row_dim: int, col_dim: int, dtype=jnp.float32) -> Dict:
    """One WeightOffsets parameter set.

    row_dim = in_features of the target projection, col_dim = out_features
    (reference instantiates WeightOffsets(query_dim, inner_dim):
    /root/reference/e4t/models/cross_attention.py:97-99).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "v": jnp.ones((1,), dtype),
        "linear1": _torch_linear_init(k1, 1, row_dim, dtype),
        "linear2": _torch_linear_init(k2, 1, col_dim, dtype),
        "linear_column": _torch_linear_init(k3, row_dim, row_dim, dtype),
        "linear_row": _torch_linear_init(k4, col_dim, col_dim, dtype),
    }


def compute_offset(p: Dict) -> jax.Array:
    """Evaluate one hypernetwork -> (row_dim, col_dim) offset in JAX
    (in, out) kernel layout. Mirrors WeightOffsets.forward
    (/root/reference/e4t/weightoffsets.py:14-23) with the final transpose
    absorbed into the layout change."""
    v = p["v"]
    vx = v @ p["linear1"]["kernel"] + p["linear1"]["bias"]  # (row,)
    vy = v @ p["linear2"]["kernel"] + p["linear2"]["bias"]  # (col,)
    a = vx[:, None] * vy[None, :]                            # (row, col)
    # column-wise dense map (torch: linear_column over A^T rows)
    b = a.T @ p["linear_column"]["kernel"] + p["linear_column"]["bias"]  # (col, row)
    # row-wise dense map
    c = b.T @ p["linear_row"]["kernel"] + p["linear_row"]["bias"]        # (row, col)
    return c


def attention_sites(unet_config) -> List[Tuple[Tuple[str, ...], int, int]]:
    """Enumerate every CrossAttention site in the UNet param tree.

    Returns (path-to-attention-module, query_dim, cross_attention_dim) for
    attn1 (self) and attn2 (cross) of every BasicTransformerBlock — the
    reference attaches offsets to all of them
    (/root/reference/e4t/models/cross_attention.py:95-100 via
    attention.py:227-249). For SD v1: 16 sites x 2 attns = 32 entries,
    96 offset param sets.
    """
    sites = []
    cad = unet_config.cross_attention_dim
    block_out = tuple(unet_config.block_out_channels)
    layers = unet_config.layers_per_block

    def add_tx(path, dim):
        sites.append((path + ("attn1",), dim, dim))
        sites.append((path + ("attn2",), dim, cad))

    for bi, btype in enumerate(unet_config.down_block_types):
        if "CrossAttn" in btype:
            for li in range(layers):
                add_tx((f"down_blocks_{bi}", f"attentions_{li}",
                        "transformer_blocks_0"), block_out[bi])
    if unet_config.mid_block_type is None or "CrossAttn" in unet_config.mid_block_type:
        add_tx(("mid_block", "attentions_0", "transformer_blocks_0"),
               block_out[-1])
    rev = list(reversed(block_out))
    for bi, btype in enumerate(unet_config.up_block_types):
        if "CrossAttn" in btype:
            for li in range(layers + 1):
                add_tx((f"up_blocks_{bi}", f"attentions_{li}",
                        "transformer_blocks_0"), rev[bi])
    return sites


def init_offset_bank(key, unet_config, dtype=jnp.float32) -> Dict:
    """Initialize the full offsets pytree: {site-path joined by '.':
    {wo_q, wo_k, wo_v}}. inner_dim == query_dim for SD v1 attention."""
    sites = attention_sites(unet_config)
    keys = jax.random.split(key, len(sites) * 3).reshape(len(sites), 3, -1)
    bank = {}
    for (path, qdim, kvdim), ks in zip(sites, keys):
        inner = qdim  # heads * dim_head == query_dim in SD v1 blocks
        name = ".".join(path)
        bank[name] = {
            "wo_q": init_weight_offset(ks[0], qdim, inner, dtype),
            "wo_k": init_weight_offset(ks[1], kvdim, inner, dtype),
            "wo_v": init_weight_offset(ks[2], kvdim, inner, dtype),
        }
    return bank


def offset_linear_apply(wo_params: Dict, base_kernel: jax.Array,
                        x: jax.Array, bias: jax.Array = None) -> jax.Array:
    """y = x @ (W_base * (1 + offset)) with gradients flowing to the
    offset parameters through the product rule.

    JAX-native equivalent of the reference's experimental gradient-hook
    ``Model`` (/root/reference/e4t/weightoffsets.py:26-49), which mutated
    linear.weight.data and re-routed weight gradients into the
    hypernetwork via a backward hook. Here the same math is just function
    composition — differentiate normally. Kept as the single-layer demo /
    unit-test surface for the fold semantics used by fold_offset_bank.
    """
    o = compute_offset(wo_params)
    w_eff = base_kernel * (1.0 + o.astype(base_kernel.dtype))
    y = x @ w_eff
    if bias is not None:
        y = y + bias
    return y


_WO_TO_PROJ = {"wo_q": "to_q", "wo_k": "to_k", "wo_v": "to_v"}


def fold_offset_bank(unet_params: PyTree, bank: Dict) -> PyTree:
    """Return UNet params with effective kernels W*(1+O) at every site.

    Pure function of (unet_params, bank): safe to differentiate through
    (training) or to call once and reuse across a whole sampling run
    (inference) — the main structural speedup over the reference's
    per-call recomputation.

    The 96 hypernetwork evaluations are BATCHED by offset shape (vmap
    over sites stacked on a leading axis) instead of dispatched as 96
    chains of small GEMMs: SD-v1 has only 6 distinct (row, col) shapes,
    so the whole bank evaluates as 6 batched matmul chains that tile the
    MXU properly. Same math, same tree, differentiates identically
    (round 4; the per-site path measured 6.5 ms/run against a ~1.5 ms
    analytic FLOP floor — see docs/ARCHITECTURE.md).
    """
    import os

    import flax.core

    batched = os.environ.get("E4T_BATCHED_FOLD", "1") != "0"

    # group sites by offset shape: (row, col) -> list of (name, wo_key)
    groups: Dict[Tuple[int, int], List[Tuple[str, str]]] = {}
    for name, offsets in bank.items():
        for wo_key in WO_KEYS:
            p = offsets[wo_key]
            shape = (p["linear1"]["kernel"].shape[1],
                     p["linear2"]["kernel"].shape[1])
            groups.setdefault(shape, []).append((name, wo_key))

    # one vmapped hypernetwork eval per shape group (E4T_BATCHED_FOLD=0
    # falls back to per-site evals, kept for A/B measurement)
    computed: Dict[Tuple[str, str], jax.Array] = {}
    if batched:
        batched_offset = jax.vmap(compute_offset)
        for shape, members in groups.items():
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[bank[name][wo_key] for name, wo_key in members])
            offs = batched_offset(stacked)  # (n_sites, row, col)
            for i, key in enumerate(members):
                computed[key] = offs[i]
    else:
        for members in groups.values():
            for name, wo_key in members:
                computed[(name, wo_key)] = compute_offset(bank[name][wo_key])

    # unfreeze deep-copies the container structure (leaves shared), so the
    # in-place writes below never alias the caller's tree.
    params = flax.core.unfreeze(unet_params)
    for name in bank:
        attn = params
        for p in name.split("."):
            attn = attn[p]
        for wo_key, proj in _WO_TO_PROJ.items():
            o = computed[(name, wo_key)]
            kernel = attn[proj]["kernel"]
            attn[proj]["kernel"] = kernel * (1.0 + o.astype(kernel.dtype))
    return params
