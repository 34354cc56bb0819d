"""ViT-H tower attribution bench (real TPU): where do the non-MXU
milliseconds go?

The per-site MFU table (docs/ARCHITECTURE.md) has the ViT-H encode at
38.7% bf16 / 44.3% int8 — the weakest row. This script times the tower
alone (224px input, the shape encode_image feeds it) under ablations
that isolate the three candidate costs:

  base        full ViT-H-14 forward (batch 8)
  gelu_tanh   tanh-approximate GELU instead of open_clip's exact erf
              (VPU transcendental cost; 32 x (2056,5120) erf evals)
  no_attn     softmax-attention matmuls skipped, projections kept
              (the 257-token seq / d_head 80 sites pad MXU tiles:
              257 -> 3x128 rows, 80 -> 128-lane contraction)
  no_ln       ln_1/ln_2 skipped (64 small reductions / encode)
  flash       attention forced onto the flash kernel instead of the
              einsum path (dispatcher sends 33.8 MB scores to einsum
              at the default 128 MB threshold)

Timing methodology identical to scripts/bench_components.py (iterate
inside one jit over distinct inputs; re-randomize between repeats;
fetch the scalar inside the timed region — CLAUDE.md relay pitfalls).

Reference counterpart: open_clip ViT-H-14 tower built at
/root/reference/e4t/encoder.py:91-96 (torch, fp16/32, no such study).

Run: python scripts/bench_vit.py
Knobs: E4T_BENCH_BATCH (8), E4T_BENCH_ITERS (10),
E4T_VIT_CONFIGS (comma list of the names above; default all).
"""
import contextlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dataclasses

import jax
import jax.numpy as jnp


def main():
    from e4t_diffusion_tpu.utils.runtime import (apply_platform_override,
                                                 setup_compilation_cache)

    apply_platform_override()
    setup_compilation_cache()

    from bench import zeros_params
    from bench_components import scan_time
    from e4t_diffusion_tpu.models.vit import ViTConfig, VisionTransformer
    from e4t_diffusion_tpu.ops.attention import flash_threshold
    from e4t_diffusion_tpu.utils import flops as fl

    batch = int(os.environ.get("E4T_BENCH_BATCH", "8"))
    iters = int(os.environ.get("E4T_BENCH_ITERS", "10"))
    sel = os.environ.get("E4T_VIT_CONFIGS", "")
    want = lambda n: (not sel) or n in sel.split(",")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    base_cfg = ViTConfig.vit_h_14()
    CONFIGS = {
        "base": (base_cfg, None),
        "gelu_tanh": (dataclasses.replace(base_cfg, gelu_approximate=True),
                      None),
        "no_attn": (dataclasses.replace(base_cfg, ablate_attn=True), None),
        "no_ln": (dataclasses.replace(base_cfg, ablate_ln=True), None),
        "flash": (base_cfg, 0),  # force flash dispatch for all sites
        # packed-heads short-seq kernel (round 5; E4T_SHORTSEQ_MH_ATTN);
        # name suffix _g<N> selects heads-per-cell, e.g. mh_attn_g8
        "mh_attn": (base_cfg, None),
    }

    rng = jax.random.PRNGKey(0)
    size = base_cfg.image_size
    pixels = jax.random.normal(jax.random.PRNGKey(1),
                               (iters, batch, 3, size, size), dtype)
    # params are re-initialized per config: the ln ablation removes the
    # LayerNorm param sites entirely, so one shared tree wouldn't apply
    # mh_attn_g<N> variants: same config, different heads-per-cell pack
    for n in (sel.split(",") if sel else ()):
        if n.startswith("mh_attn_g") and n not in CONFIGS:
            CONFIGS[n] = (base_cfg, None)

    import e4t_diffusion_tpu.ops.attention as att

    @contextlib.contextmanager
    def mh_g(g):
        prev = att._SHORTSEQ_MH_G
        att._SHORTSEQ_MH_G = g
        try:
            yield
        finally:
            att._SHORTSEQ_MH_G = prev

    results = {}
    analytic = fl.vit_forward(base_cfg, batch)
    for name, (cfg, thresh) in CONFIGS.items():
        if not want(name):
            continue
        model = VisionTransformer(cfg, dtype=dtype)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            zeros_params(lambda k: model.init(
                k, jnp.zeros((1, 3, size, size)))["params"], rng))
        if name.startswith("mh_attn"):
            ctx = mh_g(int(name[len("mh_attn_g"):])
                       if name.startswith("mh_attn_g") else 16)
        elif thresh is not None:
            ctx = flash_threshold(thresh)
        else:
            ctx = contextlib.nullcontext()
        with ctx:
            ms = scan_time(
                lambda x: model.apply({"params": params}, x), pixels)
        results[f"{name}_ms"] = round(ms, 3)
        results[f"{name}_mfu"] = round(
            analytic / (ms * 1e-3) / fl.V5E_BF16_PEAK, 4)
    results["batch"] = batch
    results["note"] = ("tower-only at 224px; encode_image adds the "
                       "512->224 resize+normalize on top. MFU uses the "
                       "BASE analytic FLOPs for every row so ablation "
                       "deltas read as recovered milliseconds.")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
