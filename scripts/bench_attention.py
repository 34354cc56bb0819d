"""Per-site attention microbenchmark (real TPU).

Times the attention core (dispatcher, einsum, flash) for every (seq, d,
kv) shape the SD v1 UNet hits at 512px, iterated inside one jit via
lax.scan over distinct inputs (axon-relay methodology — see CLAUDE.md).

Shapes at batch 8 (bh = batch * heads = 64 everywhere in SD v1):
  self-attn:  4096/d40, 1024/d80, 256/d160, 64/d160
  cross-attn: kv=77 at the same q lengths
Multiply per-call ms by the site count to estimate the per-UNet-forward
attention budget (5, 5, 5, 1 sites resp. for down+up+mid at 512px).

Knobs: E4T_BENCH_ITERS (20), E4T_FLASH_BLOCK_Q/K, E4T_BENCH_IMPLS
(comma list: dispatch,einsum,flash).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def scan_time(fn, xs_stack, repeats=3):
    n = jax.tree_util.tree_leaves(xs_stack)[0].shape[0]

    @jax.jit
    def scanned(xs):
        def body(carry, x):
            out = fn(*x)
            return carry + jnp.sum(out.astype(jnp.float32)), ()
        tot, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return tot

    float(scanned(xs_stack))  # warmup; fetch forces a real relay sync
    best = float("inf")
    for r in range(repeats):
        xs = jax.tree_util.tree_map(
            lambda x: x + jnp.asarray(1e-3 * (r + 1), x.dtype), xs_stack)
        jax.block_until_ready(xs)
        t0 = time.perf_counter()
        # fetch the scalar INSIDE the timed region: under the axon relay,
        # block_until_ready on a small result can acknowledge before the
        # device actually executed; only a value fetch guarantees sync
        float(scanned(xs))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def main():
    from e4t_diffusion_tpu.utils.runtime import setup_compilation_cache
    from e4t_diffusion_tpu.ops import attention as A

    setup_compilation_cache()
    iters = int(os.environ.get("E4T_BENCH_ITERS", "20"))
    impls = os.environ.get("E4T_BENCH_IMPLS", "dispatch").split(",")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = jax.random.PRNGKey(0)

    # (label, bh, sq, sk, d, sites-per-unet-forward)
    shapes = [
        ("self_4096_d40", 64, 4096, 4096, 40, 5),
        ("self_1024_d80", 64, 1024, 1024, 80, 5),
        # high-res serving shapes (768px / 1024px latents; count 0 so the
        # 512px per-forward TOTAL is unaffected) — select explicitly via
        # E4T_BENCH_SHAPES
        ("self_9216_d40_768px", 64, 9216, 9216, 40, 0),
        ("self_16384_d40_1024px", 64, 16384, 16384, 40, 0),
        # ViT-H tower site (batch 8 x 16 heads, 257 tokens, d=80; 32
        # layers per encode) — einsum-dispatched at the default
        # threshold; select explicitly to compare einsum vs flash there
        ("vit_257_d80", 128, 257, 257, 80, 0),
        ("self_256_d160", 64, 256, 256, 160, 5),
        ("self_64_d160", 64, 64, 64, 160, 1),
        ("cross_4096_d40", 64, 4096, 77, 40, 5),
        ("cross_1024_d80", 64, 1024, 77, 80, 5),
        ("cross_256_d160", 64, 256, 77, 160, 5),
        ("cross_64_d160", 64, 64, 77, 160, 1),
    ]
    only = os.environ.get("E4T_BENCH_SHAPES", "")
    if only:
        keep = only.split(",")
        shapes = [s for s in shapes if s[0] in keep]

    def _int8(mode):
        def fn(q, k, v):
            with A.int8_flash_attention(mode):
                return A.flash_attention(q, k, v)
        return fn

    fns = {
        "dispatch": lambda q, k, v: A.dot_product_attention(q, k, v),
        "einsum": lambda q, k, v: A.einsum_attention(q, k, v),
        "flash": lambda q, k, v: A.flash_attention(q, k, v),
        # int8 inner matmuls (serving-only; only meaningful for the
        # flash-dispatched lowdim self-attn shapes)
        "int8qk": _int8("qk"),
        "int8qkpv": _int8("qkpv"),
    }

    results = {}
    total = {impl: 0.0 for impl in impls}
    for label, bh, sq, sk, d, count in shapes:
        ks = jax.random.split(rng, 3)
        # dispatcher expects (B, H, S, D); bh folded as B with H=1 is
        # equivalent for timing (same flattened grid)
        q = jax.random.normal(ks[0], (iters, bh, 1, sq, d), dtype)
        k = jax.random.normal(ks[1], (iters, bh, 1, sk, d), dtype)
        v = jax.random.normal(ks[2], (iters, bh, 1, sk, d), dtype)
        for impl in impls:
            ms = scan_time(fns[impl], (q, k, v))
            results[f"{label}:{impl}"] = round(ms, 3)
            total[impl] += ms * count
    for impl in impls:
        results[f"TOTAL_per_unet_fwd:{impl}"] = round(total[impl], 2)
    results["blocks"] = (os.environ.get("E4T_FLASH_BLOCK_Q", "2048"),
                         os.environ.get("E4T_FLASH_BLOCK_K", "512"))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
