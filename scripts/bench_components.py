"""Per-component timing probe for the inference hot path (real TPU).

Breaks the E4T denoise step into its pieces and times each inside its own
jit (3 repeats, best-of): full UNet forward (uncond fused-tap flavor and
plain), text encoder, E4T fuse head, VAE decode, and the hoisted ViT-H.
Use to attribute step time before touching kernels.

Knobs: E4T_BENCH_BATCH (8), E4T_BENCH_RES (512), plus the attention knobs
E4T_FLASH_BLOCK_Q/K, E4T_FLASH_THRESHOLD_BYTES read by ops/attention.py.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from e4t_diffusion_tpu.utils.runtime import setup_compilation_cache
    from e4t_diffusion_tpu.diffusion.pipeline import E4TModules
    from e4t_diffusion_tpu.models.unet import pool_encoder_features
    from e4t_diffusion_tpu.models.e4t_encoder import E4TEncoder
    from e4t_diffusion_tpu.models.vae import AutoencoderKL
    from e4t_diffusion_tpu.models import weight_offsets as wo
    from bench import zeros_params

    setup_compilation_cache()
    batch = int(os.environ.get("E4T_BENCH_BATCH", "8"))
    res = int(os.environ.get("E4T_BENCH_RES", "512"))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    modules = E4TModules.create(dtype=dtype)
    tcfg = modules.text_encoder.config
    ecfg = modules.e4t_encoder.config
    rng = jax.random.PRNGKey(0)
    cast = lambda tree: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree)

    unet_params = cast(zeros_params(
        lambda k: modules.unet.init(
            k, jnp.zeros((1, 4, res // 8, res // 8)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, tcfg.hidden_size)))["params"], rng))
    text_params = cast(zeros_params(
        lambda k: modules.text_encoder.init(
            k, jnp.zeros((1, 77), jnp.int32))["params"], rng))
    e4t_params = cast(zeros_params(
        lambda k: modules.e4t_encoder.init(
            k, jnp.zeros((1, 3, res, res)),
            jnp.zeros((1, ecfg.unet_feature_dim)))["params"], rng))
    vae_params = cast(zeros_params(
        lambda k: modules.vae.init(
            k, jnp.zeros((1, 3, res, res)), k)["params"], rng))

    lat = jax.random.normal(rng, (batch, 4, res // 8, res // 8), dtype)
    ctx = jnp.zeros((batch, 77, tcfg.hidden_size), dtype)
    t = jnp.zeros((batch,), jnp.int32)
    ids = jnp.zeros((batch, 77), jnp.int32)
    pixel = jnp.zeros((batch, 3, res, res), dtype)

    results = {}

    unet_plain = jax.jit(lambda p, l, tt, c: modules.unet.apply(
        {"params": p}, l, tt, c))
    results["unet_fwd_ms"] = timeit(unet_plain, unet_params, lat, t, ctx) * 1e3

    unet_tap = jax.jit(lambda p, l, tt, c: modules.unet.apply(
        {"params": p}, l, tt, c, return_encoder_outputs="with_eps"))
    results["unet_fwd_with_tap_ms"] = timeit(
        unet_tap, unet_params, lat, t, ctx) * 1e3

    text_fn = jax.jit(lambda p, i: modules.text_encoder.apply(
        {"params": p}, i)[0])
    results["text_encoder_ms"] = timeit(text_fn, text_params, ids) * 1e3

    vit_fn = jax.jit(lambda p, x: modules.e4t_encoder.apply(
        {"params": p}, x, method=E4TEncoder.encode_image))
    results["vit_encode_ms"] = timeit(vit_fn, e4t_params, pixel) * 1e3
    clip_feats = vit_fn(e4t_params, pixel)

    tap = unet_tap(unet_params, lat, t, ctx)[1]
    feats = jax.jit(pool_encoder_features)(tap)
    fuse_fn = jax.jit(lambda p, cf, uf: modules.e4t_encoder.apply(
        {"params": p}, cf, uf, method=E4TEncoder.fuse))
    results["e4t_fuse_ms"] = timeit(fuse_fn, e4t_params, clip_feats, feats) * 1e3

    vae_fn = jax.jit(lambda p, l: modules.vae.apply(
        {"params": p}, l, method=AutoencoderKL.decode))
    results["vae_decode_ms"] = timeit(vae_fn, vae_params, lat) * 1e3

    fold_fn = jax.jit(lambda p, b: wo.fold_offset_bank(p, b))
    offsets = cast(zeros_params(
        lambda k: wo.init_offset_bank(k, modules.unet.config), rng))
    results["fold_offsets_ms"] = timeit(fold_fn, unet_params, offsets) * 1e3

    step_est = (results["unet_fwd_with_tap_ms"] + results["unet_fwd_ms"]
                + results["text_encoder_ms"] + results["e4t_fuse_ms"])
    results["est_cfg_step_ms"] = step_est
    results["batch"] = batch
    results["blocks"] = (os.environ.get("E4T_FLASH_BLOCK_Q", "512"),
                         os.environ.get("E4T_FLASH_BLOCK_K", "512"))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
