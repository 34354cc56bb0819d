"""Measure phase-1 pre-training step throughput (512px, one v5e chip).

The reference's pretrain config (README.md:34-54): batch 16/device,
fp16, frozen UNet/VAE/text, trainables = E4T encoder + weight offsets.
Here: bf16 compute, frozen models stored bf16, 8-bit AdamW optional.
Gradients flow through the frozen UNet to the offsets (fold inside the
loss), so the backward still traverses the UNet — the step is fwd + bwd
with offsets+encoder-sized optimizer state only.

Uses zero-filled weights (timing is value-independent) and the real
phase-1 train step. Env: E4T_PRE_BATCH (16), E4T_PRE_STEPS (10),
E4T_PRE_RES (512), E4T_PRE_8BIT (1), E4T_PRE_UNFREEZE_VIT (0).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp


def zeros_params(init_fn, *args):
    shapes = jax.eval_shape(init_fn, *args)
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def main():
    from e4t_diffusion_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()
    batch = int(os.environ.get("E4T_PRE_BATCH", "16"))
    steps = int(os.environ.get("E4T_PRE_STEPS", "10"))
    res = int(os.environ.get("E4T_PRE_RES", "512"))
    use_8bit = os.environ.get("E4T_PRE_8BIT", "1") == "1"
    unfreeze_vit = os.environ.get("E4T_PRE_UNFREEZE_VIT", "0") == "1"
    micro = int(os.environ.get("E4T_PRE_MICRO", "1"))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    from e4t_diffusion_tpu.diffusion.pipeline import E4TModules
    from e4t_diffusion_tpu.diffusion.schedulers import DDPMScheduler
    from e4t_diffusion_tpu.models import weight_offsets as wo
    from e4t_diffusion_tpu.training.train_step import (
        E4TTrainConfig, create_train_state, make_optimizer, make_train_step)

    modules = E4TModules.create(dtype=dtype)
    tcfg = modules.text_encoder.config
    ecfg = modules.e4t_encoder.config
    rng = jax.random.PRNGKey(0)
    lat = res // 8

    params = {
        "unet": zeros_params(lambda k: modules.unet.init(
            k, jnp.zeros((1, 4, lat, lat)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, tcfg.hidden_size)))["params"], rng),
        "vae": zeros_params(lambda k: modules.vae.init(
            k, jnp.zeros((1, 3, res, res)), k)["params"], rng),
        "text": zeros_params(lambda k: modules.text_encoder.init(
            k, jnp.zeros((1, 77), jnp.int32))["params"], rng),
        "e4t": zeros_params(lambda k: modules.e4t_encoder.init(
            k, jnp.zeros((1, 3, res, res)),
            jnp.zeros((1, ecfg.unet_feature_dim)))["params"], rng),
        "offsets": zeros_params(
            lambda k: wo.init_offset_bank(k, modules.unet.config), rng),
    }

    # phase 1: train_unet=False, no clipping (reference parity)
    cfg = E4TTrainConfig(train_unet=False, train_text_encoder=False,
                         train_clip_vision=unfreeze_vit,
                         reg_lambda=0.01, max_grad_norm=None,
                         micro_batches=micro)
    tx = make_optimizer(1.6e-5, cfg, use_8bit=use_8bit)
    state, frozen = create_train_state(params, cfg, tx)
    frozen = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, frozen)

    n_train = sum(int(x.size) for x in
                  jax.tree_util.tree_leaves(state.trainable))
    print(f"trainable params: {n_train/1e6:.1f}M, 8bit={use_8bit}, "
          f"unfreeze_vit={unfreeze_vit}, batch={batch}")

    step_fn = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx),
                      donate_argnums=(0,))
    batch_data = {
        # phase 1 VAE-encodes per step (no precomputed latents)
        "latents": None,
        "pixel_values": jax.random.uniform(
            rng, (batch, 3, res, res), dtype, -1.0, 1.0),
        "input_ids": jnp.zeros((batch, 77), jnp.int32).at[:, 4].set(49408),
        "placeholder_idx": jnp.full((batch,), 4, jnp.int32),
        "uncond_ids": jnp.zeros((1, 77), jnp.int32),
        "class_token_id": jnp.asarray(5, jnp.int32),
    }

    t0 = time.perf_counter()
    state, metrics = step_fn(state, frozen, batch_data, rng)
    float(metrics["loss"])  # fetch = real relay sync (CLAUDE.md)
    compile_time = time.perf_counter() - t0
    print(f"compile+first step: {compile_time:.1f}s")

    t0 = time.perf_counter()
    for i in range(steps - 1):
        state, metrics = step_fn(state, frozen, batch_data,
                                 jax.random.fold_in(rng, i))
    float(metrics["loss"])
    run_time = time.perf_counter() - t0
    per_step = run_time / (steps - 1)
    from e4t_diffusion_tpu.utils.runtime import peak_hbm_gb

    print(json.dumps({
        "metric": f"pretrain_{res}px_bs{batch}_images_per_sec_per_chip",
        "value": round(batch / per_step, 3),
        "unit": "images/sec/chip",
        "per_step_s": round(per_step, 3),
        "compile_s": round(compile_time, 1),
        "micro_batches": micro,
        "peak_hbm_gb": peak_hbm_gb(),
    }))


if __name__ == "__main__":
    main()
