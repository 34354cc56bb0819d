"""Measure phase-2 domain-tuning wall clock (BASELINE.md: <30 s / 30 steps
on one v5e chip, 512px, full SD sizes).

Defaults fit a single 16GB v5e: batch 8 (reference effective batch 16 is
reachable via gradient accumulation), text encoder frozen (the reference
CLI default), 8-bit AdamW moments, frozen models in bf16. Batch 16 with
--train_text_encoder needs ~17.6GB and requires 2 chips or accumulation.

Uses zero-filled weights (timing is value-independent), the real phase-2
train step (full UNet + offsets + E4T head + text encoder trainable,
grad clipping, 8-bit AdamW by default), frozen params stored bf16.

Env: E4T_TUNE_BATCH (16), E4T_TUNE_STEPS (30), E4T_TUNE_RES (512),
E4T_TUNE_8BIT (1).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import os
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
    batch = int(os.environ.get("E4T_TUNE_BATCH", "4"))
    steps = int(os.environ.get("E4T_TUNE_STEPS", "30"))
    res = int(os.environ.get("E4T_TUNE_RES", "512"))
    use_8bit = os.environ.get("E4T_TUNE_8BIT", "1") == "1"
    train_text = os.environ.get("E4T_TUNE_TEXT", "0") == "1"
    grads_bf16 = os.environ.get("E4T_TUNE_BF16_GRADS", "0") == "1"
    micro = int(os.environ.get("E4T_TUNE_MICRO", "1"))
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

    cfg = E4TTrainConfig(train_unet=True, train_text_encoder=train_text,
                         reg_lambda=1e-4, max_grad_norm=1.0,
                         grads_bf16=grads_bf16, micro_batches=micro,
                         remat_policy=os.environ.get("E4T_TUNE_REMAT",
                                                     "nothing"))
    tx = make_optimizer(1.6e-5, cfg, use_8bit=use_8bit)
    state, frozen = create_train_state(params, cfg, tx)
    # frozen models cast to compute dtype (reference casts frozen to
    # weight_dtype, pretrain_e4t.py:416-423) — halves their HBM footprint
    frozen = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, frozen)

    n_train = sum(int(x.size) for x in
                  jax.tree_util.tree_leaves(state.trainable))
    print(f"trainable params: {n_train/1e6:.1f}M, 8bit={use_8bit}, "
          f"bf16_grads={grads_bf16}, batch={batch}")

    step_fn = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx),
                      donate_argnums=(0,))
    batch_data = {
        "latents": jax.random.normal(rng, (batch, 4, lat, lat), dtype),
        "pixel_values": jnp.zeros((batch, 3, res, res), dtype),
        "input_ids": jnp.zeros((batch, 77), jnp.int32).at[:, 4].set(49408),
        "placeholder_idx": jnp.full((batch,), 4, jnp.int32),
        "uncond_ids": jnp.zeros((1, 77), jnp.int32),
        "class_token_id": jnp.asarray(5, jnp.int32),
    }

    # compile (fetch the scalar: under the axon relay block_until_ready
    # on a small result can ack before execution — see CLAUDE.md)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, frozen, batch_data, rng)
    float(metrics["loss"])
    compile_time = time.perf_counter() - t0
    print(f"compile+first step: {compile_time:.1f}s")

    t0 = time.perf_counter()
    for i in range(steps - 1):
        state, metrics = step_fn(state, frozen, batch_data,
                                 jax.random.fold_in(rng, i))
    float(metrics["loss"])
    run_time = time.perf_counter() - t0
    per_step = run_time / (steps - 1)
    total_30 = per_step * steps
    from e4t_diffusion_tpu.utils.runtime import peak_hbm_gb

    print(json.dumps({
        "metric": f"tuning_{res}px_bs{batch}_wall_clock_30steps",
        "value": round(total_30, 2),
        "unit": "seconds",
        "per_step_s": round(per_step, 3),
        "compile_s": round(compile_time, 1),
        "vs_baseline": round(30.0 / total_30, 3),  # target: <30 s
        "micro_batches": micro,
        "effective_batch": batch,
        "peak_hbm_gb": peak_hbm_gb(),
    }))


if __name__ == "__main__":
    main()
