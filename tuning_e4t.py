"""E4T phase-2 domain tuning CLI — TPU-native.

Flag-compatible with the reference (/root/reference/tuning_e4t.py:26-63):
loads phase-1 artifacts (weight offsets + encoder), fine-tunes the E4T
encoder + FULL UNet (± text encoder) on ONE image for ~15-30 steps, and
saves unet.pt / encoder.pt / text_encoder.pt / domain.png / config.json
with the pretraining config nested under pretrained_args.

Reference quirks preserved: the single image is transformed once
(random-crop pipeline) and VAE-encoded ONCE outside the loop — the latent
posterior is sampled a single time (/root/reference/tuning_e4t.py:266-269);
each step draws only fresh noise/timesteps/templates.

TPU structure: the whole step (offset fold + UNet tap + encoder + text +
UNet + loss + AdamW update with global-norm clip) is one jitted function;
batch 16 on one chip; target <30 s wall-clock for 30 steps on v5e
(BASELINE.md).
"""
import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image
from tqdm.auto import tqdm

from e4t_diffusion_tpu.config import load_config
from e4t_diffusion_tpu.diffusion.schedulers import DDPMScheduler
from e4t_diffusion_tpu.data.dataset import make_transform
from e4t_diffusion_tpu.parallel import mesh as pmesh
from e4t_diffusion_tpu.templates import resolve_templates
from e4t_diffusion_tpu.training.setup import (
    TemplateSampler, build_modules, make_lr_schedule,
    prepare_tokenizer, resolve_class_token, scale_learning_rate)
from e4t_diffusion_tpu.training.train_step import (
    E4TTrainConfig, create_train_state, encode_latents, make_optimizer,
    make_train_step, merge_params)
from e4t_diffusion_tpu.utils import artifacts
from e4t_diffusion_tpu.utils.image import load_image
from e4t_diffusion_tpu.utils.trackers import make_tracker


def parse_args():
    parser = argparse.ArgumentParser(
        description="Simple example of a training script.")
    # e4t configs
    parser.add_argument("--pretrained_model_name_or_path", type=str,
                        required=True,
                        help="Path to the phase-1 artifact directory.")
    parser.add_argument("--domain_embed_scale", type=float, default=0.1,
                        help="scale of e4t encoder's embedding")
    parser.add_argument("--reg_lambda", type=float, default=1e-4,
                        help="l2 regularization lambda")
    parser.add_argument("--train_image_path", type=str, default=None,
                        required=True, help="an image path (local)")
    parser.add_argument("--prompt_template", type=str, default=None,
                        help="If None, take the template from pretrained args.")
    # training
    parser.add_argument("--unfreeze_clip_vision", action="store_true",
                        default=False)
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1)
    parser.add_argument("--micro_batches", type=int, default=1,
                        help="split each step's batch into N sequential "
                             "micro-batches inside one jit (in-step grad "
                             "accumulation with no extra optimizer state; "
                             "effective batch stays train_batch_size)")
    parser.add_argument("--max_grad_norm", default=1.0, type=float)
    parser.add_argument("--learning_rate", type=float, default=1.6e-5)
    parser.add_argument("--scale_lr", action="store_true", default=False)
    parser.add_argument("--train_batch_size", type=int, default=16)
    parser.add_argument("--max_train_steps", type=int, default=15)
    parser.add_argument("--dataloader_num_workers", type=int, default=0)
    parser.add_argument("--checkpointing_steps", type=int, default=10000)
    parser.add_argument("--enable_xformers_memory_efficient_attention",
                        action="store_true",
                        help="parity no-op; flash attention is always used")
    parser.add_argument("--train_text_encoder", action="store_true")
    parser.add_argument("--tensor_parallel", type=int, default=1,
                        help="tensor-parallel degree: devices form a "
                             "(dp, tp) mesh and the UNet attention/FF "
                             "kernels are column/row-sharded over tp "
                             "(beyond reference parity)")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="capture a jax.profiler trace for steps "
                             "[2, 2+N) (post-compile)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="trace output dir (default <output>/profile)")
    parser.add_argument("--remat_policy", type=str, default="nothing",
                        choices=["nothing", "dots"],
                        help="UNet rematerialization policy: 'nothing' "
                             "recomputes everything in the backward "
                             "(lowest HBM); 'dots' saves matmul outputs "
                             "(faster backward, more activation HBM)")
    parser.add_argument("--grads_bf16", action="store_true",
                        help="cast gradients to bf16 before the optimizer "
                             "(reduces optimizer-input traffic; note the "
                             "f32 grads still materialize, so peak HBM is "
                             "unchanged — use batch 4 on 16GB chips)")
    # general
    parser.add_argument("--report_to", type=str, default=None,
                        choices=["tensorboard", "wandb"])
    parser.add_argument("--revision", type=str, default=None, required=False)
    parser.add_argument("--output_dir", type=str, default="e4t-model")
    parser.add_argument("--logging_dir", type=str, default="logs")
    parser.add_argument("--mixed_precision", type=str, default="no",
                        choices=["no", "fp16", "bf16"])
    parser.add_argument("--use_8bit_adam", action="store_true",
                        help="mapped to bf16 optimizer moments on TPU")
    parser.add_argument("--lr_scheduler", type=str, default="constant")
    parser.add_argument("--lr_warmup_steps", type=int, default=0)
    parser.add_argument("--local_rank", type=int, default=-1)
    args = parser.parse_args()
    env_local_rank = int(os.environ.get("LOCAL_RANK", -1))
    if env_local_rank != -1 and env_local_rank != args.local_rank:
        args.local_rank = env_local_rank
    return args


def main():
    args = parse_args()
    from e4t_diffusion_tpu.utils.runtime import (apply_platform_override,
                                                 setup_compilation_cache)

    apply_platform_override()
    setup_compilation_cache()
    pmesh_handle = pmesh.get_mesh(tp=args.tensor_parallel)
    np.random.seed(args.seed)

    # load pre-trained args (two-level config provenance, SURVEY.md §5.6)
    from e4t_diffusion_tpu.utils.hub import resolve_model_dir

    args.pretrained_model_name_or_path = resolve_model_dir(
        args.pretrained_model_name_or_path)
    pretrained_args = load_config(args.pretrained_model_name_or_path)
    sd_path = pretrained_args.pretrained_model_name_or_path
    base = artifacts.load_sd_base(sd_path)

    # compute dtype: fp16 maps to bf16 on TPU (documented deviation)
    dtype = jnp.float32 if args.mixed_precision == "no" else jnp.bfloat16
    enc_cfg = artifacts.e4t_encoder_config_from_args(
        pretrained_args, word_embedding_dim=base["text_config"].hidden_size,
        unet_config=base["unet_config"])
    modules = build_modules(base, enc_cfg, dtype=dtype)
    loaded = artifacts.load_e4t_weights(
        args.pretrained_model_name_or_path, base, enc_cfg)
    print(f"Loaded the pre-trained model from "
          f"{args.pretrained_model_name_or_path}")

    tokenizer, text_params, placeholder_id = prepare_tokenizer(
        base, pretrained_args.placeholder_token, loaded["text"],
        seed=args.seed)
    class_token_id = resolve_class_token(
        tokenizer, pretrained_args.domain_class_token)

    params = {"unet": loaded["unet"], "offsets": loaded["offsets"],
              "vae": loaded["vae"], "text": text_params,
              "e4t": loaded["e4t"]}

    # dataset: ONE image, transformed once
    pil_image = load_image(args.train_image_path)
    image = np.asarray(pil_image)
    transform = make_transform(args.resolution, random_crop_flag=True,
                               seed=args.seed)
    chw = transform(image)
    pil_image_to_save = Image.fromarray(
        ((chw.transpose(1, 2, 0) + 1.0) * 127.5).round().astype(np.uint8))
    pixel_values = np.broadcast_to(
        chw[None], (args.train_batch_size, *chw.shape)).copy()

    learning_rate = scale_learning_rate(args)
    cfg = E4TTrainConfig(
        domain_embed_scale=args.domain_embed_scale,
        reg_lambda=args.reg_lambda,
        train_unet=True,
        train_text_encoder=args.train_text_encoder,
        train_clip_vision=args.unfreeze_clip_vision,
        max_grad_norm=args.max_grad_norm,
        grads_bf16=args.grads_bf16,
        remat_policy=args.remat_policy,
        micro_batches=args.micro_batches,
    )
    schedule = make_lr_schedule(args.lr_scheduler, learning_rate,
                                args.lr_warmup_steps * args.gradient_accumulation_steps,
                                args.max_train_steps * args.gradient_accumulation_steps)
    tx = make_optimizer(schedule, cfg, use_8bit=args.use_8bit_adam)
    if args.gradient_accumulation_steps > 1:
        import optax

        tx = optax.MultiSteps(tx, args.gradient_accumulation_steps)
    state, frozen = create_train_state(params, cfg, tx)
    n_train = sum(int(np.prod(p.shape)) for p in
                  jax.tree_util.tree_leaves(state.trainable))
    print(f"Number of Trainable Parameters: {n_train * 1e-6:.2f} M")
    if args.tensor_parallel > 1:
        # phase 2 trains the UNet: shard its params over tp. The spec
        # rules match on path suffixes (…/to_q/kernel), so they apply to
        # the optimizer moment trees too — except the 8-bit optimizer,
        # whose chunk-quantized leaves don't preserve kernel shapes.
        state.trainable["unet"] = pmesh.apply_tensor_parallel(
            state.trainable["unet"], pmesh_handle)
        if not args.use_8bit_adam:
            state.opt_state = pmesh.apply_tensor_parallel(
                state.opt_state, pmesh_handle)
        print(f"tensor parallelism: UNet kernels sharded over "
              f"tp={args.tensor_parallel}")

    ddpm = DDPMScheduler(base["schedule_config"])
    step_fn = jax.jit(
        make_train_step(
            modules, ddpm, cfg, tx,
            tp_mesh=pmesh_handle if args.tensor_parallel > 1 else None),
        donate_argnums=(0,))

    # templates
    template_name = args.prompt_template or pretrained_args.prompt_template
    prompts = resolve_templates(template_name)
    sampler = TemplateSampler(prompts, tokenizer,
                              pretrained_args.placeholder_token,
                              placeholder_id, seed=args.seed)

    # VAE-encode the replicated image ONCE (latent posterior sampled once,
    # /root/reference/tuning_e4t.py:266-269)
    rng = jax.random.PRNGKey(args.seed)
    latents = jax.jit(lambda px, r: encode_latents(modules, params["vae"], px, r))(
        jnp.asarray(pixel_values), rng)

    tracker = make_tracker(args.report_to,
                           os.path.join(args.output_dir, args.logging_dir),
                           config=vars(args))

    def save_weights(step):
        args_to_save = dict(vars(args))
        args_to_save["pretrained_args"] = pretrained_args.to_dict()
        merged = merge_params(state.trainable, frozen)
        artifacts.save_e4t_weights(
            args.output_dir, step, args_to_save,
            merged["e4t"], enc_cfg,
            offsets=state.trainable["offsets"],
            unet_params=merged["unet"],
            text_params=merged["text"] if args.train_text_encoder else None,
            text_num_layers=base["text_config"].num_layers,
            domain_image=pil_image_to_save)
        print(f"[*] Weights saved at {os.path.join(args.output_dir, str(step))}")

    total_batch = (args.train_batch_size * jax.process_count()
                   * args.gradient_accumulation_steps)
    print("***** Running training *****")
    print(f"  Instantaneous batch size per device = {args.train_batch_size}")
    print(f"  Total train batch size (w. parallel, distributed & accumulation)"
          f" = {total_batch}")
    print(f"  Gradient Accumulation steps = {args.gradient_accumulation_steps}")
    print(f"  Total optimization steps = {args.max_train_steps}")

    progress = tqdm(range(args.max_train_steps), desc="Steps")
    t0 = time.perf_counter()
    global_step = 0
    trace_active = False
    pending = None  # (global_step, metrics) of the newest in-flight step

    def log_metrics(at_step, m):
        logs = {"loss": float(m["loss"]),
                "loss_diff": float(m["loss_diff"]),
                "loss_reg": float(m["loss_reg"]),
                "lr": float(schedule(at_step))}
        progress.set_postfix(**logs)
        tracker.log(logs, at_step)
    for step in range(args.max_train_steps * args.gradient_accumulation_steps):
        input_ids, ph_idx = sampler.sample(args.train_batch_size)
        batch = {
            "latents": latents,
            "pixel_values": jnp.asarray(pixel_values),
            "input_ids": jnp.asarray(input_ids),
            "placeholder_idx": jnp.asarray(ph_idx),
            "uncond_ids": jnp.asarray(sampler.uncond_ids),
            "class_token_id": jnp.asarray(class_token_id, jnp.int32),
        }
        if args.profile_steps:
            # post-compile window [2, 2+N): step 0 includes jit
            if step == 2:
                profile_dir = args.profile_dir or os.path.join(
                    args.output_dir, "profile")
                jax.block_until_ready(state.trainable)
                jax.profiler.start_trace(profile_dir)
                trace_active = True
            elif step == 2 + args.profile_steps:
                jax.block_until_ready(state.trainable)
                jax.profiler.stop_trace()
                trace_active = False
                print(f"[profiler] trace written")
        state, metrics = step_fn(state, frozen, batch,
                                 jax.random.fold_in(rng, 1 + step))
        if (step + 1) % args.gradient_accumulation_steps == 0:
            global_step += 1
            progress.update(1)
            # log the PREVIOUS step's metrics (finished while this step
            # dispatched) so float() never stalls on the in-flight step —
            # see the same pattern in pretrain_e4t.py
            if pending is not None:
                log_metrics(*pending)
            pending = (global_step, metrics)
            if global_step % args.checkpointing_steps == 0:
                save_weights(global_step)
    if pending is not None:
        log_metrics(*pending)
    jax.block_until_ready(state.trainable)
    if trace_active:  # window extended past the loop end — flush it
        jax.profiler.stop_trace()
        print("[profiler] trace written (window clamped to loop end)")
    wall = time.perf_counter() - t0
    print(f"Training wall-clock: {wall:.2f}s "
          f"({args.max_train_steps} steps incl. compile)")
    save_weights(global_step)
    tracker.finish()


if __name__ == "__main__":
    main()
