"""E4T phase-1 pretraining CLI — TPU-native.

Flag-compatible with the reference (/root/reference/pretrain_e4t.py:66-122).
Trains the E4T encoder + the 96 weight-offset hypernetworks on a domain
dataset; UNet base weights, VAE and text encoder stay frozen
(/root/reference/pretrain_e4t.py:274-278).

TPU-native runtime replacing accelerate/DDP/NCCL:
- data parallelism = batch sharded over the ``dp`` jax.sharding.Mesh axis,
  params replicated; XLA SPMD emits the gradient all-reduce over ICI;
- one jitted train step (VAE encode + offset fold + both UNet passes +
  loss + AdamW update) with full UNet remat;
- input pipeline: folder / HF datasets / tar shards with per-process
  sharding (replaces wds.split_by_node);
- Orbax resumable state (checkpoint-<step>, 'latest' resolution) +
  reference-layout deployable artifacts every --checkpointing_steps;
- in-loop qualitative eval every --log_steps renders sample grids through
  the same pipeline used at inference (tensorboard/wandb).
"""
import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from tqdm.auto import tqdm

from e4t_diffusion_tpu.config import AttributeDict
from e4t_diffusion_tpu.data.dataset import E4TDataLoader
from e4t_diffusion_tpu.diffusion.pipeline import StableDiffusionE4TPipeline
from e4t_diffusion_tpu.diffusion.schedulers import (
    DDPMScheduler, DDIMScheduler)
from e4t_diffusion_tpu.parallel import mesh as pmesh
from e4t_diffusion_tpu.templates import resolve_templates
from e4t_diffusion_tpu.training.setup import (
    TemplateSampler, build_modules, init_e4t_encoder_params, make_lr_schedule,
    prepare_tokenizer, resolve_class_token, scale_learning_rate)  # noqa: E501
from e4t_diffusion_tpu.training.train_step import (
    E4TTrainConfig, create_train_state, make_optimizer, make_train_step,
    merge_params)
from e4t_diffusion_tpu.utils import artifacts
from e4t_diffusion_tpu.utils.image import image_grid, to_pil
from e4t_diffusion_tpu.utils.trackers import make_tracker
from e4t_diffusion_tpu.utils.profiling import StepTimer


def parse_args():
    parser = argparse.ArgumentParser(
        description="Simple example of a training script.")
    # e4t configs
    parser.add_argument("--pretrained_model_name_or_path", type=str,
                        default="runwayml/stable-diffusion-v1-5",
                        required=False,
                        help="Path to a LOCAL diffusers-format SD checkpoint "
                             "directory (no hub download on TPU pods).")
    parser.add_argument("--clip_model_name_or_path", type=str,
                        default="ViT-H-14::laion2b_s32b_b79k",
                        help="'arch::version'; weights loaded from "
                             "--clip_vision_weights if given, else random init")
    parser.add_argument("--clip_vision_weights", type=str, default=None,
                        help="path to an open_clip visual-tower .pt to "
                             "initialize the E4T vision tower")
    parser.add_argument("--placeholder_token", type=str, default="*s")
    parser.add_argument("--domain_class_token", type=str, default=None,
                        required=True)
    parser.add_argument("--domain_embed_scale", type=float, default=0.1)
    parser.add_argument("--reg_lambda", type=float, default=0.01)
    parser.add_argument("--prompt_template", type=str,
                        default="a photo of {placeholder_token}")
    parser.add_argument("--train_image_dataset", type=str, default=None,
                        required=True)
    parser.add_argument("--unfreeze_clip_vision", action="store_true",
                        default=False)
    parser.add_argument("--webdataset", action="store_true", default=False)
    parser.add_argument("--iterable_dataset", action="store_true",
                        default=False)
    # training
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1)
    parser.add_argument("--micro_batches", type=int, default=1,
                        help="split each step's batch into N sequential "
                             "micro-batches inside one jit (in-step grad "
                             "accumulation with no extra optimizer state; "
                             "effective batch stays train_batch_size)")
    parser.add_argument("--max_grad_norm", default=1.0, type=float,
                        help="parity flag; pretrain does not clip "
                             "(reference has it commented out)")
    parser.add_argument("--learning_rate", type=float, default=1.6e-5)
    parser.add_argument("--scale_lr", action="store_true", default=False)
    parser.add_argument("--train_batch_size", type=int, default=16)
    parser.add_argument("--num_train_epochs", type=int, default=1)
    parser.add_argument("--max_train_steps", type=int, default=30000)
    parser.add_argument("--dataloader_num_workers", type=int, default=0)
    parser.add_argument("--checkpointing_steps", type=int, default=10000)
    parser.add_argument("--async_checkpointing", action="store_true",
                        help="Orbax async saves: the periodic train-state "
                             "checkpoint's D2H transfer + write run on "
                             "background threads while training continues "
                             "(beyond reference parity)")
    parser.add_argument("--resume_from_checkpoint", type=str, default=None)
    parser.add_argument("--log_steps", type=int, default=1000)
    parser.add_argument("--enable_xformers_memory_efficient_attention",
                        action="store_true",
                        help="parity no-op; flash attention is always used")
    # log
    parser.add_argument("--save_sample_prompt", type=str,
                        default="a photo of *s,a photo of *s in the style of monet")
    parser.add_argument("--n_save_sample", type=int, default=4)
    parser.add_argument("--save_guidance_scale", type=float, default=7.5)
    parser.add_argument("--save_inference_steps", type=int, default=50)
    # general
    parser.add_argument("--report_to", type=str, default="wandb",
                        choices=["tensorboard", "wandb"])
    parser.add_argument("--revision", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default="e4t-model")
    parser.add_argument("--logging_dir", type=str, default="logs")
    parser.add_argument("--mixed_precision", type=str, default="no",
                        choices=["no", "fp16", "bf16"])
    parser.add_argument("--use_8bit_adam", action="store_true")
    parser.add_argument("--lr_scheduler", type=str, default="constant")
    parser.add_argument("--lr_warmup_steps", type=int, default=0)
    parser.add_argument("--local_rank", type=int, default=-1)
    parser.add_argument("--vit_config", type=str, default=None,
                        choices=[None, "tiny"],
                        help="test hook: tiny vision-tower geometry")
    parser.add_argument("--zero1", action="store_true", default=False,
                        help="shard optimizer state over the dp mesh axis "
                             "(ZeRO-1); cuts optimizer HBM by ~n_devices")
    parser.add_argument("--tensor_parallel", type=int, default=1,
                        help="tensor-parallel degree: devices form a "
                             "(dp, tp) mesh and the UNet attention/FF "
                             "kernels are column/row-sharded over tp "
                             "(beyond reference parity; attention runs "
                             "the einsum path, which XLA partitions over "
                             "the head axis)")
    # profiling (new subsystem vs reference, SURVEY.md §5.1)
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="capture a jax.profiler trace for steps "
                             "[10, 10+N)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="trace output dir (default <output>/profile)")
    args = parser.parse_args()
    env_local_rank = int(os.environ.get("LOCAL_RANK", -1))
    if env_local_rank != -1 and env_local_rank != args.local_rank:
        args.local_rank = env_local_rank
    if args.train_image_dataset is None:
        raise ValueError("You must specify a train data directory.")
    if args.domain_class_token is None:
        raise ValueError("You must specify a coarse-class token.")
    return args


def main():
    args = parse_args()
    pmesh.maybe_initialize_distributed()
    from e4t_diffusion_tpu.utils.runtime import (apply_platform_override,
                                                 setup_compilation_cache)

    apply_platform_override()
    setup_compilation_cache()
    mesh = pmesh.get_mesh(tp=args.tensor_parallel)
    is_main = jax.process_index() == 0
    np.random.seed(args.seed)
    print(f"mesh: {mesh}")

    base = artifacts.load_sd_base(args.pretrained_model_name_or_path)
    dtype = jnp.float32 if args.mixed_precision == "no" else jnp.bfloat16

    from e4t_diffusion_tpu.config import AttributeDict as _AD

    enc_cfg = artifacts.e4t_encoder_config_from_args(
        _AD(vars(args)), word_embedding_dim=base["text_config"].hidden_size,
        unet_config=base["unet_config"])
    modules = build_modules(base, enc_cfg, dtype=dtype)

    # E4T encoder: resume from an existing artifact dir if present, else init
    prior_enc = os.path.join(args.pretrained_model_name_or_path, "encoder.pt")
    prior_wo = os.path.join(args.pretrained_model_name_or_path,
                            "weight_offsets.pt")
    if os.path.exists(prior_enc):
        from e4t_diffusion_tpu.utils import convert

        e4t_params = convert.e4t_encoder_from_torch(
            convert.load_torch_state_dict(prior_enc), enc_cfg)
        print(f"Resuming encoder from {prior_enc}")
    else:
        e4t_params = init_e4t_encoder_params(modules, seed=args.seed)
        if args.clip_vision_weights:
            from e4t_diffusion_tpu.utils import convert

            sd = convert.load_torch_state_dict(args.clip_vision_weights)
            prefix = "visual." if any(k.startswith("visual.") for k in sd) else ""
            e4t_params = dict(e4t_params)
            e4t_params["clip_vision"] = convert.vit_from_torch(
                sd, enc_cfg.vit, prefix=prefix)
            print(f"Loaded CLIP vision tower from {args.clip_vision_weights}")

    from e4t_diffusion_tpu.models import weight_offsets as wo

    if os.path.exists(prior_wo):
        from e4t_diffusion_tpu.utils import convert

        offsets = convert.offset_bank_from_torch(
            convert.load_torch_state_dict(prior_wo))
        print(f"Resuming offsets from {prior_wo}")
    else:
        offsets = wo.init_offset_bank(jax.random.PRNGKey(args.seed),
                                      base["unet_config"])

    tokenizer, text_params, placeholder_id = prepare_tokenizer(
        base, args.placeholder_token, base["text"], seed=args.seed)
    class_token_id = resolve_class_token(tokenizer, args.domain_class_token)

    params = {"unet": base["unet"], "offsets": offsets, "vae": base["vae"],
              "text": text_params, "e4t": e4t_params}

    learning_rate = scale_learning_rate(args)
    cfg = E4TTrainConfig(
        domain_embed_scale=args.domain_embed_scale,
        reg_lambda=args.reg_lambda,
        train_unet=False, train_text_encoder=False,
        train_clip_vision=args.unfreeze_clip_vision,
        max_grad_norm=None,  # pretrain does not clip (reference parity)
        micro_batches=args.micro_batches,
    )
    schedule = make_lr_schedule(
        args.lr_scheduler, learning_rate,
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

    # resume
    rng = jax.random.PRNGKey(args.seed)
    global_step = 0
    if args.resume_from_checkpoint:
        path = (artifacts.find_latest_checkpoint(args.output_dir)
                if args.resume_from_checkpoint == "latest"
                else args.resume_from_checkpoint)
        if path is None:
            print(f"Checkpoint '{args.resume_from_checkpoint}' does not "
                  f"exist. Starting a new training run.")
        else:
            print(f"Resuming from checkpoint {path}")
            state, rng, _ = artifacts.restore_train_state(path, state, rng)
            global_step = int(os.path.basename(path).split("-")[1])

    # data
    loader = E4TDataLoader(
        args.train_image_dataset, batch_size=args.train_batch_size,
        resolution=args.resolution, random_crop=True,
        seed=args.seed + global_step, use_tar=args.webdataset,
        streaming=args.iterable_dataset,
        num_workers=args.dataloader_num_workers)
    if loader.num_samples:
        print(f"dataset size: {loader.num_samples}")

    if args.zero1:
        from e4t_diffusion_tpu.training.train_step import TrainState

        state = TrainState(
            step=jax.device_put(state.step, pmesh.replicated(mesh)),
            trainable=pmesh.replicate(state.trainable, mesh),
            opt_state=pmesh.apply_zero1(state.opt_state, mesh))
        frozen = pmesh.replicate(frozen, mesh)
        print("ZeRO-1: optimizer state sharded over dp")
    if args.tensor_parallel > 1:
        # phase 1 freezes the UNet; its params are the big TP win
        frozen["unet"] = pmesh.apply_tensor_parallel(frozen["unet"], mesh)
        print(f"tensor parallelism: UNet kernels sharded over "
              f"tp={args.tensor_parallel}")

    ddpm = DDPMScheduler(base["schedule_config"])
    step_fn = jax.jit(
        make_train_step(modules, ddpm, cfg, tx,
                        tp_mesh=mesh if args.tensor_parallel > 1 else None),
        donate_argnums=(0,))

    prompt_templates = resolve_templates(args.prompt_template)
    if args.prompt_template in ("normal", "face", "art"):
        print(f"Using the default {len(prompt_templates)} templates!")
    sampler = TemplateSampler(prompt_templates, tokenizer,
                              args.placeholder_token, placeholder_id,
                              seed=args.seed)

    tracker = make_tracker(args.report_to,
                           os.path.join(args.output_dir, args.logging_dir),
                           config=vars(args), is_main=is_main)

    # in-loop qualitative eval (/root/reference/pretrain_e4t.py:452-513)
    e4t_config = AttributeDict(vars(args))
    sample_pipe = None

    def sample(images_chw, step):
        nonlocal sample_pipe
        merged = merge_params(state.trainable, frozen)
        pipe_params = {"unet": merged["unet"], "offsets": merged["offsets"],
                       "vae": merged["vae"], "text": merged["text"],
                       "e4t": merged["e4t"]}
        if sample_pipe is None:
            sample_pipe = StableDiffusionE4TPipeline(
                modules, pipe_params, tokenizer, e4t_config,
                scheduler=DDIMScheduler(base["schedule_config"]),
                already_added_placeholder_token=True)
        else:
            sample_pipe.params = pipe_params
        inputs = to_pil(np.clip((images_chw + 1.0) / 2.0, 0, 1))
        chosen = inputs[: args.n_save_sample]
        prompts = args.save_sample_prompt.split(",")
        grid_rows = []
        for prompt in tqdm(prompts, desc="Generating samples"):
            for img in chosen:
                out = sample_pipe(
                    prompt, img,
                    num_inference_steps=args.save_inference_steps,
                    guidance_scale=args.save_guidance_scale,
                    height=args.resolution, width=args.resolution,
                    seed=int(np.random.randint(0, 2**31)),
                    output_type="pil")
                grid_rows.extend(out)
        input_grid = image_grid(chosen, 1, len(chosen))
        sample_grid = image_grid(grid_rows, len(prompts), len(chosen))
        sample_dir = os.path.join(args.output_dir, "samples")
        os.makedirs(sample_dir, exist_ok=True)
        input_grid.save(os.path.join(sample_dir, f"input-{step}.png"))
        sample_grid.save(os.path.join(sample_dir, f"sample-{step}.png"))
        tracker.log_images({"train/inputs": input_grid,
                            "train/samples": sample_grid}, step)

    def save_weights(step):
        if not is_main:
            return
        merged = merge_params(state.trainable, frozen)
        artifacts.save_e4t_weights(
            args.output_dir, step, vars(args), merged["e4t"], enc_cfg,
            offsets=merged["offsets"])
        print(f"[*] Weights saved at "
              f"{os.path.join(args.output_dir, str(step))}")

    total_batch = (args.train_batch_size * jax.device_count()
                   * args.gradient_accumulation_steps)
    print("***** Running training *****")
    print(f"  Instantaneous batch size per device = {args.train_batch_size}")
    print(f"  Total train batch size (w. parallel, distributed & "
          f"accumulation) = {total_batch}")
    print(f"  Gradient Accumulation steps = {args.gradient_accumulation_steps}")
    print(f"  Total optimization steps = {args.max_train_steps}")

    progress = tqdm(range(args.max_train_steps), initial=global_step,
                    disable=not is_main, desc="Steps")
    micro_step = 0
    pending = None  # (global_step, metrics) of the newest in-flight step

    def log_metrics(at_step, m):
        logs = {"train/loss": float(m["loss"]),
                "train/loss_diff": float(m["loss_diff"]),
                "train/loss_reg": float(m["loss_reg"]),
                "train/lr": float(schedule(at_step))}
        logs.update(timer.metrics())
        progress.set_postfix(**logs)
        tracker.log(logs, at_step)
        return logs
    t_start = time.perf_counter()
    timer = StepTimer(warmup_steps=2, batch_size=args.train_batch_size
                      * jax.device_count())
    profile_dir = args.profile_dir or os.path.join(args.output_dir, "profile")
    profiling = False
    # loop-invariant device constants, placed once
    uncond_ids_dev = jax.device_put(
        jnp.asarray(sampler.uncond_ids), pmesh.replicated(mesh))
    class_token_dev = jax.device_put(
        jnp.asarray(class_token_id, jnp.int32), pmesh.replicated(mesh))

    def place(batch_np):
        """Host->device placement for one micro-batch; runs ahead of the
        consuming step via device_prefetch (device_put is async, so the
        transfer overlaps the in-flight step's compute)."""
        input_ids, ph_idx = sampler.sample(args.train_batch_size)
        batch = pmesh.shard_batch({
            "latents": None,
            "pixel_values": batch_np["pixel_values"],
            "input_ids": input_ids,
            "placeholder_idx": ph_idx,
        }, mesh)
        batch["uncond_ids"] = uncond_ids_dev
        batch["class_token_id"] = class_token_dev
        batch["latents"] = None
        return batch, batch_np

    from e4t_diffusion_tpu.data.prefetch import device_prefetch
    from e4t_diffusion_tpu.utils.runtime import GracefulShutdown

    # TPU pod preemptions deliver SIGTERM with a grace window: poll the
    # flag at step boundaries and exit through the normal save path
    # (the reference only handled Ctrl-C)
    shutdown = GracefulShutdown()
    try:
        for batch, batch_np in device_prefetch(loader, place, depth=2):
            state, metrics = step_fn(state, frozen, batch,
                                     jax.random.fold_in(rng, micro_step))
            micro_step += 1
            if micro_step % args.gradient_accumulation_steps != 0:
                continue
            global_step += 1
            progress.update(1)
            if args.profile_steps and is_main:
                if global_step == 10 and not profiling:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                elif profiling and global_step == 10 + args.profile_steps:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"[profiler] trace written to {profile_dir}")
            timer.step()
            if global_step % args.checkpointing_steps == 0:
                save_weights(global_step)
                if is_main:
                    path = artifacts.save_train_state(
                        args.output_dir, global_step, state, rng,
                        async_save=args.async_checkpointing)
                    print(f"Saved state to {path}"
                          + (" (async)" if args.async_checkpointing
                             else ""))
            if global_step == 1 or global_step % args.log_steps == 0:
                if is_main:
                    sample(batch_np["pixel_values"], global_step)
            # log the PREVIOUS step's metrics: float() forces a device
            # sync, and the previous step's arrays finished while this
            # step was being dispatched — the host never stalls on the
            # step it just launched, so dispatch stays ahead of the
            # device (the relay's ~20-30 ms round trip would otherwise
            # serialize every step)
            if pending is not None:
                log_metrics(*pending)
            pending = (global_step, metrics)
            if shutdown.requested:
                print(f"Preemption ({shutdown.describe()}) — "
                      f"checkpointing at step {global_step}")
                if is_main:
                    # sync: must be committed before the grace window ends
                    artifacts.wait_for_checkpoints()
                    path = artifacts.save_train_state(
                        args.output_dir, global_step, state, rng)
                    print(f"Saved state to {path}")
                break
            if global_step >= args.max_train_steps:
                break
    except KeyboardInterrupt:
        print("Summoning checkpoint...")
    shutdown.restore()
    if pending is not None:
        try:
            log_metrics(*pending)
        except Exception:
            pass  # interrupted mid-step: the last metrics may be unfinished
    if profiling:
        jax.profiler.stop_trace()
    wall = time.perf_counter() - t_start
    if global_step > 0:
        print(f"steps/sec: {global_step / wall:.3f}")
        for k, v in timer.metrics().items():
            print(f"  {k}: {v:.4f}")
    save_weights(global_step)
    artifacts.wait_for_checkpoints()  # flush any in-flight async save
    tracker.finish()


if __name__ == "__main__":
    main()
