"""E4T train steps (phase-1 pretrain, phase-2 tuning) as pjit-able pure fns.

Reference loops: /root/reference/pretrain_e4t.py:586-681 (trainables =
E4T encoder + weight offsets, everything else frozen) and
/root/reference/tuning_e4t.py:270-358 (trainables = encoder + FULL UNet
incl. offsets ± text encoder, with global-norm clipping).

The loss is identical in both phases
(/root/reference/pretrain_e4t.py:645-647):
    mse(unet(noisy, t, cond_states), target) + reg_lambda * ||word_embed||^2
where word_embed = class_embed + domain_embed_scale * e4t(image, tap) is
written into the placeholder slot of the prompt embeddings, and target is
epsilon or v (prediction_type).

TPU-first structure: one jitted step; the weight-offset fold
W_eff = W*(1+O) sits INSIDE the differentiated function so phase 1 trains
offsets through frozen W and phase 2 co-trains both factors (SURVEY.md
§7.3.2). Data parallelism comes from sharding the batch over the ``dp``
mesh axis — XLA inserts the gradient psum (no DDP wrapper).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from e4t_diffusion_tpu.diffusion.pipeline import E4TModules
from e4t_diffusion_tpu.diffusion.schedulers import DDPMScheduler
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.models.clip_text import embed_tokens
from e4t_diffusion_tpu.models.e4t_encoder import E4TEncoder
from e4t_diffusion_tpu.models.unet import pool_encoder_features
from e4t_diffusion_tpu.models.vae import AutoencoderKL, sample_latent


@dataclasses.dataclass(frozen=True)
class E4TTrainConfig:
    domain_embed_scale: float = 0.1
    reg_lambda: float = 0.01
    train_unet: bool = False          # phase 2 only
    train_text_encoder: bool = False  # phase 2 optional
    train_clip_vision: bool = False   # --unfreeze_clip_vision
    max_grad_norm: Optional[float] = None  # set (1.0) in phase 2
    remat_unet: bool = True
    # "nothing": rematerialize everything in the backward (lowest HBM).
    # "dots": save matmul/einsum outputs (the flash-attention custom call
    # is never saved either way) — less recompute, more activation HBM.
    remat_policy: str = "nothing"
    grads_bf16: bool = False  # halve gradient HBM (16GB-chip tuning aid)
    # True (default): trace with all-flash attention (flat backward HBM).
    # False: einsum attention everywhere — required under tensor
    # parallelism, where XLA partitions einsums over the sharded head axis
    # natively but cannot partition the Pallas custom call; the score
    # tensors are then sharded over tp, so the memory penalty divides.
    all_flash: bool = True
    # >1: split the in-step batch into this many sequential micro-batches
    # (lax.scan over the grad computation, f32 grad accumulator). Unlike
    # optax MultiSteps accumulation this adds NO persistent optimizer
    # state — activation peak is one micro-batch, grad peak one f32
    # accumulator + one live grad — so effective batch 16 fits a single
    # 16GB v5e where MultiSteps would not.
    micro_batches: int = 1


def split_trainable(params: Dict, cfg: E4TTrainConfig):
    """Partition the full param dict into (trainable, frozen) following the
    reference's optimizer param selection
    (/root/reference/pretrain_e4t.py:274-278, tuning_e4t.py:139-146).
    The E4T vision tower is frozen by default inside the encoder
    (/root/reference/e4t/encoder.py:98-99), trainable only with
    --unfreeze_clip_vision."""
    e4t = dict(params["e4t"])
    frozen = {"vae": params["vae"]}
    if not cfg.train_clip_vision and "clip_vision" in e4t:
        frozen["e4t_frozen"] = {"clip_vision": e4t.pop("clip_vision")}
    trainable = {"e4t": e4t, "offsets": params["offsets"]}
    if cfg.train_unet:
        trainable["unet"] = params["unet"]
    else:
        frozen["unet"] = params["unet"]
    if cfg.train_text_encoder:
        trainable["text"] = params["text"]
    else:
        frozen["text"] = params["text"]
    return trainable, frozen


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    merged = {**frozen, **trainable}
    e4t_frozen = merged.pop("e4t_frozen", None)
    if e4t_frozen is not None:
        merged["e4t"] = {**merged["e4t"], **e4t_frozen}
    return merged


def e4t_loss_fn(modules: E4TModules, ddpm: DDPMScheduler,
                cfg: E4TTrainConfig, trainable: Dict, frozen: Dict,
                batch: Dict, rng: jax.Array):
    """The shared E4T loss. batch:
      latents        (B, 4, h, w)  — already VAE-encoded and scaled
      pixel_values   (B, 3, H, W)  — [-1, 1]
      input_ids      (B, L) int32  — templated prompts w/ placeholder
      placeholder_idx(B,)   int32
      uncond_ids     (1, L) int32  — "" prompt
      class_token_id ()     int32
    """
    p = merge_params(trainable, frozen)
    rng_noise, rng_t, rng_vae = jax.random.split(rng, 3)
    if batch.get("latents") is not None:
        latents = batch["latents"]  # tuning: VAE-encoded once outside
    else:
        # pretrain encodes per step (/root/reference/pretrain_e4t.py:598-599)
        latents = jax.lax.stop_gradient(encode_latents(
            modules, p["vae"], batch["pixel_values"], rng_vae))
    bsz = latents.shape[0]

    noise = jax.random.normal(rng_noise, latents.shape, latents.dtype)
    if batch.get("timesteps") is not None:
        # optional per-sample override: curriculum / importance-sampled
        # t schedules, and probes that pin high-noise t where the image
        # conditioning is the only identity source
        timesteps = batch["timesteps"]
    else:
        timesteps = jax.random.randint(
            rng_t, (bsz,), 0, ddpm.config.num_train_timesteps)
    noisy = ddpm.add_noise(latents, noise, timesteps)

    # "" conditioning states + class embed are non-trained inputs
    # (detached in the reference: /root/reference/tuning_e4t.py:281,287)
    text_params = p["text"]
    uncond_states, _ = modules.text_encoder.apply(
        {"params": text_params}, batch["uncond_ids"])
    uncond_states = jax.lax.stop_gradient(
        jnp.broadcast_to(uncond_states, (bsz, *uncond_states.shape[1:])))
    class_embed = jax.lax.stop_gradient(
        embed_tokens(text_params, batch["class_token_id"][None])[0])

    # fold offsets inside the differentiated region (SURVEY.md §7.3.2)
    unet_params_eff = wo.fold_offset_bank(p["unet"], trainable["offsets"])

    unet_apply = modules.unet.apply
    if cfg.remat_unet:
        policy = {
            "nothing": jax.checkpoint_policies.nothing_saveable,
            "dots": jax.checkpoint_policies.dots_saveable,
        }[cfg.remat_policy]
        unet_apply = jax.checkpoint(
            unet_apply, static_argnums=(4,), policy=policy)

    tap = unet_apply({"params": unet_params_eff}, noisy, timesteps,
                     uncond_states, True)
    unet_feats = pool_encoder_features(tap)
    domain_embed = modules.e4t_encoder.apply(
        {"params": p["e4t"]}, batch["pixel_values"], unet_feats)
    word = class_embed[None] + cfg.domain_embed_scale * domain_embed

    inputs_embeds = embed_tokens(text_params, batch["input_ids"])
    inputs_embeds = inputs_embeds.at[
        jnp.arange(bsz), batch["placeholder_idx"]].set(
        word.astype(inputs_embeds.dtype))
    cond_states, _ = modules.text_encoder.apply(
        {"params": text_params}, inputs_embeds=inputs_embeds)

    pred = unet_apply({"params": unet_params_eff}, noisy, timesteps,
                      cond_states, False)
    target = ddpm.target(latents, noise, timesteps)

    loss_diff = jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    loss_reg = cfg.reg_lambda * jnp.sum(word.astype(jnp.float32) ** 2)
    loss = loss_diff + loss_reg
    return loss, {"loss": loss, "loss_diff": loss_diff, "loss_reg": loss_reg}


def make_optimizer(learning_rate, cfg: E4TTrainConfig,
                   weight_decay: float = 1e-2,
                   use_8bit: bool = False) -> optax.GradientTransformation:
    """AdamW matching torch defaults (the reference's optimizer,
    /root/reference/pretrain_e4t.py:387-392). ``use_8bit`` selects the
    block-quantized 8-bit-moment AdamW (training/optim8bit.py), the
    TPU-native bitsandbytes AdamW8bit equivalent."""
    if use_8bit:
        from e4t_diffusion_tpu.training.optim8bit import adamw_8bit

        tx = adamw_8bit(learning_rate, weight_decay=weight_decay)
    else:
        tx = optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                         weight_decay=weight_decay)
    if cfg.max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    return tx


@dataclasses.dataclass
class TrainState:
    step: jax.Array
    trainable: Dict
    opt_state: Any


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.trainable, s.opt_state), None),
    lambda aux, c: TrainState(*c),
)


def create_train_state(params: Dict, cfg: E4TTrainConfig,
                       tx: optax.GradientTransformation):
    trainable, frozen = split_trainable(params, cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=tx.init(trainable),
    ), frozen


def _microbatched_grads(modules: E4TModules, ddpm: DDPMScheduler,
                        cfg: E4TTrainConfig, trainable: Dict, frozen: Dict,
                        batch: Dict, rng: jax.Array):
    """Sequential lax.scan over micro-batches: per chunk one value_and_grad
    (remat'd UNet), accumulated into a single f32 grad tree. Loss/metrics
    are means of per-chunk means (equal chunk sizes), matching one big
    batch statistically; each chunk folds its index into the step rng so
    noise/timesteps differ per chunk like they would per sample."""
    mb = cfg.micro_batches
    bsz = batch["input_ids"].shape[0]
    assert bsz % mb == 0, (bsz, mb)
    csz = bsz // mb
    split_keys = [k for k in ("latents", "pixel_values", "input_ids",
                              "placeholder_idx")
                  if batch.get(k) is not None]
    stacked = {k: batch[k].reshape(mb, csz, *batch[k].shape[1:])
               for k in split_keys}
    rest = {k: v for k, v in batch.items() if k not in split_keys}

    def body(carry, xs):
        idx, chunk = xs
        chunk_batch = dict(rest, **chunk)
        (_, m), g = jax.value_and_grad(
            lambda t: e4t_loss_fn(modules, ddpm, cfg, t, frozen, chunk_batch,
                                  jax.random.fold_in(rng, idx)),
            has_aux=True)(trainable)
        acc_g, acc_m = carry
        acc_g = jax.tree_util.tree_map(
            lambda a, b: a + b.astype(jnp.float32) / mb, acc_g, g)
        acc_m = jax.tree_util.tree_map(lambda a, b: a + b / mb, acc_m, m)
        return (acc_g, acc_m), None

    zero_g = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape, jnp.float32), trainable)
    zero_m = {k: jnp.zeros((), jnp.float32)
              for k in ("loss", "loss_diff", "loss_reg")}
    (grads, metrics), _ = jax.lax.scan(
        body, (zero_g, zero_m), (jnp.arange(mb), stacked))
    grads = jax.tree_util.tree_map(
        lambda g, t: g.astype(t.dtype), grads, trainable)
    return grads, metrics


def make_train_step(modules: E4TModules, ddpm: DDPMScheduler,
                    cfg: E4TTrainConfig,
                    tx: optax.GradientTransformation,
                    tp_mesh=None) -> Callable:
    """Returns jit-able ``step(state, frozen, batch, rng) ->
    (state, metrics)``. Shard batch over ``dp`` to data-parallelize —
    gradients are reduced by XLA SPMD automatically. Pass the (dp, tp)
    mesh as ``tp_mesh`` when tensor parallelism is active: flash
    attention then runs under shard_map with heads sharded over ``tp``
    (a Pallas custom call is not SPMD-partitionable on its own), so the
    all-flash trace keeps its flat backward HBM under TP too."""
    import contextlib

    def step(state: TrainState, frozen: Dict, batch: Dict, rng: jax.Array):
        from e4t_diffusion_tpu.ops.attention import (flash_threshold,
                                                     head_sharded_attention)

        rng = jax.random.fold_in(rng, state.step)
        shard_ctx = (head_sharded_attention(tp_mesh) if tp_mesh is not None
                     else contextlib.nullcontext())
        # trace the loss with all-flash attention: the einsum path's score
        # tensors inflate peak HBM in the backward pass
        with shard_ctx, flash_threshold(0 if cfg.all_flash else (1 << 62)):
            if cfg.micro_batches <= 1:
                (_, metrics), grads = jax.value_and_grad(
                    lambda t: e4t_loss_fn(modules, ddpm, cfg, t, frozen,
                                          batch, rng),
                    has_aux=True)(state.trainable)
            else:
                grads, metrics = _microbatched_grads(
                    modules, ddpm, cfg, state.trainable, frozen, batch, rng)
        if cfg.grads_bf16:
            # halves peak gradient HBM; Adam math still runs in f32
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.bfloat16), grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(step=state.step + 1, trainable=trainable,
                               opt_state=opt_state)
        metrics = {k: v for k, v in metrics.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def encode_latents(modules: E4TModules, vae_params, pixel_values,
                   rng) -> jax.Array:
    """VAE-encode + posterior sample + scaling, as the train loops do
    (/root/reference/pretrain_e4t.py:598-599)."""
    mean, logvar = modules.vae.apply({"params": vae_params}, pixel_values,
                                     method=AutoencoderKL.encode)
    z = sample_latent(mean, logvar, rng)
    return z * modules.vae.config.scaling_factor
