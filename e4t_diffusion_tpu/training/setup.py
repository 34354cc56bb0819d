"""Shared bootstrap for the train/inference CLIs.

Covers the model-loading preamble every reference entry point repeats
(/root/reference/pretrain_e4t.py:233-259, tuning_e4t.py:96-123,
inference.py:80-109): SD base -> flax params, tokenizer + placeholder
registration, E4T encoder init-or-load, LR schedule construction.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from e4t_diffusion_tpu.diffusion.pipeline import E4TModules
from e4t_diffusion_tpu.models.clip_text import resize_token_embeddings
from e4t_diffusion_tpu.models.e4t_encoder import E4TEncoder, E4TEncoderConfig
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.utils import artifacts
from e4t_diffusion_tpu.utils.tokenizer import CLIPTokenizer


def build_modules(base: Dict, e4t_cfg: E4TEncoderConfig,
                  dtype=jnp.float32) -> E4TModules:
    return E4TModules.create(
        unet_config=base["unet_config"], vae_config=base["vae_config"],
        text_config=base["text_config"], e4t_config=e4t_cfg, dtype=dtype)


def prepare_tokenizer(base: Dict, placeholder_token: str,
                      text_params: Dict, seed: int = 0,
                      require_new: bool = True):
    """Tokenizer + placeholder registration + embedding resize
    (/root/reference/pretrain_e4t.py:253-259)."""
    tokenizer = CLIPTokenizer.from_pretrained(
        base["tokenizer_dir"],
        model_max_length=base["text_config"].max_position_embeddings)
    n = tokenizer.add_tokens(placeholder_token)
    if n == 0 and require_new:
        raise ValueError(
            f"The tokenizer already contains the token {placeholder_token}. "
            f"Please pass a different `placeholder_token` that is not "
            f"already in the tokenizer.")
    text_params = resize_token_embeddings(
        text_params, len(tokenizer), jax.random.PRNGKey(seed))
    placeholder_id = tokenizer.convert_tokens_to_ids(placeholder_token)
    return tokenizer, text_params, placeholder_id


def resolve_class_token(tokenizer, domain_class_token: str) -> int:
    ids = tokenizer(domain_class_token, add_special_tokens=False,
                    padding=None)["input_ids"][0]
    assert len(ids) == 1, (
        f"domain_class_token {domain_class_token!r} must be a single token "
        f"(got {len(ids)}), see scripts/check_domain_class_token.py")
    return ids[0]


def init_e4t_encoder_params(modules: E4TModules, seed: int = 0) -> Dict:
    ecfg = modules.e4t_encoder.config
    return modules.e4t_encoder.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, 3, 64, 64)),
        jnp.zeros((1, ecfg.unet_feature_dim)))["params"]


class TemplateSampler:
    """Pre-tokenized template prompts; per-step sampling is just index
    draws (the reference re-tokenizes every step on the host,
    /root/reference/pretrain_e4t.py:609-617)."""

    def __init__(self, templates: List[str], tokenizer, placeholder_token: str,
                 placeholder_id: int, seed: int = 0):
        self.rng = np.random.default_rng(seed)
        self.input_ids = []
        self.placeholder_idx = []
        for t in templates:
            prompt = t.format(placeholder_token=placeholder_token)
            ids = tokenizer(prompt, padding="max_length", truncation=True,
                            max_length=tokenizer.model_max_length)["input_ids"][0]
            assert placeholder_id in ids, prompt
            self.input_ids.append(ids)
            self.placeholder_idx.append(ids.index(placeholder_id))
        self.input_ids = np.asarray(self.input_ids, np.int32)
        self.placeholder_idx = np.asarray(self.placeholder_idx, np.int32)
        self.uncond_ids = np.asarray(
            tokenizer("", padding="max_length", truncation=True,
                      max_length=tokenizer.model_max_length)["input_ids"],
            np.int32)

    def sample(self, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
        idx = self.rng.integers(0, len(self.input_ids), size=batch_size)
        return self.input_ids[idx], self.placeholder_idx[idx]


def make_lr_schedule(name: str, learning_rate: float, warmup_steps: int,
                     total_steps: int) -> optax.Schedule:
    """diffusers get_scheduler parity (/root/reference/pretrain_e4t.py:
    402-407; names at :110)."""
    warmup = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
    rest = max(total_steps - warmup_steps, 1)
    if name == "constant":
        return optax.constant_schedule(learning_rate)
    if name == "constant_with_warmup":
        body = optax.constant_schedule(learning_rate)
    elif name == "linear":
        body = optax.linear_schedule(learning_rate, 0.0, rest)
    elif name == "cosine":
        body = optax.cosine_decay_schedule(learning_rate, rest)
    elif name == "cosine_with_restarts":
        cycle = max(rest // 3, 1)
        body = optax.join_schedules(
            [optax.cosine_decay_schedule(learning_rate, cycle)] * 3,
            [cycle, 2 * cycle])
    elif name == "polynomial":
        body = optax.polynomial_schedule(learning_rate, 0.0, 1.0, rest)
    else:
        raise ValueError(f"unknown lr_scheduler {name}")
    if warmup_steps > 0:
        return optax.join_schedules([warmup, body], [warmup_steps])
    return body


def scale_learning_rate(args) -> float:
    """--scale_lr semantics (/root/reference/pretrain_e4t.py:354-361)."""
    lr = args.learning_rate
    if getattr(args, "scale_lr", False):
        world = jax.device_count()
        lr = (args.learning_rate * args.gradient_accumulation_steps
              * args.train_batch_size * world)
        print(f"Setting learning rate to {lr:.2e} = "
              f"{args.gradient_accumulation_steps} (accumulate_grad_batches)"
              f" * {world} (num_devices) * {args.train_batch_size} "
              f"(batchsize) * {args.learning_rate:.2e} (base_lr)")
    return lr
