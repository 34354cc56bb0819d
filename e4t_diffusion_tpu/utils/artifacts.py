"""Artifact I/O: reference-compatible checkpoints + Orbax training state.

Two distinct mechanisms, mirroring SURVEY.md §5.4:

1. Deployable artifacts — a directory ``output_dir/<step>/`` holding
   config.json (argparse namespace verbatim; tuning nests the pretraining
   config under pretrained_args), weight_offsets.pt (pretrain) or unet.pt
   (tuning), encoder.pt, optional text_encoder.pt, domain.png
   (/root/reference/pretrain_e4t.py:515-528, tuning_e4t.py:220-240).
   Saved as REAL torch .pt files so artifacts interchange with the
   reference ecosystem.

2. Resumable training state — Orbax checkpoints ``checkpoint-<step>/``
   with trainable params, optimizer state, and step; ``latest`` resolution
   scans for the max step (/root/reference/pretrain_e4t.py:536-558).

Also hosts the SD-base loader for local diffusers-format checkpoints
(unet/ vae/ text_encoder/ tokenizer/ scheduler/ subfolders, .bin or
.safetensors) — the no-network replacement for from_pretrained.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax

from e4t_diffusion_tpu.config import AttributeDict, load_config, save_config
from e4t_diffusion_tpu.models.unet import UNetConfig
from e4t_diffusion_tpu.models.vae import VAEConfig
from e4t_diffusion_tpu.models.clip_text import CLIPTextConfig
from e4t_diffusion_tpu.models.e4t_encoder import E4TEncoderConfig
from e4t_diffusion_tpu.models.vit import ViTConfig
from e4t_diffusion_tpu.diffusion.schedulers import NoiseScheduleConfig
from e4t_diffusion_tpu.utils import convert


# ---------------------------------------------------------------------------
# diffusers-format SD base checkpoint
# ---------------------------------------------------------------------------

def _read_json(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def _load_weights(subdir: str, names=("diffusion_pytorch_model.safetensors",
                                      "diffusion_pytorch_model.bin",
                                      "model.safetensors",
                                      "pytorch_model.bin")) -> Dict[str, np.ndarray]:
    for name in names:
        path = os.path.join(subdir, name)
        if os.path.exists(path):
            if name.endswith(".safetensors"):
                from safetensors.numpy import load_file

                return load_file(path)
            return convert.load_torch_state_dict(path)
    raise FileNotFoundError(f"no weight file in {subdir}")


def unet_config_from_diffusers(cfg: dict) -> UNetConfig:
    return UNetConfig(
        sample_size=cfg.get("sample_size", 64),
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        center_input_sample=cfg.get("center_input_sample", False),
        down_block_types=tuple(cfg["down_block_types"]),
        mid_block_type=cfg.get("mid_block_type", "UNetMidBlock2DCrossAttn"),
        up_block_types=tuple(cfg["up_block_types"]),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        attention_head_dim=(tuple(cfg["attention_head_dim"])
                            if isinstance(cfg.get("attention_head_dim", 8),
                                          (list, tuple))
                            else cfg.get("attention_head_dim", 8)),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        norm_eps=cfg.get("norm_eps", 1e-5),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        freq_shift=cfg.get("freq_shift", 0),
        use_linear_projection=cfg.get("use_linear_projection", False),
        class_embed_type=cfg.get("class_embed_type", None),
        projection_class_embeddings_input_dim=cfg.get(
            "projection_class_embeddings_input_dim", None),
    )


def vae_config_from_diffusers(cfg: dict) -> VAEConfig:
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        sample_size=cfg.get("sample_size", 512),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def text_config_from_hf(cfg: dict) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden_size=cfg.get("hidden_size", 768),
        num_layers=cfg.get("num_hidden_layers", 12),
        num_heads=cfg.get("num_attention_heads", 12),
        intermediate_size=cfg.get("intermediate_size", 3072),
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
    )


def schedule_config_from_diffusers(cfg: dict) -> NoiseScheduleConfig:
    return NoiseScheduleConfig(
        num_train_timesteps=cfg.get("num_train_timesteps", 1000),
        beta_start=cfg.get("beta_start", 0.00085),
        beta_end=cfg.get("beta_end", 0.012),
        beta_schedule=cfg.get("beta_schedule", "scaled_linear"),
        prediction_type=cfg.get("prediction_type", "epsilon"),
        steps_offset=cfg.get("steps_offset", 1),
        set_alpha_to_one=cfg.get("set_alpha_to_one", False),
        clip_sample=cfg.get("clip_sample", False),
    )


def load_sd_base(path: str) -> Dict[str, Any]:
    """Load a local diffusers-format SD v1 checkpoint directory.

    Returns configs + converted flax params + tokenizer path. Strict key
    parity is enforced by the converters
    (mirror of /root/reference/e4t/utils.py:121-125).
    """
    out: Dict[str, Any] = {}
    ucfg = unet_config_from_diffusers(_read_json(os.path.join(path, "unet", "config.json")))
    out["unet_config"] = ucfg
    out["unet"] = convert.unet_from_torch(
        _load_weights(os.path.join(path, "unet")), ucfg)
    vcfg = vae_config_from_diffusers(_read_json(os.path.join(path, "vae", "config.json")))
    out["vae_config"] = vcfg
    out["vae"] = convert.vae_from_torch(
        _load_weights(os.path.join(path, "vae")), vcfg)
    tcfg = text_config_from_hf(_read_json(os.path.join(path, "text_encoder", "config.json")))
    out["text_config"] = tcfg
    out["text"] = convert.clip_text_from_torch(
        _load_weights(os.path.join(path, "text_encoder")), tcfg.num_layers)
    out["schedule_config"] = schedule_config_from_diffusers(
        _read_json(os.path.join(path, "scheduler", "scheduler_config.json")))
    out["tokenizer_dir"] = os.path.join(path, "tokenizer")
    return out


def load_sd_unclip(path: str) -> Dict[str, Any]:
    """Load a local diffusers-format Stable-unCLIP checkpoint directory
    (stabilityai/stable-diffusion-2-1-unclip layout: unet/ vae/
    text_encoder/ tokenizer/ scheduler/ image_encoder/ image_normalizer/
    image_noising_scheduler/).

    Returns configs + converted flax params (strict key accounting) for
    diffusion/unclip_pipeline.StableUnCLIPImg2ImgPipeline.
    """
    from e4t_diffusion_tpu.models.e4t_encoder_legacy import CLIPVisionConfig
    from e4t_diffusion_tpu.models.unclip import CLIPVisionProjectionConfig

    out: Dict[str, Any] = {}
    ucfg = unet_config_from_diffusers(
        _read_json(os.path.join(path, "unet", "config.json")))
    out["unet_config"] = ucfg
    out["unet"] = convert.unet_from_torch(
        _load_weights(os.path.join(path, "unet")), ucfg)
    vcfg = vae_config_from_diffusers(
        _read_json(os.path.join(path, "vae", "config.json")))
    out["vae_config"] = vcfg
    out["vae"] = convert.vae_from_torch(
        _load_weights(os.path.join(path, "vae")), vcfg)
    tcfg = text_config_from_hf(
        _read_json(os.path.join(path, "text_encoder", "config.json")))
    out["text_config"] = tcfg
    out["text"] = convert.clip_text_from_torch(
        _load_weights(os.path.join(path, "text_encoder")), tcfg.num_layers)

    icfg_json = _read_json(os.path.join(path, "image_encoder", "config.json"))
    vision = CLIPVisionConfig(
        hidden_size=icfg_json.get("hidden_size", 1280),
        num_layers=icfg_json.get("num_hidden_layers", 32),
        num_heads=icfg_json.get("num_attention_heads", 16),
        intermediate_size=icfg_json.get("intermediate_size", 5120),
        image_size=icfg_json.get("image_size", 224),
        patch_size=icfg_json.get("patch_size", 14),
        hidden_act=icfg_json.get("hidden_act", "gelu"),
    )
    icfg = CLIPVisionProjectionConfig(
        vision=vision, projection_dim=icfg_json.get("projection_dim", 1024))
    out["image_encoder_config"] = icfg
    out["image_encoder"] = convert.clip_vision_with_projection_from_torch(
        _load_weights(os.path.join(path, "image_encoder")),
        vision.num_layers)
    out["image_normalizer"] = convert.image_normalizer_from_torch(
        _load_weights(os.path.join(path, "image_normalizer")))
    out["schedule_config"] = schedule_config_from_diffusers(
        _read_json(os.path.join(path, "scheduler", "scheduler_config.json")))
    noise_aug_path = os.path.join(path, "image_noising_scheduler",
                                  "scheduler_config.json")
    if os.path.exists(noise_aug_path):
        out["noise_aug_schedule"] = schedule_config_from_diffusers(
            _read_json(noise_aug_path))
    out["tokenizer_dir"] = os.path.join(path, "tokenizer")
    return out


# ---------------------------------------------------------------------------
# E4T deployable artifacts (.pt contract)
# ---------------------------------------------------------------------------

def e4t_encoder_config_from_args(args: AttributeDict,
                                 word_embedding_dim: int = 768,
                                 unet_config: Optional[UNetConfig] = None,
                                 unet_feature_dim: Optional[int] = None
                                 ) -> E4TEncoderConfig:
    """Resolve the encoder config from a saved run config.

    Reference quirk preserved (SURVEY.md §2.2): tuning/inference pass
    ``clip_model=`` which E4TEncoder silently ignores, so those paths
    always use the ViT-H-14 default; only pretrain's 'arch::version' is
    honored — and only ViT-H-14 geometry is bundled natively.
    ``vit_config: "tiny"`` in the config selects the test geometry.
    """
    if unet_feature_dim is None:
        from e4t_diffusion_tpu.models.unet import tap_feature_dim

        unet_feature_dim = tap_feature_dim(unet_config) if unet_config else 10880
    if getattr(args, "vit_config", None) == "tiny":
        vit = ViTConfig.tiny()
    else:
        arch = None
        if args.clip_model_name_or_path:
            arch = str(args.clip_model_name_or_path).split("::")[0]
        vit = ViTConfig.vit_h_14()
        if arch not in (None, "ViT-H-14"):
            n = args.n_odd_layers
            assert n is not None, "You must specify `n_odd_layers`!"
    return E4TEncoderConfig(word_embedding_dim=word_embedding_dim,
                            unet_feature_dim=unet_feature_dim, vit=vit,
                            freeze_clip_vision=not args.unfreeze_clip_vision)


def save_e4t_weights(save_dir: str, step: int, config: Dict,
                     e4t_params, e4t_config: E4TEncoderConfig,
                     offsets=None, unet_params=None, text_params=None,
                     text_num_layers: int = 12,
                     domain_image=None) -> str:
    """Write output_dir/<step>/ artifacts in the reference layout."""
    out = os.path.join(save_dir, str(step))
    os.makedirs(out, exist_ok=True)
    save_config(config, out)
    if unet_params is not None:
        # tuning saves the ENTIRE unet + offsets (tuning_e4t.py:232)
        sd = convert.unet_to_torch(jax.device_get(unet_params))
        if offsets is not None:
            sd.update(convert.offset_bank_to_torch(jax.device_get(offsets)))
        convert.save_torch_state_dict(sd, os.path.join(out, "unet.pt"))
    elif offsets is not None:
        convert.save_torch_state_dict(
            convert.offset_bank_to_torch(jax.device_get(offsets)),
            os.path.join(out, "weight_offsets.pt"))
    convert.save_torch_state_dict(
        convert.e4t_encoder_to_torch(jax.device_get(e4t_params), e4t_config),
        os.path.join(out, "encoder.pt"))
    if text_params is not None:
        convert.save_torch_state_dict(
            convert.clip_text_to_torch(jax.device_get(text_params),
                                       text_num_layers),
            os.path.join(out, "text_encoder.pt"))
    if domain_image is not None:
        domain_image.save(os.path.join(out, "domain.png"))
    return out


def load_e4t_weights(artifact_dir: str, base: Dict[str, Any],
                     e4t_config: E4TEncoderConfig) -> Dict[str, Any]:
    """Overlay E4T artifacts onto SD base params (strict key checks).

    Handles both artifact flavors: pretrain dirs carry weight_offsets.pt,
    tuned dirs carry a full unet.pt (with embedded offsets)
    (/root/reference/e4t/utils.py:92-126).
    """
    out = dict(base)
    wo_path = os.path.join(artifact_dir, "weight_offsets.pt")
    unet_path = os.path.join(artifact_dir, "unet.pt")
    if os.path.exists(unet_path):
        sd = convert.load_torch_state_dict(unet_path)
        offsets_sd = {k: v for k, v in sd.items() if ".wo_" in k}
        out["unet"] = convert.unet_from_torch(sd, base["unet_config"])
        out["offsets"] = convert.offset_bank_from_torch(offsets_sd)
    elif os.path.exists(wo_path):
        out["offsets"] = convert.offset_bank_from_torch(
            convert.load_torch_state_dict(wo_path))
    else:
        raise FileNotFoundError(
            f"neither unet.pt nor weight_offsets.pt in {artifact_dir}")
    enc_path = os.path.join(artifact_dir, "encoder.pt")
    out["e4t"] = convert.e4t_encoder_from_torch(
        convert.load_torch_state_dict(enc_path), e4t_config)
    te_path = os.path.join(artifact_dir, "text_encoder.pt")
    if os.path.exists(te_path):
        sd = convert.load_torch_state_dict(te_path)
        n_rows = sd["text_model.embeddings.token_embedding.weight"].shape[0]
        out["text"] = convert.clip_text_from_torch(
            sd, base["text_config"].num_layers)
        out["text_vocab_size"] = n_rows
    return out


# ---------------------------------------------------------------------------
# Orbax resumable training state
# ---------------------------------------------------------------------------

_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until any in-flight async save has committed. Call before
    process exit, before restoring, and before a final sync save."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_train_state(output_dir: str, step: int, state, rng,
                     async_save: bool = False) -> str:
    """Orbax checkpoint of the full train state.

    ``async_save``: hand Orbax the on-device arrays and return while the
    D2H transfer + write run on background threads — the step loop keeps
    training through the save (the expensive part of the sync path is
    the blocking jax.device_get of params+optimizer state). A new save
    first waits for the previous one (a natural barrier that still
    overlaps the whole inter-checkpoint window); callers must
    wait_for_checkpoints() before exiting.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, f"checkpoint-{step}"))
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # one save in flight at a time
        payload = {"step": state.step, "trainable": state.trainable,
                   "opt_state": state.opt_state, "rng": rng}
        ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
        return path
    ckptr = ocp.StandardCheckpointer()
    payload = {"step": jax.device_get(state.step),
               "trainable": jax.device_get(state.trainable),
               "opt_state": jax.device_get(state.opt_state),
               "rng": jax.device_get(rng)}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def find_latest_checkpoint(output_dir: str) -> Optional[str]:
    """'latest' resolution (/root/reference/pretrain_e4t.py:540-544)."""
    if not os.path.isdir(output_dir):
        return None
    dirs = [d for d in os.listdir(output_dir)
            if re.match(r"^checkpoint-\d+$", d)]
    if not dirs:
        return None
    dirs.sort(key=lambda d: int(d.split("-")[1]))
    return os.path.join(output_dir, dirs[-1])


def restore_train_state(path: str, state, rng) -> Tuple[Any, Any, int]:
    import orbax.checkpoint as ocp

    wait_for_checkpoints()  # same-process restore after an async save
    ckptr = ocp.StandardCheckpointer()
    template = {"step": jax.device_get(state.step),
                "trainable": jax.device_get(state.trainable),
                "opt_state": jax.device_get(state.opt_state),
                "rng": jax.device_get(rng)}
    payload = ckptr.restore(os.path.abspath(path), template)
    from e4t_diffusion_tpu.training.train_step import TrainState

    new_state = TrainState(step=payload["step"],
                           trainable=payload["trainable"],
                           opt_state=payload["opt_state"])
    return new_state, payload["rng"], int(payload["step"])
