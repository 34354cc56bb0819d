"""Stable-unCLIP stack tests: SD2-flavor UNet oracle parity, HF image
encoder parity, noise augmentation semantics, pipeline smoke.

Parity target: the diffusers StableUnCLIPImg2ImgPipeline stack used by
/root/reference/scripts/image_variation_augmentation.py:95-99.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from e4t_diffusion_tpu.models.unet import UNet2DConditionModel, UNetConfig
from e4t_diffusion_tpu.models.unclip import (
    CLIPVisionModelWithProjection, CLIPVisionProjectionConfig,
    noise_image_embeddings, UNCLIP_NOISE_AUG_SCHEDULE)
from e4t_diffusion_tpu.models.clip_text import CLIPTextModel, CLIPTextConfig
from e4t_diffusion_tpu.diffusion.unclip_pipeline import (
    UnCLIPModules, StableUnCLIPImg2ImgPipeline)
from e4t_diffusion_tpu.diffusion.schedulers import (
    NoiseScheduleConfig, DPMSolverMultistepScheduler, alphas_cumprod)
from e4t_diffusion_tpu.utils import convert
from e4t_diffusion_tpu.utils.tokenizer import (
    CLIPTokenizer, make_tiny_tokenizer_files)
from torch_unet_oracle import TorchTinyUNet


def _tiny_unclip_unet_config():
    return dataclasses.replace(
        UNetConfig.tiny(),
        use_linear_projection=True,
        class_embed_type="projection",
        projection_class_embeddings_input_dim=32,
    )


def test_sd2_flavor_unet_matches_torch_oracle():
    """Linear transformer projections + projection class embedding, vs the
    independent torch oracle through the emitted state dict."""
    cfg = _tiny_unclip_unet_config()
    m = UNet2DConditionModel(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)),
                    jnp.array([0]), jnp.zeros((1, 7, 32)),
                    class_labels=jnp.zeros((1, 32)))["params"]

    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in convert.unet_to_torch(params).items()}
    oracle = TorchTinyUNet(ctx_dim=32, linear_proj=True,
                           class_proj_dim=32).eval()
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    assert not missing, f"missing: {missing}"
    assert not unexpected, f"unexpected: {unexpected}"

    r = np.random.default_rng(0)
    x = r.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([3, 800], dtype=np.int64)
    ctx = r.standard_normal((2, 7, 32)).astype(np.float32)
    cls = r.standard_normal((2, 32)).astype(np.float32)

    ours = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                   jnp.asarray(ctx), class_labels=jnp.asarray(cls))
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x), torch.from_numpy(t),
                        torch.from_numpy(ctx), torch.from_numpy(cls))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               atol=3e-5, rtol=3e-5)


def test_sd2_unet_converter_roundtrip():
    """torch->flax->torch round trip preserves every tensor (strict key
    accounting incl. class_embedding + linear proj_in/out)."""
    cfg = _tiny_unclip_unet_config()
    m = UNet2DConditionModel(cfg)
    params = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 8, 8)),
                    jnp.array([0]), jnp.zeros((1, 7, 32)),
                    class_labels=jnp.zeros((1, 32)))["params"]
    sd = convert.unet_to_torch(params)
    back = convert.unet_from_torch(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_b[path]), atol=0, rtol=0)


def test_image_encoder_matches_hf():
    """CLIPVisionModelWithProjection parity vs HF transformers on a tiny
    config, through the HF-layout converter."""
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import CLIPVisionModelWithProjection as HFVisionProj

    hf_cfg = HFVisionConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, image_size=28, patch_size=14,
        projection_dim=16)
    hf = HFVisionProj(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = CLIPVisionProjectionConfig.tiny()
    ours = CLIPVisionModelWithProjection(cfg)
    params = convert.clip_vision_with_projection_from_torch(
        sd, cfg.vision.num_layers)

    r = np.random.default_rng(0)
    x = r.standard_normal((2, 3, 28, 28)).astype(np.float32)
    out = ours.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(x)).image_embeds
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=2e-5, rtol=2e-5)


def test_sd2_text_encoder_matches_hf_gelu():
    """hidden_act='gelu' (SD v2 text tower) parity vs HF CLIPTextModel."""
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel as HFTextModel

    hf_cfg = HFTextConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, hidden_act="gelu")
    hf = HFTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = dataclasses.replace(CLIPTextConfig.tiny(), hidden_act="gelu")
    ours = CLIPTextModel(cfg)
    params = convert.clip_text_from_torch(sd, cfg.num_layers)

    ids = np.array([[0, 5, 9, 200, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]],
                   dtype=np.int32)
    out, _ = ours.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.last_hidden_state.numpy(),
                               atol=2e-5, rtol=2e-5)


def test_noise_image_embeddings_semantics():
    """scale -> DDPM add_noise -> unscale -> concat sinusoidal noise-level
    embedding, against a direct numpy transcription of the diffusers
    pipeline_stable_unclip_img2img.noise_image_embeddings math."""
    r = np.random.default_rng(0)
    d = 16
    embeds = r.standard_normal((2, d)).astype(np.float32)
    noise = r.standard_normal((2, d)).astype(np.float32)
    mean = r.standard_normal((d,)).astype(np.float32)
    std = (0.5 + r.uniform(0.5, 1.0, (d,))).astype(np.float32)
    level = np.array([0, 700], dtype=np.int32)

    out = noise_image_embeddings(
        jnp.asarray(embeds), jnp.asarray(level), jnp.asarray(noise),
        {"mean": jnp.asarray(mean), "std": jnp.asarray(std)})
    out = np.asarray(out)
    assert out.shape == (2, 2 * d)

    acp = alphas_cumprod(UNCLIP_NOISE_AUG_SCHEDULE)
    x = (embeds - mean) / std
    a = acp[level][:, None]
    x = np.sqrt(a) * x + np.sqrt(1 - a) * noise
    x = x * std + mean
    np.testing.assert_allclose(out[:, :d], x.astype(np.float32),
                               atol=1e-5, rtol=1e-5)

    # sinusoidal part: exact diffusers get_timestep_embedding formula
    half = d // 2
    freqs = np.exp(-np.log(10000) * np.arange(half) / half)
    ang = level[:, None].astype(np.float32) * freqs[None]
    sincos = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
    flipped = np.concatenate([sincos[:, half:], sincos[:, :half]], axis=-1)
    np.testing.assert_allclose(out[:, d:], flipped.astype(np.float32),
                               atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_unclip(tmp_path_factory):
    modules = UnCLIPModules.tiny()
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    tcfg = modules.text_encoder.config
    icfg = modules.image_encoder.config

    unet_params = modules.unet.init(
        ks[0], jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
        jnp.zeros((1, tcfg.max_position_embeddings, tcfg.hidden_size)),
        class_labels=jnp.zeros((1, 2 * icfg.projection_dim)))["params"]
    vae_params = modules.vae.init(ks[1], jnp.zeros((1, 3, 16, 16)),
                                  ks[1])["params"]
    text_params = modules.text_encoder.init(
        ks[2], jnp.zeros((1, tcfg.max_position_embeddings), jnp.int32))["params"]
    img_params = modules.image_encoder.init(
        ks[3], jnp.zeros((1, 3, icfg.vision.image_size,
                          icfg.vision.image_size)))["params"]
    params = {
        "unet": unet_params, "vae": vae_params, "text": text_params,
        "image_encoder": img_params,
        "image_normalizer": {
            "mean": jnp.zeros((icfg.projection_dim,)),
            "std": jnp.ones((icfg.projection_dim,)),
        },
    }
    tok_dir = make_tiny_tokenizer_files(
        str(tmp_path_factory.mktemp("tok")), extra_words=["photo"])
    tokenizer = CLIPTokenizer.from_pretrained(
        tok_dir, model_max_length=tcfg.max_position_embeddings)
    scheduler = DPMSolverMultistepScheduler(
        NoiseScheduleConfig(prediction_type="v_prediction"))
    pipe = StableUnCLIPImg2ImgPipeline(modules, params, tokenizer,
                                       scheduler=scheduler)
    image = (np.random.default_rng(0)
             .uniform(0, 255, (32, 32, 3)).astype(np.uint8))
    return pipe, image


def test_unclip_pipeline_generates_images(tiny_unclip):
    pipe, image = tiny_unclip
    out = pipe(image, num_inference_steps=3, guidance_scale=10.0,
               num_images_per_prompt=2, seed=0, output_type="np")
    assert out.shape == (2, 3, 16, 16)
    assert np.all(out >= 0) and np.all(out <= 1)
    assert np.isfinite(out).all()


def test_unclip_pipeline_no_cfg_and_noise_level(tiny_unclip):
    pipe, image = tiny_unclip
    a = pipe(image, num_inference_steps=2, guidance_scale=1.0,
             noise_level=0, seed=1, output_type="np")
    b = pipe(image, num_inference_steps=2, guidance_scale=1.0,
             noise_level=500, seed=1, output_type="np")
    assert a.shape == b.shape == (1, 3, 16, 16)
    # noise level must change the conditioning, hence the output
    assert np.abs(a - b).max() > 1e-6


def test_unclip_pipeline_prompt_conditioning(tiny_unclip):
    pipe, image = tiny_unclip
    a = pipe(image, prompt="", num_inference_steps=2, guidance_scale=5.0,
             seed=2, output_type="np")
    b = pipe(image, prompt="photo", num_inference_steps=2,
             guidance_scale=5.0, seed=2, output_type="np")
    assert np.abs(a - b).max() > 1e-6


def test_load_sd_unclip_roundtrip(tmp_path):
    """Synthesize a full diffusers-format stable-diffusion-2-1-unclip
    directory (unet/vae/text_encoder/image_encoder/image_normalizer/
    scheduler/image_noising_scheduler/tokenizer) and drive the loader +
    pipeline end to end."""
    import json
    import os

    import torch as _torch
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import CLIPVisionModelWithProjection as HFVisionProj

    from e4t_diffusion_tpu.utils import artifacts
    from e4t_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig

    root = str(tmp_path / "unclip")
    modules = UnCLIPModules.tiny()
    ucfg = modules.unet.config
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 3)
    tcfg = modules.text_encoder.config
    unet_params = modules.unet.init(
        ks[0], jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
        jnp.zeros((1, tcfg.max_position_embeddings, tcfg.hidden_size)),
        class_labels=jnp.zeros((1, 32)))["params"]
    vae_params = modules.vae.init(ks[1], jnp.zeros((1, 3, 16, 16)),
                                  ks[1])["params"]
    text_params = modules.text_encoder.init(
        ks[2], jnp.zeros((1, tcfg.max_position_embeddings), jnp.int32))["params"]

    os.makedirs(os.path.join(root, "unet"))
    with open(os.path.join(root, "unet", "config.json"), "w") as f:
        json.dump({
            "sample_size": ucfg.sample_size, "in_channels": 4,
            "out_channels": 4,
            "down_block_types": list(ucfg.down_block_types),
            "up_block_types": list(ucfg.up_block_types),
            "block_out_channels": list(ucfg.block_out_channels),
            "layers_per_block": ucfg.layers_per_block,
            "attention_head_dim": ucfg.attention_head_dim,
            "cross_attention_dim": ucfg.cross_attention_dim,
            "norm_num_groups": ucfg.norm_num_groups,
            "use_linear_projection": True,
            "class_embed_type": "projection",
            "projection_class_embeddings_input_dim": 32,
        }, f)
    convert.save_torch_state_dict(
        convert.unet_to_torch(unet_params),
        os.path.join(root, "unet", "diffusion_pytorch_model.bin"))

    vcfg = modules.vae.config
    os.makedirs(os.path.join(root, "vae"))
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump({"block_out_channels": list(vcfg.block_out_channels),
                   "layers_per_block": vcfg.layers_per_block,
                   "norm_num_groups": vcfg.norm_num_groups,
                   "sample_size": vcfg.sample_size}, f)
    convert.save_torch_state_dict(
        convert.vae_to_torch(vae_params),
        os.path.join(root, "vae", "diffusion_pytorch_model.bin"))

    os.makedirs(os.path.join(root, "text_encoder"))
    with open(os.path.join(root, "text_encoder", "config.json"), "w") as f:
        json.dump({"vocab_size": tcfg.vocab_size,
                   "hidden_size": tcfg.hidden_size,
                   "num_hidden_layers": tcfg.num_layers,
                   "num_attention_heads": tcfg.num_heads,
                   "intermediate_size": tcfg.intermediate_size,
                   "max_position_embeddings": tcfg.max_position_embeddings,
                   "hidden_act": "quick_gelu"}, f)
    convert.save_torch_state_dict(
        convert.clip_text_to_torch(text_params, tcfg.num_layers),
        os.path.join(root, "text_encoder", "pytorch_model.bin"))

    hf_cfg = HFVisionConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, image_size=28, patch_size=14,
        projection_dim=16)
    hf = HFVisionProj(hf_cfg)
    os.makedirs(os.path.join(root, "image_encoder"))
    with open(os.path.join(root, "image_encoder", "config.json"), "w") as f:
        json.dump({"hidden_size": 32, "num_hidden_layers": 4,
                   "num_attention_heads": 4, "intermediate_size": 64,
                   "image_size": 28, "patch_size": 14,
                   "projection_dim": 16, "hidden_act": "quick_gelu"}, f)
    _torch.save(hf.state_dict(),
                os.path.join(root, "image_encoder", "pytorch_model.bin"))

    os.makedirs(os.path.join(root, "image_normalizer"))
    _torch.save({"mean": _torch.zeros(1, 16), "std": _torch.ones(1, 16)},
                os.path.join(root, "image_normalizer",
                             "diffusion_pytorch_model.bin"))

    os.makedirs(os.path.join(root, "scheduler"))
    with open(os.path.join(root, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump({"beta_start": 0.00085, "beta_end": 0.012,
                   "beta_schedule": "scaled_linear",
                   "num_train_timesteps": 1000, "steps_offset": 1,
                   "prediction_type": "v_prediction"}, f)
    os.makedirs(os.path.join(root, "image_noising_scheduler"))
    with open(os.path.join(root, "image_noising_scheduler",
                           "scheduler_config.json"), "w") as f:
        json.dump({"beta_schedule": "squaredcos_cap_v2",
                   "num_train_timesteps": 1000}, f)
    make_tiny_tokenizer_files(os.path.join(root, "tokenizer"),
                              extra_words=["photo"])

    loaded = artifacts.load_sd_unclip(root)
    assert loaded["unet_config"].use_linear_projection
    assert loaded["unet_config"].class_embed_type == "projection"
    assert loaded["schedule_config"].prediction_type == "v_prediction"
    assert loaded["noise_aug_schedule"].beta_schedule == "squaredcos_cap_v2"

    built = UnCLIPModules.create(
        unet_config=loaded["unet_config"], vae_config=loaded["vae_config"],
        text_config=loaded["text_config"],
        image_config=loaded["image_encoder_config"])
    built.noise_aug_schedule = loaded["noise_aug_schedule"]
    params = {"unet": loaded["unet"], "vae": loaded["vae"],
              "text": loaded["text"],
              "image_encoder": loaded["image_encoder"],
              "image_normalizer": loaded["image_normalizer"]}
    tokenizer = CLIPTokenizer.from_pretrained(
        loaded["tokenizer_dir"], model_max_length=tcfg.max_position_embeddings)
    pipe = StableUnCLIPImg2ImgPipeline(
        built, params, tokenizer,
        scheduler=DPMSolverMultistepScheduler(loaded["schedule_config"]))
    image = (np.random.default_rng(1)
             .uniform(0, 255, (32, 32, 3)).astype(np.uint8))
    out = pipe(image, num_inference_steps=2, guidance_scale=10.0,
               noise_level=100, seed=3, output_type="np")
    assert out.shape == (1, 3, 16, 16)
    assert np.isfinite(out).all()
