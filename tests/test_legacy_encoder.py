"""E4TEncoderLegacy: HF CLIPVisionModel backbone parity + head structure."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from e4t_diffusion_tpu.models.e4t_encoder_legacy import (
    CLIPVisionConfig, CLIPVisionModel, E4TEncoderLegacy,
    E4TEncoderLegacyConfig)
from e4t_diffusion_tpu.utils.convert import clip_vision_hf_from_torch


def test_clip_vision_matches_transformers():
    from transformers import CLIPVisionConfig as HFVC
    from transformers import CLIPVisionModel as HFVM

    hf_cfg = HFVC(hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
                  intermediate_size=64, image_size=28, patch_size=14,
                  hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = HFVM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = clip_vision_hf_from_torch(sd, 4)

    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    pooled, hs = CLIPVisionModel(CLIPVisionConfig.tiny()).apply(
        {"params": params}, jnp.asarray(px))
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px), output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                               atol=2e-5, rtol=2e-5)
    assert len(hs) == len(out.hidden_states)
    for a, b in zip(hs, out.hidden_states):
        np.testing.assert_allclose(np.asarray(a), b.numpy(),
                                   atol=2e-5, rtol=2e-5)


def test_legacy_encoder_output_and_sharing():
    cfg = E4TEncoderLegacyConfig.tiny()
    m = E4TEncoderLegacy(cfg)
    samples = [jnp.ones((2, 8, 8, 32)), jnp.ones((2, 4, 4, 64))]
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 32, 32)),
               samples)["params"]
    out = m.apply({"params": p}, jnp.zeros((2, 3, 32, 32)), samples)
    assert out.shape == (2, cfg.word_embedding_dim)
    # the head reuses the backbone's post_layernorm: no extra LN params
    assert "post_layernorm" in p["clip_vision"]
    assert "clip_vision_post_layernorm" not in p
    # final_linear input = hidden + sum(block_out_channels)
    assert p["final_linear"]["kernel"].shape[0] == (
        cfg.vision.hidden_size + sum(cfg.block_out_channels))
