"""Full-UNet numerical parity vs the independent torch oracle.

Loads the diffusers-named state dict emitted by utils/convert.unet_to_torch
into tests/torch_unet_oracle.TorchTinyUNet with strict=True (key parity)
and compares forward outputs on random inputs (math parity).
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from e4t_diffusion_tpu.models.unet import UNet2DConditionModel, UNetConfig
from e4t_diffusion_tpu.utils import convert
from torch_unet_oracle import TorchTinyUNet


def test_tiny_unet_matches_torch_oracle():
    cfg = UNetConfig.tiny()
    m = UNet2DConditionModel(cfg)
    rng = jax.random.PRNGKey(0)
    params = m.init(rng, jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
                    jnp.zeros((1, 7, 32)))["params"]

    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in convert.unet_to_torch(params).items()}
    oracle = TorchTinyUNet(ctx_dim=cfg.cross_attention_dim).eval()
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    assert not missing, f"missing keys in emitted state dict: {missing}"
    assert not unexpected, f"unexpected keys: {unexpected}"

    r = np.random.default_rng(0)
    x = r.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([17, 901], dtype=np.int64)
    ctx = r.standard_normal((2, 7, 32)).astype(np.float32)

    ours = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                   jnp.asarray(ctx))
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x), torch.from_numpy(t),
                        torch.from_numpy(ctx))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               atol=3e-5, rtol=3e-5)


def test_tiny_unet_tap_matches_oracle_residuals():
    """The encoder-outputs tap must equal the oracle's residual stack +
    mid output (pooled), i.e. the 10,880-dim contract at tiny scale."""
    cfg = UNetConfig.tiny()
    m = UNet2DConditionModel(cfg)
    params = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 8, 8)),
                    jnp.array([0]), jnp.zeros((1, 7, 32)))["params"]
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in convert.unet_to_torch(params).items()}
    oracle = TorchTinyUNet(ctx_dim=32).eval()
    oracle.load_state_dict(sd, strict=False)

    r = np.random.default_rng(1)
    x = r.standard_normal((1, 4, 8, 8)).astype(np.float32)
    t = np.array([500], dtype=np.int64)
    ctx = r.standard_normal((1, 7, 32)).astype(np.float32)
    tap = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                  jnp.asarray(ctx), return_encoder_outputs=True)

    # oracle-side: replicate the down path manually
    import torch.nn.functional as F
    from torch_unet_oracle import timestep_embedding

    with torch.no_grad():
        xt = torch.from_numpy(x)
        temb = oracle.time_embedding(timestep_embedding(torch.from_numpy(t), 32))
        h = oracle.conv_in(xt)
        res = [h]
        d0 = oracle.down_blocks[0]
        h = d0.attentions[0](d0.resnets[0](h, temb), torch.from_numpy(ctx))
        res.append(h)
        h = d0.downsamplers[0](h)
        res.append(h)
        h = oracle.down_blocks[1].resnets[0](h, temb)
        res.append(h)
        mb = oracle.mid_block
        h = mb.resnets[1](mb.attentions[0](mb.resnets[0](h, temb),
                                           torch.from_numpy(ctx)), temb)
        res.append(h)
    assert len(tap) == len(res)
    for a, b in zip(tap, res):
        # ours is NHWC, oracle NCHW
        np.testing.assert_allclose(np.asarray(a).transpose(0, 3, 1, 2),
                                   b.numpy(), atol=3e-5, rtol=3e-5)
