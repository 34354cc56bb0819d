"""Model parity and round-trip tests.

Oracles: HF transformers CLIPTextModel (random tiny config) and an
independent torch implementation of the WeightOffsets math written from the
reference's published equations.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from e4t_diffusion_tpu.models.clip_text import CLIPTextModel, CLIPTextConfig
from e4t_diffusion_tpu.models.unet import UNet2DConditionModel, UNetConfig
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.utils import convert


def test_clip_text_matches_transformers():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64,
                         max_position_embeddings=16)
    params = convert.clip_text_from_torch(sd, cfg.num_layers)

    ids = np.array([[49, 3, 7, 1, 0, 5, 2, 9, 11, 4, 8, 6, 10, 12, 13, 14]],
                   dtype=np.int32)
    ours, _ = CLIPTextModel(cfg).apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        theirs = hf(input_ids=torch.from_numpy(ids).long()).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               atol=2e-5, rtol=2e-5)


class _TorchWeightOffsets(torch.nn.Module):
    """Independent oracle of the WeightOffsets equations
    (/root/reference/e4t/weightoffsets.py:14-23)."""

    def __init__(self, row, col):
        super().__init__()
        self.v = torch.nn.Parameter(torch.ones(1))
        self.linear1 = torch.nn.Linear(1, row)
        self.linear2 = torch.nn.Linear(1, col)
        self.linear_column = torch.nn.Linear(row, row)
        self.linear_row = torch.nn.Linear(col, col)

    def forward(self):
        vx = self.linear1(self.v)
        vy = self.linear2(self.v)
        m = vx.unsqueeze(0).T * vy.unsqueeze(0)
        m = self.linear_column(m.T)
        m = self.linear_row(m.T)
        return m.T


def _wo_torch_to_flax(mod):
    sd = {k: v.detach().numpy() for k, v in mod.state_dict().items()}
    p = {"v": sd["v"]}
    for lin in ("linear1", "linear2", "linear_column", "linear_row"):
        p[lin] = {"kernel": sd[f"{lin}.weight"].T, "bias": sd[f"{lin}.bias"]}
    return p


@pytest.mark.parametrize("row,col", [(8, 16), (16, 16), (32, 8)])
def test_weight_offsets_match_torch(row, col):
    torch.manual_seed(1)
    oracle = _TorchWeightOffsets(row, col)
    with torch.no_grad():
        oracle.v.copy_(torch.tensor([1.37]))
        expected = oracle().numpy()  # (col, row) torch weight layout
    params = _wo_torch_to_flax(oracle)
    ours = wo.compute_offset(params)  # (row, col) flax kernel layout
    np.testing.assert_allclose(np.asarray(ours).T, expected, atol=1e-5, rtol=1e-5)


def test_offset_sites_count_sd_v1():
    sites = wo.attention_sites(UNetConfig())
    # 16 Transformer2DModel sites x 2 attentions (SURVEY.md §2.2)
    assert len(sites) == 32
    bank = jax.eval_shape(
        lambda k: wo.init_offset_bank(k, UNetConfig()), jax.random.PRNGKey(0))
    n_modules = sum(len(v) for v in bank.values())
    assert n_modules == 96


def test_fold_offset_bank_batched_matches_per_site():
    """The shape-grouped vmapped fold (round 4) == the naive per-site
    loop, at every one of the bank's sites/projections."""
    import flax.core

    cfg = UNetConfig.tiny()
    m = UNet2DConditionModel(cfg)
    rng = jax.random.PRNGKey(0)
    params = m.init(rng, jnp.ones((1, 4, 8, 8)), jnp.array([3]),
                    jnp.ones((1, 7, 32)))["params"]
    bank = wo.init_offset_bank(jax.random.PRNGKey(1), cfg)

    folded = wo.fold_offset_bank(params, bank)

    ref = flax.core.unfreeze(params)
    for name, offsets in bank.items():
        attn = ref
        for p in name.split("."):
            attn = attn[p]
        for wo_key, proj in (("wo_q", "to_q"), ("wo_k", "to_k"),
                             ("wo_v", "to_v")):
            o = wo.compute_offset(offsets[wo_key])
            attn[proj]["kernel"] = (
                attn[proj]["kernel"] * (1.0 + o.astype(jnp.float32)))

    for name in bank:
        a, b = folded, ref
        for p in name.split("."):
            a, b = a[p], b[p]
        for proj in ("to_q", "to_k", "to_v"):
            np.testing.assert_allclose(
                np.asarray(a[proj]["kernel"]), np.asarray(b[proj]["kernel"]),
                rtol=1e-6, atol=1e-6, err_msg=f"{name}/{proj}")


def test_fold_offset_bank_applies_multiplicative_update():
    cfg = UNetConfig.tiny()
    m = UNet2DConditionModel(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 4, 8, 8))
    t = jnp.array([3])
    c = jnp.ones((1, 7, 32))
    params = m.init(rng, x, t, c)["params"]
    bank = wo.init_offset_bank(jax.random.PRNGKey(1), cfg)

    folded = wo.fold_offset_bank(params, bank)
    site = "down_blocks_0.attentions_0.transformer_blocks_0.attn1"
    node_orig = params
    node_fold = folded
    for p in site.split("."):
        node_orig = node_orig[p]
        node_fold = node_fold[p]
    o = wo.compute_offset(bank[site]["wo_q"])
    np.testing.assert_allclose(
        np.asarray(node_fold["to_q"]["kernel"]),
        np.asarray(node_orig["to_q"]["kernel"] * (1 + o)),
        atol=1e-6, rtol=1e-6)
    # untouched params identical
    np.testing.assert_array_equal(
        np.asarray(folded["conv_in"]["kernel"]),
        np.asarray(params["conv_in"]["kernel"]))
    # input tree not mutated
    assert node_orig["to_q"]["kernel"] is not node_fold["to_q"]["kernel"]

    # folded apply differs from unfolded (offsets actually reach compute)
    out_a = m.apply({"params": params}, x, t, c)
    out_b = m.apply({"params": folded}, x, t, c)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_unet_torch_roundtrip():
    cfg = UNetConfig.tiny()
    m = UNet2DConditionModel(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)),
                    jnp.array([0]), jnp.zeros((1, 7, 32)))["params"]
    sd = convert.unet_to_torch(params, cfg)
    back = convert.unet_from_torch(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                  sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_offset_bank_torch_roundtrip():
    cfg = UNetConfig.tiny()
    bank = wo.init_offset_bank(jax.random.PRNGKey(2), cfg)
    sd = convert.offset_bank_to_torch(bank)
    assert all("wo" in k for k in sd)  # reference's "wo" filter applies
    back = convert.offset_bank_from_torch(sd)
    la = jax.tree_util.tree_leaves_with_path(bank)
    lb = jax.tree_util.tree_leaves_with_path(back)
    assert len(la) == len(lb)
    for (pa, va), (pb, vb) in zip(sorted(la, key=lambda x: str(x[0])),
                                  sorted(lb, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_e4t_encoder_torch_roundtrip():
    from e4t_diffusion_tpu.models.e4t_encoder import E4TEncoder, E4TEncoderConfig

    cfg = E4TEncoderConfig.tiny()
    enc = E4TEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)),
                      jnp.zeros((1, cfg.unet_feature_dim)))["params"]
    sd = convert.e4t_encoder_to_torch(params, cfg)
    back = convert.e4t_encoder_from_torch(sd, cfg)
    la = jax.tree_util.tree_leaves_with_path(params)
    lb = jax.tree_util.tree_leaves_with_path(back)
    assert len(la) == len(lb)
    for (pa, va), (pb, vb) in zip(sorted(la, key=lambda x: str(x[0])),
                                  sorted(lb, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_offset_linear_apply_gradient_flow():
    """Single-layer fold demo (reference weightoffsets.py Model oracle):
    one AdamW step through W*(1+wo) must move the offset params, with the
    base weight gradient equal to grad_Weff * W_base per the product rule."""
    import optax

    rng = jax.random.PRNGKey(0)
    p = wo.init_weight_offset(rng, 32, 16)
    base = jax.random.normal(jax.random.PRNGKey(1), (32, 16)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 16))

    def loss(p):
        out = wo.offset_linear_apply(p, base, x)
        return jnp.mean((out - y) ** 2)

    tx = optax.adamw(1e-2)
    opt = tx.init(p)
    v_before = float(p["v"][0])
    l0 = float(loss(p))
    for _ in range(5):
        g = jax.grad(loss)(p)
        up, opt = tx.update(g, opt, p)
        p = optax.apply_updates(p, up)
    assert float(p["v"][0]) != v_before  # v received gradient (ref oracle)
    assert float(loss(p)) < l0
