"""Real-checkpoint key-manifest exactness at full SD-v1 geometry.

The reference strict-checks its loaders against actual published
checkpoints (/root/reference/e4t/utils.py:92-126 loads with
strict accounting; :129-131 saves the "wo"-filtered weight_offsets.pt and
the full encoder state dict). No network access exists here, so the
known key/shape manifests of those artifacts are enumerated from first
principles below — independently of utils/convert.py — and the
converters are asserted to produce and consume EXACTLY those sets:

- diffusers==0.14.0 (reference requirements.txt) UNet2DConditionModel at
  runwayml/sd-v1-5 geometry,
- diffusers 0.14 AutoencoderKL at SD-v1 geometry (pre-0.15
  query/key/value/proj_attn attention naming, as stored on the hub),
- HF CLIPTextModel (oracle: the real transformers module, not a manifest),
- e4t-diffusion-ffhq-celebahq-v1 weight_offsets.pt: the 96-module
  WeightOffsets bank (/root/reference/e4t/models/cross_attention.py:97-99,
  /root/reference/e4t/weightoffsets.py:5-12),
- e4t-diffusion-ffhq-celebahq-v1 encoder.pt: open_clip ViT-H-14 visual
  tower (proj removed) + fusion head (/root/reference/e4t/encoder.py:80-131).

A manifest test failing means the artifact format no longer matches what
a real reference checkpoint contains.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e4t_diffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from e4t_diffusion_tpu.models.e4t_encoder import E4TEncoder, E4TEncoderConfig
from e4t_diffusion_tpu.models.unet import UNet2DConditionModel, UNetConfig
from e4t_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.utils import convert


# ---------------------------------------------------------------------------
# manifest builders (torch shape conventions: linear (out,in), conv
# (out,in,kh,kw))
# ---------------------------------------------------------------------------

def _lin(m, key, out_d, in_d, bias=True):
    m[key + ".weight"] = (out_d, in_d)
    if bias:
        m[key + ".bias"] = (out_d,)


def _conv(m, key, out_c, in_c, k):
    m[key + ".weight"] = (out_c, in_c, k, k)
    m[key + ".bias"] = (out_c,)


def _norm(m, key, c):
    m[key + ".weight"] = (c,)
    m[key + ".bias"] = (c,)


def _resnet(m, p, cin, cout, temb=True, temb_dim=1280):
    _norm(m, p + "norm1", cin)
    _conv(m, p + "conv1", cout, cin, 3)
    if temb:
        _lin(m, p + "time_emb_proj", cout, temb_dim)
    _norm(m, p + "norm2", cout)
    _conv(m, p + "conv2", cout, cout, 3)
    if cin != cout:
        _conv(m, p + "conv_shortcut", cout, cin, 1)


def _transformer2d(m, p, c, cross=768):
    _norm(m, p + "norm", c)
    _conv(m, p + "proj_in", c, c, 1)
    b = p + "transformer_blocks.0."
    for n in ("norm1", "norm2", "norm3"):
        _norm(m, b + n, c)
    for q in ("to_q", "to_k", "to_v"):
        m[b + "attn1." + q + ".weight"] = (c, c)
    _lin(m, b + "attn1.to_out.0", c, c)
    m[b + "attn2.to_q.weight"] = (c, c)
    m[b + "attn2.to_k.weight"] = (c, cross)
    m[b + "attn2.to_v.weight"] = (c, cross)
    _lin(m, b + "attn2.to_out.0", c, c)
    _lin(m, b + "ff.net.0.proj", 8 * c, c)  # GEGLU: 2 * 4c
    _lin(m, b + "ff.net.2", c, 4 * c)
    _conv(m, p + "proj_out", c, c, 1)


def sd15_unet_manifest():
    m = {}
    bo = (320, 640, 1280, 1280)
    _conv(m, "conv_in", 320, 4, 3)
    _lin(m, "time_embedding.linear_1", 1280, 320)
    _lin(m, "time_embedding.linear_2", 1280, 1280)
    cin = 320
    skips = [320]  # conv_in output
    for i, c in enumerate(bo):
        p = f"down_blocks.{i}."
        for li in range(2):
            _resnet(m, p + f"resnets.{li}.", cin if li == 0 else c, c)
            skips.append(c)
            if i < 3:
                _transformer2d(m, p + f"attentions.{li}.", c)
        if i < 3:
            _conv(m, p + "downsamplers.0.conv", c, c, 3)
            skips.append(c)
        cin = c
    for r in range(2):
        _resnet(m, f"mid_block.resnets.{r}.", 1280, 1280)
    _transformer2d(m, "mid_block.attentions.0.", 1280)
    prev = 1280
    for i, c in enumerate((1280, 1280, 640, 320)):
        p = f"up_blocks.{i}."
        for li in range(3):
            _resnet(m, p + f"resnets.{li}.", prev + skips.pop(), c)
            prev = c
            if i > 0:
                _transformer2d(m, p + f"attentions.{li}.", c)
        if i < 3:
            _conv(m, p + "upsamplers.0.conv", c, c, 3)
    _norm(m, "conv_norm_out", 320)
    _conv(m, "conv_out", 4, 320, 3)
    return m


def sd15_vae_manifest():
    m = {}
    bo = (128, 256, 512, 512)
    _conv(m, "encoder.conv_in", 128, 3, 3)
    cin = 128
    for i, c in enumerate(bo):
        p = f"encoder.down_blocks.{i}."
        for li in range(2):
            _resnet(m, p + f"resnets.{li}.", cin if li == 0 else c, c,
                    temb=False)
        if i < 3:
            _conv(m, p + "downsamplers.0.conv", c, c, 3)
        cin = c
    for side in ("encoder", "decoder"):
        for r in range(2):
            _resnet(m, f"{side}.mid_block.resnets.{r}.", 512, 512,
                    temb=False)
        a = f"{side}.mid_block.attentions.0."
        _norm(m, a + "group_norm", 512)
        for n in ("query", "key", "value", "proj_attn"):
            _lin(m, a + n, 512, 512)
    _norm(m, "encoder.conv_norm_out", 512)
    _conv(m, "encoder.conv_out", 8, 512, 3)  # 2 * latent (mean ++ logvar)
    m["quant_conv.weight"] = (8, 8, 1, 1)
    m["quant_conv.bias"] = (8,)
    m["post_quant_conv.weight"] = (4, 4, 1, 1)
    m["post_quant_conv.bias"] = (4,)
    _conv(m, "decoder.conv_in", 512, 4, 3)
    prev = 512
    for i, c in enumerate((512, 512, 256, 128)):
        p = f"decoder.up_blocks.{i}."
        for li in range(3):
            _resnet(m, p + f"resnets.{li}.", prev if li == 0 else c, c,
                    temb=False)
        if i < 3:
            _conv(m, p + "upsamplers.0.conv", c, c, 3)
        prev = c
    _norm(m, "decoder.conv_norm_out", 128)
    _conv(m, "decoder.conv_out", 3, 128, 3)
    return m


# the 16 Transformer2D sites of the SD-v1 UNet with their channel dims
ATTENTION_SITES = (
    [(f"down_blocks.{i}.attentions.{j}", c)
     for i, c in ((0, 320), (1, 640), (2, 1280)) for j in (0, 1)]
    + [("mid_block.attentions.0", 1280)]
    + [(f"up_blocks.{i}.attentions.{j}", c)
       for i, c in ((1, 1280), (2, 640), (3, 320)) for j in (0, 1, 2)]
)


def e4t_weight_offsets_manifest():
    """96 WeightOffsets modules: wo_q/wo_k/wo_v on every CrossAttention
    (/root/reference/e4t/models/cross_attention.py:97-99). Each module:
    v, linear1(row<-1), linear2(col<-1), linear_column(row<-row),
    linear_row(col<-col) with row=input dim, col=inner dim."""
    m = {}
    for site, c in ATTENTION_SITES:
        for attn, cross in (("attn1", c), ("attn2", 768)):
            for name, row in (("wo_q", c), ("wo_k", cross), ("wo_v", cross)):
                p = f"{site}.transformer_blocks.0.{attn}.{name}."
                col = c  # inner_dim == query channels in SD v1
                m[p + "v"] = (1,)
                _lin(m, p + "linear1", row, 1)
                _lin(m, p + "linear2", col, 1)
                _lin(m, p + "linear_column", row, row)
                _lin(m, p + "linear_row", col, col)
    return m


def e4t_encoder_manifest():
    """encoder.pt at ViT-H-14 geometry: width 1280, 32 resblocks, mlp
    5120, 257 tokens, patch 14; proj deleted, mean/std buffers
    non-persistent (/root/reference/e4t/encoder.py:93-131)."""
    m = {}
    w, layers, mlp, tokens = 1280, 32, 5120, 257
    p = "clip_vision."
    m[p + "class_embedding"] = (w,)
    m[p + "positional_embedding"] = (tokens, w)
    m[p + "conv1.weight"] = (w, 3, 14, 14)
    _norm(m, p + "ln_pre", w)
    _norm(m, p + "ln_post", w)
    for i in range(layers):
        t = f"{p}transformer.resblocks.{i}."
        _norm(m, t + "ln_1", w)
        _norm(m, t + "ln_2", w)
        m[t + "attn.in_proj_weight"] = (3 * w, w)
        m[t + "attn.in_proj_bias"] = (3 * w,)
        _lin(m, t + "attn.out_proj", w, w)
        _lin(m, t + "mlp.c_fc", mlp, w)
        _lin(m, t + "mlp.c_proj", w, mlp)
    _lin(m, "unet_feature_embedder.0", w, 10880)
    _lin(m, "unet_feature_embedder.2", w, w)
    _lin(m, "feature_linear", w, 2 * w)
    for i in range(129):  # pooled + every-2nd of 256 patch tokens
        _lin(m, f"first_linears.{i}", w, w)
    _lin(m, "final_linear", 768, w)
    return m


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _zeros_tree(shapes):
    return jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, np.float32), shapes)


def _zeros_sd(manifest):
    return {k: np.zeros(shape, np.float32) for k, shape in manifest.items()}


def _shape_map(sd):
    return {k: tuple(v.shape) for k, v in sd.items()}


def _tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out[".".join(prefix + (k,))] = tuple(np.shape(v))
    return out


def _assert_same_keys(got, want, label):
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{label}: missing={missing[:10]} extra={extra[:10]} "
        f"(+{max(0, len(missing) - 10)}/+{max(0, len(extra) - 10)} more)")
    bad = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    assert not bad, f"{label} shape mismatches: {bad[:10]}"


@pytest.fixture(scope="module")
def unet_full_params():
    unet = UNet2DConditionModel(UNetConfig())
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((1, 4, 8, 8)), jnp.zeros((1,),
                            jnp.int32), jnp.zeros((1, 3, 768)))["params"],
        jax.random.PRNGKey(0))
    return _zeros_tree(shapes)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_unet_to_torch_matches_sd15_manifest(unet_full_params):
    sd = convert.unet_to_torch(unet_full_params)
    _assert_same_keys(_shape_map(sd), sd15_unet_manifest(), "unet_to_torch")


def test_unet_from_torch_consumes_sd15_manifest_exactly(unet_full_params):
    manifest = sd15_unet_manifest()
    params = convert.unet_from_torch(_zeros_sd(manifest), UNetConfig())
    # strict accounting inside the converter raises on unused keys; here
    # assert the produced tree exactly matches the model's own param tree
    _assert_same_keys(_tree_shapes(params), _tree_shapes(unet_full_params),
                      "unet_from_torch tree")
    # and that dropping any key is an error (KeyError via take)
    broken = _zeros_sd(manifest)
    broken.pop("mid_block.attentions.0.transformer_blocks.0.attn2.to_k.weight")
    with pytest.raises(Exception):
        convert.unet_from_torch(broken, UNetConfig())


@pytest.fixture(scope="module")
def vae_full_params():
    vae = AutoencoderKL(VAEConfig())
    shapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 3, 32, 32)), k)["params"],
        jax.random.PRNGKey(0))
    return _zeros_tree(shapes)


def test_vae_to_torch_matches_sd15_manifest(vae_full_params):
    sd = convert.vae_to_torch(vae_full_params)
    _assert_same_keys(_shape_map(sd), sd15_vae_manifest(), "vae_to_torch")


def test_vae_from_torch_consumes_sd15_manifest_exactly(vae_full_params):
    manifest = sd15_vae_manifest()
    params = convert.vae_from_torch(_zeros_sd(manifest), VAEConfig())
    _assert_same_keys(_tree_shapes(params), _tree_shapes(vae_full_params),
                      "vae_from_torch tree")


def test_vae_from_torch_accepts_post15_attention_naming(vae_full_params):
    """Hub re-exports with diffusers >=0.15 use to_q/to_k/to_v/to_out.0."""
    manifest = sd15_vae_manifest()
    renames = {"query": "to_q", "key": "to_k", "value": "to_v",
               "proj_attn": "to_out.0"}
    sd = {}
    for k, shape in manifest.items():
        for old, new in renames.items():
            parts = k.rsplit(".", 1)
            if parts[0].endswith("attentions.0." + old):
                k = parts[0][: -len(old)] + new + "." + parts[1]
                break
        sd[k] = np.zeros(shape, np.float32)
    params = convert.vae_from_torch(sd, VAEConfig())
    _assert_same_keys(_tree_shapes(params), _tree_shapes(vae_full_params),
                      "vae_from_torch (to_q naming) tree")


def test_clip_text_matches_real_transformers_keys():
    """Oracle: the actual HF CLIPTextModel at SD-v1 config — the exact
    module the reference loads (/root/reference/pretrain_e4t.py:233-236)."""
    import transformers

    hf = transformers.CLIPTextModel(transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77))
    want = {k: tuple(v.shape) for k, v in hf.state_dict().items()
            if not k.endswith("position_ids")}

    cfg = CLIPTextConfig()
    model = CLIPTextModel(cfg)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 77), jnp.int32))["params"],
        jax.random.PRNGKey(0))
    params = _zeros_tree(shapes)
    sd = convert.clip_text_to_torch(params, cfg.num_layers)
    _assert_same_keys(_shape_map(sd), want, "clip_text_to_torch vs HF")
    # and the reverse direction consumes the real HF state dict exactly
    back = convert.clip_text_from_torch(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg.num_layers)
    _assert_same_keys(_tree_shapes(back), _tree_shapes(params),
                      "clip_text_from_torch tree")


@pytest.fixture(scope="module")
def offset_bank_full():
    shapes = jax.eval_shape(
        lambda k: wo.init_offset_bank(k, UNetConfig()), jax.random.PRNGKey(0))
    return _zeros_tree(shapes)


def test_offset_bank_to_torch_matches_published_manifest(offset_bank_full):
    sd = convert.offset_bank_to_torch(offset_bank_full)
    _assert_same_keys(_shape_map(sd), e4t_weight_offsets_manifest(),
                      "offset_bank_to_torch")


def test_offset_bank_from_torch_consumes_manifest_exactly(offset_bank_full):
    manifest = e4t_weight_offsets_manifest()
    bank = convert.offset_bank_from_torch(_zeros_sd(manifest))
    _assert_same_keys(_tree_shapes(bank), _tree_shapes(offset_bank_full),
                      "offset_bank_from_torch tree")
    with pytest.raises(convert.ConversionError):
        convert.offset_bank_from_torch(
            dict(_zeros_sd(manifest), stray_key=np.zeros((1,))))


@pytest.fixture(scope="module")
def e4t_encoder_full_params():
    cfg = E4TEncoderConfig()
    enc = E4TEncoder(cfg)
    shapes = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, 3, 224, 224)),
                           jnp.zeros((1, cfg.unet_feature_dim)))["params"],
        jax.random.PRNGKey(0))
    return cfg, _zeros_tree(shapes)


def test_e4t_encoder_to_torch_matches_published_manifest(
        e4t_encoder_full_params):
    cfg, params = e4t_encoder_full_params
    assert cfg.n_fused == 129  # ViT-H-14: pooled + every-2nd patch token
    sd = convert.e4t_encoder_to_torch(params, cfg)
    _assert_same_keys(_shape_map(sd), e4t_encoder_manifest(),
                      "e4t_encoder_to_torch")


def test_e4t_encoder_from_torch_consumes_published_manifest(
        e4t_encoder_full_params):
    cfg, params = e4t_encoder_full_params
    got = convert.e4t_encoder_from_torch(_zeros_sd(e4t_encoder_manifest()),
                                         cfg)
    _assert_same_keys(_tree_shapes(got), _tree_shapes(params),
                      "e4t_encoder_from_torch tree")
