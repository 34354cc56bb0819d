"""torch <-> flax state-dict converters for every model in the stack.

The reference ecosystem ships torch state dicts: SD v1 base weights
(diffusers naming), the published E4T artifacts weight_offsets.pt /
encoder.pt / unet.pt / text_encoder.pt (/root/reference/e4t/utils.py:67-73,
129-131,158-159) and OpenCLIP ViT towers. These converters map them onto
this package's flax param pytrees with strict key accounting, mirroring the
reference's zero missing/unexpected-keys contract
(/root/reference/e4t/utils.py:121-125,149-153).

Conventions:
- torch Linear weight (out, in)  -> flax Dense kernel (in, out)
- torch Conv2d weight (o,i,h,w)  -> flax Conv kernel (h, w, i, o)
- torch *Norm weight/bias        -> flax scale/bias
All values are handled as numpy arrays; no torch import is required unless
reading/writing .pt files (io helpers below).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

PyTree = Any


class ConversionError(RuntimeError):
    pass


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: Dict, path: List[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Converter:
    """Accumulates torch->flax assignments with used-key tracking."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()
        self.tree: Dict = {}

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise ConversionError(f"missing torch key: {key}")
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def linear(self, tkey: str, path: str, bias: bool = True) -> None:
        _set(self.tree, path.split(".") + ["kernel"], _t(self.take(tkey + ".weight")))
        if bias:
            _set(self.tree, path.split(".") + ["bias"], self.take(tkey + ".bias"))

    def conv(self, tkey: str, path: str, bias: bool = True) -> None:
        _set(self.tree, path.split(".") + ["kernel"], _conv(self.take(tkey + ".weight")))
        if bias:
            _set(self.tree, path.split(".") + ["bias"], self.take(tkey + ".bias"))

    def norm(self, tkey: str, path: str) -> None:
        _set(self.tree, path.split(".") + ["scale"], self.take(tkey + ".weight"))
        _set(self.tree, path.split(".") + ["bias"], self.take(tkey + ".bias"))

    def raw(self, tkey: str, path: str) -> None:
        _set(self.tree, path.split("."), self.take(tkey))

    def finish(self, ignore_unused: Tuple[str, ...] = ()) -> Dict:
        leftover = [
            k for k in self.sd
            if k not in self.used and not any(re.search(p, k) for p in ignore_unused)
        ]
        if leftover:
            raise ConversionError(
                f"unexpected torch keys ({len(leftover)}): {leftover[:8]}...")
        return self.tree


# ---------------------------------------------------------------------------
# CLIP text encoder (HF transformers naming)
# ---------------------------------------------------------------------------

def clip_text_from_torch(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    c = _Converter(sd)
    p = "text_model."
    c.raw(p + "embeddings.token_embedding.weight", "token_embedding")
    c.raw(p + "embeddings.position_embedding.weight", "position_embedding")
    for i in range(num_layers):
        t = f"{p}encoder.layers.{i}."
        f = f"layers_{i}."
        c.norm(t + "layer_norm1", f + "layer_norm1")
        c.norm(t + "layer_norm2", f + "layer_norm2")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            c.linear(t + "self_attn." + proj, f + "self_attn." + proj)
        c.linear(t + "mlp.fc1", f + "mlp_fc1")
        c.linear(t + "mlp.fc2", f + "mlp_fc2")
    c.norm(p + "final_layer_norm", "final_layer_norm")
    return c.finish(ignore_unused=(r"position_ids$",))


def clip_text_to_torch(params: Dict, num_layers: int) -> Dict[str, np.ndarray]:
    sd = {}
    p = "text_model."
    sd[p + "embeddings.token_embedding.weight"] = np.asarray(params["token_embedding"])
    sd[p + "embeddings.position_embedding.weight"] = np.asarray(params["position_embedding"])
    for i in range(num_layers):
        t = f"{p}encoder.layers.{i}."
        f = params[f"layers_{i}"]
        for name, key in (("layer_norm1", "layer_norm1"), ("layer_norm2", "layer_norm2")):
            sd[t + name + ".weight"] = np.asarray(f[key]["scale"])
            sd[t + name + ".bias"] = np.asarray(f[key]["bias"])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[t + "self_attn." + proj + ".weight"] = _t(np.asarray(f["self_attn"][proj]["kernel"]))
            sd[t + "self_attn." + proj + ".bias"] = np.asarray(f["self_attn"][proj]["bias"])
        for tname, fname in (("mlp.fc1", "mlp_fc1"), ("mlp.fc2", "mlp_fc2")):
            sd[t + tname + ".weight"] = _t(np.asarray(f[fname]["kernel"]))
            sd[t + tname + ".bias"] = np.asarray(f[fname]["bias"])
    sd[p + "final_layer_norm.weight"] = np.asarray(params["final_layer_norm"]["scale"])
    sd[p + "final_layer_norm.bias"] = np.asarray(params["final_layer_norm"]["bias"])
    return sd


# ---------------------------------------------------------------------------
# UNet (diffusers naming) + weight offsets
# ---------------------------------------------------------------------------

def _unet_attention(c: _Converter, t: str, f: str) -> None:
    for proj in ("to_q", "to_k", "to_v"):
        c.linear(t + proj, f + proj, bias=False)
    c.linear(t + "to_out.0", f + "to_out_0")


def _unet_tx_block(c: _Converter, t: str, f: str) -> None:
    c.norm(t + "norm1", f + "norm1")
    c.norm(t + "norm2", f + "norm2")
    c.norm(t + "norm3", f + "norm3")
    _unet_attention(c, t + "attn1.", f + "attn1.")
    _unet_attention(c, t + "attn2.", f + "attn2.")
    c.linear(t + "ff.net.0.proj", f + "ff.net_0_proj")
    c.linear(t + "ff.net.2", f + "ff.net_2")


def _unet_transformer2d(c: _Converter, t: str, f: str, depth: int = 1,
                        linear: bool = False) -> None:
    c.norm(t + "norm", f + "norm")
    if linear:  # SD v2 use_linear_projection: Dense instead of 1x1 conv
        c.linear(t + "proj_in", f + "proj_in")
        c.linear(t + "proj_out", f + "proj_out")
    else:
        c.conv(t + "proj_in", f + "proj_in")
        c.conv(t + "proj_out", f + "proj_out")
    for d in range(depth):
        _unet_tx_block(c, f"{t}transformer_blocks.{d}.", f"{f}transformer_blocks_{d}.")


def _unet_resnet(c: _Converter, t: str, f: str, temb: bool = True) -> None:
    c.norm(t + "norm1", f + "norm1")
    c.conv(t + "conv1", f + "conv1")
    if temb:
        c.linear(t + "time_emb_proj", f + "time_emb_proj")
    c.norm(t + "norm2", f + "norm2")
    c.conv(t + "conv2", f + "conv2")
    if c.has(t + "conv_shortcut.weight"):
        c.conv(t + "conv_shortcut", f + "conv_shortcut")


def unet_from_torch(sd: Dict[str, np.ndarray], config) -> Dict:
    """diffusers UNet2DConditionModel state dict -> flax params.

    Offset keys ("wo" substring, /root/reference/e4t/utils.py:130) are
    handled separately by ``offset_bank_from_torch``; strip them first.
    """
    sd = {k: v for k, v in sd.items() if ".wo_" not in k}
    c = _Converter(sd)
    c.conv("conv_in", "conv_in")
    c.conv("conv_out", "conv_out")
    c.norm("conv_norm_out", "conv_norm_out")
    c.linear("time_embedding.linear_1", "time_embedding.linear_1")
    c.linear("time_embedding.linear_2", "time_embedding.linear_2")
    if getattr(config, "class_embed_type", None) == "projection":
        c.linear("class_embedding.linear_1", "class_embedding.linear_1")
        c.linear("class_embedding.linear_2", "class_embedding.linear_2")

    linear = bool(getattr(config, "use_linear_projection", False))
    layers = config.layers_per_block
    for bi, btype in enumerate(config.down_block_types):
        t, f = f"down_blocks.{bi}.", f"down_blocks_{bi}."
        for li in range(layers):
            _unet_resnet(c, f"{t}resnets.{li}.", f"{f}resnets_{li}.")
            if "CrossAttn" in btype:
                _unet_transformer2d(c, f"{t}attentions.{li}.",
                                    f"{f}attentions_{li}.", linear=linear)
        if c.has(t + "downsamplers.0.conv.weight"):
            c.conv(t + "downsamplers.0.conv", f + "downsamplers_0.conv")

    _unet_resnet(c, "mid_block.resnets.0.", "mid_block.resnets_0.")
    _unet_resnet(c, "mid_block.resnets.1.", "mid_block.resnets_1.")
    _unet_transformer2d(c, "mid_block.attentions.0.", "mid_block.attentions_0.",
                        linear=linear)

    for bi, btype in enumerate(config.up_block_types):
        t, f = f"up_blocks.{bi}.", f"up_blocks_{bi}."
        for li in range(layers + 1):
            _unet_resnet(c, f"{t}resnets.{li}.", f"{f}resnets_{li}.")
            if "CrossAttn" in btype:
                _unet_transformer2d(c, f"{t}attentions.{li}.",
                                    f"{f}attentions_{li}.", linear=linear)
        if c.has(t + "upsamplers.0.conv.weight"):
            c.conv(t + "upsamplers.0.conv", f + "upsamplers_0.conv")
    return c.finish()


_INDEXED_MODULES = ("down_blocks", "up_blocks", "attentions", "resnets",
                    "transformer_blocks", "downsamplers", "upsamplers",
                    "to_out", "layers")


def _flax_component_to_torch(comp: str) -> str:
    """Module-name component rename flax -> torch/diffusers."""
    if comp == "net_0_proj":
        return "net.0.proj"
    if comp == "net_2":
        return "net.2"
    m = re.match(r"^(.*)_(\d+)$", comp)
    if m and m.group(1) in _INDEXED_MODULES:
        return f"{m.group(1)}.{m.group(2)}"
    return comp  # linear_1/linear_2, conv_in, norm1, mid_block, ...


def unet_to_torch(params: Dict, config=None) -> Dict[str, np.ndarray]:
    """flax UNet params -> diffusers-named torch state dict (for unet.pt
    artifacts, /root/reference/tuning_e4t.py:232)."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, fpath):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, fpath + [_flax_component_to_torch(k)])
            else:
                v = np.asarray(v)
                base = ".".join(fpath)
                if k == "kernel":
                    if v.ndim == 4:
                        out[base + ".weight"] = np.transpose(v, (3, 2, 0, 1))
                    else:
                        out[base + ".weight"] = _t(v)
                elif k == "scale":
                    out[base + ".weight"] = v
                else:
                    out[base + "." + k] = v

    walk(params, [])
    return out


_WO_LINEARS = ("linear1", "linear2", "linear_column", "linear_row")


def offset_bank_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """weight_offsets.pt (torch keys like
    'down_blocks.0.attentions.0.transformer_blocks.0.attn1.wo_q.v') ->
    offsets bank pytree keyed by flax site path."""
    bank: Dict = {}
    used = set()
    for key in sd:
        m = re.match(r"^(.*)\.(wo_[qkv])\.(.*)$", key)
        if not m:
            continue
        site_t, wo, rest = m.groups()
        site = re.sub(r"\.(\d+)", r"_\1", site_t)
        entry = bank.setdefault(site, {}).setdefault(wo, {})
        if rest == "v":
            entry["v"] = np.asarray(sd[key])
        else:
            lin, leaf = rest.split(".")
            d = entry.setdefault(lin, {})
            if leaf == "weight":
                d["kernel"] = _t(np.asarray(sd[key]))
            else:
                d["bias"] = np.asarray(sd[key])
        used.add(key)
    leftover = [k for k in sd if k not in used]
    if leftover:
        raise ConversionError(f"non-offset keys in offsets dict: {leftover[:8]}")
    return bank


def offset_bank_to_torch(bank: Dict) -> Dict[str, np.ndarray]:
    """Offsets bank -> reference weight_offsets.pt key layout
    (/root/reference/e4t/utils.py:129-131)."""
    sd: Dict[str, np.ndarray] = {}
    for site, wos in bank.items():
        site_t = re.sub(r"_(\d+)", r".\1", site)
        for wo, p in wos.items():
            sd[f"{site_t}.{wo}.v"] = np.asarray(p["v"])
            for lin in _WO_LINEARS:
                sd[f"{site_t}.{wo}.{lin}.weight"] = _t(np.asarray(p[lin]["kernel"]))
                sd[f"{site_t}.{wo}.{lin}.bias"] = np.asarray(p[lin]["bias"])
    return sd


# ---------------------------------------------------------------------------
# VAE (diffusers naming)
# ---------------------------------------------------------------------------

def vae_from_torch(sd: Dict[str, np.ndarray], config) -> Dict:
    c = _Converter(sd)
    c.conv("quant_conv", "quant_conv")
    c.conv("post_quant_conv", "post_quant_conv")

    def attention(t, f):
        c.norm(t + "group_norm", f + "group_norm")
        # handle both diffusers namings (query/... pre-0.15, to_q/... later)
        if c.has(t + "query.weight"):
            names = (("query", "query"), ("key", "key"), ("value", "value"),
                     ("proj_attn", "proj_attn"))
        else:
            names = (("to_q", "query"), ("to_k", "key"), ("to_v", "value"),
                     ("to_out.0", "proj_attn"))
        for tn, fn in names:
            c.linear(t + tn, f + fn)

    for side in ("encoder", "decoder"):
        t, f = side + ".", side + "."
        c.conv(t + "conv_in", f + "conv_in")
        c.conv(t + "conv_out", f + "conv_out")
        c.norm(t + "conv_norm_out", f + "conv_norm_out")
        _unet_resnet(c, t + "mid_block.resnets.0.", f + "mid_block.resnets_0.", temb=False)
        _unet_resnet(c, t + "mid_block.resnets.1.", f + "mid_block.resnets_1.", temb=False)
        attention(t + "mid_block.attentions.0.", f + "mid_block.attentions_0.")
        nblocks = len(config.block_out_channels)
        if side == "encoder":
            layers = config.layers_per_block
            prefix, updown = "down_blocks", "downsamplers"
        else:
            layers = config.layers_per_block + 1
            prefix, updown = "up_blocks", "upsamplers"
        for bi in range(nblocks):
            for li in range(layers):
                _unet_resnet(c, f"{t}{prefix}.{bi}.resnets.{li}.",
                             f"{f}{prefix}_{bi}_resnets_{li}.", temb=False)
            tk = f"{t}{prefix}.{bi}.{updown}.0.conv"
            if c.has(tk + ".weight"):
                c.conv(tk, f"{f}{prefix}_{bi}_{updown}_0.conv")
    return c.finish()


def vae_to_torch(params: Dict, config=None) -> Dict[str, np.ndarray]:
    """flax VAE params -> diffusers-named (v0.14 attention naming) torch
    state dict."""
    out: Dict[str, np.ndarray] = {}

    def fix(comp: str) -> str:
        comp = re.sub(
            r"(down_blocks|up_blocks|resnets|attentions|downsamplers|"
            r"upsamplers)_(\d+)", r"\1.\2", comp)
        # joining underscores of compound flax names: "down_blocks.0_resnets.0"
        comp = re.sub(r"(\d)_([a-z])", r"\1.\2", comp)
        return comp

    def walk(node, fpath):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, fpath + [fix(k)])
            else:
                v = np.asarray(v)
                base = ".".join(fpath)
                if k == "kernel":
                    out[base + ".weight"] = (np.transpose(v, (3, 2, 0, 1))
                                             if v.ndim == 4 else _t(v))
                elif k == "scale":
                    out[base + ".weight"] = v
                else:
                    out[base + "." + k] = v

    walk(params, [])
    return out


# ---------------------------------------------------------------------------
# E4T encoder (open_clip visual tower + fusion head)
# ---------------------------------------------------------------------------

def vit_from_torch(sd: Dict[str, np.ndarray], config, prefix: str = "") -> Dict:
    """open_clip VisionTransformer state dict (keys without 'visual.'
    when saved from E4TEncoder.clip_vision) -> flax params."""
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    c = _Converter(sub)
    c.conv("conv1", "conv1", bias=False)
    c.raw("class_embedding", "class_embedding")
    c.raw("positional_embedding", "positional_embedding")
    c.norm("ln_pre", "ln_pre")
    c.norm("ln_post", "ln_post")
    for i in range(config.num_layers):
        t = f"transformer.resblocks.{i}."
        f = f"resblocks_{i}."
        c.norm(t + "ln_1", f + "ln_1")
        c.norm(t + "ln_2", f + "ln_2")
        _set(c.tree, (f + "attn_in_proj.kernel").split("."),
             _t(c.take(t + "attn.in_proj_weight")))
        _set(c.tree, (f + "attn_in_proj.bias").split("."),
             c.take(t + "attn.in_proj_bias"))
        c.linear(t + "attn.out_proj", f + "attn_out_proj")
        c.linear(t + "mlp.c_fc", f + "mlp_c_fc")
        c.linear(t + "mlp.c_proj", f + "mlp_c_proj")
    return c.finish(ignore_unused=(r"^proj$",))


def e4t_encoder_from_torch(sd: Dict[str, np.ndarray], config) -> Dict:
    """encoder.pt (E4TEncoder state dict) -> flax params."""
    tree: Dict = {}
    tree["clip_vision"] = vit_from_torch(sd, config.vit, prefix="clip_vision.")
    rest = {k: np.asarray(v) for k, v in sd.items()
            if not k.startswith("clip_vision.")}
    c = _Converter(rest)
    c.linear("unet_feature_embedder.0", "unet_feature_embedder_0")
    c.linear("unet_feature_embedder.2", "unet_feature_embedder_2")
    c.linear("feature_linear", "feature_linear")
    c.linear("final_linear", "final_linear")
    n = config.n_fused
    kernels = np.stack([_t(c.take(f"first_linears.{i}.weight")) for i in range(n)])
    biases = np.stack([c.take(f"first_linears.{i}.bias") for i in range(n)])
    head = c.finish(ignore_unused=(r"^(mean|std)$",))
    tree.update(head)
    tree["first_linears_kernel"] = kernels
    tree["first_linears_bias"] = biases
    return tree


def e4t_encoder_to_torch(params: Dict, config) -> Dict[str, np.ndarray]:
    """flax E4T encoder params -> reference encoder.pt key layout
    (/root/reference/e4t/utils.py:158-159)."""
    sd: Dict[str, np.ndarray] = {}
    vit = params["clip_vision"]
    p = "clip_vision."
    sd[p + "conv1.weight"] = np.transpose(np.asarray(vit["conv1"]["kernel"]), (3, 2, 0, 1))
    sd[p + "class_embedding"] = np.asarray(vit["class_embedding"])
    sd[p + "positional_embedding"] = np.asarray(vit["positional_embedding"])
    for name in ("ln_pre", "ln_post"):
        sd[p + name + ".weight"] = np.asarray(vit[name]["scale"])
        sd[p + name + ".bias"] = np.asarray(vit[name]["bias"])
    for i in range(config.vit.num_layers):
        t = f"{p}transformer.resblocks.{i}."
        f = vit[f"resblocks_{i}"]
        for name in ("ln_1", "ln_2"):
            sd[t + name + ".weight"] = np.asarray(f[name]["scale"])
            sd[t + name + ".bias"] = np.asarray(f[name]["bias"])
        sd[t + "attn.in_proj_weight"] = _t(np.asarray(f["attn_in_proj"]["kernel"]))
        sd[t + "attn.in_proj_bias"] = np.asarray(f["attn_in_proj"]["bias"])
        for tname, fname in (("attn.out_proj", "attn_out_proj"),
                             ("mlp.c_fc", "mlp_c_fc"),
                             ("mlp.c_proj", "mlp_c_proj")):
            sd[t + tname + ".weight"] = _t(np.asarray(f[fname]["kernel"]))
            sd[t + tname + ".bias"] = np.asarray(f[fname]["bias"])
    for tname, fname in (("unet_feature_embedder.0", "unet_feature_embedder_0"),
                         ("unet_feature_embedder.2", "unet_feature_embedder_2"),
                         ("feature_linear", "feature_linear"),
                         ("final_linear", "final_linear")):
        sd[tname + ".weight"] = _t(np.asarray(params[fname]["kernel"]))
        sd[tname + ".bias"] = np.asarray(params[fname]["bias"])
    fk = np.asarray(params["first_linears_kernel"])
    fb = np.asarray(params["first_linears_bias"])
    for i in range(config.n_fused):
        sd[f"first_linears.{i}.weight"] = _t(fk[i])
        sd[f"first_linears.{i}.bias"] = fb[i]
    return sd


def clip_vision_hf_from_torch(sd: Dict[str, np.ndarray], num_layers: int,
                              prefix: str = "vision_model.") -> Dict:
    """HF CLIPVisionModel state dict -> flax params
    (models/e4t_encoder_legacy.CLIPVisionModel)."""
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    c = _Converter(sub)
    c.conv("embeddings.patch_embedding", "patch_embedding", bias=False)
    c.raw("embeddings.class_embedding", "class_embedding")
    c.raw("embeddings.position_embedding.weight", "position_embedding")
    c.norm("pre_layrnorm", "pre_layrnorm")
    c.norm("post_layernorm", "post_layernorm")
    for i in range(num_layers):
        t, f = f"encoder.layers.{i}.", f"layers_{i}."
        c.norm(t + "layer_norm1", f + "layer_norm1")
        c.norm(t + "layer_norm2", f + "layer_norm2")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            c.linear(t + "self_attn." + proj, f + "self_attn." + proj)
        c.linear(t + "mlp.fc1", f + "mlp_fc1")
        c.linear(t + "mlp.fc2", f + "mlp_fc2")
    return c.finish(ignore_unused=(r"position_ids",))


def e4t_encoder_legacy_from_torch(sd: Dict[str, np.ndarray], config) -> Dict:
    """E4TEncoderLegacy state dict -> flax params
    (/root/reference/e4t/encoder.py:11-49 layout: clip_vision.vision_model.*,
    linear, final_linear)."""
    tree: Dict = {}
    tree["clip_vision"] = clip_vision_hf_from_torch(
        sd, config.vision.num_layers, prefix="clip_vision.vision_model.")
    rest = {k: np.asarray(v) for k, v in sd.items()
            if not k.startswith("clip_vision.")}
    c = _Converter(rest)
    c.linear("linear", "linear")
    c.linear("final_linear", "final_linear")
    tree.update(c.finish(ignore_unused=(r"^(mean|std)$",)))
    return tree


def clip_vision_with_projection_from_torch(sd: Dict[str, np.ndarray],
                                           num_layers: int) -> Dict:
    """HF CLIPVisionModelWithProjection (the Stable-unCLIP image_encoder)
    -> flax params for models/unclip.CLIPVisionModelWithProjection."""
    tree: Dict = {"vision_model": clip_vision_hf_from_torch(
        sd, num_layers, prefix="vision_model.")}
    tree["visual_projection"] = {
        "kernel": _t(np.asarray(sd["visual_projection.weight"]))}
    return tree


def image_normalizer_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """diffusers StableUnCLIPImageNormalizer state dict ({mean, std} of
    shape (1, embed_dim)) -> flax params."""
    return {"mean": np.asarray(sd["mean"]).reshape(-1),
            "std": np.asarray(sd["std"]).reshape(-1)}


# ---------------------------------------------------------------------------
# .pt io helpers (torch only needed here)
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    import torch

    # np.array(copy=True) so torch never sees jax's read-only buffers
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, path)
