"""CLIP scorer tests: structure, normalization, open_clip converter."""
import numpy as np
import jax
import jax.numpy as jnp

from e4t_diffusion_tpu.models.clip_score import (
    CLIPScorer, CLIPScoreConfig, clip_i, clip_t, scorer_from_open_clip)


def _init_scorer():
    cfg = CLIPScoreConfig.tiny()
    scorer = CLIPScorer(cfg)
    params = scorer.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)),
        jnp.zeros((1, cfg.text.context_length), jnp.int32))["params"]
    return cfg, scorer, params


def test_features_normalized_and_scores_bounded():
    cfg, scorer, params = _init_scorer()
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.uniform(-1, 1, (2, 3, 40, 40)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, 500, (2, cfg.text.context_length)),
                      jnp.int32)
    img_f, txt_f = scorer.apply({"params": params}, pix, ids)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img_f), axis=-1),
                               1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(txt_f), axis=-1),
                               1.0, rtol=1e-5)
    assert -1.0001 <= float(clip_t(img_f, txt_f)) <= 1.0001
    assert float(clip_i(img_f, img_f)) > 0.9999  # self-similarity == 1


def test_eot_pooling_uses_argmax_token():
    cfg, scorer, params = _init_scorer()
    ids_a = jnp.zeros((1, cfg.text.context_length), jnp.int32).at[0, 3].set(599)
    ids_b = ids_a.at[0, 10].set(77)  # change a token AFTER eot position?
    # 599 stays argmax; but position 10 token change alters causal context
    # only for positions >= 10, so pooled (at 3) must be unchanged.
    fa = scorer.apply({"params": params}, ids_b,
                      method=CLIPScorer.text_features)
    fb = scorer.apply({"params": params}, ids_a,
                      method=CLIPScorer.text_features)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-6)


def test_open_clip_converter_roundtrip():
    """Synthesize an open_clip-style torch state dict from our params and
    reconvert."""
    cfg, scorer, params = _init_scorer()
    sd = {}
    vit = params["visual"]
    sd["visual.proj"] = np.asarray(params["visual_proj"])
    sd["visual.conv1.weight"] = np.transpose(
        np.asarray(vit["conv1"]["kernel"]), (3, 2, 0, 1))
    sd["visual.class_embedding"] = np.asarray(vit["class_embedding"])
    sd["visual.positional_embedding"] = np.asarray(vit["positional_embedding"])
    for name in ("ln_pre", "ln_post"):
        sd[f"visual.{name}.weight"] = np.asarray(vit[name]["scale"])
        sd[f"visual.{name}.bias"] = np.asarray(vit[name]["bias"])
    for i in range(cfg.vit.num_layers):
        f = vit[f"resblocks_{i}"]
        t = f"visual.transformer.resblocks.{i}."
        for name in ("ln_1", "ln_2"):
            sd[t + name + ".weight"] = np.asarray(f[name]["scale"])
            sd[t + name + ".bias"] = np.asarray(f[name]["bias"])
        sd[t + "attn.in_proj_weight"] = np.asarray(f["attn_in_proj"]["kernel"]).T
        sd[t + "attn.in_proj_bias"] = np.asarray(f["attn_in_proj"]["bias"])
        for tn, fn in (("attn.out_proj", "attn_out_proj"),
                       ("mlp.c_fc", "mlp_c_fc"), ("mlp.c_proj", "mlp_c_proj")):
            sd[t + tn + ".weight"] = np.asarray(f[fn]["kernel"]).T
            sd[t + tn + ".bias"] = np.asarray(f[fn]["bias"])
    txt = params["text"]
    sd["token_embedding.weight"] = np.asarray(txt["token_embedding"])
    sd["positional_embedding"] = np.asarray(txt["positional_embedding"])
    sd["text_projection"] = np.asarray(txt["text_projection"])
    sd["ln_final.weight"] = np.asarray(txt["ln_final"]["scale"])
    sd["ln_final.bias"] = np.asarray(txt["ln_final"]["bias"])
    for i in range(cfg.text.num_layers):
        f = txt[f"resblocks_{i}"]
        t = f"transformer.resblocks.{i}."
        for name in ("ln_1", "ln_2"):
            sd[t + name + ".weight"] = np.asarray(f[name]["scale"])
            sd[t + name + ".bias"] = np.asarray(f[name]["bias"])
        sd[t + "attn.in_proj_weight"] = np.asarray(f["attn_in_proj"]["kernel"]).T
        sd[t + "attn.in_proj_bias"] = np.asarray(f["attn_in_proj"]["bias"])
        for tn, fn in (("attn.out_proj", "attn_out_proj"),
                       ("mlp.c_fc", "mlp_c_fc"), ("mlp.c_proj", "mlp_c_proj")):
            sd[t + tn + ".weight"] = np.asarray(f[fn]["kernel"]).T
            sd[t + tn + ".bias"] = np.asarray(f[fn]["bias"])
    sd["logit_scale"] = np.asarray(4.6052)

    back = scorer_from_open_clip(sd, cfg)
    la = jax.tree_util.tree_leaves_with_path(params)
    lb = jax.tree_util.tree_leaves_with_path(back)
    assert len(la) == len(lb)
    for (pa, va), (pb, vb) in zip(sorted(la, key=lambda x: str(x[0])),
                                  sorted(lb, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
