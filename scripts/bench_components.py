"""Per-component timing probe for the inference hot path (real TPU).

Methodology (two axon-relay pitfalls to dodge, see CLAUDE.md):
1. Per-dispatch latency through the remote tunnel is ~20-30 ms, so each
   component is iterated N times INSIDE one jit (lax.scan over a stack of
   distinct inputs) and the wall time is divided by N.
2. Repeat dispatches with bit-identical arguments can return without
   re-executing, so every scan iteration gets different inputs and the
   timing loop re-randomizes between repeats.

Prints one JSON line of per-call milliseconds for: full UNet forward,
fused-tap UNet forward, text encoder, ViT-H encode, E4T fuse head, VAE
decode, offset fold.

Knobs: E4T_BENCH_BATCH (8), E4T_BENCH_RES (512), E4T_BENCH_ITERS (10),
plus the attention knobs E4T_FLASH_BLOCK_Q/K, E4T_FLASH_THRESHOLD_BYTES.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def scan_time(make_fn, stack_inputs, repeats=2):
    """Time make_fn scanned over stacked inputs; returns ms per iteration.

    stack_inputs: pytree whose leaves have a leading N axis.
    """
    n = jax.tree_util.tree_leaves(stack_inputs)[0].shape[0]

    @jax.jit
    def scanned(xs):
        def body(carry, x):
            out = make_fn(x)
            # fold the output into a scalar carry so nothing is DCE'd and
            # the per-iter output footprint stays tiny
            s = sum(jnp.sum(o.astype(jnp.float32))
                    for o in jax.tree_util.tree_leaves(out))
            return carry + s, ()
        tot, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return tot

    float(scanned(stack_inputs))  # warmup; fetch forces a real relay sync
    best = float("inf")
    for r in range(repeats):
        # re-randomize to defeat relay-side same-args memoization
        xs = jax.tree_util.tree_map(
            lambda x: x + jnp.asarray(1e-3 * (r + 1), x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, stack_inputs)
        jax.block_until_ready(xs)
        t0 = time.perf_counter()
        # fetch the scalar INSIDE the timed region: under the axon relay,
        # block_until_ready on a small result can acknowledge before the
        # device actually executed; only a value fetch guarantees sync
        float(scanned(xs))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def main():
    from e4t_diffusion_tpu.utils.runtime import setup_compilation_cache
    from e4t_diffusion_tpu.diffusion.pipeline import E4TModules
    from e4t_diffusion_tpu.models.unet import pool_encoder_features
    from e4t_diffusion_tpu.models.e4t_encoder import E4TEncoder
    from e4t_diffusion_tpu.models.vae import AutoencoderKL
    from e4t_diffusion_tpu.models import weight_offsets as wo
    from bench import zeros_params

    setup_compilation_cache()
    batch = int(os.environ.get("E4T_BENCH_BATCH", "8"))
    res = int(os.environ.get("E4T_BENCH_RES", "512"))
    iters = int(os.environ.get("E4T_BENCH_ITERS", "10"))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    modules = E4TModules.create(dtype=dtype)
    tcfg = modules.text_encoder.config
    ecfg = modules.e4t_encoder.config
    rng = jax.random.PRNGKey(0)
    cast = lambda tree: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree)

    unet_params = cast(zeros_params(
        lambda k: modules.unet.init(
            k, jnp.zeros((1, 4, res // 8, res // 8)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, tcfg.hidden_size)))["params"], rng))
    text_params = cast(zeros_params(
        lambda k: modules.text_encoder.init(
            k, jnp.zeros((1, 77), jnp.int32))["params"], rng))
    e4t_params = cast(zeros_params(
        lambda k: modules.e4t_encoder.init(
            k, jnp.zeros((1, 3, res, res)),
            jnp.zeros((1, ecfg.unet_feature_dim)))["params"], rng))
    vae_params = cast(zeros_params(
        lambda k: modules.vae.init(
            k, jnp.zeros((1, 3, res, res)), k)["params"], rng))

    ks = jax.random.split(rng, 8)
    lats = jax.random.normal(ks[0], (iters, batch, 4, res // 8, res // 8),
                             dtype)
    ctxs = jax.random.normal(ks[1], (iters, batch, 77, tcfg.hidden_size),
                             dtype)
    t = jnp.zeros((batch,), jnp.int32)

    only = os.environ.get("E4T_BENCH_ONLY", "")
    want = lambda name: (not only) or name in only.split(",")

    results = {}
    if want("unet_fwd"):
        results["unet_fwd_ms"] = scan_time(
            lambda x: modules.unet.apply({"params": unet_params},
                                         x[0], t, x[1]),
            (lats, ctxs))
    if want("unet_fwd_int8"):
        from e4t_diffusion_tpu.ops.quant import quantize_params

        q_params = quantize_params(unet_params)
        results["unet_fwd_int8_ms"] = scan_time(
            lambda x: modules.unet.apply({"params": q_params},
                                         x[0], t, x[1]),
            (lats, ctxs))
    if want("unet_fwd_int8_static"):
        from e4t_diffusion_tpu.ops import quant

        # calibrate activation ranges from one bf16 forward (timing is
        # scale-value independent; real serving calibrates a trajectory
        # via pipeline.make_calibration_fn)
        with quant.calibration_trace():
            _, cvars = jax.jit(
                lambda p, x, tt, c: modules.unet.apply(
                    {"params": p}, x, tt, c, mutable=["calib"]))(
                unet_params, lats[0], t, ctxs[0])
        qs_params = quant.quantize_params(unet_params,
                                          act_amax=cvars["calib"])
        results["unet_fwd_int8_static_ms"] = scan_time(
            lambda x: modules.unet.apply({"params": qs_params},
                                         x[0], t, x[1]),
            (lats, ctxs))
    if want("unet_fwd_int8_attn"):
        # int8 attention inner math alone (bf16 conv/GEMM around it);
        # mode via E4T_BENCH_ATTN_MODE (qk | qkpv)
        from e4t_diffusion_tpu.ops.attention import int8_flash_attention

        attn_mode = os.environ.get("E4T_BENCH_ATTN_MODE", "qk")
        with int8_flash_attention(attn_mode):
            results["unet_fwd_int8_attn_ms"] = scan_time(
                lambda x: modules.unet.apply({"params": unet_params},
                                             x[0], t, x[1]),
                (lats, ctxs))
    if want("unet_fwd_int8_static_attn"):
        # the full int8 serving candidate: static-act int8 conv/GEMM +
        # int8 attention inner math
        from e4t_diffusion_tpu.ops import quant
        from e4t_diffusion_tpu.ops.attention import int8_flash_attention

        attn_mode = os.environ.get("E4T_BENCH_ATTN_MODE", "qk")
        with quant.calibration_trace():
            _, cvars2 = jax.jit(
                lambda p, x, tt, c: modules.unet.apply(
                    {"params": p}, x, tt, c, mutable=["calib"]))(
                unet_params, lats[0], t, ctxs[0])
        qsa_params = quant.quantize_params(unet_params,
                                           act_amax=cvars2["calib"])
        with int8_flash_attention(attn_mode):
            results["unet_fwd_int8_static_attn_ms"] = scan_time(
                lambda x: modules.unet.apply({"params": qsa_params},
                                             x[0], t, x[1]),
                (lats, ctxs))
    # --- MFU accounting (utils/flops.py analytic counts / v5e bf16 peak).
    # int8 sites are also reported vs the BF16 peak ("effective MFU":
    # >100% would mean beating the bf16 roofline via the int8 MXU).
    from e4t_diffusion_tpu.utils import flops as fl

    unet_f = batch * fl.unet_forward(modules.unet.config, res // 8)
    site_flops = {
        "unet_fwd_ms": unet_f,
        "unet_fwd_int8_ms": unet_f,
        "unet_fwd_int8_static_ms": unet_f,
        "unet_fwd_with_tap_ms": unet_f,
        "text_encoder_ms": fl.text_encoder_forward(tcfg, batch),
        "vit_encode_ms": fl.vit_forward(ecfg.vit, batch),
        "vit_encode_int8_ms": fl.vit_forward(ecfg.vit, batch),
        "vit_encode_int8_static_ms": fl.vit_forward(ecfg.vit, batch),
        "vae_decode_ms": batch * fl.vae_decode(modules.vae.config, res // 8),
        "vae_decode_int8_ms": batch * fl.vae_decode(modules.vae.config,
                                                    res // 8),
        "vae_decode_int8_static_ms": batch * fl.vae_decode(
            modules.vae.config, res // 8),
    }

    def add_mfu(res_dict):
        if jax.default_backend() != "tpu":
            return
        for name, f in site_flops.items():
            if name in res_dict:
                mfu = f / (res_dict[name] * 1e-3) / fl.V5E_BF16_PEAK
                res_dict[name.replace("_ms", "_mfu")] = round(mfu, 4)

    if want("unet_fwd_with_tap"):
        results["unet_fwd_with_tap_ms"] = scan_time(
            lambda x: modules.unet.apply({"params": unet_params}, x[0], t,
                                         x[1],
                                         return_encoder_outputs="with_eps"),
            (lats, ctxs))

    if want("text_encoder"):
        embeds = jax.random.normal(ks[2],
                                   (iters, batch, 77, tcfg.hidden_size),
                                   dtype)
        results["text_encoder_ms"] = scan_time(
            lambda x: modules.text_encoder.apply({"params": text_params},
                                                 inputs_embeds=x)[0], embeds)

    pixels = jax.random.normal(ks[3], (2, batch, 3, res, res), dtype)
    if want("vit_encode"):
        results["vit_encode_ms"] = scan_time(
            lambda x: modules.e4t_encoder.apply(
                {"params": e4t_params}, x, method=E4TEncoder.encode_image),
            pixels)

    if want("vit_encode_int8"):
        from e4t_diffusion_tpu.ops.quant import quantize_params

        e4t_q = {**e4t_params,
                 "clip_vision": quantize_params(e4t_params["clip_vision"])}
        results["vit_encode_int8_ms"] = scan_time(
            lambda x: modules.e4t_encoder.apply(
                {"params": e4t_q}, x, method=E4TEncoder.encode_image),
            pixels)
    if want("vit_encode_int8_static") or want("vae_decode_int8_static"):
        from e4t_diffusion_tpu.diffusion.pipeline import (
            make_aux_calibration_fn)

        aux_amax = make_aux_calibration_fn(modules)(
            e4t_params, vae_params, jnp.zeros((batch, 3, res, res), dtype),
            jax.random.normal(ks[7], (batch, 4, res // 8, res // 8), dtype))
    if want("vit_encode_int8_static"):
        from e4t_diffusion_tpu.ops.quant import quantize_params

        e4t_qs = {**e4t_params,
                  "clip_vision": quantize_params(
                      e4t_params["clip_vision"],
                      act_amax=aux_amax["e4t"]["clip_vision"])}
        results["vit_encode_int8_static_ms"] = scan_time(
            lambda x: modules.e4t_encoder.apply(
                {"params": e4t_qs}, x, method=E4TEncoder.encode_image),
            pixels)

    if want("e4t_fuse"):
        vit_cfg = ecfg.vit
        clip_feats = jax.random.normal(
            ks[4], (iters, batch, ecfg.n_fused, vit_cfg.width), dtype)
        unet_feats = jax.random.normal(
            ks[5], (iters, batch, ecfg.unet_feature_dim), dtype)
        results["e4t_fuse_ms"] = scan_time(
            lambda x: modules.e4t_encoder.apply(
                {"params": e4t_params}, x[0], x[1], method=E4TEncoder.fuse),
            (clip_feats, unet_feats))

    dec_lats = jax.random.normal(ks[6], (2, batch, 4, res // 8, res // 8),
                                 dtype)
    if want("vae_decode"):
        results["vae_decode_ms"] = scan_time(
            lambda x: modules.vae.apply({"params": vae_params}, x,
                                        method=AutoencoderKL.decode),
            dec_lats)

    if want("vae_decode_int8"):
        from e4t_diffusion_tpu.ops.quant import (DEFAULT_EXCLUDE,
                                                 quantize_params)

        vae_q = quantize_params(vae_params,
                                exclude=DEFAULT_EXCLUDE + ("encoder",
                                                           "quant_conv"))
        results["vae_decode_int8_ms"] = scan_time(
            lambda x: modules.vae.apply({"params": vae_q}, x,
                                        method=AutoencoderKL.decode),
            dec_lats)
    if want("vae_decode_int8_static"):
        from e4t_diffusion_tpu.ops.quant import (DEFAULT_EXCLUDE,
                                                 quantize_params)

        vae_qs = quantize_params(vae_params, act_amax=aux_amax["vae"],
                                 exclude=DEFAULT_EXCLUDE + ("encoder",
                                                            "quant_conv"))
        results["vae_decode_int8_static_ms"] = scan_time(
            lambda x: modules.vae.apply({"params": vae_qs}, x,
                                        method=AutoencoderKL.decode),
            dec_lats)

    if want("fold_offsets"):
        offsets = cast(zeros_params(
            lambda k: wo.init_offset_bank(k, modules.unet.config), rng))
        # fold is param-only; vary via a scalar jitter on the bank
        jit_scalars = jnp.linspace(0.0, 1e-4, 4).astype(dtype)
        results["fold_offsets_ms"] = scan_time(
            lambda s: wo.fold_offset_bank(
                unet_params,
                jax.tree_util.tree_map(lambda x: x + s, offsets)),
            jit_scalars)

    if all(k in results for k in ("unet_fwd_with_tap_ms", "unet_fwd_ms",
                                  "text_encoder_ms", "e4t_fuse_ms")):
        results["est_cfg_step_ms"] = (
            results["unet_fwd_with_tap_ms"] + results["unet_fwd_ms"]
            + results["text_encoder_ms"] + results["e4t_fuse_ms"])
    results["batch"] = batch
    results["blocks"] = (os.environ.get("E4T_FLASH_BLOCK_Q", "2048"),
                         os.environ.get("E4T_FLASH_BLOCK_K", "512"))
    if only:
        results["threshold"] = os.environ.get("E4T_FLASH_THRESHOLD_BYTES",
                                              "default")
    add_mfu(results)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
