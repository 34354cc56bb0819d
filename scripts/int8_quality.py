"""int8-vs-bf16 serving quality at SD-v1 GEOMETRY: full 50-step DDIM
trajectory divergence with structured random weights.

The +17% int8-static serving headline (bench.py) needs a quality bound at
the geometry it serves. Real SD weights can't be fetched in this
environment, but error PROPAGATION through the network depends on
layer shapes, activation magnitudes and the 50-step feedback loop — all
reproduced by structured random weights (fan-in-scaled kernels, unit
norm scales, zero biases — the magnitudes flax/torch init and trained
nets share). This measures, per denoise step, the relative L2 distance
between the bf16 trajectory and the int8(-static) trajectory, anchored
against the distance between two bf16 trajectories from DIFFERENT
noise seeds (the "unrelated samples" scale).

Counterpart question in the reference: its fp16 autocast serving
(/root/reference/inference.py:139-149) is the reference's own
reduced-precision path, shipped without a quality study.

Run (real TPU): python scripts/int8_quality.py
Env: E4T_QUAL_STEPS (50), E4T_QUAL_RES (512), E4T_QUAL_BATCH (1),
E4T_QUAL_MODE — comma list of configs (default static):
  static | dynamic           int8 conv/GEMM path (ops/quant.py)
  static_pc                  static PER-CHANNEL activation scales
                             (quant.quantize_params act_pc: calibrated
                             per-input-channel ranges folded into the
                             kernel; all-static serving cost, no
                             exclusions needed)
  attn_qk | attn_qkpv        int8 flash-attention inner math alone
                             (ops/attention.int8_flash_attention)
  static_attn                static-act int8 + int8 attention "qk"
                             (the combined serving candidate)
  static~G1:G2:...           static-act int8 with sites whose module
                             path contains any Gi kept on DYNAMIC
                             scales (quant.quantize_params
                             static_exclude) — the per-site
                             attribution sweep for the static-vs-
                             dynamic quality gap
  calib_gap                  no trajectory: run a FULL-length
                             calibration and report the sites whose
                             live activation range most exceeds the
                             8-step calibrated amax (the clipping
                             candidates that drive the static penalty)
  both = static,dynamic (back-compat)
E4T_QUAL_SCHEDULER (ddim | dpmpp — bound the DPM++ fast-sampler config),
E4T_QUAL_TINY (1 = tiny config on CPU, used by the test suite),
E4T_QUAL_IMAGE (1 default — ALSO decode each config's final latents
through the bf16 VAE and report image-space rel-L2 + PSNR beside the
latent bounds: the metric scripts/validate_real_weights.py uses, so the
machinery is pre-validated before real weights exist; 0 skips the
decode).
Output: one JSON line per config with per-step relative divergence.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from e4t_diffusion_tpu.utils.structured_init import structured_params


def main():
    from e4t_diffusion_tpu.utils.runtime import (apply_platform_override,
                                                 setup_compilation_cache)

    apply_platform_override()
    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from e4t_diffusion_tpu.diffusion.pipeline import (
        E4TModules, make_calibration_fn, make_trajectory_fn)
    from e4t_diffusion_tpu.diffusion.schedulers import DDIMScheduler
    from e4t_diffusion_tpu.models import weight_offsets as wo

    tiny = os.environ.get("E4T_QUAL_TINY", "0") == "1"
    steps = int(os.environ.get("E4T_QUAL_STEPS", "8" if tiny else "50"))
    res = int(os.environ.get("E4T_QUAL_RES", "32" if tiny else "512"))
    batch = int(os.environ.get("E4T_QUAL_BATCH", "1"))
    mode = os.environ.get("E4T_QUAL_MODE", "static")
    gs, des = 7.5, 0.1
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    modules = (E4TModules.tiny(dtype=dtype) if tiny
               else E4TModules.create(dtype=dtype))
    tcfg = modules.text_encoder.config
    ecfg = modules.e4t_encoder.config
    L = tcfg.max_position_embeddings
    lat = res // (2 ** (len(modules.vae.config.block_out_channels) - 1))
    rng = jax.random.PRNGKey(0)
    # NOTE: widening this split (8 -> 9 for the round-5 VAE key)
    # changed ALL keys, so round-5 rows are not seed-identical to
    # round-4 runs. Comparability is preserved by re-measuring the
    # reference configs in-run (round 5 re-measured all-static 0.1057
    # vs round-4's 0.105 and exclusions 0.0570 vs 0.0566 — the reseed
    # effect is ~0.5%, far under any reported delta). Keep the split
    # at 9 so published round-5 numbers stay reproducible.
    ks = jax.random.split(rng, 9)

    def shapes_of(fn, *args):
        return jax.eval_shape(fn, *args)

    params = {
        "unet": structured_params(shapes_of(
            lambda k: modules.unet.init(
                k, jnp.zeros((1, 4, lat, lat)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, L, tcfg.hidden_size)))["params"], ks[0]),
            ks[0]),
        "text": structured_params(shapes_of(
            lambda k: modules.text_encoder.init(
                k, jnp.zeros((1, L), jnp.int32))["params"], ks[1]), ks[1]),
        "e4t": structured_params(shapes_of(
            lambda k: modules.e4t_encoder.init(
                k, jnp.zeros((1, 3, res, res)),
                jnp.zeros((1, ecfg.unet_feature_dim)))["params"], ks[2]),
            ks[2]),
        # REAL offset-bank init (small MLPs; the zero-centered offsets
        # are the serving regime — quantization folds (1+O) kernels)
        "offsets": wo.init_offset_bank(ks[3], modules.unet.config),
    }

    latents0 = jax.random.normal(ks[4], (batch, 4, lat, lat), jnp.float32)
    latents1 = jax.random.normal(ks[5], (batch, 4, lat, lat), jnp.float32)
    pixels = jax.random.uniform(ks[6], (1, 3, res, res), jnp.float32,
                                -1.0, 1.0)
    inputs_embeds = 0.02 * jax.random.normal(
        ks[7], (1, L, tcfg.hidden_size), jnp.float32)
    ph_idx = jnp.full((batch,), 4, jnp.int32)
    uncond_ids = jnp.zeros((1, L), jnp.int32)
    class_embed = 0.02 * jax.random.normal(ks[7], (tcfg.hidden_size,),
                                           jnp.float32)
    noise_rng = jax.random.PRNGKey(42)
    # E4T_QUAL_SCHEDULER: ddim (default) | dpmpp — bound the fast-sampler
    # serving config (bench.py E4T_BENCH_SCHEDULER=dpmpp, 20 steps) with
    # the same machinery; the 2nd-order multistep update feeds back int8
    # error through TWO retained model outputs per step.
    if os.environ.get("E4T_QUAL_SCHEDULER", "ddim") == "dpmpp":
        from e4t_diffusion_tpu.diffusion.schedulers import (
            DPMSolverMultistepScheduler)

        sched = DPMSolverMultistepScheduler()
    else:
        sched = DDIMScheduler()

    common = (params["text"], params["e4t"])

    def run_traj(int8, seed_latents, act_amax=None, int8_attn=False,
                 static_exclude=""):
        prev = os.environ.get("E4T_INT8_STATIC_EXCLUDE")
        os.environ["E4T_INT8_STATIC_EXCLUDE"] = static_exclude
        try:
            fn = make_trajectory_fn(modules, sched, steps, gs, des,
                                    int8=int8, int8_attn=int8_attn)
            extra = (act_amax,) if int8 in ("static", "static_pc") else ()
            traj = fn(params["unet"], params["offsets"], *common,
                      seed_latents, pixels, inputs_embeds, ph_idx,
                      uncond_ids, class_embed, noise_rng, *extra)
            return np.asarray(jax.device_get(traj), np.float32)
        finally:
            if prev is None:
                os.environ.pop("E4T_INT8_STATIC_EXCLUDE", None)
            else:
                os.environ["E4T_INT8_STATIC_EXCLUDE"] = prev

    print(f"[int8_quality] {'tiny' if tiny else 'SD-v1'} geometry, "
          f"{res}px, {steps} steps, batch {batch}", file=sys.stderr)
    t_bf16 = run_traj(False, latents0)
    # the unrelated-samples anchor: same weights, different start noise
    t_anchor = run_traj(False, latents1)

    def rel(a, b):
        num = np.linalg.norm((a - b).reshape(a.shape[0], -1), axis=1)
        den = np.linalg.norm(b.reshape(b.shape[0], -1), axis=1)
        return num / np.maximum(den, 1e-12)

    anchor = rel(t_anchor, t_bf16)

    # Image-space bounds (VERDICT r4 #6): decode the final latents of
    # every config through ONE shared bf16 VAE, so the reported image
    # rel-L2/PSNR isolates the UNet-path quantization error in the
    # metric validate_real_weights.py scores real checkpoints with.
    decode = None
    if os.environ.get("E4T_QUAL_IMAGE", "1") == "1":
        from e4t_diffusion_tpu.models.vae import AutoencoderKL

        vae_params = structured_params(shapes_of(
            lambda k: modules.vae.init(
                k, jnp.zeros((1, 3, res, res)), k)["params"], ks[8]), ks[8])
        scaling = modules.vae.config.scaling_factor

        @jax.jit
        def decode_fn(final_latents):
            img = modules.vae.apply(
                {"params": vae_params},
                jnp.asarray(final_latents, dtype) / scaling,
                method=AutoencoderKL.decode)
            return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

        def decode(final_latents):
            return np.asarray(jax.device_get(decode_fn(final_latents)),
                              np.float32)

    def image_metrics(img_q, img_ref, img_anchor):
        """Whole-batch image rel-L2 + PSNR (pixels in [0,1])."""
        num = float(np.linalg.norm(img_q - img_ref))
        den = float(max(np.linalg.norm(img_ref), 1e-12))
        mse = float(np.mean((img_q - img_ref) ** 2))
        anchor_rel = (float(np.linalg.norm(img_anchor - img_ref)) / den)
        return {
            "image_rel_l2": round(num / den, 5),
            "image_psnr_db": round(10.0 * np.log10(1.0 / max(mse, 1e-12)),
                                   2),
            "image_anchor_rel_l2": round(anchor_rel, 5),
            "image_fraction_of_unrelated": round(
                (num / den) / max(anchor_rel, 1e-12), 5),
        }

    img_bf16 = img_anchor = None
    if decode is not None:
        img_bf16 = decode(t_bf16[-1])
        img_anchor = decode(t_anchor[-1])

    # (kernel-int8 arg, attention-int8 arg) per named config
    CONFIGS = {
        "static": ("static", False),
        "static_pc": ("static_pc", False),
        "dynamic": (True, False),
        "attn_qk": (False, "qk"),
        "attn_qkpv": (False, "qkpv"),
        "static_attn": ("static", "qk"),
    }
    results = []
    modes = ["static", "dynamic"] if mode == "both" else mode.split(",")
    if (any(CONFIGS.get(m, ("", False))[1] for m in modes)
            and jax.default_backend() != "tpu"):
        print("[int8_quality] WARNING: attention int8 modes only take "
              "effect where the dispatcher routes to flash (TPU backend, "
              "above-threshold sites) — on this backend they measure 0 "
              "divergence by construction", file=sys.stderr)
    def get_amax():
        nonlocal act_amax
        if act_amax is None:
            calib_steps = int(os.environ.get("E4T_QUAL_CALIB_STEPS",
                                             str(min(8, steps))))
            cfn = make_calibration_fn(modules, sched, calib_steps, gs, des)
            act_amax = cfn(params["unet"], params["offsets"], *common,
                           latents0, pixels, inputs_embeds, ph_idx,
                           uncond_ids, class_embed, noise_rng)
        return act_amax

    def calib_gap():
        """FULL-length calibration vs the 8-step one: which sites' live
        activation ranges exceed the calibrated amax (i.e. clip under
        static scales), and by how much. No trajectory run needed —
        this is the cheap attribution pass that picks the sweep groups."""
        from jax.tree_util import tree_flatten_with_path, keystr

        cfn_full = make_calibration_fn(modules, sched, steps, gs, des)
        amax_full = cfn_full(params["unet"], params["offsets"], *common,
                             latents0, pixels, inputs_embeds, ph_idx,
                             uncond_ids, class_embed, noise_rng)
        short = get_amax()
        flat_f, _ = tree_flatten_with_path(jax.device_get(amax_full))
        flat_s, _ = tree_flatten_with_path(jax.device_get(short))
        rows = []
        for (pf, vf), (ps, vs) in zip(flat_f, flat_s):
            assert keystr(pf) == keystr(ps)
            full, cal = float(np.max(vf)), float(np.max(vs))
            rows.append((full / max(cal, 1e-12), cal, full,
                         keystr(pf).replace("['", "/").replace("']", "")))
        rows.sort(reverse=True)
        out = {
            "metric": "int8_static_calib_gap",
            "unit": "live_amax / calibrated_amax (>1 clips)",
            "calib_steps": int(os.environ.get("E4T_QUAL_CALIB_STEPS",
                                              str(min(8, steps)))),
            "full_steps": steps,
            "n_sites": len(rows),
            "n_clipping": sum(1 for r in rows if r[0] > 1.0 + 1e-6),
            "worst": [{"site": r[3], "ratio": round(r[0], 4),
                       "calib_amax": round(r[1], 4),
                       "live_amax": round(r[2], 4)} for r in rows[:20]],
        }
        results.append(out)
        print(json.dumps(out))

    act_amax = None
    for m in modes:
        if m == "calib_gap":
            calib_gap()
            continue
        static_exclude = ""
        if m.startswith("static~"):
            static_exclude = m.split("~", 1)[1].replace(":", ",")
            int8, int8_attn = "static", False
        else:
            int8, int8_attn = CONFIGS[m]
        if int8 in ("static", "static_pc"):
            get_amax()
        t_q = run_traj(int8, latents0,
                       act_amax if int8 in ("static", "static_pc") else None,
                       int8_attn=int8_attn, static_exclude=static_exclude)
        d = rel(t_q, t_bf16)
        # headline: final-step divergence as a fraction of the
        # unrelated-samples distance (0 = identical, 1 = as different
        # as an unrelated sample)
        frac = float(d[-1] / max(anchor[-1], 1e-12))
        out = {
            "metric": f"int8_{m}_vs_bf16_rel_l2_final",
            "value": round(float(d[-1]), 5),
            "unit": "relative L2 (final latents)",
            "anchor_unrelated_rel_l2": round(float(anchor[-1]), 5),
            "fraction_of_unrelated": round(frac, 5),
            "per_step_rel_l2": [round(float(x), 5) for x in d],
            "steps": steps, "res": res, "geometry":
                "tiny" if tiny else "sd-v1",
            "scheduler": type(sched).__name__,
        }
        if int8 in ("static", "static_pc"):
            out["calib_steps"] = int(os.environ.get(
                "E4T_QUAL_CALIB_STEPS", str(min(8, steps))))
        if decode is not None:
            out.update(image_metrics(decode(t_q[-1]), img_bf16, img_anchor))
        results.append(out)
        print(json.dumps(out))
    return results


if __name__ == "__main__":
    main()
