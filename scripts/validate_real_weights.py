"""One-command real-weights validation (BASELINE.md CLIP parity row).

No SD weights exist on this image (no egress), so the full-quality
validation is staged: the day a diffusers SD-v1-4 dir and the published
E4T checkpoint (mshing/e4t-diffusion-ffhq-celebahq-v1,
/root/reference/README.md:22-27) can be copied in, this script runs the
entire chain in one command:

1. stage the E4T checkpoint with its ``pretrained_model_name_or_path``
   rewritten to the local SD dir (the published config references the
   HF hub name, unreachable here);
2. (optional, --tune_steps N) domain-tune on the target image the way
   the reference README does before its sample
   (/root/reference/README.md:62-74, 30 steps on Yann LeCun's photo);
3. generate the README prompt ("a photo of *s in the beach") with the
   bf16 pipeline, then again with --int8 --int8_static_act;
4. report the int8-vs-bf16 image delta (rel-L2, PSNR) — the image-level
   counterpart of the latent-trajectory bound in scripts/int8_quality.py;
5. if open_clip ViT-H-14 weights are staged too, score CLIP-I (vs the
   domain image, and vs the reference's published sample if given) and
   CLIP-T (vs the prompt) via scripts/evaluate_clip_scores.py machinery.

Every step uses the tested CLI surfaces (tuning_e4t.py / inference.py as
subprocesses), so a passing run here is evidence the user-facing chain —
converters with strict key manifests included — works on real weights.
The chain itself is CI-tested end-to-end on a tiny synthetic SD dir
(tests/test_validate_real_weights.py).

Usage (real):
  python scripts/validate_real_weights.py \
      --e4t_ckpt /data/e4t-diffusion-ffhq-celebahq-v1 \
      --sd_dir /data/stable-diffusion-v1-4 \
      --domain_image /data/yann-lecun.jpg \
      --reference_image /root/reference/assets/yann-in-the-beach.png \
      --tune_steps 30 \
      --open_clip_weights /data/open_clip_vit_h14.pt \
      --out_dir out/validation
Prints one JSON line; also written to <out_dir>/validation.json.
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--e4t_ckpt", required=True,
                   help="E4T 3-artifact checkpoint dir (pretrained or "
                        "domain-tuned)")
    p.add_argument("--sd_dir", default=None,
                   help="local diffusers SD-v1 dir; rewrites the ckpt's "
                        "pretrained_model_name_or_path (omit if the ckpt "
                        "already points at a reachable path)")
    p.add_argument("--domain_image", required=True,
                   help="target/source image (ViT conditioning + CLIP-I)")
    p.add_argument("--prompt", default="a photo of *s in the beach",
                   help="README sample prompt by default")
    p.add_argument("--reference_image", default=None,
                   help="the reference's published sample to score "
                        "against (assets/yann-in-the-beach.png)")
    p.add_argument("--tune_steps", type=int, default=0,
                   help=">0: domain-tune on --domain_image first "
                        "(README uses 30)")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--resolution", type=int, default=512,
                   help="tuning resolution and generated height/width")
    p.add_argument("--train_batch_size", type=int, default=4,
                   help="tuning batch (4 fits one 16GB v5e, CLAUDE.md)")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--open_clip_weights", default=None,
                   help="open_clip ViT-H-14 .pt for CLIP-I/CLIP-T "
                        "(skipped if absent)")
    p.add_argument("--class_word", default="face",
                   help="replaces the placeholder token for CLIP-T")
    p.add_argument("--skip_int8", action="store_true")
    p.add_argument("--out_dir", default="out/validation")
    return p.parse_args()


def _run(cmd, cwd):
    print(f"[validate] $ {' '.join(cmd)}", file=sys.stderr)
    r = subprocess.run([sys.executable] + cmd, cwd=cwd)
    if r.returncode != 0:
        raise SystemExit(f"[validate] step failed (rc={r.returncode}): "
                         f"{cmd[0]}")


def stage_ckpt(e4t_ckpt: str, sd_dir: str, out_dir: str) -> str:
    """Copy the ckpt dir with pretrained_model_name_or_path rewritten to
    the local SD dir; weight files are symlinked, not copied."""
    staged = os.path.join(out_dir, "staged_ckpt")
    os.makedirs(staged, exist_ok=True)
    for name in os.listdir(e4t_ckpt):
        src = os.path.join(e4t_ckpt, name)
        dst = os.path.join(staged, name)
        if name == "config.json" or not os.path.isfile(src):
            continue
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(src), dst)
    with open(os.path.join(e4t_ckpt, "config.json")) as f:
        cfg = json.load(f)
    # the key lives either at the top level (tuning output) or nested in
    # pretrained_args (pretrain output) — rewrite wherever present
    if "pretrained_model_name_or_path" in cfg:
        cfg["pretrained_model_name_or_path"] = sd_dir
    if isinstance(cfg.get("pretrained_args"), dict):
        cfg["pretrained_args"]["pretrained_model_name_or_path"] = sd_dir
    with open(os.path.join(staged, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    return staged


def image_delta(path_a: str, path_b: str) -> dict:
    from PIL import Image

    a = np.asarray(Image.open(path_a).convert("RGB"), np.float32) / 255.0
    b = np.asarray(Image.open(path_b).convert("RGB"), np.float32) / 255.0
    rel_l2 = float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))
    mse = float(np.mean((a - b) ** 2))
    psnr = float(10.0 * np.log10(1.0 / max(mse, 1e-12)))
    return {"rel_l2": round(rel_l2, 5), "psnr_db": round(psnr, 2)}


def clip_scores(args, image_paths, out):
    """CLIP-I/CLIP-T via models/clip_score (open_clip ViT-H-14) — same
    machinery as scripts/evaluate_clip_scores.py."""
    import jax.numpy as jnp
    from PIL import Image

    from e4t_diffusion_tpu.models.clip_score import (
        CLIPScorer, CLIPScoreConfig, clip_i, clip_t, scorer_from_open_clip)
    from e4t_diffusion_tpu.utils.convert import load_torch_state_dict
    from e4t_diffusion_tpu.utils.tokenizer import CLIPTokenizer

    config = CLIPScoreConfig()
    params = scorer_from_open_clip(
        load_torch_state_dict(args.open_clip_weights), config)
    scorer = CLIPScorer(config)

    def feats(path, size=224):
        img = Image.open(path).convert("RGB").resize((size, size))
        arr = np.asarray(img).astype(np.float32) / 127.5 - 1.0
        px = jnp.asarray(arr.transpose(2, 0, 1)[None])
        return scorer.apply({"params": params}, px,
                            method=CLIPScorer.image_features)

    gen_feats = [feats(p) for p in image_paths]
    src_feats = feats(args.domain_image)
    out["clip_i_vs_domain"] = round(float(np.mean(
        [float(clip_i(g, src_feats)) for g in gen_feats])), 4)
    if args.reference_image:
        ref_feats = feats(args.reference_image)
        out["clip_i_vs_reference_sample"] = round(float(np.mean(
            [float(clip_i(g, ref_feats)) for g in gen_feats])), 4)
    tok_dir = os.path.join(args.sd_dir or "", "tokenizer")
    if os.path.isdir(tok_dir):
        tokenizer = CLIPTokenizer.from_pretrained(tok_dir)
        text = args.prompt.replace("*s", args.class_word)
        ids = jnp.asarray(tokenizer(text, padding="max_length",
                                    truncation=True,
                                    max_length=77)["input_ids"])
        text_feats = scorer.apply({"params": params}, ids,
                                  method=CLIPScorer.text_features)
        out["clip_t"] = round(float(np.mean(
            [float(clip_t(g, text_feats)) for g in gen_feats])), 4)


def main():
    args = parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(args.out_dir, exist_ok=True)
    out = {"metric": "real_weights_validation", "prompt": args.prompt}

    ckpt = args.e4t_ckpt
    if args.sd_dir:
        ckpt = stage_ckpt(args.e4t_ckpt, os.path.abspath(args.sd_dir),
                          args.out_dir)
        out["staged_ckpt"] = ckpt

    if args.tune_steps > 0:
        tuned = os.path.join(args.out_dir, "tuned")
        _run(["tuning_e4t.py",
              "--pretrained_model_name_or_path", ckpt,
              "--prompt_template", "a photo of {placeholder_token}",
              "--reg_lambda", "0.1",
              "--output_dir", tuned,
              "--train_image_path", args.domain_image,
              "--resolution", str(args.resolution),
              "--train_batch_size", str(args.train_batch_size),
              "--learning_rate", "1e-6", "--scale_lr",
              "--max_train_steps", str(args.tune_steps),
              "--use_8bit_adam", "--seed", str(args.seed)], cwd=repo)
        # tuning_e4t.py writes its artifacts to output_dir/<step>/
        ckpt = os.path.join(tuned, str(args.tune_steps))
        out["tuned_ckpt"] = ckpt

    def generate(tag, extra):
        png = os.path.abspath(os.path.join(args.out_dir, f"{tag}.png"))
        _run(["inference.py",
              "--pretrained_model_name_or_path", ckpt,
              "--image_path_or_url", args.domain_image,
              "--prompt", args.prompt,
              "--num_inference_steps", str(args.num_inference_steps),
              "--guidance_scale", str(args.guidance_scale),
              "--height", str(args.resolution),
              "--width", str(args.resolution),
              "--seed", str(args.seed),
              "--output", png] + extra, cwd=repo)
        return png

    bf16_png = generate("bf16", [])
    out["bf16_sample"] = bf16_png
    gen_paths = [bf16_png]
    if not args.skip_int8:
        int8_png = generate("int8_static", ["--int8", "--int8_static_act"])
        out["int8_sample"] = int8_png
        out["int8_vs_bf16"] = image_delta(int8_png, bf16_png)
        gen_paths.append(int8_png)

    if args.open_clip_weights and os.path.exists(args.open_clip_weights):
        clip_scores(args, gen_paths[:1], out)
    else:
        out["clip_scores"] = "skipped (no --open_clip_weights staged)"

    with open(os.path.join(args.out_dir, "validation.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
