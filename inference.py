"""E4T inference CLI — TPU-native.

Flag-compatible with the reference (/root/reference/inference.py:32-48):
loads a tuned/pretrained E4T artifact dir, builds the sampling pipeline,
renders a prompt grid to grid.png. '::' splits multiple prompts.

TPU notes: --enable_xformers_memory_efficient_attention is accepted for CLI
parity but is a no-op — the Pallas flash-attention kernel is always on for
TPU backends. --dtype bf16 (default on TPU) runs the whole denoise loop in
bfloat16 compute with fp32 params.
"""
import argparse
import os

import jax
import jax.numpy as jnp
from tqdm import tqdm

from e4t_diffusion_tpu.config import (
    load_config, get_e4t_config, getattr_from_config)
from e4t_diffusion_tpu.diffusion.pipeline import StableDiffusionE4TPipeline
from e4t_diffusion_tpu.diffusion.schedulers import SCHEDULER_MAPPING
from e4t_diffusion_tpu.training.setup import build_modules, prepare_tokenizer
from e4t_diffusion_tpu.utils import artifacts
from e4t_diffusion_tpu.utils.image import image_grid, load_image


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_path_or_url", type=str,
                        help="path to the input image")
    parser.add_argument("--pretrained_model_name_or_path", type=str,
                        help="model dir including config.json, encoder.pt, "
                             "weight_offsets.pt")
    # diffusers config
    parser.add_argument("--prompt", type=str, nargs="?",
                        default="a photo of *s", help="the prompt to render")
    parser.add_argument("--num_inference_steps", type=int, default=50,
                        help="number of ddim sampling steps")
    parser.add_argument("--guidance_scale", type=float, default=1.0,
                        help="unconditional guidance scale")
    parser.add_argument("--num_images_per_prompt", type=int, default=1,
                        help="number of images per prompt")
    parser.add_argument("--height", type=int, default=512,
                        help="image height, in pixel space")
    parser.add_argument("--width", type=int, default=512,
                        help="image width, in pixel space")
    parser.add_argument("--seed", type=int, default=None,
                        help="the seed (for reproducible sampling)")
    parser.add_argument("--scheduler_type", type=str,
                        choices=["ddim", "plms", "lms", "euler",
                                 "euler_ancestral", "dpm_solver++"],
                        default="ddim", help="diffusion scheduler type")
    parser.add_argument("--enable_xformers_memory_efficient_attention",
                        action="store_true",
                        help="accepted for parity; flash attention is "
                             "always used on TPU")
    # TPU additions
    parser.add_argument("--dtype", type=str, default="auto",
                        choices=["auto", "bf16", "fp32"],
                        help="compute dtype (auto = bf16 on TPU)")
    parser.add_argument("--tensor_parallel", type=int, default=1,
                        help="tensor-parallel serving degree: UNet "
                             "kernels sharded over a tp mesh axis, flash "
                             "attention head-sharded via shard_map "
                             "(beyond reference parity)")
    parser.add_argument("--data_parallel_serving", action="store_true",
                        help="shard the sampling batch over the mesh's "
                             "dp axis (all remaining devices after "
                             "--tensor_parallel); the batch must be "
                             "divisible by dp")
    parser.add_argument("--int8", action="store_true",
                        help="int8-quantize the offset-folded UNet kernels "
                             "and serve the matmul/conv path on the int8 "
                             "MXU (ops/quant.py; composes with "
                             "--tensor_parallel/--data_parallel_serving)")
    parser.add_argument("--batch_prompts", action="store_true",
                        help="run all '::'-separated prompts as ONE "
                             "batched sampling run (per-sample prompt "
                             "embeddings) instead of the reference's "
                             "one-run-per-prompt loop — N prompts for "
                             "the price of one batch-N run")
    parser.add_argument("--lora_weights", type=str, default=None,
                        help="optional LoRA attention adapters: a "
                             "diffusers-0.14 attn-procs state dict "
                             "(pytorch_lora_weights.bin layout); folded "
                             "into the effective kernels after the E4T "
                             "offsets (models/lora.py)")
    parser.add_argument("--lora_scale", type=float, default=1.0,
                        help="LoRA scale (reference processor default)")
    parser.add_argument("--int8_aux", action="store_true",
                        help="also int8-quantize the once-per-run "
                             "auxiliary towers: the ViT-H image encoder "
                             "and the VAE decode path (dynamic act "
                             "scales, no calibration; independent of "
                             "--int8)")
    parser.add_argument("--int8_aux_static", action="store_true",
                        help="with --int8_aux: calibrate static "
                             "activation scales for the aux towers too "
                             "(one ViT encode + one VAE decode at the "
                             "first prompt) and skip their per-call "
                             "abs-max reductions — the per-run latency "
                             "knob")
    parser.add_argument("--vit_gelu_tanh", action="store_true",
                        help="serve the ViT-H tower's GELU with the tanh "
                             "approximation (open_clip uses exact erf — "
                             "the parity default). Measured: encode 29.2 "
                             "vs 38.4 ms at batch 8; feature deviation "
                             "bounded in tests/test_vit_gelu_knob.py. "
                             "The per-run latency knob, like "
                             "--int8_aux_static")
    parser.add_argument("--int8_attn", choices=["qk", "qkpv"], default=None,
                        help="run the flash-attention inner matmuls on "
                             "the int8 MXU too (SageAttention-style "
                             "per-head Q/K quantization with exact "
                             "key-mean-centering; 'qkpv' also quantizes "
                             "the p@v pass). Independent of --int8; "
                             "quality bound: scripts/int8_quality.py")
    parser.add_argument("--int8_static_act", action="store_true",
                        help="with --int8: calibrate static activation "
                             "scales on a short trajectory at the first "
                             "prompt (E4T_INT8_CALIB_STEPS, default 8) "
                             "and skip the per-call activation abs-max "
                             "reductions for all prompts except the "
                             "clip-prone residual-conv sites, which "
                             "stay on dynamic scales in every regime "
                             "(measured free; near-dynamic quality — "
                             "docs/KERNELS.md; E4T_INT8_STATIC_EXCLUDE "
                             "overrides the site list)")
    parser.add_argument("--int8_pc_act", action="store_true",
                        help="with --int8_static_act: PER-CHANNEL "
                             "calibrated activation scales, folded into "
                             "the int8 kernels' contraction axis "
                             "(quant.quantize_params act_pc) — the "
                             "best ALL-static flavor (every site "
                             "static, zero dynamic reductions; "
                             "E4T_INT8_PC_ALPHA tunes the fold). The "
                             "default static+exclusions config bounds "
                             "tighter at equal speed; see "
                             "docs/KERNELS.md")
    parser.add_argument("--act_scales", type=str, default=None,
                        help="with --int8_static_act: JSON file of "
                             "calibrated activation ranges. Loaded if it "
                             "exists (deployments sharing it quantize "
                             "identically); otherwise written after the "
                             "first prompt's calibration")
    parser.add_argument("--output", type=str, default="grid.png")
    return parser.parse_args()


def build_pipeline(args) -> StableDiffusionE4TPipeline:
    """Resolve the artifact dir, load weights, and construct the serving
    pipeline from parsed CLI args. Shared by this CLI and the batch
    server (scripts/serve_e4t.py)."""
    from e4t_diffusion_tpu.utils.runtime import (apply_platform_override,
                                                 setup_compilation_cache)

    apply_platform_override()
    print(f"devices: {jax.devices()}")
    setup_compilation_cache()
    if getattr(args, "vit_gelu_tanh", False):
        # trace-time knob (models/vit._gelu_tanh_env); set before any
        # encode program is traced
        os.environ["E4T_VIT_GELU"] = "tanh"
    if args.dtype == "auto":
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    else:
        dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    from e4t_diffusion_tpu.utils.hub import resolve_model_dir

    args.pretrained_model_name_or_path = resolve_model_dir(
        args.pretrained_model_name_or_path)
    config = load_config(args.pretrained_model_name_or_path)
    sd_path = getattr_from_config(config, "pretrained_model_name_or_path")
    e4t_config = get_e4t_config(config)

    base = artifacts.load_sd_base(sd_path)
    enc_cfg = artifacts.e4t_encoder_config_from_args(
        e4t_config, word_embedding_dim=base["text_config"].hidden_size,
        unet_config=base["unet_config"])
    loaded = artifacts.load_e4t_weights(
        args.pretrained_model_name_or_path, base, enc_cfg)

    modules = build_modules(base, enc_cfg, dtype=dtype)
    tokenizer, text_params, _ = prepare_tokenizer(
        base, e4t_config.placeholder_token, loaded["text"])

    params = {
        "unet": loaded["unet"],
        "offsets": loaded.get("offsets"),
        "vae": loaded["vae"],
        "text": text_params,
        "e4t": loaded["e4t"],
    }
    scheduler = SCHEDULER_MAPPING[args.scheduler_type](
        base["schedule_config"])
    tp_mesh = None
    dp_serving = getattr(args, "data_parallel_serving", False)
    if args.tensor_parallel > 1 or dp_serving:
        from e4t_diffusion_tpu.parallel import mesh as pmesh

        tp_mesh = pmesh.get_mesh(tp=args.tensor_parallel)
        params["unet"] = pmesh.apply_tensor_parallel(params["unet"], tp_mesh)
        print(f"parallel serving mesh: dp={tp_mesh.shape[pmesh.DATA_AXIS]} "
              f"x tp={args.tensor_parallel}"
              + (" (batch dp-sharded)" if dp_serving else ""))
    lora_bank = None
    if args.lora_weights:
        from e4t_diffusion_tpu.models import lora
        from e4t_diffusion_tpu.utils import convert

        lora_bank = lora.lora_from_torch(
            convert.load_torch_state_dict(args.lora_weights),
            modules.unet.config)
        print(f"loaded LoRA adapters ({len(lora_bank)} attention sites, "
              f"scale {args.lora_scale})")
    act_scales = None
    if getattr(args, "act_scales", None) and os.path.exists(args.act_scales):
        from e4t_diffusion_tpu.ops import quant

        act_scales = quant.load_act_scales(args.act_scales)
        print(f"loaded activation ranges from {args.act_scales}")
    pipe = StableDiffusionE4TPipeline(
        modules, params, tokenizer, e4t_config, scheduler=scheduler,
        already_added_placeholder_token=True, tp_mesh=tp_mesh,
        # --int8_static_act implies --int8 (advisor r2: passing it alone
        # used to silently serve bf16); --int8_pc_act implies both
        int8=("static_pc" if getattr(args, "int8_pc_act", False)
              else "static" if args.int8_static_act else args.int8),
        int8_aux=("static" if getattr(args, "int8_aux_static", False)
                  else getattr(args, "int8_aux", False)),
        int8_attn=getattr(args, "int8_attn", None) or False,
        lora_bank=lora_bank, lora_scale=args.lora_scale,
        dp_shard_batch=dp_serving, act_scales=act_scales)
    print("loaded pipeline")
    return pipe


def maybe_save_act_scales(pipe, args) -> None:
    """After the first generation: persist freshly calibrated ranges if
    --act_scales names a file that didn't exist yet."""
    if (getattr(args, "act_scales", None) and pipe._act_amax is not None
            and not os.path.exists(args.act_scales)):
        from e4t_diffusion_tpu.ops import quant

        quant.save_act_scales(jax.device_get(pipe._act_amax),
                              args.act_scales)
        print(f"saved activation ranges to {args.act_scales}")


def main():
    args = parse_args()
    pipe = build_pipeline(args)

    image = load_image(args.image_path_or_url)
    prompts = args.prompt.split("::")
    all_images = []
    if args.batch_prompts and len(prompts) > 1:
        all_images = pipe(prompts,
                          image,
                          num_inference_steps=args.num_inference_steps,
                          guidance_scale=args.guidance_scale,
                          num_images_per_prompt=args.num_images_per_prompt,
                          height=args.height,
                          width=args.width,
                          seed=args.seed,
                          output_type="pil")
    else:
        for prompt in tqdm(prompts):
            imgs = pipe(prompt,
                        image,
                        num_inference_steps=args.num_inference_steps,
                        guidance_scale=args.guidance_scale,
                        num_images_per_prompt=args.num_images_per_prompt,
                        height=args.height,
                        width=args.width,
                        seed=args.seed,
                        output_type="pil")
            all_images.extend(imgs)
    maybe_save_act_scales(pipe, args)
    grid_image = image_grid(all_images, len(prompts),
                            args.num_images_per_prompt)
    grid_image.save(args.output)
    print(f"DONE! See `{args.output}` for the results!")


if __name__ == "__main__":
    main()
