"""e4t_diffusion_tpu — a TPU-native (JAX/Flax/Pallas) E4T framework.

A from-scratch reimplementation of the capabilities of mkshing/e4t-diffusion
("Encoder-based Domain Tuning for Fast Personalization of Text-to-Image
Models", arXiv:2302.12228), designed TPU-first:

- All models (SD v1 UNet, AutoencoderKL VAE, CLIP text encoder, OpenCLIP
  ViT vision tower, E4T encoder head) are flax.linen modules operating on
  parameter pytrees.
- The E4T weight-offset hypernetworks live in a separate pytree and are
  *folded* into effective attention projection weights: once per sampling
  run at inference, and inside the differentiated loss during training
  (reference recomputes all 96 hypernetworks per attention call:
  /root/reference/e4t/models/cross_attention.py:297,305-307).
- The denoising loop is a single `lax.scan` under one jit; the ViT vision
  tower is hoisted out of the loop (its input image is constant across
  denoise steps; the reference re-runs it every step:
  /root/reference/e4t/pipeline_stable_diffusion_e4t.py:194).
- Attention uses a Pallas flash-attention kernel on TPU with a jnp einsum
  fallback for CPU tests.
- Data parallelism via jax.sharding.Mesh + collectives (reference uses
  accelerate/DDP/NCCL: /root/reference/pretrain_e4t.py:224-229,409-412).
"""

__version__ = "0.1.0"
