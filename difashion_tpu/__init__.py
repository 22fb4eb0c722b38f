"""difashion_tpu — a from-scratch, TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of DiFashion (SIGIR 2024): diffusion-based generative outfit recommendation.

Layer map (mirrors SURVEY.md §7):
  core/       typed config, PRNG discipline, mesh/sharding, checkpointing, weight import
  nn/         NHWC neural-net primitives (conv, norms, attention incl. Pallas flash attention)
  diffusion/  pure-function noise schedules + samplers (DDPM fwd, PNDM/PLMS as lax.scan, DDIM)
  models/     SD UNet (8-ch conv_in variant), AutoencoderKL VAE, CLIP text encoder,
              MutualEncoder, and evaluation backbones
  data/       host-side pipeline: .npy schema readers, CLIP BPE tokenizer, prompt builder,
              image preprocessing, catalog precompute
  engine/     jitted training step (DP over a device mesh) and the scan-based generation engine
  eval/       metric library (FID, IS, CLIP scores, LPIPS, personalization, compatibility)
  cli/        train / generate / evaluate / extract-features entry points
"""

__version__ = "0.1.0"
