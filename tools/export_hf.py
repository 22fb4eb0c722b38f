"""Export a difashion-tpu checkpoint to diffusers-layout safetensors.

The inverse of `core/importer.py`: users coming FROM the reference can bring SD
checkpoints in; users leaving can take fine-tuned weights out in the HF layout
(`unet/diffusion_pytorch_model.safetensors`, `fashion_encoder/...`, optionally the
frozen towers), consumable by torch/diffusers tooling.

Usage:
  python tools/export_hf.py --ckpt_dir ckpt [--step N] --out exported/ [--ema]
          [--tiny] [--include_frozen]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

# honor JAX_PLATFORMS=cpu in-process: the axon sitecustomize's remote-TPU backend
# wins over the env var alone, and with the tunnel down a hang here wedges any
# caller (tests spawn this tool as a subprocess)
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--ema", action="store_true",
                   help="export the EMA weights (the reference's released form)")
    p.add_argument("--include_frozen", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--config", default=None)
    args = p.parse_args(argv)

    from safetensors.numpy import save_file

    from difashion_tpu.cli.generate import load_model_for_inference
    from difashion_tpu.core.config import Config
    from difashion_tpu.core.importer import export_params

    cfg = (Config.from_json(open(args.config).read()) if args.config
           else (Config.preset_tiny() if args.tiny else Config.preset_eta01()))
    model, params, step = load_model_for_inference(
        cfg, args.ckpt_dir, args.step, use_ema=args.ema
    )

    towers = [("unet", "unet"), ("fashion_encoder", "mutual")]
    if args.include_frozen:
        towers += [("vae", "vae"), ("text_encoder", "text")]
    mdims = (cfg.model.mutual.latent_channels, cfg.model.mutual.latent_size)
    for key, kind in towers:
        sd = export_params(jax.device_get(params[key]), kind,
                           mutual_dims=mdims if kind == "mutual" else None)
        sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
        d = os.path.join(args.out, key)
        os.makedirs(d, exist_ok=True)
        name = ("model.safetensors" if key == "text_encoder"
                else "diffusion_pytorch_model.safetensors")
        save_file(sd, os.path.join(d, name))
        print(f"wrote {key}: {len(sd)} tensors -> {d}/{name}")
    print(f"exported checkpoint-{step} (ema={args.ema}) to {args.out}")


if __name__ == "__main__":
    main()
