"""Unified CLI dispatcher: `python -m difashion_tpu <command> [...]`.

Commands mirror the reference's public entry points (`/root/reference/README.md:183-206`):
  train              fine-tune DiFashion (run_eta0.1.sh recipe by default)
  generate           FITB/GOR inference for evaluation (inf4eval equivalent)
  evaluate           metric cascades over generated runs (Evaluation/ equivalent)
  extract-features   catalog VAE moments + CLIP features + history means
  parity             turnkey quality-parity runbook (generate + evaluate + 2% gates)
  serve              warm-model HTTP generation service
  info               environment + training-state HBM capacity planner
"""
import sys


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, argv = sys.argv[1], sys.argv[2:]
    # honor JAX_PLATFORMS=cpu in-process for every CLI: the axon sitecustomize's
    # remote-TPU backend otherwise wins over the env var (and hangs when the
    # tunnel is down)
    import os

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        import jax

        jax.config.update("jax_platforms", "cpu")
    # persistent executable cache: the 50-step sampler / train step compile in
    # tens of minutes on TPU; restarts reload them in seconds
    from difashion_tpu.core.logging import enable_compile_cache

    enable_compile_cache()
    if cmd == "train":
        from difashion_tpu.cli.train import main as run
    elif cmd == "generate":
        from difashion_tpu.cli.generate import main as run
    elif cmd == "evaluate":
        from difashion_tpu.cli.evaluate import main as run
    elif cmd in ("extract-features", "extract_features"):
        from difashion_tpu.cli.extract_features import main as run
    elif cmd == "parity":
        from difashion_tpu.cli.parity import main as run
    elif cmd == "serve":
        from difashion_tpu.cli.serve import main as run
    elif cmd == "info":
        from difashion_tpu.cli.info import main as run
    else:
        print(f"unknown command {cmd!r}\n{__doc__}")
        return 2
    run(argv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
