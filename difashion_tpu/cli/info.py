"""`python -m difashion_tpu info` — environment + capacity planner.

Prints the backend/devices/mesh the other CLIs will see, and the per-chip HBM
accounting of the requested training configuration (engine/memory.py), so an
operator can answer "does this recipe fit on this slice?" BEFORE paying a
full-model compile. The reference has no equivalent surface (its capacity story
is trial-and-error CUDA OOMs on a single GPU).
"""
import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="difashion_tpu info",
        description="environment + training-state HBM capacity planner",
    )
    p.add_argument("--model", choices=["sd2_base", "sd15", "tiny"],
                   default="sd2_base")
    p.add_argument("--dp_size", type=int, default=0,
                   help="devices to plan for (default: all visible)")
    p.add_argument("--adam8bit", action="store_true",
                   help="plan with block-wise int8 Adam moments")
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--hbm_gib", type=float, default=16.0,
                   help="per-chip HBM budget (v5e default)")
    p.add_argument("--json", action="store_true", help="machine-readable output")
    p.add_argument("--skip_accounting", action="store_true",
                   help="devices/mesh only (skips the eval_shape trace, which "
                        "takes a minute or two at full model size)")
    args = p.parse_args(argv)

    import jax

    devices = jax.devices()
    ndev = args.dp_size if args.dp_size > 0 else len(devices)
    env = {
        "backend": devices[0].platform if devices else "none",
        "devices": len(devices),
        "device_kind": devices[0].device_kind if devices else "none",
        "mesh": {"dp": ndev},
        "jax": jax.__version__,
    }

    acc = None
    if not args.skip_accounting:
        from difashion_tpu.core.config import ModelConfig, TrainConfig
        from difashion_tpu.engine.memory import (
            format_accounting,
            state_memory_accounting,
        )

        mcfg = getattr(ModelConfig, args.model)()
        tcfg = TrainConfig(
            learning_rate=1e-5,
            use_8bit_adam=args.adam8bit,
            use_ema=not args.no_ema,
            use_ema_fashion=not args.no_ema,
        )
        acc = state_memory_accounting(mcfg, tcfg, n_devices=ndev)

    if args.json:
        out = dict(env)
        if acc is not None:
            out["hbm_accounting"] = {
                **acc,
                "hbm_budget_bytes": int(args.hbm_gib * 2**30),
                "fits_dp": acc["per_chip_bytes_dp"] <= args.hbm_gib * 2**30,
                "fits_zero1": acc["per_chip_bytes_zero1"] <= args.hbm_gib * 2**30,
            }
        print(json.dumps(out))
    else:
        for k, v in env.items():
            print(f"{k:<12} {v}")
        if acc is not None:
            print()
            print(format_accounting(acc, hbm_bytes=int(args.hbm_gib * 2**30)))
    return 0


if __name__ == "__main__":
    main()
