"""Benchmark: outfit-image generation throughput on the north-star config.

Measures GOR-style joint generation — one outfit, 4 items denoised in lockstep with the
full 4-branch CFG (category 12.0 / mutual 5.0 / history 4.0), eta=0.1, 512px, 50-step
PNDM — on the full SD2-base-scale DiFashion stack (bf16 UNet/VAE compute), i.e. the
configuration pinned by the reference recipes (`/root/reference/DiFashion/run_inf4eval.sh`,
`train.py:161-180`). Random weights; throughput is weight-independent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline is ESTIMATE-DERIVED and labeled as such in the JSON itself
(`vs_baseline_estimated: true`): the reference repo publishes no numbers
(BASELINE.md), and this image has no GPU, so the denominator comes from an MFU-bound
analysis of the same workload on an A100 (fp16 peak 312 TFLOP/s):

  per outfit-image: 51 UNet forwards x 4 CFG branches x ~0.75 TFLOP = ~153 TFLOP
  + VAE decode + scheduler/host overhead
  A100 fp16 MFU for SD-class UNets with xformers typically lands at 25-50%
  => baseline range 0.37-0.74 outfit-images/sec, midpoint estimate 0.55.

The JSON reports the point ratio against 0.55 AND the ratio range against the MFU
bounds, so no unlabeled estimate appears anywhere a number is reported.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the 51-step scan over the 866M UNet takes ~20 min to
# compile through the remote-compile tunnel; cached executables make reruns ~instant.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

# PyTorch+xformers A100 fp16 ESTIMATE (no GPU in this image; see module doc +
# BASELINE.md "MFU-bound analysis"). (low, mid, high) = 25%/~37%/50% A100 fp16 MFU.
ESTIMATED_REF_IMAGES_PER_SEC = 0.55
ESTIMATED_REF_RANGE = (0.37, 0.74)


def _require_devices(timeout_s: float = None):
    if timeout_s is None:
        timeout_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "900"))
    """Backend watchdog: with the axon tunnel down, jax.devices() HANGS (it does
    not raise), which would leave the driver's bench window with no output at
    all. Probe device init on a thread; on timeout emit a structured error line
    and exit nonzero so the failure is recorded instead of silent."""
    import threading

    out = {}

    def probe():
        out["devices"] = jax.devices()

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" not in out:
        print(json.dumps({
            "metric": "outfit_images_per_sec_per_chip_512px_50step_pndm_4cfg",
            "value": None,
            "unit": "images/sec/chip",
            "error": f"TPU backend did not initialize within {timeout_s:.0f}s "
                     "(axon tunnel down?) — no measurement taken",
        }))
        os._exit(3)
    return out["devices"]


def main():
    _require_devices()
    from difashion_tpu.core.config import ModelConfig
    from difashion_tpu.engine import (
        GenerationInputs,
        build_sampler,
        decode_to_uint8,
        make_guidance_spec,
    )
    from difashion_tpu.models.clip_text import CLIPTextEncoder
    from difashion_tpu.models.mutual import MutualEncoder
    from difashion_tpu.models.unet import UNet2DCondition
    from difashion_tpu.models.vae import AutoencoderKL
    from difashion_tpu.models.difashion import DiFashionModel
    from difashion_tpu.diffusion.schedule import DiffusionSchedule

    cfg = ModelConfig.sd2_base()
    dtype = jnp.bfloat16

    unet = UNet2DCondition(cfg.unet, dtype=dtype)
    vae = AutoencoderKL(cfg.vae, dtype=dtype)
    text = CLIPTextEncoder(cfg.text, dtype=dtype)
    mutual = MutualEncoder(cfg.mutual, dtype=dtype)

    # Initialize params on-device (jitted init: one compile, no host->device weight push)
    s, c_in, xd = cfg.unet.sample_size, cfg.unet.in_channels, cfg.text.hidden_size
    unet_params = jax.jit(unet.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, s, s, c_in), dtype), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, cfg.unet.cross_attention_dim), dtype),
    )["params"]
    vae_params = jax.jit(vae.init)(
        {"params": jax.random.PRNGKey(1)},
        jnp.zeros((1, 512, 512, 3), dtype), jax.random.PRNGKey(0),
    )["params"]
    text_params = jax.jit(text.init)(
        jax.random.PRNGKey(2), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    mutual_params = jax.jit(mutual.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 4))
    )["params"]
    params = {
        "unet": unet_params, "vae": vae_params,
        "text_encoder": text_params, "fashion_encoder": mutual_params,
    }
    model = DiFashionModel(
        config=cfg, unet=unet, vae=vae, text_encoder=text,
        fashion_encoder=mutual, schedule=DiffusionSchedule.create(cfg.scheduler),
    )

    # GOR: 1 outfit, all 4 slots generated -> F=4, UNet batch 16 per step
    import os as _os
    B, olen = int(_os.environ.get("BENCH_OUTFITS", "1")), 4
    F = B * olen
    gen_mask = jnp.ones((B, olen), bool)
    gen_index = jnp.arange(F, dtype=jnp.int32).reshape(B, olen)
    outfit_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), olen)
    key = jax.random.PRNGKey(42)
    inputs = GenerationInputs(
        init_latents=jax.random.normal(key, (F, 64, 64, 4)),
        outfit_idx=outfit_idx,
        known_latents=jnp.zeros((B, olen, 64, 64, 4)),
        gen_mask=gen_mask,
        gen_index=gen_index,
        hist_latents=jnp.zeros((F, 64, 64, 4)),
        cate_text=jax.jit(lambda p, i: text.apply({"params": p}, i))(
            text_params, jnp.zeros((F, 77), jnp.int32)
        ),
        null_text=jax.jit(lambda p, i: text.apply({"params": p}, i))(
            text_params, jnp.zeros((1, 77), jnp.int32)
        )[0],
        null_latent=jnp.zeros((64, 64, 4)),
    )

    spec = make_guidance_spec(12.0, 4.0, 5.0)

    def time_mode(scheduler: str, steps: int) -> float:
        """Compile + warm one sampler mode, return best-of-N steady-state seconds
        per batch under the software-pipelined protocol `GenerationPipeline.run`
        actually uses: batch i+1 is dispatched (async) BEFORE batch i's
        device->host transfer, so dispatch/RTT/fetch overlap device compute.
        Each measured interval is fetch(i)->fetch(i+1) with one batch always in
        flight — i.e. the per-batch period of a saturated serving loop."""
        sampler = build_sampler(model, num_inference_steps=steps, spec=spec,
                                eta=0.1, scheduler=scheduler)

        # Same fused executable GenerationPipeline dispatches: scan + VAE decode
        # + on-device uint8 quantization (round 4). Donation is NOT used here
        # because the bench reuses one input pytree across iterations; the
        # pipeline's donate_argnums only enables aliasing, it doesn't change
        # the measured device work.
        def run(params, inputs):
            lat = sampler(params, inputs)
            return decode_to_uint8(model, params, lat)

        jitted = jax.jit(run)
        imgs = jitted(params, inputs)                      # compile + warmup
        assert imgs.shape == (F, 512, 512, 3)
        float(imgs[0, 0, 0, 0])  # host-transfer sync (remote backend's
        # block_until_ready can resolve before execution completes)

        # best-of-N: the shared-tunnel chip's throughput varies a few percent
        # run-to-run; the minimum is the stable estimator of the machine's capability
        inflight = jitted(params, inputs)                  # fill the pipeline
        times = []
        t0 = time.perf_counter()
        for _ in range(6):
            nxt = jitted(params, inputs)                   # async dispatch ahead
            float(inflight[0, 0, 0, 0])                    # fetch previous batch
            t1 = time.perf_counter()
            times.append(t1 - t0)
            t0 = t1
            inflight = nxt
        float(inflight[0, 0, 0, 0])                        # drain
        return min(times)

    dt = time_mode("pndm", 50)                   # the north-star config
    n_chips = jax.device_count()
    images_per_sec_per_chip = F / dt / n_chips

    # fast-serving mode (dpmpp @ 20 steps, `cli/serve.py --scheduler dpmpp`):
    # recorded as a secondary row so BENCH_r*.json carries both modes
    secondary = None
    if _os.environ.get("BENCH_SKIP_DPMPP", "") != "1":
        try:
            dt2 = time_mode("dpmpp", 20)
            secondary = {
                "metric": "outfit_images_per_sec_per_chip_512px_20step_dpmpp_4cfg",
                "value": round(F / dt2 / n_chips, 4),
                "unit": "images/sec/chip",
            }
        except Exception as e:   # never lose the headline metric to the extra row
            import sys

            print(f"dpmpp secondary bench failed: {e!r}", file=sys.stderr)

    lo, hi = ESTIMATED_REF_RANGE
    print(json.dumps({
        "metric": "outfit_images_per_sec_per_chip_512px_50step_pndm_4cfg",
        "value": round(images_per_sec_per_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec_per_chip / ESTIMATED_REF_IMAGES_PER_SEC, 3),
        "vs_baseline_estimated": True,
        "baseline_estimate": {
            "value": ESTIMATED_REF_IMAGES_PER_SEC,
            "range": [lo, hi],
            "basis": "A100 fp16 MFU-bound analysis (25-50% MFU); no GPU "
                     "measurement exists — see BASELINE.md",
        },
        "vs_baseline_range": [
            round(images_per_sec_per_chip / hi, 3),
            round(images_per_sec_per_chip / lo, 3),
        ],
        **({"secondary": [secondary]} if secondary else {}),
    }))


if __name__ == "__main__":
    main()
