"""Per-op roofline for the sampler's data-layout bucket (VERDICT r4 #5).

The 102 ms denoise step carries ~7 ms of convert/copy/transpose ops
(BASELINE.md phase table). This tool decides whether that bucket is
*harvestable* or already at this chip's practical HBM floor:

  1. build + jit the full-scale sampler exactly like tools/profile_sampler.py,
  2. read the optimized HLO (`compiled.as_text()`) and index every
     instruction's operand/result byte counts,
  3. join against a jax.profiler trace of one sampler dispatch: for each
     layout-bucket op, measured ms vs `bytes / PRACTICAL_BW` floor.

Output: a table (op, ms, MiB moved, achieved GB/s, floor ms, harvestable ms)
plus bucket totals — the committed evidence for "<2% remains harvestable" or
a pointer at the ops worth fusing.

Usage: python tools/roofline_layout.py [--trace_dir /tmp/difashion_trace]
       [--steps 5] [--bw_gbps 158] [--retrace]
`--bw_gbps` defaults to the measured practical stream rate of this tunnel v5e
(BASELINE.md "practical ceiling": 158 GB/s on pure elementwise streams).
"""
import argparse
import collections
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

# one HLO operand/result tensor: dtype[dims]{layout}
_TENSOR = re.compile(r"\b(pred|s8|u8|s16|u16|bf16|f16|s32|u32|f32|s64|u64|f64)"
                     r"\[([\d,]*)\]")
_INSTR = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.+)$")

LAYOUT_OPS = re.compile(
    r"\b(copy|transpose|convert|bitcast-convert|reshape|concatenate|pad|slice|"
    r"dynamic-slice|dynamic-update-slice|gather|scatter|broadcast)\(", re.I)


def tensor_bytes(text: str) -> int:
    """Sum the byte sizes of every dtype[shape] tensor literal in `text`."""
    total = 0
    for dt, dims in _TENSOR.findall(text):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def index_hlo(hlo: str):
    """name -> (opcode-ish line, bytes moved = result + operands)."""
    table = {}
    for line in hlo.splitlines():
        m = _INSTR.match(line)
        if not m:
            continue
        name, rhs = m.groups()
        if not LAYOUT_OPS.search(rhs):
            # fusions that are pure layout work are named fusion.N — they carry
            # a `kind=kLoop` + a layout op in the root; approximate by matching
            # "fusion" lines whose rhs mentions transpose/convert/copy in the
            # inlined computation name (e.g. fused_transpose)
            if "fusion(" not in rhs or not re.search(
                    r"transpose|convert|copy|concatenate|pad", rhs, re.I):
                continue
        table[name] = (rhs.split("(")[0].strip(), tensor_bytes(rhs))
    return table


def load_trace_ops(trace_dir: str):
    """name -> total device ms (same parsing rules as tools/analyze_trace.py)."""
    import glob

    hits = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                     recursive=True)
    hits += glob.glob(os.path.join(trace_dir, "**", "*.trace.json"),
                      recursive=True)
    if not hits:
        raise SystemExit(f"no trace under {trace_dir} — run with --retrace")
    path = max(hits, key=os.path.getmtime)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "device" in n.lower()}
    per_op = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        per_op[e.get("name", "?")] += e["dur"] / 1e3
    return per_op, path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace_dir", default="/tmp/difashion_trace")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--bw_gbps", type=float, default=158.0)
    p.add_argument("--retrace", action="store_true",
                   help="capture a fresh trace first (needs the TPU)")
    p.add_argument("--out", default=None, help="also write the table as JSON")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))

    from difashion_tpu.core.config import ModelConfig
    from difashion_tpu.engine import (
        GenerationInputs, build_sampler, make_guidance_spec,
    )
    from difashion_tpu.models.difashion import create_difashion

    cfg = ModelConfig.sd2_base()
    model, params = create_difashion(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.bfloat16)
    spec = make_guidance_spec(12.0, 4.0, 5.0)
    sampler = jax.jit(build_sampler(
        model, num_inference_steps=args.steps, spec=spec, eta=0.1))
    F = 4
    key = jax.random.PRNGKey(1)
    inputs = GenerationInputs(
        init_latents=jax.random.normal(key, (F, 64, 64, 4)),
        outfit_idx=jnp.zeros(F, jnp.int32),
        known_latents=jnp.zeros((1, 4, 64, 64, 4)),
        gen_mask=jnp.ones((1, 4), bool),
        gen_index=jnp.arange(F, dtype=jnp.int32).reshape(1, 4),
        hist_latents=jnp.zeros((F, 64, 64, 4)),
        cate_text=jnp.zeros((F, 77, cfg.unet.cross_attention_dim)),
        null_text=jnp.zeros((77, cfg.unet.cross_attention_dim)),
        null_latent=jnp.zeros((64, 64, 4)),
    )

    lowered = sampler.lower(params, inputs)
    compiled = lowered.compile()
    hlo_table = index_hlo(compiled.as_text())
    print(f"HLO layout-bucket instructions indexed: {len(hlo_table)}")

    if args.retrace:
        from difashion_tpu.core.logging import profile_trace

        out = sampler(params, inputs)
        float(out[0, 0, 0, 0])          # sync (axon: block_until_ready lies)
        with profile_trace(args.trace_dir):
            out = sampler(params, inputs)
            float(out[0, 0, 0, 0])

    per_op, trace_path = load_trace_ops(args.trace_dir)
    print(f"trace: {trace_path}")

    rows, unmatched_ms = [], 0.0
    for name, ms in per_op.items():
        base = name.lstrip("%")
        hit = hlo_table.get(base)
        if hit is None:
            # layout ops in the trace the HLO index missed (e.g. renamed
            # fusions): count them by trace-name pattern so the bucket total
            # still reconciles with analyze_trace.py
            if re.search(r"copy|transpose|convert|concatenate|pad", base, re.I):
                unmatched_ms += ms
            continue
        opcode, nbytes = hit
        floor_ms = nbytes / (args.bw_gbps * 1e9) * 1e3
        rows.append({
            "op": base, "opcode": opcode, "ms": round(ms, 3),
            "mib": round(nbytes / 2**20, 2),
            "gbps": round(nbytes / 1e9 / (ms / 1e3), 1) if ms > 0 else None,
            "floor_ms": round(floor_ms, 3),
            "harvestable_ms": round(max(0.0, ms - floor_ms), 3),
        })
    rows.sort(key=lambda r: -r["ms"])

    tot_ms = sum(r["ms"] for r in rows)
    tot_floor = sum(r["floor_ms"] for r in rows)
    per_step = args.steps + 1  # scan trips in one dispatch (steps + PLMS warmup)
    print(f"\n{'op':<40} {'ms':>8} {'MiB':>9} {'GB/s':>7} "
          f"{'floor':>7} {'harvest':>8}")
    for r in rows[:40]:
        print(f"{r['op']:<40} {r['ms']:>8.3f} {r['mib']:>9.2f} "
              f"{(r['gbps'] or 0):>7.1f} {r['floor_ms']:>7.3f} "
              f"{r['harvestable_ms']:>8.3f}")
    print(f"\nlayout bucket total: {tot_ms:.2f} ms measured, "
          f"{tot_floor:.2f} ms at {args.bw_gbps:.0f} GB/s floor "
          f"-> harvestable {tot_ms - tot_floor:.2f} ms "
          f"({(tot_ms - tot_floor) / max(tot_ms, 1e-9) * 100:.0f}% of bucket)")
    if unmatched_ms:
        print(f"unmatched layout-pattern trace ops (no HLO row): "
              f"{unmatched_ms:.2f} ms")
    summary = {
        "bucket_ms": round(tot_ms, 2),
        "bucket_floor_ms": round(tot_floor, 2),
        "harvestable_ms": round(tot_ms - tot_floor, 2),
        "unmatched_ms": round(unmatched_ms, 2),
        "bw_gbps": args.bw_gbps,
        "trace": trace_path,
        "note": f"one dispatch = {per_step} scan trips at --steps {args.steps}",
        "rows": rows,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
