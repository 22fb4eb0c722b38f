"""Aggregate a jax.profiler chrome-trace into a per-op-category time table.

Pairs with tools/profile_sampler.py: no TensorBoard/xprof needed — parses the
`*.trace.json.gz` the profiler writes and buckets device-op durations by kernel
family (conv / attention matmul / other matmul / elementwise / reduce / copy ...),
printing the table BASELINE.md's per-phase MFU section wants.

Usage: python tools/analyze_trace.py /tmp/difashion_trace [--top 30]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace(root: str):
    hits = glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True)
    hits += glob.glob(os.path.join(root, "**", "*.trace.json"), recursive=True)
    if not hits:
        raise SystemExit(f"no trace.json(.gz) under {root}")
    return max(hits, key=os.path.getmtime)


_BUCKETS = [
    ("conv", re.compile(r"conv", re.I)),
    ("flash_attention", re.compile(r"flash|pallas|attn[12]\.|custom-call", re.I)),
    ("matmul", re.compile(r"dot|einsum|gemm", re.I)),
    ("reduce", re.compile(r"reduce|norm|mean|variance", re.I)),
    ("exp/softmax", re.compile(r"exp|softmax|log", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|reshape|broadcast|concat|pad|slice|gather|scatter|convert", re.I)),
    ("fusion (unnamed)", re.compile(r"^fusion\.\d+$")),
    ("elementwise", re.compile(r"fusion|add|mul|sub|div|tanh|sigmoid|rsqrt|select", re.I)),
]

# container/wrapper entries whose children are counted separately — summing
# them double-counts the whole scan. Purely-numeric names are the unjitted-step
# module containers the train trace emits (one ~whole-step event per step).
_CONTAINER = re.compile(r"^(jit_|while|body|cond|region|run\b|Thread|XLA|\d+$)", re.I)


def bucket(name: str) -> str:
    for label, rx in _BUCKETS:
        if rx.search(name):
            return label
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--per_step", type=int, default=0,
                    help="divide all times by this scan trip count")
    args = ap.parse_args()

    path = find_trace(args.trace_dir)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])

    # device-op complete events carry dur (us); restrict to TPU device tracks
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")

    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "device" in n.lower() or "/device" in n}

    per_op = collections.Counter()
    per_bucket = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if _CONTAINER.match(name):
            continue
        dur = e["dur"] / 1e3  # ms
        per_op[name] += dur
        per_bucket[bucket(name)] += dur
        total += dur
    if args.per_step:
        per_op = collections.Counter(
            {k: v / args.per_step for k, v in per_op.items()})
        per_bucket = collections.Counter(
            {k: v / args.per_step for k, v in per_bucket.items()})
        total /= args.per_step

    print(f"trace: {path}")
    print(f"total device time: {total:.1f} ms")
    print("\n-- by category --")
    for k, v in per_bucket.most_common():
        print(f"{k:>18}: {v:9.2f} ms  ({100 * v / max(total, 1e-9):5.1f}%)")
    print(f"\n-- top {args.top} ops --")
    for name, v in per_op.most_common(args.top):
        print(f"{v:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
