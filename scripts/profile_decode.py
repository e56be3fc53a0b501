"""Capture a TPU trace of the decode loop and print where the time goes.

Usage:
    python scripts/profile_decode.py [--quant int4|int8] [--batch N]

Builds the same flagship decode setup as bench.py (LLaMA-7B shapes, 640-token
prefill + 64 decode steps), traces one generate() call with jax.profiler, then
parses the xplane with tensorboard_plugin_profile and prints the top self-time
ops — separating Pallas custom calls, fusions, and copies.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np


def build(quant: str, batch: int):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    run_generate, max_new, prompt_len = bench._build_decode_setup(
        batch=batch, quant=quant
    )
    return run_generate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int4")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--logdir", default="/tmp/teochat_trace")
    args = ap.parse_args()

    run = build(args.quant, args.batch)
    out = run(64)  # compile + warmup
    jax.block_until_ready(out)

    with jax.profiler.trace(args.logdir):
        out = run(64)
        jax.block_until_ready(out)

    xplanes = sorted(glob.glob(f"{args.logdir}/**/*.xplane.pb", recursive=True))
    print(f"captured {xplanes[-1]}")
    summarize(xplanes[-1])


def summarize(xplane: str):
    """Aggregate self-times from the device plane of the xplane proto."""
    from xprof.convert import _pywrap_profiler_plugin as pp  # noqa: F401

    # The plugin's python API differs across versions; fall back to the raw
    # xplane proto, which is stable.
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        totals = {}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e9
        if not totals:
            # fall back: aggregate every line
            for line in plane.lines:
                for ev in line.events:
                    name = f"{line.name}::{ev_meta[ev.metadata_id].name}"
                    totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e9
        items = sorted(totals.items(), key=lambda kv: -kv[1])
        total = sum(totals.values())
        print(f"\n== plane {plane.name}: total self-time {total:.2f} ms ==")
        for name, ms in items[:40]:
            print(f"{ms:9.3f} ms  {100*ms/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
