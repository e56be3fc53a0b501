"""Trace the ViT-L/14 encode path on TPU and print top self-time HLO ops.

Usage: python scripts/profile_encode.py [--batch 32]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np


def print_hlo_stats(logdir: str, top: int = 30):
    from xprof.convert import raw_to_tool_data as r

    xp = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))[-1]
    data, _ = r.xspace_to_tool_data([xp], "hlo_stats", {})
    j = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["label"] for c in j["cols"]]
    rows = [[c.get("v") for c in row["c"]] for row in j["rows"]]
    ti = cols.index("Total self time (us)")
    cat = cols.index("HLO op category")
    name = cols.index("HLO op name")
    bound = cols.index("Bound by") if "Bound by" in cols else None
    flops = cols.index("Normalized GFLOP/s") if "Normalized GFLOP/s" in cols else None
    bw = cols.index("Measured memory BW (GiB/s)") if "Measured memory BW (GiB/s)" in cols else None
    rows.sort(key=lambda r: -(r[ti] or 0))
    tot = sum(r[ti] or 0 for r in rows)
    print(f"total {tot:.1f}us")
    for row in rows[:top]:
        extra = ""
        if bound is not None:
            extra = f" bound={row[bound]}"
        if flops is not None and row[flops]:
            extra += f" {float(row[flops]):.0f}GF/s"
        if bw is not None and row[bw]:
            extra += f" {float(row[bw]):.0f}GiB/s"
        print(f"{row[ti]:10.1f}us {100*row[ti]/tot:5.1f}% [{row[cat]}]"
              f" {str(row[name])[:70]}{extra}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--logdir", default="/tmp/teochat_trace_enc")
    args = ap.parse_args()

    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.models import teochat as teochat_mod, vit as vit_mod
    from teochat_tpu.models.projector import init_projector

    cfg = TEOChatConfig()
    vp = vit_mod.init_vit(jax.random.PRNGKey(0), cfg.vision, dtype=jnp.bfloat16)
    pp = init_projector(jax.random.PRNGKey(1), cfg.projector, dtype=jnp.bfloat16)
    params = {"vision": vp, "projector": pp}
    frames = jnp.asarray(
        np.random.RandomState(0).randn(args.batch, 3, 224, 224), jnp.bfloat16
    )

    out = teochat_mod.encode_frames(params, cfg, frames)
    jax.block_until_ready(out)
    with jax.profiler.trace(args.logdir):
        for _ in range(5):
            out = teochat_mod.encode_frames(params, cfg, frames)
        jax.block_until_ready(out)
    print_hlo_stats(args.logdir)


if __name__ == "__main__":
    main()
