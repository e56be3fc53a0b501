"""Device-mesh construction: (data, fsdp, model) axes over ICI.

The TPU-native replacement for the reference's DeepSpeed/NCCL runtime
(SURVEY §2.4): one `jax.sharding.Mesh` whose axes carry data parallelism,
fully-sharded parameters (the ZeRO-3 equivalent), and tensor parallelism.
GSPMD emits all-gather/reduce-scatter/all-reduce over ICI from the sharding
annotations in parallel/sharding.py — no hand-written communication layer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh

from teochat_tpu.config import MeshConfig


def create_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build a (data, fsdp, model[, sequence][, pipe]) mesh.

    Axis sizes multiply to the device count; any axis given as -1 absorbs the
    remainder (at most one). Defaults to all devices on the fsdp axis. The
    `sequence` axis (context parallelism) is appended only when its size
    exceeds 1, so existing 3-axis layouts are untouched.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    cfg = cfg or MeshConfig(fsdp=-1)
    sizes = [cfg.data, cfg.fsdp, cfg.model]
    names = list(cfg.axis_names)
    if cfg.sequence < 1:
        # no -1 wildcard here: an implicitly-sized sequence axis would be
        # a silent replication sink (the trainer only activates the ring
        # when sequence > 1 is EXPLICIT)
        raise ValueError(f"sequence axis size must be >= 1, got {cfg.sequence}")
    if cfg.sequence != 1:
        sizes.append(cfg.sequence)
        names.append("sequence")
    if cfg.pipe < 1:
        raise ValueError(f"pipe axis size must be >= 1, got {cfg.pipe}")
    if cfg.pipe != 1:
        sizes.append(cfg.pipe)
        names.append("pipe")
    if sizes.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {sizes} != {n} devices")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(names))


def local_mesh() -> Mesh:
    """Single-process mesh over whatever devices exist (bench/eval default)."""
    n = len(jax.devices())
    # put everything on fsdp: weight-sharded inference scales decode bandwidth
    return create_mesh(MeshConfig(data=1, fsdp=n, model=1))
