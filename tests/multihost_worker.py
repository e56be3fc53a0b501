"""Worker for the 2-process multi-host smoke test (launched by
tests/test_multihost.py with a cleansed PYTHONPATH — the axon TPU plugin
breaks jax.distributed's coordination service).

Each process contributes 4 virtual CPU devices; the pair forms the
production (data, fsdp, model) mesh and runs one sharded train step of the
tiny model, exercising cross-process collectives (gloo) end to end —
the multi-host stand-in for a 2-host TPU pod slice (SURVEY §2.4 comm plan).
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from teochat_tpu.config import MeshConfig, tiny_test_config
from teochat_tpu.constants import IMAGE_TOKEN_INDEX
from teochat_tpu.models import fusion as fusion_mod
from teochat_tpu.models import teochat as teochat_mod
from teochat_tpu.parallel import create_mesh, shard_params
from teochat_tpu.train.train import _batches
from teochat_tpu.train.trainer import init_train_state, make_optimizer, make_train_step

assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert len(jax.devices()) == 8

mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
cfg = tiny_test_config()
params = teochat_mod.init_teochat(jax.random.PRNGKey(0), cfg)

with jax.set_mesh(mesh):
    params = shard_params(params, mesh)
    opt = make_optimizer(1e-3, total_steps=10)
    state = jax.jit(lambda p: init_train_state(p, opt))(params)
    step = make_train_step(cfg, opt)

    tpf = cfg.vision.num_patches
    ids = [[1, 5 + r, IMAGE_TOKEN_INDEX, 9, 7, 2] for r in range(4)]
    labels = [[-100, -100, -100, -100, 7, 2]] * 4
    plan = fusion_mod.build_fusion_plan(
        ids, labels=labels, tokens_per_frame=tpf, pad_to=16
    )
    pixels = jnp.asarray(np.random.RandomState(0).randn(4, 3, 28, 28), jnp.float32)
    pixels = jax.device_put(pixels, NamedSharding(mesh, P()))
    state, loss = step(state, plan, pixels)
    loss = float(loss)
    assert np.isfinite(loss), loss

# per-host batch sharding: the two processes must consume disjoint chunks
mine = [
    b for b in _batches(list(range(16)), lambda xs: tuple(xs), iter(range(16)),
                        4, process_index=jax.process_index(),
                        process_count=jax.process_count())
]
flat = sorted(i for b in mine for i in b)
expected = sorted(
    i for c in range(4) if c % 2 == jax.process_index()
    for i in range(c * 4, c * 4 + 4)
)
assert flat == expected, (flat, expected)

print(f"proc {pid}: sharded train step loss={loss:.4f}, host batches OK", flush=True)
