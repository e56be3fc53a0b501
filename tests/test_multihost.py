"""2-process jax.distributed smoke test: real cross-process collectives.

The reference gets multi-host from the deepspeed launcher + NCCL
(scripts/train_teochat.sh:3); here two OS processes each hold 4 virtual CPU
devices, join via jax.distributed (gloo collectives), form the production
(data, fsdp, model) mesh, and run one sharded train step — plus the per-host
disjoint batch-stream check (llava_trainer.py:135-148 equivalent).
"""

import pytest
import os
import socket
import subprocess
import sys

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    # the axon TPU plugin (injected via PYTHONPATH) breaks jax.distributed's
    # coordination service; workers run with it stripped
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    )
    env.pop("_TEOCHAT_DRYRUN_CHILD", None)
    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert "host batches OK" in out
