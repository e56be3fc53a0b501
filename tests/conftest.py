"""Test configuration: run the whole suite on a virtual 8-device CPU platform.

Multi-chip sharding is validated on a faked pod via
``--xla_force_host_platform_device_count=8`` (the JAX-native way to test pjit
layouts without hardware); kernels fall back to their XLA reference paths on CPU.
Must run before the first ``import jax`` anywhere in the suite.
"""

import os

# The machine env pins the axon TPU platform; the test suite always runs on
# the virtual CPU platform — TPU-only checks live in bench.py / examples.
# NOTE: this jax build ignores the JAX_PLATFORMS env var; JAX_PLATFORM_NAME and
# jax.config.update("jax_platforms", ...) are the mechanisms that work.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# fp32 parity tests need exact matmuls; the default CPU matmul path rounds
# through bf16-ish precision (env var form of this option is not honored).
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
