"""Driver-hook integration: dryrun_multichip runs on the virtual 8-device mesh."""

import sys

import jax
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)  # asserts finite loss internally
