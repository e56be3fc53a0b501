"""Load individual modules from the read-only reference without executing its
package __init__ (which imports a torch/transformers model stack incompatible
with the installed transformers). Used only by parity tests."""

import importlib.util
import os
import sys
import types

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "videollava"))


def load_ref_module(relpath: str, modname: str):
    """Load e.g. load_ref_module('videollava/conversation.py', 'videollava.conversation')."""
    if "videollava" not in sys.modules:
        pkg = types.ModuleType("videollava")
        pkg.__path__ = [os.path.join(REFERENCE, "videollava")]
        sys.modules["videollava"] = pkg
    # mm_utils imports videollava.constants; preload it the same lazy way
    if modname != "videollava.constants" and "videollava.constants" not in sys.modules:
        load_ref_module("videollava/constants.py", "videollava.constants")
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REFERENCE, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod
