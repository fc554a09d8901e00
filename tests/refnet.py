"""Import the reference's torch-only model modules for golden comparisons.

The reference ``network`` package __init__ imports vgg19 -> torchvision, which
is unavailable here, so we mount the network directory as a synthetic package
``refnet`` and import vit / adaDecoder / conv directly.  Reference code is
used strictly as a test oracle — nothing from it ships in mhada_tpu.
"""

import importlib
import importlib.util
import sys
import types
from pathlib import Path

REF_DIR = Path("/root/reference/MHAdaSTr/network")


def available() -> bool:
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return REF_DIR.is_dir()


def load():
    """Returns (vit_module, adaDecoder_module, conv_module)."""
    if "_refpkg" not in sys.modules:
        spec = importlib.machinery.ModuleSpec("_refpkg", None, is_package=True)
        spec.submodule_search_locations = [str(REF_DIR)]
        pkg = importlib.util.module_from_spec(spec)
        sys.modules["_refpkg"] = pkg
    conv = importlib.import_module("_refpkg.conv")
    vit = importlib.import_module("_refpkg.vit")
    ada = importlib.import_module("_refpkg.adaDecoder")
    return vit, ada, conv
