"""Import the ACTUAL reference code (/root/reference) for ground-truth
parity tests.

The reference is CUDA-only PyTorch + timm 0.5.4; this environment has CPU
torch and no timm. Three shims make it importable and runnable on CPU —
none of them touch the reference's math:

  * a module-level ``turtle`` stub (deit_models_attn.py:1 does
    ``from turtle import forward`` — a stray dead import that needs tkinter);
  * tests/_vendor/timm — a minimal reimplementation of the timm 0.5.4
    surface the reference imports (see its docstring for the faithfulness
    argument);
  * ``torch.Tensor.cuda`` / ``torch.nn.Module.cuda`` patched to identity
    (hardcoded .cuda() calls: deit_models_attn.py:100,115;
    cait_models_attn.py:240,252; protopformer.py:202,262-285).
"""

import os
import sys
import types

REFERENCE_ROOT = os.environ.get("PPF_REFERENCE_ROOT", "/root/reference")
_VENDOR = os.path.join(os.path.dirname(__file__), "_vendor")


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REFERENCE_ROOT, "protopformer.py"))


def load_reference():
    """Returns the reference ``protopformer`` module (cached)."""
    if "protopformer" in sys.modules:
        return sys.modules["protopformer"]

    if "turtle" not in sys.modules:
        turtle = types.ModuleType("turtle")
        turtle.forward = None
        sys.modules["turtle"] = turtle

    for p in (_VENDOR, REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]

    import protopformer  # noqa: F401  (the reference module)

    return protopformer
