"""Compatibility re-exports; see oracle_deit.py / oracle_cait.py."""

from tests.oracle_deit import RefDeiT, RefPPNet  # noqa: F401
from tests.oracle_cait import (  # noqa: F401
    RefCait,
    RefCaitCABlock,
    RefCaitSABlock,
)
