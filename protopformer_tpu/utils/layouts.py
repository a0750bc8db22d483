"""Compiler-chosen (AUTO) input layouts, read from the EXECUTABLE.

``compiled.input_formats`` can DISAGREE with the layouts the executable
actually requires. Observed on the axon TPU plugin (docs/DESIGN.md
round-5): with a warm persistent compilation cache (and in some
in-process orderings), ``input_formats`` reports one layout assignment
(e.g. ``(0,2,1,3)/(8,128)`` for the f32[16,16,3,192] patch-embed kernel)
while the executable that actually runs was built with another
(``(0,1,2,3)/(4,128)``). Arrays staged with the lying formats either
fail at dispatch ("Computation was compiled for input layouts that
disagree with the layouts of arguments passed to it") or — worse — are
silently RESHARDED on every dispatch, which on a remote-tunnel backend
re-crosses the network per call (measured: a served request slowed ~30x).

The jax-level truth is ``compiled._executable._xla_in_layouts`` — the
list the dispatch check validates arrays against. ``true_input_formats``
rebuilds per-argument Formats from it (sharding still taken from
``input_formats``). Private API: every call site probe-validates by
EXECUTION and falls back to default layouts on any failure.
"""

from __future__ import annotations

import jax


def true_input_formats(compiled):
    """Tree of ``Format``s for ``compiled``'s positional arguments, with
    layouts read from the executable itself (see module docstring).

    Returns the same tree structure as ``compiled.input_formats[0]``.
    Raises if the private layout list cannot be aligned with the
    argument tree — callers treat that like any other AUTO-layout
    failure (default-layout fallback).
    """
    from jax.experimental.layout import Format

    args_fmt = compiled.input_formats[0]
    flat, treedef = jax.tree_util.tree_flatten(args_fmt)
    layouts = compiled._executable._xla_in_layouts
    if len(layouts) != len(flat):
        raise ValueError(
            f"executable reports {len(layouts)} input layouts for "
            f"{len(flat)} arguments"
        )
    fixed = [
        Format(lay, fmt.sharding) for fmt, lay in zip(flat, layouts)
    ]
    return jax.tree_util.tree_unflatten(treedef, fixed)
