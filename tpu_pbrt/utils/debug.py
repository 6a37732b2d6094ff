"""Numerical-sanitizer wiring — the TPU analogue of the reference's
debug-layer / GPU-validation path (reference: Source/DeviceResources.cpp
debug layer + DRED breadcrumbs; SURVEY.md §5 race-detection row).

There are no data races to detect under XLA (SSA values, no shared
mutable device memory), so the failure class that remains is NUMERICAL:
NaN/Inf escaping a pass. `enable_debug()` turns on `jax_debug_nans`,
which re-runs the offending op un-jitted and raises with a source
location the moment any jitted computation produces a NaN — the
device-fault breadcrumb equivalent. Enabled by the `--debug-nans` CLI
flag or the TPU_PBRT_DEBUG_NANS=1 environment variable.

Buffer-donation discipline: the frame graph deliberately does NOT donate
input buffers (no `donate_argnums`) — FrameHistory is both read and
carried, and donation would alias freed storage into the next frame's
reads; the ~100 MB of history at 1080p is an accepted cost, documented
here so nobody "optimizes" it back in.
"""

from __future__ import annotations

import os


def enable_debug(nans: bool = True) -> None:
    """Turn on the numerical sanitizer (idempotent)."""
    import jax

    if nans:
        jax.config.update("jax_debug_nans", True)


def maybe_enable_from_env() -> bool:
    """Honor TPU_PBRT_DEBUG_NANS=1; returns whether debug is on."""
    if os.environ.get("TPU_PBRT_DEBUG_NANS") == "1":
        enable_debug()
        return True
    return False
