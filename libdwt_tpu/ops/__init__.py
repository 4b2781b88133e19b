"""Compute ops: lifting engines, transforms, kernels, and riders.

- lifting      — batched 1-D polyphase lifting (float/int), the core math
- separable    — N-dim separable MRA (the correctness oracle)
- fused        — Pallas single-loop 2-D strip kernels (1/2-level, deep tail)
- fused3d      — Pallas single-pass 3-D volume kernel
- nsls         — non-separable merged-stage variant
- interleaved  — dwt-simple in-place layout + conversions
- eaw          — edge-avoiding (weighted) lifting
- swt          — stationary (à-trous) transform
- conv         — centered convolution / signal utilities
- gabor        — STFT/CWT/S-transform time-frequency analysis
- features     — per-subband aggregates and denoising
"""


class UnsupportedGeometry(ValueError):
    """A kernel's documented support check rejected the call geometry
    (odd dims, too-small volume, VMEM budget, tile-count range).

    Dispatchers (api.wavedec3/waverec3) catch exactly this to fall back
    to the separable oracle; any other error from a kernel is a bug and
    propagates.  Subclasses ValueError so explicit-impl callers keep
    their existing error contract."""
