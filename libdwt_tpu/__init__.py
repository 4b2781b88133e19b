"""libdwt_tpu — a TPU-native discrete wavelet transform framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
xbarin02/libdwt (lifting-scheme DWT over 1-D/2-D/3-D data, CDF 5/3 & 9/7
float and reversible-integer, multi-level MRA, SWT, edge-avoiding
wavelets, time-frequency analysis, denoising, feature extraction),
built TPU-first: batched data-parallel lifting under XLA, fused Pallas
tile kernels for the hot path, and sharded multi-chip transforms with
halo exchange over ICI/DCN.
"""

from libdwt_tpu.models.wavelets import (
    CDF53,
    CDF97,
    INTERP53,
    REGISTRY,
    Wavelet,
    get_wavelet,
)
from libdwt_tpu.ops.separable import (
    dwt1,
    dwt2_level,
    dwt3_level,
    fdwt1,
    fdwt2,
    fdwt3,
    idwt1,
    idwt1_packed,
    idwt2,
    idwt2_level,
    idwt3,
    idwt3_level,
    wavedec1,
    wavedec2,
    wavedec3,
    waverec1,
    waverec2,
    waverec3,
)
from libdwt_tpu.utils.subband import (
    band_rect,
    band_view,
    ceil_div_pow2,
    count_subbands,
    j_limit,
    level_sizes,
    resolve_j,
    zero_padding_f,
    zero_padding_i,
)
from libdwt_tpu.api import get_impl, set_impl
from libdwt_tpu.api import dwt2 as dwt2_level_fast, idwt2 as idwt2_level_fast
from libdwt_tpu.api import wavedec2 as wavedec2_fast, waverec2 as waverec2_fast
from libdwt_tpu.api import wavedec3 as wavedec3_fast, waverec3 as waverec3_fast
from libdwt_tpu.image import Image, Volume
from libdwt_tpu.ops.eaw import eaw_wavedec2, eaw_waverec2
from libdwt_tpu.ops.interleaved import fdwt2_interleaved, idwt2_interleaved
from libdwt_tpu.ops.nsls import nsls_dwt2_level, nsls_idwt2_level
from libdwt_tpu.ops.conv import convolve1, find_max_pos
from libdwt_tpu.ops.fused import fused_dwt2_level, fused_idwt2_level
from libdwt_tpu.ops.swt import (
    analysis_filters,
    iswt1,
    iswt2,
    swt1,
    swt2,
    swt_level,
)

__version__ = "0.1.0"
