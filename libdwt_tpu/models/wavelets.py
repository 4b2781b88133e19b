"""Wavelet registry: lifting-scheme descriptions of every wavelet family.

A wavelet is described as a sequence of *lifting steps* applied to the
even/odd polyphase components (s = even samples -> lowpass channel,
d = odd samples -> highpass channel), plus an optional final scaling pair.

Float steps compute ``target += coeff * (left + right)`` where (left, right)
are the two mirrored neighbours from the opposite channel (whole-point
symmetric extension at the borders).

Integer (reversible) steps compute ``target +/-= (w*(left+right) + k) >> shift``
with C-style arithmetic shift, which round-trips bit-exactly.

Reference semantics (constants and step order):
  /root/reference/src/inline.h:304-342          (CDF 9/7 + CDF 5/3 float constants)
  /root/reference/src/libdwt.c:2024-2133        (float lifting step structure)
  /root/reference/src/libdwt.c:10901-10997      (integer 9/7-F and 5/3 steps)
  /root/reference/src/libdwt.c:11252-11292      (interpolating 5/3, predict-only)
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class FloatLiftStep:
    """One float lifting step: ``target += coeff * (left + right)``."""

    target: str  # 'd' (predict, updates odd/high channel) or 's' (update, even/low)
    coeff: float


@dataclasses.dataclass(frozen=True)
class IntLiftStep:
    """One reversible integer lifting step.

    ``target = target + sign * ((w * (left + right) + k) >> shift)``

    with arithmetic (sign-propagating) right shift, matching the C
    expressions in the reference, e.g. ``tmp[i] -= (+203*(l+r) - (1<<6)) >> 7``
    (/root/reference/src/libdwt.c:10920).
    """

    target: str  # 'd' or 's'
    sign: int  # +1 or -1
    w: int
    k: int
    shift: int


@dataclasses.dataclass(frozen=True)
class Wavelet:
    """A lifting-scheme wavelet description."""

    name: str
    # Float path.
    steps: Tuple[FloatLiftStep, ...] = ()
    # Final scaling: (low gets *= scale_s, high gets *= scale_d). None = no scaling.
    scale_s: Optional[float] = None
    scale_d: Optional[float] = None
    # Reversible integer path (None if the family has no integer variant).
    int_steps: Optional[Tuple[IntLiftStep, ...]] = None
    # Support of the equivalent analysis filters; determines the halo width
    # needed by tiled/sharded kernels (number of samples of one-sided overlap).
    support: int = 4

    @property
    def has_int(self) -> bool:
        return self.int_steps is not None

    @property
    def n_steps(self) -> int:
        return len(self.steps)


# --- CDF 9/7 -----------------------------------------------------------------
# Constants: Mallat 3rd ed. p. 370; reference /root/reference/src/inline.h:309-315.
CDF97_P1 = 1.58613434342059
CDF97_U1 = -0.0529801185729
CDF97_P2 = -0.8829110755309
CDF97_U2 = 0.4435068520439
CDF97_S1 = 1.1496043988602  # lowpass scale (zeta)
CDF97_S2 = 1.0 / CDF97_S1  # highpass scale

CDF97 = Wavelet(
    name="cdf97",
    steps=(
        FloatLiftStep("d", -CDF97_P1),
        FloatLiftStep("s", +CDF97_U1),
        FloatLiftStep("d", -CDF97_P2),
        FloatLiftStep("s", +CDF97_U2),
    ),
    scale_s=CDF97_S1,
    scale_d=CDF97_S2,
    # Reversible integer 9/7-F (Adams); reference /root/reference/src/libdwt.c:10918-10943.
    int_steps=(
        IntLiftStep("d", -1, +203, -(1 << 6), 7),
        IntLiftStep("s", +1, -217, +(1 << 11), 12),
        IntLiftStep("d", -1, -113, -(1 << 6), 7),
        IntLiftStep("s", +1, +1817, +(1 << 11), 12),
    ),
    support=4,
)

# --- CDF 5/3 -----------------------------------------------------------------
# Constants: reference /root/reference/src/inline.h:331-337.
CDF53_P1 = 0.5
CDF53_U1 = 0.25
CDF53_S1 = math.sqrt(2.0)
CDF53_S2 = 1.0 / math.sqrt(2.0)

CDF53 = Wavelet(
    name="cdf53",
    steps=(
        FloatLiftStep("d", -CDF53_P1),
        FloatLiftStep("s", +CDF53_U1),
    ),
    scale_s=CDF53_S1,
    scale_d=CDF53_S2,
    # Reversible integer 5/3 (JPEG2000); reference /root/reference/src/libdwt.c:10964-10981.
    #   d -= (l+r) >> 1 ; s += (l+r+2) >> 2
    int_steps=(
        IntLiftStep("d", -1, 1, 0, 1),
        IntLiftStep("s", +1, 1, 2, 2),
    ),
    support=2,
)

# --- Interpolating 5/3 (predict-only) ----------------------------------------
# Reference /root/reference/src/libdwt.c:11252-11292 (dwt_interp53_f_ex_stride_s):
# single predict step, no update, same scaling as CDF 5/3.
INTERP53 = Wavelet(
    name="interp53",
    steps=(FloatLiftStep("d", -CDF53_P1),),
    scale_s=CDF53_S1,
    scale_d=CDF53_S2,
    int_steps=None,
    support=1,
)

# --- Haar ---------------------------------------------------------------------
# Lifting factorization of (unnormalized-orthogonal) Haar, as in the reference's
# cores example (/root/reference/examples/cores/cores-haar.h): d -= s ; s += d/2,
# with scaling (sqrt2, 1/sqrt2).  Note Haar neighbours are one-sided: we express
# it with the standard two-sided machinery below via dedicated handling in
# ops.lifting (left-neighbour-only step).
HAAR = Wavelet(
    name="haar",
    steps=(
        FloatLiftStep("d", -0.5),  # placeholder; haar uses one-sided steps
    ),
    scale_s=CDF53_S1,
    scale_d=CDF53_S2,
    support=1,
)

REGISTRY = {
    "cdf97": CDF97,
    "cdf53": CDF53,
    "interp53": INTERP53,
}


def get_wavelet(wavelet) -> Wavelet:
    """Resolve a wavelet spec (name or Wavelet) to a Wavelet."""
    if isinstance(wavelet, Wavelet):
        return wavelet
    try:
        return REGISTRY[str(wavelet).lower()]
    except KeyError:
        raise ValueError(
            f"unknown wavelet {wavelet!r}; known: {sorted(REGISTRY)}"
        ) from None
