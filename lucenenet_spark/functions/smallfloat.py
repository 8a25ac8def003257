"""Lucene SmallFloat 3-mantissa-bit / zero-exponent-15 norm quantization.

Bit-faithful numpy reimplementation of the 8-bit float codec used for
per-document field norms:

- encode: reference ``src/Lucene.Net/Util/SmallFloat.cs:146-159``
  (``SingleToSByte315``): take the raw IEEE-754 float32 bits, shift
  right 21 (keeping 3 mantissa bits), re-bias the exponent by
  (63 - 15), saturating to [0/1, 255].
- decode: reference ``src/Lucene.Net/Util/SmallFloat.cs:179-191``
  (``SByte315ToSingle``): shift the byte back up 21 bits and add the
  bias back into the exponent; 0 decodes to 0.0.

BM25 encodes ``boost / sqrt(fieldLength)`` into this byte at index
time (``Search/Similarities/BM25Similarity.cs:110-113``) and decodes
through ``NORM_TABLE[b] = 1 / f**2`` (i.e. back to ~fieldLength /
boost^2) at query time (``BM25Similarity.cs:143-154``).

All functions are vectorized over numpy arrays so they can run inside
Arrow/pandas UDFs with zero per-row Python.
"""

from __future__ import annotations

import numpy as np

_BIAS_SHIFTED = (63 - 15) << 3  # 384
_SHIFT = 24 - 3  # 21


def float_to_byte315(f: np.ndarray | float) -> np.ndarray:
    """Vectorized SingleToByte315: float32 -> uint8."""
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32)
    smallfloat = bits >> _SHIFT
    out = (smallfloat - _BIAS_SHIFTED).astype(np.int32)
    # underflow: values whose shifted bits <= bias encode to 0 (for <=0) or 1
    under = smallfloat <= _BIAS_SHIFTED
    out = np.where(under, np.where(bits <= 0, 0, 1), out)
    # overflow saturates to 255 (sbyte -1)
    out = np.where(smallfloat >= _BIAS_SHIFTED + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray | int) -> np.ndarray:
    """Vectorized Byte315ToSingle: uint8 -> float32."""
    by = np.asarray(b, dtype=np.uint8).astype(np.int32)
    bits = (by << _SHIFT) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32)
    return np.where(by == 0, np.float32(0.0), out).astype(np.float32)


# NORM_TABLE[i] = 1 / f^2 where f = byte315_to_float(i); decodes a norm
# byte straight to the (quantized) field length for boost=1.
# Reference: BM25Similarity.cs LoadNormTable (1f / (f * f)); index 0
# divides by zero -> +inf, same as the C# float semantics.
with np.errstate(divide="ignore"):
    _f = byte315_to_float(np.arange(256, dtype=np.uint8))
    NORM_TABLE: np.ndarray = (np.float32(1.0) / (_f * _f)).astype(np.float32)
del _f


def norm_byte_from_length(field_length: np.ndarray, boost: float = 1.0) -> np.ndarray:
    """Index-time norm byte: SingleToByte315(boost / sqrt(fieldLength)).

    fieldLength counts emitted (post-stopword) tokens; length 0 yields
    +inf which saturates to byte 255, matching C# float division.
    Reference: BM25Similarity.cs:110-113 (EncodeNormValue) with
    discountOverlaps numTerms (ComputeNorm, :156-160).
    """
    fl = np.asarray(field_length, dtype=np.float64)
    with np.errstate(divide="ignore"):
        val = (np.float32(boost) / np.sqrt(fl).astype(np.float32)).astype(np.float32)
    return float_to_byte315(val)
