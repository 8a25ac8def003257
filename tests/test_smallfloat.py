"""SmallFloat byte315 codec — bit-faithful vs a literal transcription
of the reference algorithm (src/Lucene.Net/Util/SmallFloat.cs:146-191)."""

import math
import struct

import numpy as np
import pytest

from lucenenet_spark.functions.smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    float_to_byte315,
    norm_byte_from_length,
)


def _ref_encode(f: float) -> int:
    """Scalar reference: SingleToSByte315 (SmallFloat.cs:146-159)."""
    bits = struct.unpack("<i", struct.pack("<f", np.float32(f)))[0]
    smallfloat = bits >> (24 - 3)
    if smallfloat <= ((63 - 15) << 3):
        return 0 if bits <= 0 else 1
    if smallfloat >= ((63 - 15) << 3) + 0x100:
        return 255
    return (smallfloat - ((63 - 15) << 3)) & 0xFF


def _ref_decode(b: int) -> float:
    """Scalar reference: SByte315ToSingle (SmallFloat.cs:179-191)."""
    if b == 0:
        return 0.0
    bits = ((b & 0xFF) << (24 - 3)) + ((63 - 15) << 24)
    return struct.unpack("<f", struct.pack("<i", np.int32(bits)))[0]


def test_decode_all_256_bytes():
    for b in range(256):
        assert byte315_to_float(np.array([b], dtype=np.uint8))[0] == np.float32(_ref_decode(b))


def test_encode_roundtrip_all_256_bytes():
    # every decodable value must encode back to its byte
    for b in range(256):
        f = _ref_decode(b)
        assert int(float_to_byte315(np.array([f], dtype=np.float32))[0]) == b


@pytest.mark.parametrize(
    "f",
    [0.0, -0.0, -1.0, 1.0, 0.5, 5.820766e-10, 7.5161928e9, 1e-12, 1e12,
     float("inf"), 0.1, 0.333333, 2.0, 123456.789],
)
def test_encode_matches_reference_scalar(f):
    got = int(float_to_byte315(np.array([f], dtype=np.float32))[0])
    assert got == _ref_encode(f)


def test_encode_random_floats_match_reference():
    rng = np.random.default_rng(42)
    vals = rng.uniform(-10, 10, 2000).astype(np.float32)
    vals = np.concatenate([vals, (10.0 ** rng.uniform(-12, 12, 2000)).astype(np.float32)])
    got = float_to_byte315(vals)
    exp = np.array([_ref_encode(float(v)) for v in vals], dtype=np.uint8)
    np.testing.assert_array_equal(got, exp)


def test_norm_table_matches_reference():
    # BM25Similarity.cs LoadNormTable: 1f / (f*f)
    for b in range(256):
        f = np.float32(_ref_decode(b))
        exp = np.float32(1.0) / (f * f) if f != 0 else np.float32("inf")
        assert NORM_TABLE[b] == exp or (math.isinf(NORM_TABLE[b]) and math.isinf(exp))


def test_norm_byte_from_length():
    # fieldLength 1 -> 1/sqrt(1)=1.0 ; known fixture values
    assert int(norm_byte_from_length(np.array([1]))[0]) == _ref_encode(1.0)
    assert int(norm_byte_from_length(np.array([4]))[0]) == _ref_encode(0.5)
    # zero-length doc: 1/sqrt(0) = +inf saturates to 255
    assert int(norm_byte_from_length(np.array([0]))[0]) == 255
    lengths = np.arange(1, 5000)
    got = norm_byte_from_length(lengths)
    exp = np.array(
        [_ref_encode(np.float32(1.0) / np.float32(math.sqrt(l))) for l in lengths],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(got, exp)
