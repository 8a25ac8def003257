"""Delta+varbyte codec round-trips, including a scalar-reference check
of the wire format (7 data bits per byte, high bit continuation, as in
src/Lucene.Net/Store/DataOutput.cs:199-207)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucenenet_spark.functions.varbyte import (
    decode_freqs,
    decode_positions,
    delta_decode_docids,
    delta_encode_docids,
    encode_freqs,
    encode_positions,
    vbyte_decode,
    vbyte_encode,
)


def _ref_vbyte_one(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def test_wire_format_known_values():
    assert vbyte_encode(np.array([0])) == b"\x00"
    assert vbyte_encode(np.array([127])) == b"\x7f"
    assert vbyte_encode(np.array([128])) == b"\x80\x01"
    assert vbyte_encode(np.array([16384])) == b"\x80\x80\x01"
    vals = [0, 1, 127, 128, 255, 300, 16383, 16384, 2**31 - 1, 2**40]
    assert vbyte_encode(np.array(vals, dtype=np.uint64)) == b"".join(
        _ref_vbyte_one(v) for v in vals
    )


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=50, deadline=None)
def test_vbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(vbyte_decode(vbyte_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True)
)
@settings(max_examples=50, deadline=None)
def test_docid_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    np.testing.assert_array_equal(delta_decode_docids(delta_encode_docids(arr)), arr)


def test_freqs_roundtrip():
    f = np.array([1, 1, 2, 300, 7, 128], dtype=np.int32)
    np.testing.assert_array_equal(decode_freqs(encode_freqs(f)), f)


def test_positions_roundtrip():
    pos = [[0, 5, 9], [2], [], [1, 2, 3, 1000]]
    enc = encode_positions(pos)
    dec = decode_positions(enc, len(pos))
    assert len(dec) == len(pos)
    for got, exp in zip(dec, pos):
        np.testing.assert_array_equal(got, np.array(exp, dtype=np.int64))


def test_compression_is_compact():
    # 128 sequential docids with gap 1 -> ~1 byte/doc after the head
    ids = np.arange(10_000, 10_128, dtype=np.int64)
    assert len(delta_encode_docids(ids)) <= 2 + 127


@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=5000), max_size=12
        ).map(sorted),
        max_size=40,
    )
)
@settings(max_examples=60, deadline=None)
def test_positions_flat_matches_listwise(plists):
    """decode_positions_flat (freq-driven, fully vectorized) agrees
    with the record-walking decode_positions on the same stream."""
    from lucenenet_spark.functions.varbyte import decode_positions_flat

    enc = encode_positions(plists)
    freqs = np.array([len(p) for p in plists], dtype=np.int64)
    flat, starts = decode_positions_flat(enc, freqs)
    listwise = decode_positions(enc, len(plists))
    assert flat.size == int(freqs.sum())
    for j, exp in enumerate(listwise):
        np.testing.assert_array_equal(
            flat[starts[j] : starts[j] + freqs[j]], exp
        )


@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=30),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_gather_ranges(lens, data):
    from lucenenet_spark.functions.varbyte import gather_ranges

    lens_a = np.array(lens, dtype=np.int64)
    starts = np.cumsum(lens_a) - lens_a
    flat = np.arange(int(lens_a.sum()), dtype=np.int64) * 3
    # gather a random subset of ranges
    n_pick = data.draw(st.integers(min_value=0, max_value=len(lens)))
    picks = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(lens) - 1),
                min_size=n_pick,
                max_size=n_pick,
                unique=True,
            )
        )
    )
    got = gather_ranges(flat, starts[picks], lens_a[picks])
    exp = (
        np.concatenate([flat[starts[j] : starts[j] + lens_a[j]] for j in picks])
        if picks and lens_a[picks].sum()
        else np.empty(0, dtype=np.int64)
    )
    np.testing.assert_array_equal(got, exp)


def test_vbyte_fast_path_boundary():
    # 127 takes the single-byte fast path; 128 forces the general path;
    # both must produce the identical wire bytes as the scalar reference
    for vals in ([127] * 64, [128] + [1] * 63, [0], [127, 128]):
        arr = np.array(vals, dtype=np.uint64)
        assert vbyte_encode(arr) == b"".join(_ref_vbyte_one(v) for v in vals)
        np.testing.assert_array_equal(vbyte_decode(vbyte_encode(arr)), arr)
