"""Delta + variable-byte posting-list compression, vectorized in numpy.

Spark-first replacement for the reference's Lucene41 block postings
format: docID gaps are delta-encoded then variable-byte packed (7 data
bits per byte, high bit = continuation), the same wire idea as
``src/Lucene.Net/Store/DataOutput.cs:199-207`` (WriteVInt32) used by
``Codecs/Lucene41/Lucene41PostingsWriter.cs:479-495`` for tail blocks.
We keep fixed ``BLOCK_SIZE = 128`` docs per block like
``Lucene41PostingsFormat.cs:375`` but store each block as a Parquet
BinaryType cell plus block metadata columns (first/last docid,
max_freq, max_norm) — the block metadata plays the role of Lucene's
skip lists (``MultiLevelSkipListWriter.cs``) and feeds block-max
pruning.

Everything operates on whole numpy arrays (no per-element Python in
the encode hot path beyond one pass to interleave variable-length
byte groups).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def vbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized variable-byte encode of a uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # how many 7-bit groups each value needs (at least 1)
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while np.any(tmp):
        nbytes += (tmp != 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # byte position within each value, vectorized by max width
    maxw = int(nbytes.max())
    for k in range(maxw):
        mask = nbytes > k
        idx = starts[mask] + k
        chunk = (v[mask] >> np.uint64(7 * k)).astype(np.uint64)
        byte = (chunk & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > k).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out.tobytes()


def vbyte_decode(data: bytes) -> np.ndarray:
    """Vectorized variable-byte decode -> uint64 array."""
    if not data:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    cont = (raw & 0x80) != 0
    payload = (raw & 0x7F).astype(np.uint64)
    # value boundaries: a value ends where cont bit is 0
    ends = np.flatnonzero(~cont)
    starts = np.concatenate(([0], ends[:-1] + 1))
    widths = ends - starts + 1
    n = ends.size
    out = np.zeros(n, dtype=np.uint64)
    maxw = int(widths.max())
    for k in range(maxw):
        mask = widths > k
        out[mask] |= payload[starts[mask] + k] << np.uint64(7 * k)
    return out


def delta_encode_docids(doc_ids: np.ndarray) -> bytes:
    """Sorted docids -> vbyte(first, gap1, gap2, ...)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return b""
    deltas = np.empty(d.size, dtype=np.uint64)
    deltas[0] = d[0]
    deltas[1:] = np.diff(d).astype(np.uint64)
    return vbyte_encode(deltas)


def delta_decode_docids(data: bytes) -> np.ndarray:
    deltas = vbyte_decode(data)
    if deltas.size == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(deltas.astype(np.int64))


def encode_freqs(freqs: np.ndarray) -> bytes:
    return vbyte_encode(np.asarray(freqs, dtype=np.uint64))


def decode_freqs(data: bytes) -> np.ndarray:
    return vbyte_decode(data).astype(np.int32)


def encode_positions(positions_per_doc: list[list[int]] | list[np.ndarray]) -> bytes:
    """Per-doc position lists -> vbyte(len, delta-positions...) per doc,
    concatenated. Mirrors the prox stream idea of
    ``Lucene41PostingsWriter.cs:400-565`` (delta positions per doc)."""
    flat: list[np.ndarray] = []
    for pos in positions_per_doc:
        p = np.asarray(pos, dtype=np.int64)
        rec = np.empty(p.size + 1, dtype=np.uint64)
        rec[0] = p.size
        if p.size:
            rec[1] = p[0]
            rec[2:] = np.diff(p).astype(np.uint64)
        flat.append(rec)
    if not flat:
        return b""
    return vbyte_encode(np.concatenate(flat))


def decode_positions(data: bytes, n_docs: int) -> list[np.ndarray]:
    """Inverse of :func:`encode_positions`."""
    vals = vbyte_decode(data).astype(np.int64)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_docs):
        cnt = int(vals[i])
        i += 1
        deltas = vals[i : i + cnt]
        i += cnt
        out.append(np.cumsum(deltas))
    return out
