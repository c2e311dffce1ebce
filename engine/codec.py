"""Delta-gap + varint posting compression (BASELINE.json:6, SURVEY.md Q6).

Pure-numpy vectorized LEB128: encoding loops over BYTE POSITIONS (≤10
for 64-bit values), not over values — each iteration is a full-array
numpy op, so cost is O(10 vector ops) regardless of posting count.
Decoding finds value boundaries from continuation bits and reduces each
value's 7-bit groups with ``np.bitwise_or.reduceat``.

The reference packs fixed 6-byte (doc_id, tf) tuples (SURVEY.md §1.1);
delta+varint typically beats that ~3-4× on sorted doc_id runs, which at
10^12-file scale is the difference between an index that fits on the
cluster and one that does not.
"""

from __future__ import annotations

import numpy as np


def varint_encode_with_lengths(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode an array; returns (bytes_u8_array, bytes_per_value).

    The per-value byte lengths let a caller encode a large concatenated
    run ONCE and slice out sub-ranges by cumulative offset — the bytes
    for values [i:j] are exactly out[cum[i]:cum[j]] (LEB128 is
    self-delimiting per value, no cross-value state)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # bytes per value = number of 7-bit groups = 1 + #(v >= 2^(7k))
    thresholds = np.uint64(1) << (np.uint64(7) * np.arange(1, 10, dtype=np.uint64))
    nb = 1 + (v[:, None] >= thresholds[None, :]).sum(axis=1, dtype=np.int64)
    # fill an (n×10) uint8 byte matrix column-by-column (10 passes over
    # n-sized arrays — no n×10 uint64 temporaries), then flatten the
    # used prefix of each row: row-major order IS value-major byte order
    max_nb = int(nb.max())
    mat = np.empty((v.size, max_nb), dtype=np.uint8)
    tmp = v.copy()
    for j in range(max_nb):
        mat[:, j] = (tmp & np.uint64(0x7F)).astype(np.uint8)
        tmp >>= np.uint64(7)
    cols = np.arange(max_nb, dtype=np.int64)[None, :]
    np.bitwise_or(
        mat, np.where(cols < (nb - 1)[:, None], np.uint8(0x80), np.uint8(0)), out=mat
    )
    out = mat[cols < nb[:, None]]
    return out, nb


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64/int64 array (values must be >= 0)."""
    out, _ = varint_encode_with_lengths(values)
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (raw & 0x80) == 0
    # group index of each byte: 0-based id of the value it belongs to
    group = np.zeros(raw.shape, dtype=np.int64)
    group[1:] = np.cumsum(is_end[:-1])
    starts = np.flatnonzero(np.concatenate(([True], is_end[:-1])))
    # position of each byte within its value → shift amount
    idx = np.arange(raw.size, dtype=np.int64)
    within = idx - starts[group]
    parts = (raw & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * within.astype(np.uint64)
    )
    vals = np.bitwise_or.reduceat(parts, starts)
    if count is not None and vals.size != count:
        raise ValueError(f"decoded {vals.size} values, expected {count}")
    return vals


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Delta-gap + varint for a strictly-increasing int64 array."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return b""
    gaps = np.empty(a.shape, dtype=np.uint64)
    gaps[0] = np.uint64(a[0])
    if a.size > 1:
        d = np.diff(a)
        if (d <= 0).any():
            raise ValueError("doc_ids must be strictly increasing")
        gaps[1:] = d.astype(np.uint64)
    return varint_encode(gaps)


def delta_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    gaps = varint_decode(buf, count)
    return np.cumsum(gaps.astype(np.int64))
