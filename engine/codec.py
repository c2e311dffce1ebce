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


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64/int64 array (values must be >= 0)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlength/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    # bit length via 4 halving steps would be branchy; use frexp-free loop
    # over the 10 possible 7-bit groups instead:
    nb = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    del nbits
    total = int(nb.sum())
    out = np.empty(total, dtype=np.uint8)
    # start offset of each value's byte run
    starts = np.zeros(v.shape, dtype=np.int64)
    np.cumsum(nb[:-1], out=starts[1:])
    shifted = v.copy()
    remaining = nb.copy()
    pos = starts.copy()
    for _ in range(10):
        mask = remaining > 0
        if not mask.any():
            break
        b = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (remaining[mask] > 1).astype(np.uint8) << 7
        out[pos[mask]] = b | cont
        shifted[mask] >>= np.uint64(7)
        pos[mask] += 1
        remaining[mask] -= 1
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
