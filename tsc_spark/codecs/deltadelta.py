"""Delta-of-delta + zigzag varint codec for int32 token arrays.

The reference stores one row per point in a TSDB (timestamps are
synthetic counters, /root/reference/scripts/seed_influx.jl:615,646); our
engine stores whole token sequences and compresses them with the classic
TSDB delta-of-delta scheme (Gorilla §4.1 timestamp encoding, adapted to
token values): v[0], d[0]=v[1]-v[0], then dod[i]=d[i]-d[i-1], each
zigzag-mapped and LEB128-varint packed.

Both encode and decode are fully vectorized numpy (no per-value Python
loops) so they run inside Arrow-batched pandas UDFs at scan speed, per
the engine's no-per-row-Python rule.

Layout: [varint n] [zigzag-varint stream of n values: v0, d0, dod...].
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_dod", "decode_dod"]

CODEC_VERSION = 1


def _zigzag(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64)
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)) ^ (-(u & np.uint64(1))).astype(np.uint64)).astype(np.int64)


def _varint_encode(values: np.ndarray) -> np.ndarray:
    """Vectorized LEB128: uint64 array -> uint8 byte stream."""
    n = values.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    v = values.astype(np.uint64)
    # byte length per value: ceil(bitlen/7), min 1  (bitlen via log2-free trick)
    nbits = np.zeros(n, dtype=np.int64)
    tmp = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.uint64(1) << np.uint64(shift))
        nbits[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    nbits += 1  # bitlen of 0 -> 1
    nbytes = (nbits + 6) // 7
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    # position of each output byte within its varint
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, nbytes)
    val_rep = np.repeat(v, nbytes)
    chunks = (val_rep >> (np.uint64(7) * pos.astype(np.uint64))) & np.uint64(0x7F)
    out[:] = chunks.astype(np.uint8)
    # continuation bit on all but the last byte of each varint
    ends = starts + nbytes - 1
    cont = np.ones(total, dtype=bool)
    cont[ends] = False
    out[cont] |= 0x80
    return out


def _varint_decode(buf: np.ndarray) -> np.ndarray:
    """Vectorized LEB128 decode: uint8 stream -> uint64 array."""
    if buf.shape[0] == 0:
        return np.empty(0, dtype=np.uint64)
    b = buf.astype(np.uint64)
    term = (buf & 0x80) == 0
    # group id of each byte = count of terminators before it
    gid = np.concatenate(([0], np.cumsum(term)[:-1])).astype(np.int64)
    starts = np.concatenate(([0], np.nonzero(term)[0][:-1] + 1))
    pos = np.arange(buf.shape[0], dtype=np.int64) - starts[gid]
    shifted = (b & np.uint64(0x7F)) << (np.uint64(7) * pos.astype(np.uint64))
    out = np.zeros(int(term.sum()), dtype=np.uint64)
    np.add.at(out, gid, shifted)
    return out


def encode_dod(tokens) -> bytes:
    """int array -> delta-of-delta zigzag-varint bytes."""
    arr = np.asarray(tokens, dtype=np.int64)
    n = arr.shape[0]
    header = _varint_encode(np.array([n], dtype=np.uint64))
    if n == 0:
        return header.tobytes()
    if n == 1:
        body = _varint_encode(_zigzag(arr))
        return header.tobytes() + body.tobytes()
    deltas = np.diff(arr)
    stream = np.empty(n, dtype=np.int64)
    stream[0] = arr[0]
    stream[1] = deltas[0]
    stream[2:] = np.diff(deltas)
    body = _varint_encode(_zigzag(stream))
    return header.tobytes() + body.tobytes()


def decode_dod(data: bytes) -> np.ndarray:
    """delta-of-delta bytes -> int64 array (exact round-trip)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    values = _varint_decode(buf)
    if values.shape[0] == 0:
        return np.empty(0, dtype=np.int64)
    n = int(values[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    stream = _unzigzag(values[1 : 1 + n])
    if n == 1:
        return stream
    out = np.empty(n, dtype=np.int64)
    out[0] = stream[0]
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = stream[1]
    if n > 2:
        np.cumsum(stream[2:], out=deltas[1:])
        deltas[1:] += stream[1]
    out[1:] = out[0] + np.cumsum(deltas)
    return out
