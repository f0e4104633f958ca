"""Byte-aligned Gorilla-XOR codec for float64 arrays.

Gorilla value compression (Pelkonen et al., VLDB 2015 §4.1.2) XORs each
value with its predecessor and stores only the meaningful bytes.  This
implementation keeps the XOR-with-previous core but (a) aligns the
meaningful-bits window to bytes and (b) stores all control bytes in one
block ahead of the payload, so both encode and decode are fully
vectorized numpy — no per-value Python loop, no bit cursor.  The trade
is a few bits of density for an order-of-magnitude faster Python-side
codec, the right trade inside Arrow UDF batches.

Layout:
  [uint32 n] [8-byte raw first value]
  [m = n-1 control bytes: (leading_zero_bytes << 4) | significant_bytes]
  [concatenated significant bytes, MSB-first per value]
XOR == 0 encodes as control 0x00 with no payload.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_gorilla", "decode_gorilla"]

CODEC_VERSION = 1


def encode_gorilla(values) -> bytes:
    arr = np.ascontiguousarray(np.asarray(values, dtype=np.float64))
    n = arr.shape[0]
    # at-rest format is endian-pinned (header/first LE, payload MSB-
    # first) so blobs are portable across hosts; on little-endian
    # machines the bytes are identical to the previous native encoding
    head = np.array([n], dtype="<u4").tobytes()
    if n == 0:
        return head
    bits = arr.view(np.uint64)
    first = bits[0:1].astype("<u8").tobytes()
    if n == 1:
        return head + first

    x = bits[1:] ^ bits[:-1]
    m = x.shape[0]
    xb = x.astype(">u8").view(np.uint8).reshape(m, 8)  # MSB-first bytes
    nz = xb != 0
    any_nz = nz.any(axis=1)
    first_nz = np.where(any_nz, nz.argmax(axis=1), 8)
    last_nz = np.where(any_nz, 7 - nz[:, ::-1].argmax(axis=1), 7)
    sig = np.where(any_nz, last_nz - first_nz + 1, 0).astype(np.int64)
    lead = np.where(any_nz, first_nz, 0).astype(np.int64)

    controls = ((lead << 4) | sig).astype(np.uint8)

    total_pay = int(sig.sum())
    within = np.arange(total_pay, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(sig)[:-1])), sig
    )
    row = np.repeat(np.arange(m, dtype=np.int64), sig)
    col = np.repeat(lead, sig) + within
    payload = xb[row, col]
    return head + first + controls.tobytes() + payload.tobytes()


def decode_gorilla(data: bytes) -> np.ndarray:
    buf = np.frombuffer(data, dtype=np.uint8)
    n = int(np.frombuffer(buf[:4].tobytes(), dtype="<u4")[0])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    first = np.frombuffer(buf[4:12].tobytes(), dtype="<u8").astype(np.uint64)[0]
    xors = np.empty(n, dtype=np.uint64)
    xors[0] = first
    m = n - 1
    if m > 0:
        controls = buf[12 : 12 + m]
        payload = buf[12 + m :]
        sig = (controls & 0x0F).astype(np.int64)
        lead = (controls >> 4).astype(np.int64)
        total_pay = int(sig.sum())
        within = np.arange(total_pay, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(sig)[:-1])), sig
        )
        row = np.repeat(np.arange(m, dtype=np.int64), sig)
        col = np.repeat(lead, sig) + within
        xb = np.zeros((m, 8), dtype=np.uint8)
        xb[row, col] = payload[:total_pay]
        xors[1:] = xb.view(">u8").astype(np.uint64).ravel()
    bits = np.bitwise_xor.accumulate(xors)
    return bits.view(np.float64).copy()
