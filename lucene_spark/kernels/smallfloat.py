"""Lucene SmallFloat: lossy small-integer encodings used for norms.

Behavior-parity port (vectorized numpy) of the reference implementation
``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java``:

- ``longToInt4`` / ``int4ToLong``  (SmallFloat.java:104-143): float-like,
  order-preserving encoding of non-negative longs keeping 4 significant
  bits (3 stored mantissa bits + implicit leading 1, plus a shift).
- ``intToByte4`` / ``byte4ToInt``  (SmallFloat.java:145-167): builds on
  longToInt4 but spends the 255-MAX_INT4 free byte codes on exact small
  values: values < 24 are encoded exactly (NUM_FREE_VALUES == 24 because
  longToInt4(Integer.MAX_VALUE) == 231).

These must be *bit-exact*: BM25 rank-identity depends on document lengths
being quantized to exactly the same 256 codes as the reference.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "long_to_int4",
    "int4_to_long",
    "int_to_byte4",
    "byte4_to_int",
    "LENGTH_TABLE",
    "MAX_INT4",
    "NUM_FREE_VALUES",
]


def long_to_int4(i):
    """Vectorized port of SmallFloat.longToInt4 (SmallFloat.java:104-124).

    Accepts an int or ndarray of non-negative int64; returns int32 codes.
    """
    arr = np.asarray(i, dtype=np.int64)
    if np.any(arr < 0):
        raise ValueError("Only supports positive values")
    # numBits = 64 - numberOfLeadingZeros(i); for i == 0 this is 0.
    # Compute via bit_length equivalent: floor(log2) is unsafe in float —
    # use successive shifts (exact integer math).
    num_bits = np.zeros(arr.shape, dtype=np.int64)
    tmp = arr.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.int64(1) << shift)
        num_bits[mask] += shift
        tmp[mask] >>= shift
    num_bits[arr > 0] += 1  # tmp is now 0 or 1; add the top bit

    subnormal = num_bits < 4
    shift_amt = np.where(subnormal, 0, num_bits - 4)
    encoded = (arr >> shift_amt).astype(np.int64)
    encoded = np.where(subnormal, arr, (encoded & 0x07) | ((shift_amt + 1) << 3))
    out = encoded.astype(np.int32)
    return out if out.shape else int(out)


def int4_to_long(i):
    """Vectorized port of SmallFloat.int4ToLong (SmallFloat.java:127-141)."""
    arr = np.asarray(i, dtype=np.int64)
    bits = arr & 0x07
    shift = (arr >> 3) - 1
    decoded = np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))
    return decoded if decoded.shape else int(decoded)


MAX_INT4 = int(long_to_int4(np.array([2**31 - 1]))[0])  # == 231
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def int_to_byte4(i):
    """Vectorized port of SmallFloat.intToByte4 (SmallFloat.java:145-156).

    Returns uint8 codes 0..255 (Java returns a signed byte; we keep the
    unsigned view, which is what `Byte.toUnsignedInt` recovers anyway).
    """
    arr = np.asarray(i, dtype=np.int64)
    if np.any(arr < 0):
        raise ValueError("Only supports positive values")
    small = arr < NUM_FREE_VALUES
    big = np.where(small, 0, arr - NUM_FREE_VALUES)
    enc = np.where(small, arr, NUM_FREE_VALUES + long_to_int4(big))
    out = enc.astype(np.uint8)
    return out if out.shape else int(out)


def byte4_to_int(b):
    """Vectorized port of SmallFloat.byte4ToInt (SmallFloat.java:159-167).

    Accepts uint8 codes (0..255); returns int64 decoded lengths.
    """
    arr = np.asarray(b, dtype=np.int64) & 0xFF
    small = arr < NUM_FREE_VALUES
    decoded = np.where(small, arr, NUM_FREE_VALUES + int4_to_long(np.where(small, 0, arr - NUM_FREE_VALUES)))
    return decoded if decoded.shape else int(decoded)


# BM25Similarity's LENGTH_TABLE (BM25Similarity.java:112-118): float32 view
# of byte4ToInt over all 256 codes.
LENGTH_TABLE = byte4_to_int(np.arange(256, dtype=np.int64)).astype(np.float32)
