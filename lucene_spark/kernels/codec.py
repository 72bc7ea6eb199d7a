"""Posting-block codec: delta + byte-aligned FOR compression, numpy-vectorized.

Capability-parity with the reference postings format
(``lucene/core/src/java/org/apache/lucene/codecs/lucene104/Lucene104PostingsWriter.java:389-470``):
docIDs are sorted, delta-encoded, and packed in fixed-size blocks of
BLOCK_SIZE=256 (ForUtil.java:34) with per-block skip metadata
(first/last doc) and a per-block *competitive impact skyline* of
(freq, norm) pairs (CompetitiveImpactAccumulator.java:26-120) that upper-
bounds BM25 scores for block-max WAND.

The byte layout is ours to define (we build capabilities, not the Lucene
file format): each int array is packed at the TRUE bit width of its max
(b-bit FOR, ForUtil.java:34 capability) via vectorized
packbits/unpackbits whenever that beats the byte-aligned 1/2/4/8 width
— else the byte-aligned form is kept for pure ``frombuffer`` decode
speed. Both forms are self-describing (header byte), so mixed blocks
coexist (old indexes stay readable). Positions are per-doc
delta-encoded and concatenated per block (the ``.pos`` analog,
Lucene104PostingsWriter.java startTerm/finishDoc position path).

All encode/decode runs inside Arrow-batched kernels on executors.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "BLOCK_SIZE",
    "pack_ints",
    "unpack_ints",
    "encode_chunk",
    "decode_chunk_docs_tfs",
    "decode_block_positions",
    "decode_block_positions_flat",
    "impact_skyline",
]

BLOCK_SIZE = 256  # matches Lucene104 ForUtil BLOCK_SIZE (ForUtil.java:34)

_WIDTH_DTYPES = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


_BIT_FLAG = 0x80  # header marker: bit-packed form, low bits = bit width

# escape hatch for size/speed A-B measurements (decode handles both
# forms regardless): LUCENE_SPARK_NO_BITPACK=1 forces byte-aligned
import os as _os
_BITPACK = _os.environ.get("LUCENE_SPARK_NO_BITPACK") != "1"


def pack_ints(arr: np.ndarray) -> bytes:
    """Pack a non-negative int array at its true bit width when that is
    smaller than the byte-aligned form, else byte-aligned.

    Byte form:  [width:1|2|4|8] + little-endian values.
    Bit form:   [0x80|b] [n:uint32 LE] + ceil(n*b/8) bytes of
                LSB-first bit-packed values (numpy packbits).
    """
    a = np.asarray(arr, dtype=np.int64)
    if a.size == 0:
        return bytes([1])
    mx = int(a.max())
    if mx < 0:
        raise ValueError("pack_ints requires non-negative values")
    b = max(mx.bit_length(), 1)
    for width in (1, 2, 4, 8):
        if mx < (1 << (8 * width)):
            break
    n = a.size
    bit_size = 5 + (n * b + 7) // 8
    byte_size = 1 + n * width
    if _BITPACK and bit_size < byte_size:
        u = a.astype(np.uint64)
        bits = ((u[:, None] >> np.arange(b, dtype=np.uint64)) & 1) \
            .astype(np.uint8)
        packed = np.packbits(bits.ravel(), bitorder="little").tobytes()
        return (bytes([_BIT_FLAG | b])
                + np.uint32(n).tobytes() + packed)
    return bytes([width]) + a.astype(_WIDTH_DTYPES[width]).tobytes()


def unpack_ints(buf: bytes) -> np.ndarray:
    """Inverse of pack_ints; returns int64 ndarray."""
    if not buf:
        return np.zeros(0, dtype=np.int64)
    width = buf[0]
    if width & _BIT_FLAG:
        b = width & 0x7F
        n = int(np.frombuffer(buf, dtype=np.uint32, offset=1, count=1)[0])
        bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8, offset=5),
                             count=n * b, bitorder="little")
        vals = bits.reshape(n, b).astype(np.uint64)
        vals <<= np.arange(b, dtype=np.uint64)
        return vals.sum(axis=1).astype(np.int64)
    return np.frombuffer(buf, dtype=_WIDTH_DTYPES[width], offset=1).astype(np.int64)


def impact_skyline(tfs: np.ndarray, norms: np.ndarray):
    """Competitive (freq, norm) skyline of a block
    (CompetitiveImpactAccumulator.java:102-120).

    A pair (f1, n1) dominates (f2, n2) when f1 >= f2 and n1 <= n2 under
    the norm-code ordering (larger code => longer doc => lower score).
    Kept pairs, sorted by norm asc, have strictly increasing freq.
    Returns (freqs int32 list, norms int32 list).
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    if tfs.size == 0:
        return [], []
    order = np.lexsort((-tfs, norms))  # norm asc, freq desc within norm
    n_sorted = norms[order]
    f_sorted = tfs[order]
    # first occurrence per norm = max freq for that norm
    first = np.concatenate(([True], n_sorted[1:] != n_sorted[:-1]))
    n_u = n_sorted[first]
    f_u = f_sorted[first]
    # keep only strictly-increasing freq as norm increases
    keep_f, keep_n = [], []
    best = -1
    for f, n in zip(f_u.tolist(), n_u.tolist()):
        if f > best:
            keep_f.append(int(f))
            keep_n.append(int(n))
            best = f
    return keep_f, keep_n


def encode_chunk(docs: np.ndarray, tfs: np.ndarray, norms: np.ndarray,
                 positions: list | None = None):
    """Encode one (term, bucket) posting chunk into block rows.

    docs: sorted ascending global doc ids (int64); tfs: int32 freqs;
    norms: uint8 norm codes aligned with docs (used only for impacts —
    norms live in the norms table, not in postings);
    positions: optional list of int arrays (per-doc token positions).

    Returns a list of dict block rows:
      {first_doc, last_doc, num_docs, docs_enc, tfs_enc, pos_enc,
       imp_freqs, imp_norms}
    """
    docs = np.asarray(docs, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = docs.size
    blocks = []
    for start in range(0, n, BLOCK_SIZE):
        end = min(start + BLOCK_SIZE, n)
        d = docs[start:end]
        t = tfs[start:end]
        deltas = np.diff(d)  # strictly positive for valid postings
        imp_f, imp_n = impact_skyline(t, np.asarray(norms)[start:end])
        if positions is not None:
            # per-doc delta-encoded positions, concatenated; tf gives the
            # per-doc count so no extra length array is needed
            pos_parts = []
            for p in positions[start:end]:
                p = np.asarray(p, dtype=np.int64)
                pos_parts.append(np.diff(p, prepend=0))
            pos_flat = np.concatenate(pos_parts) if pos_parts else np.zeros(0, dtype=np.int64)
            pos_enc = pack_ints(pos_flat)
        else:
            pos_enc = b""
        blocks.append({
            "first_doc": int(d[0]),
            "last_doc": int(d[-1]),
            "num_docs": int(end - start),
            "docs_enc": pack_ints(deltas),
            "tfs_enc": pack_ints(t),
            "pos_enc": pos_enc,
            "imp_freqs": imp_f,
            "imp_norms": imp_n,
        })
    return blocks


def decode_block_docs_tfs(block) -> tuple:
    """Decode one block -> (docs int64, tfs int64)."""
    deltas = unpack_ints(bytes(block["docs_enc"]))
    docs = np.empty(deltas.size + 1, dtype=np.int64)
    docs[0] = block["first_doc"]
    if deltas.size:
        np.cumsum(deltas, out=docs[1:])
        docs[1:] += block["first_doc"]
    tfs = unpack_ints(bytes(block["tfs_enc"]))
    return docs, tfs


def decode_chunk_docs_tfs(blocks) -> tuple:
    """Decode a list of block rows -> (docs, tfs) int64 arrays."""
    if not blocks:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    parts = [decode_block_docs_tfs(b) for b in blocks]
    docs = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    return docs, tfs


def decode_block_positions(block) -> list:
    """Decode one block's positions -> list of int64 arrays (one per doc)."""
    tfs = unpack_ints(bytes(block["tfs_enc"]))
    flat = unpack_ints(bytes(block["pos_enc"]))
    out = []
    off = 0
    for tf in tfs.tolist():
        seg = flat[off:off + tf]
        out.append(np.cumsum(seg))
        off += tf
    return out


def decode_block_positions_flat(block) -> tuple:
    """Decode one block's positions WITHOUT per-doc Python loops ->
    (flat absolute positions int64, tfs int64). Per-doc segments are
    delta-encoded with an absolute first value, so one global cumsum
    minus each segment's carried prefix restores absolute positions
    for every doc at once."""
    tfs = unpack_ints(bytes(block["tfs_enc"]))
    flat = unpack_ints(bytes(block["pos_enc"]))
    if flat.size == 0:
        return flat, tfs
    cs = np.cumsum(flat)
    ends = np.cumsum(tfs)
    carry = np.concatenate(([0], cs[ends[:-1] - 1]))
    return cs - np.repeat(carry, tfs), tfs
