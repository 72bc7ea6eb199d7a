"""Property-based codec roundtrip tests, mirroring the reference's
RandomPostingsTester / BasePostingsFormatTestCase strategy
(tests/index/BasePostingsFormatTestCase.java:104): random posting lists
(seeded) must encode→decode to identity across singleton / tail /
full-block shapes, and block metadata invariants must hold."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.kernels.codec import (BLOCK_SIZE, decode_block_positions,
                                        decode_chunk_docs_tfs, encode_chunk,
                                        impact_skyline, pack_ints, unpack_ints)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_pack_unpack_identity(vals):
    arr = np.array(vals, dtype=np.int64)
    np.testing.assert_array_equal(unpack_ints(pack_ints(arr)), arr)


@pytest.mark.parametrize("n", [1, 2, 255, 256, 257, 1000, 5000])
def test_chunk_roundtrip_shapes(n):
    rng = np.random.default_rng(42 + n)
    docs = np.sort(rng.choice(np.arange(n * 50, dtype=np.int64), size=n, replace=False))
    tfs = rng.integers(1, 300, n)
    norms = rng.integers(0, 256, n)
    positions = [np.sort(rng.choice(2000, size=tf, replace=False)) for tf in tfs]
    blocks = encode_chunk(docs, tfs, norms, positions)
    assert all(b["num_docs"] <= BLOCK_SIZE for b in blocks)
    d2, t2 = decode_chunk_docs_tfs(blocks)
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(t2, tfs)
    # positions roundtrip
    off = 0
    for b in blocks:
        got = decode_block_positions(b)
        for p in got:
            np.testing.assert_array_equal(p, positions[off])
            off += 1
    assert off == n


def test_block_metadata_invariants():
    rng = np.random.default_rng(7)
    docs = np.sort(rng.choice(100000, size=3000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 40, 3000)
    norms = rng.integers(0, 256, 3000)
    blocks = encode_chunk(docs, tfs, norms)
    # consecutive block doc ranges strictly increasing & disjoint (skip data)
    for a, b in zip(blocks, blocks[1:]):
        assert a["last_doc"] < b["first_doc"]
    for blk in blocks:
        assert blk["first_doc"] <= blk["last_doc"]


def test_impact_skyline_dominance():
    rng = np.random.default_rng(11)
    tfs = rng.integers(1, 100, 500)
    norms = rng.integers(0, 256, 500)
    kf, kn = impact_skyline(tfs, norms)
    # skyline: norms strictly increasing, freqs strictly increasing
    assert list(kn) == sorted(set(kn))
    assert list(kf) == sorted(kf) and len(set(kf)) == len(kf)
    # every original pair is dominated by some skyline pair
    for f, n in zip(tfs, norms):
        assert any(sf >= f and sn <= n for sf, sn in zip(kf, kn))


def test_singleton_and_empty():
    blocks = encode_chunk(np.array([42]), np.array([7]), np.array([3]))
    d, t = decode_chunk_docs_tfs(blocks)
    np.testing.assert_array_equal(d, [42])
    np.testing.assert_array_equal(t, [7])
    d0, t0 = decode_chunk_docs_tfs([])
    assert d0.size == 0 and t0.size == 0


# ---- true bit-packed FOR (ForUtil.java:34 capability) ------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=120, deadline=None)
@given(st.integers(1, 62),
       st.integers(0, 600),
       st.randoms(use_true_random=False))
def test_bit_packing_roundtrip_property(bits, n, rnd):
    import numpy as np
    from lucene_spark.kernels.codec import pack_ints, unpack_ints
    vals = np.array([rnd.randrange(0, 1 << bits) for _ in range(n)],
                    dtype=np.int64)
    assert np.array_equal(unpack_ints(pack_ints(vals)), vals)


def test_bit_packing_beats_byte_alignment():
    import numpy as np
    from lucene_spark.kernels.codec import pack_ints
    rng = np.random.default_rng(1)
    for bits, byte_w in ((3, 1), (10, 2), (20, 4), (33, 8)):
        vals = rng.integers(1 << (bits - 1), 1 << bits, 256).astype(np.int64)
        got = len(pack_ints(vals))
        byte_form = 1 + 256 * byte_w
        assert got < byte_form, (bits, got, byte_form)
        assert got <= 5 + (256 * bits + 7) // 8


def test_legacy_byte_aligned_blocks_still_decode():
    import numpy as np
    from lucene_spark.kernels import codec
    vals = np.array([5, 300, 70000], dtype=np.int64)  # forces 4-byte width
    legacy = bytes([4]) + vals.astype(np.uint32).tobytes()
    assert np.array_equal(codec.unpack_ints(legacy), vals)
