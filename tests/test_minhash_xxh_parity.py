"""Round-11 verdict ask #6: the xxhash64 MinHash-LSH fast path
(`dedup_minhash_lsh_xxh`, one of the two oracle-less catalog entries) is
pinned by PAIR-SET parity against the md5/oracle-parity entry on the gate
corpus — a banding regression in the fast path now fails a pytest instead
of surfacing only as a bench timing anomaly.

The two entries share the pipeline (shingle → sign → band → bucket-join →
exact-Jaccard verify) and differ only in the signature hash family. LSH
banding is probabilistic per hash family, so the CANDIDATE sets may differ
— but at the entries' min_jaccard=0.5 threshold on the sf0.001/sf0.01
corpora the verified pair sets are identical (the duplicate pairs planted
by the generator are near-exact, far above any banding miss), and the
exact-Jaccard values must agree because they are computed from the
shingles, not the signatures.
"""

from __future__ import annotations

import pytest

from lakehouse_spark.queries import CATALOG

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pair_sets(spark):
    out = {}
    for name in ("dedup_minhash_lsh", "dedup_minhash_lsh_xxh"):
        rows = CATALOG[name].build(spark, SF_DIR).collect()
        out[name] = {(r.a_id, r.b_id): r.jaccard for r in rows}
    return out


def test_xxh_pair_set_equals_md5(pair_sets):
    md5 = pair_sets["dedup_minhash_lsh"]
    xxh = pair_sets["dedup_minhash_lsh_xxh"]
    assert set(md5) == set(xxh), (
        f"pair sets diverged: md5-only={set(md5) - set(xxh)}, "
        f"xxh-only={set(xxh) - set(md5)}"
    )


def test_xxh_jaccards_identical(pair_sets):
    """Verified Jaccard is computed from shingles (hash-independent): for
    every common pair the two entries must agree exactly."""
    md5 = pair_sets["dedup_minhash_lsh"]
    xxh = pair_sets["dedup_minhash_lsh_xxh"]
    diffs = {
        p: (md5[p], xxh[p])
        for p in set(md5) & set(xxh)
        if md5[p] != xxh[p]
    }
    assert not diffs


def test_pairs_nonempty(pair_sets):
    """The gate corpus plants near-duplicates — an empty pair set means
    the pipeline broke, not that the data is clean."""
    assert len(pair_sets["dedup_minhash_lsh"]) > 0
