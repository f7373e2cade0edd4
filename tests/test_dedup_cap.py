"""Posting-list cap semantics for ngram_jaccard_pairs: a super-frequent
shingle must not generate pairs (the skew cliff), and the Jaccard
denominator must shrink symmetrically (union over retained shingles
only)."""

from __future__ import annotations

import pytest

from roblox_vector_search_datagen_spark.operators import dedup

# word 3-grams:
#   doc 1: {a b c, b c x, c x y, x y z}
#   doc 2: {a b c, b c q, c q x, q x y, x y z}
#   doc 3: {p p2 p3, p2 p3 x, p3 x y, x y z}
#   doc 4: {r r2 r3, r2 r3 x, r3 x y, x y z}
# "x y z" appears in all 4 docs (the hot shingle).
DOCS = [
    (1, "a b c x y z"),
    (2, "a b c q x y z"),
    (3, "p p2 p3 x y z"),
    (4, "r r2 r3 x y z"),
]

@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("hotshingle")
    spark.createDataFrame(DOCS, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)

def _pairs(spark, hot_dir, df_cap):
    rows = dedup.ngram_jaccard_pairs(spark, hot_dir, threshold=0.05, df_cap=df_cap).collect()
    return {(r.doc_a, r.doc_b): r.jaccard for r in rows}

def test_uncapped_includes_hot_pairs(spark, hot_dir):
    got = _pairs(spark, hot_dir, df_cap=100)
    # every doc pair shares at least "x y z"
    assert set(got) == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    assert got[(1, 2)] == pytest.approx(2 / 7, abs=1e-6)
    assert got[(3, 4)] == pytest.approx(1 / 7, abs=1e-6)

def test_cap_drops_hot_shingle_pairs(spark, hot_dir):
    got = _pairs(spark, hot_dir, df_cap=3)
    # docs 3/4 shared ONLY the hot shingle -> no pair at all; docs 1/2
    # still pair on "a b c" with the union recomputed over retained
    # shingles (3 and 4 of them respectively): 1 / (3 + 4 - 1)
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == pytest.approx(1 / 6, abs=1e-6)

def test_dropped_shingles_report(spark, hot_dir):
    row = dedup.ngram_dropped_shingles(spark, hot_dir, df_cap=3).collect()[0]
    assert row.n_dropped == 1
    assert row.max_df == 4
    # {a b c} + 3 uniques per doc + hot = 1 + 1 + 3 + 3 + 3 + 1... count
    # distinct shingles across docs instead of hand-adding:
    distinct = {s for _, t in DOCS for s in _shingles(t)}
    assert row.n_buckets == len(distinct)

def _shingles(text: str, n: int = 3):
    w = text.split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
