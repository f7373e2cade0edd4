"""Skew-defense stress tests over a deliberately hot-keyed fixture:
one `source` holding 50% of the corpus (the blocked simhash join's
nightmare input) and sequential doc_ids. Asserts the salted join (a)
still produces each qualifying pair exactly once, (b) actually joins
on the salted composite key so no single reducer key carries the whole
hot block, and (c) spreads the hot block's rows evenly over the salt
buckets — the per-task row bound that keeps the plan alive at 100 TB."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from roblox_vector_search_datagen_spark.operators import dedup
from tests.test_plans import plan_of

N_DOCS = 200
HOT = "hot"  # 50% of docs land here; 4 cold sources share the rest


def _text(i: int) -> str:
    # unique word soup per doc (simhashes far apart), except three
    # injected exact duplicates inside the hot block
    if i in (10, 18, 26):
        return "dup dup words common to the three injected duplicates"
    return " ".join(f"w{i}x{j}" for j in range(12))


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("skewfixture")
    rows = [
        (
            i,
            _text(i),
            "en",
            HOT if i % 2 == 0 else f"cold{i % 4}",
            len(_text(i)),
        )
        for i in range(N_DOCS)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_salted_join_pairs_meet_exactly_once(spark, skew_dir):
    rows = dedup.simhash_near_dups(spark, skew_dir, max_hamming=0).collect()
    pairs = [(r.doc_a, r.doc_b) for r in rows]
    # replication of the b-side over the salt range must not duplicate
    # any pair: the a-side's salt is a function of doc_a, so each pair
    # matches exactly one replica
    assert len(pairs) == len(set(pairs))
    # the three injected duplicates (all in the hot block) are found
    assert {(10, 18), (10, 26), (18, 26)} <= set(pairs)


def test_join_key_is_salted_in_plan(spark, skew_dir):
    """The physical join must key on (source, salt) — if the salt ever
    drops out of the equi-join condition the whole hot block lands on
    one reducer key again."""
    p = plan_of(dedup.simhash_near_dups(spark, skew_dir))
    join_lines = [ln for ln in p.splitlines() if "Join" in ln or "keys" in ln]
    joined = " ".join(join_lines)
    assert re.search(r"salt", joined), p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_salt_bounds_per_key_rows_on_hot_block(spark, skew_dir):
    """With 50% of docs on one source, the largest (source, salt) key
    on the probe side must hold ~|hot|/salt_buckets rows, not |hot| —
    the deterministic version of what AQE skew-split would do. The
    fan-out is parallelism-derived (r13), floored at the historical
    SALT_BUCKETS, so the bucket count here matches the operator's."""
    n_salt = dedup.salt_buckets(spark)
    assert n_salt >= dedup.SALT_BUCKETS
    assert n_salt <= 64
    d = spark.read.parquet(f"{skew_dir}/documents.parquet").select(
        "doc_id",
        "source",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salt)).cast("int").alias("salt"),
    )
    per_key = d.groupBy("source", "salt").count().collect()
    hot_total = sum(r["count"] for r in per_key if r.source == HOT)
    hot_max = max(r["count"] for r in per_key if r.source == HOT)
    assert hot_total == N_DOCS // 2
    # fair share with 3x slack — catches a degenerate salt (constant,
    # or derived from the block key) without flaking on remainders
    # when |hot| is only a few rows per bucket
    assert hot_max <= 3 * (hot_total // n_salt + 1), per_key
    # and the hot block spreads over most buckets (all of them is not
    # guaranteed once buckets outnumber hot rows / ln(buckets))
    assert len({r.salt for r in per_key if r.source == HOT}) >= min(
        n_salt, hot_total
    ) // 2


def test_capped_postings_bound_bucket_width_at_scale(spark, skew_dir):
    """Every doc shares no shingle (unique word soup), except the three
    duplicates; with a df_cap far below the corpus size the inverted-
    index buckets stay narrow and only the true duplicates pair up."""
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            spark, skew_dir, threshold=0.5, df_cap=10
        ).collect()
    }
    assert set(pairs) == {(10, 18), (10, 26), (18, 26)}
    for j in pairs.values():
        assert j == pytest.approx(1.0, abs=1e-6)
    # the retained posting lists respect the cap (the per-bucket pair
    # work is <= C(df_cap, 2) no matter how hot the input)
    widths = (
        dedup._ngram_buckets(spark, skew_dir)
        .filter(F.size("docs") <= 10)
        .select(F.max(F.size("docs")).alias("w"))
        .collect()[0]
        .w
    )
    assert widths <= 10


@pytest.mark.slow
def test_repeated_spans_finds_injected_boilerplate(spark, tmp_path):
    """Docs sharing a boilerplate prefix must surface it as the top
    span; unique-text docs must contribute nothing."""
    from roblox_vector_search_datagen_spark.operators import textprep

    boiler = "subscribe to our newsletter for more updates"
    rows = []
    for i in range(6):
        body = " ".join(f"b{i}w{j}" for j in range(6))
        rows.append((i, f"{boiler} {body}", "en", "s", 0))
    for i in range(6, 12):
        rows.append((i, " ".join(f"u{i}w{j}" for j in range(12)), "en", "s", 0))
    d = tmp_path / "spanfix"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))

    got = textprep.repeated_spans(spark, str(d), n=5, min_docs=2, k=10).collect()
    assert got, "boilerplate span not detected"
    top = got[0]
    # the 7-word boilerplate yields three 5-gram spans, each in all 6
    # docs; ordering ties break on span text ascending
    assert top.n_docs == 6 and top.n_occurrences == 6
    spans = {r.span for r in got}
    assert "subscribe to our newsletter for" in spans
    assert all(r.n_docs >= 2 for r in got)


@pytest.fixture(scope="module")
def dupsat_dir(spark, tmp_path_factory):
    """Duplicate-saturated corpus: 100 of 160 docs share ONE text (all
    four simhash bands identical -> four buckets of 100), plus one
    true near-dup pair of unique docs, plus unique word soup."""
    d = tmp_path_factory.mktemp("dupsat")
    base = " ".join(f"near{j} tok{j}" for j in range(20))
    rows = []
    for i in range(100):
        rows.append((i, "the exact same duplicated document body", "en", "s", 40))
    # near-dup pair: long shared text, tiny difference -> small hamming
    rows.append((200, base + " tailone", "en", "s", 200))
    rows.append((201, base + " tailtwo", "en", "s", 200))
    for i in range(300, 358):
        rows.append((i, " ".join(f"u{i}w{j}" for j in range(12)), "en", "s", 100))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_simhash_band_cap_bounds_candidates_on_dup_saturated_corpus(spark, dupsat_dir):
    """Uncapped, the 100 identical docs alone produce C(100,2)=4950
    pairs; with the cap their buckets are dropped and candidate volume
    stays bounded by the cap while genuine near-dups (in cold buckets)
    still surface."""
    capped = dedup.simhash_banded_near_dups(spark, dupsat_dir, band_cap=50)
    rows = capped.collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    # the injected near-dup pair survives (its band buckets are cold)
    assert (200, 201) in pairs
    # the saturated block's quadratic blowup is fenced off: no pair of
    # identical docs (both ids < 100) appears, and total volume is far
    # below the uncapped 4950+
    assert not any(a < 100 and b < 100 for a, b in pairs)
    assert len(pairs) < 50 * 50
    # uncapped twin DOES explode — the cap is load-bearing
    uncapped = dedup.simhash_banded_near_dups(
        spark, dupsat_dir, band_cap=10**9
    ).count()
    assert uncapped >= 4950


def test_simhash_dropped_bands_reports_hot_buckets(spark, dupsat_dir):
    r = dedup.simhash_dropped_bands(spark, dupsat_dir, band_cap=50).collect()[0]
    # the 100 identical fingerprints occupy one bucket per band = 4 hot
    assert r.n_dropped == 4
    assert r.max_bucket == 100
    assert r.n_buckets > 4


def test_simhash_band_cap_adds_no_exchange(spark, dupsat_dir):
    """The cap is a window count whose (band, val) partitioning IS the
    self-join key: each side must shuffle exactly once on (band, val)
    — the cap must not introduce an extra exchange or turn the join
    into a product."""
    df = dedup.simhash_banded_near_dups(spark, dupsat_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in p and "bucket_n" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # one (band, val) exchange per self-join side, nothing more
    assert p.count("Exchange hashpartitioning(band") <= 2, p


@pytest.fixture(scope="module")
def dupsat_emb_dir(spark, tmp_path_factory):
    """Duplicate-saturated embedding corpus: 100 of 142 vectors are
    IDENTICAL (identical vectors share a sign bucket at ANY bit count
    -> one hot bucket), plus one true near-dup pair in a cold bucket,
    plus scattered noise."""
    d = tmp_path_factory.mktemp("dupsatemb")
    rows = []
    for i in range(100):
        rows.append((i, [1.0] * 64, 0))  # every block positive -> bucket 255
    near_a = [-1.0] * 8 + [1.0] * 56  # block0 negative -> bucket 254
    near_b = near_a[:63] + [0.5]
    rows.append((200, near_a, 1))
    rows.append((201, near_b, 1))
    for i in range(300, 340):
        # sign pattern from the id bits scatters the noise over buckets
        v = []
        for blk in range(8):
            s = 1.0 if (i >> blk) & 1 else -1.0
            v.extend([s * (0.5 + 0.01 * ((i + j) % 7)) for j in range(8)])
        rows.append((i, v, 2))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_embedding_lsh_bucket_cap_bounds_candidates(spark, dupsat_emb_dir):
    """Uncapped, the 100 identical vectors alone produce C(100,2)=4950
    same-bucket pairs at cosine 1.0; with the cap their bucket is
    dropped while the genuine near-dup pair (cold bucket) still
    surfaces."""
    capped = dedup.embedding_lsh_near_dups(spark, dupsat_emb_dir, bucket_cap=50)
    pairs = {(r.vec_a, r.vec_b) for r in capped.collect()}
    assert (200, 201) in pairs
    assert not any(a < 100 and b < 100 for a, b in pairs)
    assert len(pairs) < 50 * 50
    uncapped = dedup.embedding_lsh_near_dups(
        spark, dupsat_emb_dir, bucket_cap=10**9
    ).count()
    assert uncapped >= 4950


def test_embedding_lsh_bucket_cap_adds_no_exchange(spark, dupsat_emb_dir):
    """The cap is a window count whose `bucket` partitioning IS the
    self-join key — each side shuffles exactly once on bucket, no
    extra exchange, no product."""
    df = dedup.embedding_lsh_near_dups(spark, dupsat_emb_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in p and "bucket_n" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("Exchange hashpartitioning(bucket") <= 2, p


def test_minhash_band_cap_bounds_candidates_on_dup_saturated_corpus(spark, dupsat_dir):
    """The 100 identical docs share every minhash signature, so each
    band holds one 100-wide bucket: uncapped candidate volume is
    C(100,2)=4950+; the cap drops exactly those hot buckets and
    nothing else."""
    capped = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(spark, dupsat_dir, band_cap=50).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(spark, dupsat_dir, band_cap=10**9).collect()
    }
    assert len(uncapped) >= 4950
    assert not any(a < 100 and b < 100 for a, b in capped)
    assert capped <= uncapped
    # every pair the cap removed came from the saturated block
    assert all(a < 100 and b < 100 for a, b in uncapped - capped)


def test_minhash_band_cap_adds_no_exchange(spark, dupsat_dir):
    """The cap's window partitioning (band, sig) IS the self-join key:
    each side shuffles once on it, no extra exchange, no product."""
    df = dedup.lsh_candidate_pairs(spark, dupsat_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in p and "bucket_n" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("Exchange hashpartitioning(band") <= 2, p


def test_minhash_band_cap_boundary_on_random_duplication(spark, tmp_path):
    """Cap-boundary semantics on a randomly duplicated corpus:
    identical texts share EVERY band signature, so a duplication group
    wider than the cap saturates all its buckets and its pairs must
    vanish, while a group exactly AT the cap keeps all C(cap,2) pairs.
    Seeded, so deterministic."""
    import random

    rng = random.Random(11)
    cap = 5
    rows, groups, did = [], {}, 0
    for t, size in enumerate([1, 2, 5, 6, 9, 5, 1, 2]):
        words = " ".join(f"t{t}w{rng.randint(0, 10**6)}" for _ in range(12))
        groups[t] = (size, [])
        for _ in range(size):
            groups[t][1].append(did)
            rows.append((did, words, "en", "s", len(words)))
            did += 1
    d = str(tmp_path / "dupgroups")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(spark, d, band_cap=cap).collect()
    }
    for size, ids in groups.values():
        group_pairs = {
            (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
        }
        if size > cap:
            assert not (group_pairs & pairs), (size, group_pairs & pairs)
        elif size >= 2:
            assert group_pairs <= pairs, (size, group_pairs - pairs)


def test_connected_components_converges_on_deep_path_graph(spark):
    """A 120-node PATH graph (diameter 119) — the shape that broke the
    pre-pointer-jumping loop, which extended reach by one hop per round
    and silently returned an under-merged clustering after 25 rounds.
    With pointer jumping reach doubles per round (~7 rounds here), and
    non-convergence now raises instead of returning wrong labels."""
    n = 120
    edges = [(i, i + 1) for i in range(n - 1)]
    und = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges], "src long, dst long"
    )
    labels = {r.doc_id: r.cluster for r in dedup._connected_components(und).collect()}
    assert set(labels) == set(range(n))
    assert all(c == 0 for c in labels.values()), (
        f"under-merged: {sorted(set(labels.values()))[:5]}"
    )


@pytest.mark.slow
def test_dedup_clusters_matches_union_find_on_chain_corpus(spark, tmp_path):
    """End-to-end on a sliding-window near-dup chain: whatever edge set
    LSH produces, the Spark clustering must equal an independent python
    union-find over those same edges."""
    words = [f"w{j}" for j in range(140)]
    rows = []
    for i in range(80):
        text = " ".join(words[i : i + 40])
        rows.append((i, text, "en", "s", len(text)))
    d = str(tmp_path / "chain")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    edges = [(r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(spark, d).collect()]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {x: find(x) for x in parent}
    got = {r.doc_id: r.cluster for r in dedup.dedup_clusters(spark, d).collect()}
    assert got == truth


def test_lsh_dropped_buckets_reports_hot_buckets(spark, dupsat_dir):
    """The minhash band cap's observability twin: the 100 identical
    texts share every band signature, so each band contributes exactly
    one hot bucket the cap drops — saturation is visible, not silent."""
    from roblox_vector_search_datagen_spark.functions import hashing as H

    r = dedup.lsh_dropped_buckets(spark, dupsat_dir, band_cap=50).collect()[0]
    assert r.n_dropped == H.LSH_BANDS
    assert r.max_bucket == 100
    assert r.n_buckets > H.LSH_BANDS


def test_embedding_lsh_dropped_buckets_reports_hot_bucket(spark, dupsat_emb_dir):
    """The sign-LSH cap's observability twin: 100 identical vectors
    collapse into ONE hot sign bucket."""
    r = dedup.embedding_lsh_dropped_buckets(
        spark, dupsat_emb_dir, bucket_cap=50
    ).collect()[0]
    assert r.n_dropped == 1
    assert r.max_bucket == 100
    assert r.n_buckets > 1


@pytest.mark.slow
def test_repeated_substring_spans_recovers_maximal_boilerplate(spark, tmp_path):
    """The chained upgrade must recover a LONG shared template as ONE
    maximal span per doc (the fixed-width sibling fragments it into
    overlapping n-grams), with the exact start/length/text; unique
    docs and sub-threshold runs contribute nothing."""
    from roblox_vector_search_datagen_spark.operators import textprep

    boiler = " ".join(f"tpl{j}" for j in range(12))  # 12-word template
    rows = []
    for i in range(4):
        lead = " ".join(f"d{i}l{j}" for j in range(i + 1))  # varied offset
        tail = " ".join(f"d{i}t{j}" for j in range(5))
        rows.append((i, f"{lead} {boiler} {tail}", "en", "s", 0))
    for i in range(10, 16):
        rows.append((i, " ".join(f"u{i}w{j}" for j in range(20)), "en", "s", 0))
    d = tmp_path / "chainfix"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))

    got = textprep.repeated_substring_spans(
        spark, str(d), n=5, min_docs=2, min_words=7, k=20
    ).collect()
    assert len(got) == 4, got
    for r in got:
        assert r.len_words == 12
        assert r.span_text == boiler
        assert r.start_pos == r.doc_id + 2  # 1-based, after the lead words
    # the fixed-width sibling reports the same template only as 5-gram
    # fragments — 8 overlapping windows, none longer
    frag = textprep.repeated_spans(spark, str(d), n=5, min_docs=2, k=50).collect()
    assert all(len(r.span.split()) == 5 for r in frag)
    assert sum(1 for r in frag if r.span.split()[0].startswith("tpl")) == 8


def test_dedup_clusters_memoizes_default_invocations(spark, sf_dir):
    """The CC loop executes eagerly at build time and returns a
    checkpoint-backed leaf the CacheManager cannot substitute, so the
    session memo is the reuse mechanism: a second default call must
    return the SAME DataFrame (no re-iteration), a non-default
    max_iter must bypass the memo, and the memoized labels must stay
    correct."""
    from roblox_vector_search_datagen_spark.operators import dedup

    first = dedup.dedup_clusters(spark, sf_dir)
    again = dedup.dedup_clusters(spark, sf_dir)
    assert again is first
    assert dedup.dedup_clusters(spark, sf_dir, max_iter=24) is not first
    labels = {r.doc_id: r.cluster for r in first.collect()}
    assert all(c <= d for d, c in labels.items())
