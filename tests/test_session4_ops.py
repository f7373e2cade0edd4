"""Invariant tests for the round-3 fourth-session operators
(snapshot_diff, dedup_representatives, shard_manifest,
embedding_dim_profile) — properties the DuckDB oracle parity can't
express, checked at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from roblox_vector_search_datagen_spark.operators import ann, dedup, layout, maintenance
from roblox_vector_search_datagen_spark.sources import tables


def test_snapshot_diff_statuses_partition_the_churn(spark, sf_dir):
    """added ids are absent from the old snapshot, removed ids are
    present in old but fail the post-merge prune, and changed rows
    carry at least one raised column flag."""
    diff = maintenance.snapshot_diff(spark, sf_dir)
    rows = diff.collect()
    assert rows, "snapshot_diff returned no rows"
    assert {r.status for r in rows} <= {"added", "removed", "changed"}

    old_ids = {r.universeId for r in tables.games(spark, sf_dir).select("universeId").collect()}
    flag_cols = [c for c in diff.columns if c.endswith("_changed")]
    for r in rows:
        if r.status == "added":
            assert r.universeId not in old_ids
        elif r.status == "removed":
            assert r.universeId in old_ids
        else:
            assert any(getattr(r, c) for c in flag_cols), r

    # no id appears twice
    ids = [r.universeId for r in rows]
    assert len(ids) == len(set(ids))


def test_snapshot_diff_changed_rows_match_merge_semantics(spark, sf_dir):
    """A changed row's raised flags must be consistent with the gather
    merge: only name/rootPlaceId can change for retained ids (plus
    playerCount/description flags never fire — gather preserves them)."""
    diff = maintenance.snapshot_diff(spark, sf_dir).filter(F.col("status") == "changed")
    bad = diff.filter(
        F.col("description_changed")
        | F.col("gameplayDescription_changed")
        | F.col("playerCount_changed")
    ).count()
    assert bad == 0


def test_dedup_representatives_one_keeper_per_cluster(spark, sf_dir):
    reps = dedup.dedup_representatives(spark, sf_dir)
    rows = reps.collect()
    n_docs = tables.load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs  # every document gets a verdict

    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for cluster, members in by_cluster.items():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1, f"cluster {cluster} has {len(keepers)} keepers"
        canon = {m.canonical_id for m in members}
        assert canon == {keepers[0].doc_id}
        assert keepers[0].doc_id in {m.doc_id for m in members}


def test_dedup_representatives_keeps_longest_member(spark, sf_dir):
    """The elected canonical is the longest-text member (doc_id
    tie-break), per the keep-most-complete-copy policy."""
    reps = dedup.dedup_representatives(spark, sf_dir)
    docs = tables.load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = reps.join(docs, "doc_id").collect()
    best = {}
    for r in joined:
        cur = best.get(r.cluster)
        key = (-r.n_chars, r.doc_id)
        if cur is None or key < cur[0]:
            best[r.cluster] = (key, r.doc_id)
    for r in joined:
        if r.keep:
            assert r.doc_id == best[r.cluster][1]


def test_shard_manifest_accounts_for_every_document(spark, sf_dir):
    m = layout.shard_manifest(spark, sf_dir)
    rows = m.collect()
    n_docs = tables.load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert len(rows) <= layout.SHUFFLE_SHARDS
    assert all(0 <= r.shard < layout.SHUFFLE_SHARDS for r in rows)


def test_shard_manifest_agrees_with_seeded_shuffle(spark, sf_dir):
    """The manifest's per-shard doc counts must equal the positional
    shuffle's — both derive from the same shard_assignments hash."""
    m = {r.shard: r.n_docs for r in layout.shard_manifest(spark, sf_dir).collect()}
    s = {
        r.shard: r.n
        for r in layout.seeded_shuffle(spark, sf_dir)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert m == s


def test_dedup_funnel_report_stage_consistency(spark, sf_dir):
    """The funnel's stage counts must be mutually consistent and agree
    with the standalone operators they summarize."""
    rep = {r.stage: r.n for r in dedup.dedup_funnel_report(spark, sf_dir).collect()}
    assert set(rep) == {
        "corpus_docs",
        "exact_dup_groups",
        "exact_dup_excess_docs",
        "lsh_candidate_pairs",
        "verified_dup_pairs",
        "near_dup_docs",
    }
    assert rep["corpus_docs"] == tables.load_table(spark, sf_dir, "documents").count()
    assert rep["lsh_candidate_pairs"] == dedup.lsh_candidate_pairs(spark, sf_dir).count()
    assert rep["verified_dup_pairs"] <= rep["lsh_candidate_pairs"]
    assert rep["near_dup_docs"] <= 2 * rep["verified_dup_pairs"]
    assert rep["exact_dup_excess_docs"] >= rep["exact_dup_groups"] or rep["exact_dup_groups"] == 0
    # every verified pair implies both members are exact or near dups
    if rep["verified_dup_pairs"] > 0:
        assert rep["near_dup_docs"] >= 2


def test_index_build_report_consistency(spark, sf_dir):
    """The build report's metrics must agree with the per-cell quality
    table it summarizes."""
    rep = {r.metric: r.value for r in ann.index_build_report(spark, sf_dir).collect()}
    cells = ann.ivf_cluster_quality(spark, sf_dir).collect()
    assert rep["n_vectors"] == sum(c.n_members for c in cells)
    assert rep["nonempty_cells"] == len(cells)
    assert rep["min_cell_size"] == min(c.n_members for c in cells)
    assert rep["max_cell_size"] == max(c.n_members for c in cells)
    assert rep["cell_balance"] >= 1.0
    assert -1.0 <= rep["mean_member_cosine"] <= 1.0
    assert rep["nlist"] == ann.IVF_K


def test_pack_efficiency_report_consistency(spark, sf_dir):
    """Per-split token totals must agree with pack_sequences, waste is
    bounded by one budget per shard, and waste_rate is a proportion."""
    from roblox_vector_search_datagen_spark.operators import textprep

    rep = {r.split: r for r in textprep.pack_efficiency_report(spark, sf_dir).collect()}
    packed = (
        textprep.pack_sequences(spark, sf_dir)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tot"))
        .collect()
    )
    for p in packed:
        r = rep[p.split]
        assert r.n_docs == p.n_docs
        assert r.total_tokens == p.tot
        assert r.n_sequences * textprep.PACK_BUDGET_TOKENS >= r.total_tokens
        assert r.tail_waste_tokens == r.n_sequences * textprep.PACK_BUDGET_TOKENS - r.total_tokens
        assert 0.0 <= r.waste_rate < 1.0


def test_token_length_histogram_partitions_corpus(spark, sf_dir):
    from roblox_vector_search_datagen_spark.operators import textstats

    rows = textstats.token_length_histogram(spark, sf_dir).collect()
    n_docs = tables.load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    bins = [r.bin for r in rows]
    assert len(bins) == len(set(bins))
    for r in rows:
        assert r.lo_tokens <= r.hi_tokens
        assert r.n_docs * r.lo_tokens <= r.total_tokens <= r.n_docs * r.hi_tokens


def test_embedding_outliers_are_the_k_most_isolated(spark, sf_dir):
    out = ann.embedding_outliers(spark, sf_dir).collect()
    assert len(out) == ann.OUTLIER_K
    cosines = [r.cosine for r in out]
    assert cosines == sorted(cosines)  # most isolated first
    assert all(r.z < 0 for r in out)  # all below the mean cosine
    # the queue's worst member bounds everything not in the queue
    assign = ann.ivf_assignments(spark, sf_dir)
    n_below = assign.filter(F.col("cosine") < cosines[-1]).count()
    assert n_below <= ann.OUTLIER_K


def test_dup_graph_degrees_sum_to_pair_endpoints(spark, sf_dir):
    """Sum of degree*n_docs must equal 2x the candidate pair count
    (every pair contributes one degree to each endpoint)."""
    rows = dedup.dup_graph_degrees(spark, sf_dir).collect()
    n_pairs = dedup.lsh_candidate_pairs(spark, sf_dir).count()
    assert sum(r.degree * r.n_docs for r in rows) == 2 * n_pairs
    assert all(r.degree >= 1 for r in rows)


def test_embedding_dim_profile_bounds_and_counts(spark, sf_dir):
    prof = ann.embedding_dim_profile(spark, sf_dir).collect()
    n_vecs = (
        tables.load_table(spark, sf_dir, "embeddings")
        .filter(F.size("embedding") == 64)
        .count()
    )
    assert len(prof) == 64
    for r in prof:
        assert r.n >= n_vecs  # 64-dim vectors all contribute to every pos < 64
        assert r.mn <= r.mean <= r.mx
        assert r.std >= 0.0
        # quantization error bound: std can't exceed half the range + grid
        assert r.std <= (r.mx - r.mn) / 2 + 1e-5


def test_argmax_centroid_null_cosine_falls_to_smallest_cent_id(spark):
    """The max_by struct-ordering rewrite's NULL arm, pinned on literal
    rows (the shipped embeddings fixture has no zero-norm vectors, so
    without this a struct-field reorder regressing the semantics would
    ship undetected — the batch twin of
    test_nearest_centroid_expr_zero_norm_degrades_to_null):
    - all-NULL cosines (zero-norm vector): smallest cent_id, NULL cos
    - mixed NULLs: any non-NULL cosine beats every NULL
    - exact ties: smallest cent_id wins."""
    from roblox_vector_search_datagen_spark.operators.ann import _argmax_centroid

    scored = spark.createDataFrame(
        [
            # vec 1: all cosines NULL -> (cent 2, NULL)
            (1, 5, None),
            (1, 2, None),
            (1, 9, None),
            # vec 2: NULL loses to a worse non-NULL -> (cent 7, -0.5)
            (2, 3, None),
            (2, 7, -0.5),
            # vec 3: exact tie -> smallest cent_id -> (cent 4, 0.25)
            (3, 8, 0.25),
            (3, 4, 0.25),
            (3, 6, -1.0),
        ],
        "vec_id long, cent_id long, cosine double",
    )
    got = {r.vec_id: (r.cent_id, r.cosine) for r in _argmax_centroid(scored).collect()}
    assert got == {1: (2, None), 2: (7, -0.5), 3: (4, 0.25)}
    # with_cosine=False drops the column but keeps the same argmax
    got2 = {
        r.vec_id: r.cent_id
        for r in _argmax_centroid(scored, with_cosine=False).collect()
    }
    assert got2 == {1: 2, 2: 7, 3: 4}
