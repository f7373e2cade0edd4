"""Partition-count invariance: the repo's determinism discipline
(integer micro-unit sums, 6-dp rounding before aggregation, explicit
tie-breaks) exists so results never depend on partition boundaries or
per-partition accumulation order — the property that makes a local
oracle compare meaningful for a 1000-executor plan. Pin it: the most
float-heavy queries must produce IDENTICAL normalized outputs when the
shuffle fans out over 3 vs 31 partitions (primes chosen to shift every
boundary)."""

from __future__ import annotations

import pytest

from roblox_vector_search_datagen_spark.plans.registry import QUERIES

from .oracle_utils import normalize

FLOAT_HEAVY = [
    "stats",
    "ivf_cluster_quality",
    "event_anomalies",
    "winsorized_event_stats",
    "bigram_lm_score",
    "dsir_weights",
    "mixture_report",
    "corpus_profile",
    "bm25_search",
    "unigram_logprob",
    "minhash_jaccard_estimates",
    "knn_label_accuracy",
    "bpe_fertility_report",
    # r9 late additions: quantized-mean silhouette, exp()-decay
    # economics, share/amplification ratios
    "ivf_silhouette",
    "repetition_budget_plan",
    "zone_map_pruning",
    "deletion_impact",
    "user_activity_entropy",
    "mixture_reweight",
    "funnel_within",
    "k_anonymity_report",
    # r10: scale ratio is float-bearing (per-row arithmetic, but the
    # enrollment rule is any float-bearing registry op)
    "media_resize_contract",
]


def _run(spark, sf_dir, name, n_shuffle):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
    try:
        df = QUERIES[name].builder(spark, sf_dir)
        return normalize(df.columns, [tuple(r) for r in df.collect()])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", FLOAT_HEAVY)
def test_partition_count_invariance(spark, sf_dir, name):
    cols3, rows3 = _run(spark, sf_dir, name, 3)
    cols31, rows31 = _run(spark, sf_dir, name, 31)
    assert cols3 == cols31
    assert rows3 == rows31, (
        f"{name}: result depends on partition count; first diff: "
        f"{next((a, b) for a, b in zip(rows3, rows31) if a != b)}"
    )


def test_bpe_training_is_partition_invariant(spark, sf_dir):
    """The learned merge TABLE (not just downstream floats) must not
    depend on shuffle fan-out: integer pair totals + (total DESC, a, b)
    tie-break make each round's argmax partition-independent. The memo
    is cleared between runs so both actually train."""
    from roblox_vector_search_datagen_spark.operators import textstats

    results = []
    old = spark.conf.get("spark.sql.shuffle.partitions")
    for n in (3, 31):
        textstats._BPE_MEMO.clear()
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            results.append(textstats._bpe_train(spark, sf_dir))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    textstats._BPE_MEMO.clear()
    assert results[0] == results[1]
    assert len(results[0]) == textstats.BPE_MERGES
