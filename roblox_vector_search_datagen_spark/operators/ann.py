"""Similarity search over the embeddings table: brute-force cosine
top-k (the exact baseline) and an IVF-style partition-probing variant
(the 100 TB path).

Brute force is a narrow scan + TakeOrderedAndProject: per-partition
heaps, k rows to the driver per partition, no global sort. The IVF
variant prunes the scan to the probed partitions *before* scoring —
with the table bucketed/partitioned by list id, partition pruning makes
that a physical-file skip, which is the actual point of IVF on a
cluster: score 1/nlist of the bytes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import parallelism
from ..functions import vector as V
from ..functions import warehouse
from ..functions.caching import persist_if
from ..functions.num import qmean6, qsum6
from ..sources import tables

def ann_topk(
    spark: SparkSession, sf_dir: str, query_text: str = "vector similarity search", k: int = 20
) -> DataFrame:
    """Exact brute-force cosine top-k over embeddings, decorated with
    the matching document row (two-phase: rank narrow, join tiny)."""
    qv = V.vector_lit(V.embed_query(query_text))
    e = tables.load_table(spark, sf_dir, "embeddings")
    scored = e.select(
        "vec_id", "label", F.round(V.cosine_expr(F.col("embedding"), qv), 6).alias("cosine")
    )
    topk = scored.orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id")).limit(k)
    docs = tables.load_table(spark, sf_dir, "documents")
    return (
        docs.join(F.broadcast(topk), docs["doc_id"] == topk["vec_id"], "inner")
        .select("vec_id", "label", "cosine", "doc_id", "source", "lang")
    )

ANN_LSH_PROBE_HAMMING = 1


def _py_sign_bucket(vec: list[float], bits: int) -> int:
    """Python twin of dedup._sign_bucket_expr for a literal query
    vector: same block partitioning, same left-to-right double
    accumulation, same >= 0 sign rule."""
    dims_per = len(vec) // bits
    bucket = 0
    for j in range(bits):
        s = 0.0
        for x in vec[j * dims_per : (j + 1) * dims_per]:
            s += x
        if s >= 0:
            bucket |= 1 << j
    return bucket


def ann_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    query_text: str = "vector similarity search",
    k: int = 20,
    probe_hamming: int = ANN_LSH_PROBE_HAMMING,
) -> DataFrame:
    """Sign-LSH bucketed approximate top-k — the query-time path of the
    random-hyperplane index that `embedding_lsh_near_dups` uses for
    dedup blocking, complementing the IVF family (`ann_ivf_topk`): no
    trained centroids, just the vector's own sign bits, which makes it
    the index you can query before any training pass has run.

    The query's bucket and its multi-probe set (all buckets within
    Hamming distance `probe_hamming` — the standard recall lever,
    cf. Lv et al. VLDB'07 multi-probe LSH) are computed driver-side
    from the LITERAL query vector and pushed into the scan as an IN
    filter: with the corpus stored bucket-partitioned (the layout
    `shard_manifest`/`events_zorder` model), that filter is partition
    pruning — the scan itself shrinks to probes/2^bits of the corpus,
    and only probed rows are ever scored. Emits (vec_id, bucket,
    cosine)."""
    from .dedup import LSH_SIGN_BITS, _sign_bucket_expr

    qv_list = V.embed_query(query_text)
    q_bucket = _py_sign_bucket(qv_list, LSH_SIGN_BITS)
    probes = sorted(
        q_bucket ^ m
        for m in range(1 << LSH_SIGN_BITS)
        if bin(m).count("1") <= probe_hamming
    )
    e = tables.load_table(spark, sf_dir, "embeddings")
    qv = V.vector_lit(qv_list)
    scored = e.select(
        "vec_id",
        _sign_bucket_expr(F.col("embedding")).cast("int").alias("bucket"),
        F.round(V.cosine_expr(F.col("embedding"), qv), 6).alias("cosine"),
    ).filter(F.col("bucket").isin(probes))
    return scored.orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id")).limit(k)


def _lsh_bucket_sql(emb_d: str) -> str:
    from .dedup import LSH_SIGN_BITS

    dims_per = GEN_DIM // LSH_SIGN_BITS
    return " + ".join(
        f"CASE WHEN list_sum({emb_d}[{j * dims_per + 1}:{(j + 1) * dims_per}]) >= 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j in range(LSH_SIGN_BITS)
    )


def ann_lsh_topk_oracle(
    query_text: str = "vector similarity search",
    k: int = 20,
    probe_hamming: int = ANN_LSH_PROBE_HAMMING,
) -> str:
    from .dedup import LSH_SIGN_BITS

    qv_list = V.embed_query(query_text)
    q_bucket = _py_sign_bucket(qv_list, LSH_SIGN_BITS)
    probes = sorted(
        q_bucket ^ m
        for m in range(1 << LSH_SIGN_BITS)
        if bin(m).count("1") <= probe_hamming
    )
    qv = V.vector_sql_literal(qv_list)
    cos = V.cosine_sql("embedding", f"{qv}")
    return f"""
WITH eb AS (
  SELECT vec_id, embedding,
         CAST({_lsh_bucket_sql("CAST(embedding AS DOUBLE[])")} AS INT) AS bucket
  FROM embeddings
)
SELECT vec_id, bucket, round({cos}, 6) AS cosine
FROM eb WHERE bucket IN ({", ".join(str(p) for p in probes)})
ORDER BY cosine DESC NULLS LAST, vec_id LIMIT {k}
"""


def ann_lsh_recall_at_k(
    spark: SparkSession,
    sf_dir: str,
    query_text: str = "vector similarity search",
    k: int = 20,
    probe_hamming: int = ANN_LSH_PROBE_HAMMING,
) -> DataFrame:
    """Recall@k of the sign-LSH probe path against the exact top-k —
    the `ann_recall_at_k` companion that decides probe_hamming before
    the LSH index is trusted. Both rankings are narrow top-k plans;
    the overlap join touches 2k rows. Emits (k, n_overlap, recall)."""
    qv = V.vector_lit(V.embed_query(query_text))
    e = tables.load_table(spark, sf_dir, "embeddings")
    scored = e.select(
        "vec_id", F.round(V.cosine_expr(F.col("embedding"), qv), 6).alias("cosine")
    )
    exact = (
        scored.orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id"))
        .limit(k)
        .select("vec_id")
    )
    approx = ann_lsh_topk(spark, sf_dir, query_text, k, probe_hamming).select("vec_id")
    return exact.join(approx, "vec_id").agg(
        F.lit(k).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_overlap"),
        F.round(F.count(F.lit(1)) / F.lit(float(k)), 6).alias("recall"),
    )


def ann_lsh_recall_at_k_oracle(
    query_text: str = "vector similarity search",
    k: int = 20,
    probe_hamming: int = ANN_LSH_PROBE_HAMMING,
) -> str:
    qv = V.vector_sql_literal(V.embed_query(query_text))
    cos = V.cosine_sql("embedding", f"{qv}")
    lsh = ann_lsh_topk_oracle(query_text, k, probe_hamming)
    return f"""
WITH exact AS (
  SELECT vec_id FROM embeddings
  ORDER BY round({cos}, 6) DESC NULLS LAST, vec_id LIMIT {k}
),
approx AS (SELECT vec_id FROM ({lsh}) t)
SELECT CAST({k} AS INT) AS k, CAST(count(*) AS BIGINT) AS n_overlap,
       round(count(*) / CAST({k} AS DOUBLE), 6) AS recall
FROM exact JOIN approx USING (vec_id)
"""


def ann_topk_oracle(query_text: str = "vector similarity search", k: int = 20) -> str:
    qv = V.vector_sql_literal(V.embed_query(query_text))
    cos = V.cosine_sql("embedding", f"{qv}")
    return f"""
WITH topk AS (
  SELECT vec_id, label, round({cos}, 6) AS cosine
  FROM embeddings
  ORDER BY cosine DESC NULLS LAST, vec_id LIMIT {k}
)
SELECT t.vec_id, t.label, t.cosine, d.doc_id, d.source, d.lang
FROM topk t JOIN documents d ON d.doc_id = t.vec_id
"""

def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    query_text: str = "vector similarity search",
    k: int = 20,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: `label` plays the coarse-quantizer
    cell id; each cell's representative is the embedding of its minimum
    vec_id (deterministic seed centroid). The query scores the
    representatives, picks `nprobe` cells, and brute-forces only those
    cells — at scale that filter is partition pruning on the storage
    layout, i.e. the scan itself shrinks by nlist/nprobe.
    """
    qv = V.vector_lit(V.embed_query(query_text))
    e = tables.load_table(spark, sf_dir, "embeddings")

    reps = (
        e.groupBy("label").agg(F.min("vec_id").alias("rep_id"))
        .join(e.select(F.col("vec_id").alias("rep_id"), F.col("embedding").alias("rep_emb")), "rep_id")
    )
    probed = (
        reps.select(
            "label", F.round(V.cosine_expr(F.col("rep_emb"), qv), 6).alias("rep_cos")
        )
        .orderBy(F.col("rep_cos").desc_nulls_last(), F.col("label"))
        .limit(nprobe)
        .select("label")
    )
    scored = (
        e.join(F.broadcast(probed), "label")  # partition pruning at scale
        .select("vec_id", "label", F.round(V.cosine_expr(F.col("embedding"), qv), 6).alias("cosine"))
    )
    return scored.orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id")).limit(k)

def ann_ivf_topk_oracle(
    query_text: str = "vector similarity search", k: int = 20, nprobe: int = 2
) -> str:
    qv = V.vector_sql_literal(V.embed_query(query_text))
    cos_emb = V.cosine_sql("embedding", f"{qv}")
    cos_rep = V.cosine_sql("r.embedding", f"{qv}")
    return f"""
WITH reps AS (
  SELECT e.label, min(e.vec_id) AS rep_id FROM embeddings e GROUP BY e.label
),
probed AS (
  SELECT reps.label FROM reps JOIN embeddings r ON r.vec_id = reps.rep_id
  ORDER BY round({cos_rep}, 6) DESC NULLS LAST, reps.label LIMIT {nprobe}
)
SELECT e.vec_id, e.label, round({cos_emb}, 6) AS cosine
FROM embeddings e JOIN probed p ON e.label = p.label
ORDER BY cosine DESC NULLS LAST, vec_id LIMIT {k}
"""

# ---------------------------------------------------------------------------
# Bulk index build (the north star's "DataFrame batch vector generation
# + bulk index build" — the offline half of IVF)
# ---------------------------------------------------------------------------

IVF_K = 16

def _argmax_centroid(scored: DataFrame, with_cosine: bool = True) -> DataFrame:
    """Per-vector argmax over (vec_id, cent_id, cosine) triples: max
    cosine, NULLs last, ties to the smallest cent_id — exactly the
    row_number() ordering every IVF oracle pins, expressed as a max_by
    aggregation. The ordering struct (cosine, -cent_id) reproduces the
    window's semantics because struct comparison ranks NULL below any
    value (so a NULL cosine loses to every non-NULL — DESC NULLS
    LAST) and the negated id breaks exact-cosine ties toward the
    smallest cent_id; with the full tie-break the ordering is total,
    so max_by is deterministic. One hash aggregation with map-side
    partial combine instead of sort + partial/final WindowGroupLimit
    sorts — same single vec_id shuffle, no sort buffers, measured ~2x
    less per-row work on the K-way scored stream."""
    best = F.max_by(
        F.struct("cent_id", "cosine"),
        F.struct(F.col("cosine"), (-F.col("cent_id")).alias("neg")),
    ).alias("best")
    out = scored.groupBy("vec_id").agg(best)
    cols = ["vec_id", F.col("best.cent_id").alias("cent_id")]
    if with_cosine:
        cols.append(F.col("best.cosine").alias("cosine"))
    return out.select(*cols)


def _centroid_scored(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """(vec_id, cent_id, cosine): every vector scored against the K
    seed centroids — the shared subtree under `ivf_assignments` and
    `ivf_silhouette`; one definition so rounding/seeding can never
    drift between the assignment and the quality metric."""
    e = tables.load_table(spark, sf_dir, "embeddings")
    cents = F.broadcast(
        e.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
        )
    )
    # layout repair only (no-op on healthy scans): the K-way cosine
    # scoring is the family's CPU-heavy per-row stage, and the fixture
    # scan is one split; keying on vec_id makes the added exchange the
    # same one _argmax_centroid's groupBy(vec_id) needs anyway
    probe = parallelism.spread_scan(spark, sf_dir, e, "embeddings", "vec_id")
    return probe.crossJoin(cents).selectExpr(
        "vec_id",
        "cent_id",
        f"round({V.cosine_expr_sql('embedding', 'cent')}, 6) AS cosine",
    )


def _scored_sql(k: int) -> str:
    """The cents/scored CTE pair (with per-vector rank) shared by
    `ivf_assignments_oracle` and `ivf_silhouette_oracle` — the SQL twin
    of `_centroid_scored`."""
    cos = V.cosine_sql("e.embedding", "c.cent")
    return f"""cents AS (
  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id < {k}
),
scored AS (
  SELECT e.vec_id, c.cent_id, round({cos}, 6) AS cosine,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({cos}, 6) DESC NULLS LAST, c.cent_id) AS rn
  FROM embeddings e CROSS JOIN cents c
)"""


def ivf_assignments(spark: SparkSession, sf_dir: str, k: int = IVF_K) -> DataFrame:
    """IVF bulk build, assignment step: K deterministic seed centroids
    (the embeddings of the K smallest vec_ids — a k-means++-free seeding
    that keeps the oracle exact), every vector assigned to its
    max-cosine centroid.

    Physical shape: the K×dim centroid table broadcasts with the task
    closures; assignment is ONE scan of the vector table producing n×K
    scored rows pruned to n by a per-vector argmax window. At 100 TB the
    scan dominates and parallelizes per partition; no shuffle touches
    the full vector payload (the window keys are (vec_id, cosine))."""
    from pyspark.sql import Window

    scored = _centroid_scored(spark, sf_dir, k)
    # persisted: ivf_centroid_update, ivf_cluster_quality,
    # index_build_report, embedding_outliers and semantic_dedup all
    # build on this assignment pass — the cache manager substitutes one
    # materialization across them by canonicalized-plan equality
    return persist_if(_argmax_centroid(scored), k == IVF_K)

def ivf_assignments_oracle(k: int = IVF_K) -> str:
    return f"""
WITH {_scored_sql(k)}
SELECT vec_id, cent_id, cosine FROM scored WHERE rn = 1
"""

GEN_DIM = 64

def generate_vectors(spark: SparkSession, sf_dir: str, dim: int = GEN_DIM) -> DataFrame:
    """DataFrame batch vector generation: the deterministic encoder
    (functions/vector.py:embed_query — the S16 stub, reference
    generateEmbeddings.ts:53-96) applied to the whole documents corpus
    as a pure-Catalyst projection — md5-seeded uniform components, no
    Python, no HTTP. At 100 TB this is the offline half of the
    embedding pipeline: a scan-fused per-row expression with zero
    shuffles whose output feeds the index builds directly (a real
    model encoder slots in as the mapInPandas variant in sources/http.py
    embed_texts; this operator pins the distributed plumbing + layout).
    Emits (doc_id, embedding ARRAY<DOUBLE>[dim])."""
    d = parallelism.spread_scan(
        spark, sf_dir, tables.load_table(spark, sf_dir, "documents"), "documents"
    )
    comp = lambda i: F.round(
        F.conv(F.substring(F.md5(F.concat(F.col("text"), F.lit(":"), i)), 1, 8), 16, 10).cast(
            "long"
        )
        / F.lit(4294967296.0)
        - 0.5,
        6,
    )
    emb = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda i: comp(i.cast("string")))
    return d.select("doc_id", emb.alias("embedding"))

def generate_vectors_summary(spark: SparkSession, sf_dir: str, dim: int = GEN_DIM) -> DataFrame:
    """Driver-facing projection of generate_vectors: one row per doc
    with (dim, norm2, pos_dot). The raw array column is hostile to the
    driver's canonicalizer (pandas sort over list cells) and exploding
    to (doc_id, pos, component) made the bench collect dim× more rows —
    so the correctness surface is a per-doc checksum pair instead:
    norm2 = Σ c_i², pos_dot = Σ i·c_i. Every component enters both sums
    (a changed value or position shifts at least one), both engines
    accumulate in identical element order over pre-rounded components,
    and the output stays |documents| rows. Pure-Catalyst, zero
    shuffles, same plan shape as the array producer."""
    d = generate_vectors(spark, sf_dir, dim)
    emb = F.col("embedding")
    norm2 = F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x * x)
    pos_dot = F.aggregate(
        F.transform(emb, lambda x, i: x * i.cast("double")), F.lit(0.0), lambda acc, x: acc + x
    )
    return d.select(
        "doc_id",
        F.size(emb).alias("dim"),
        F.round(norm2, 6).alias("norm2"),
        F.round(pos_dot, 6).alias("pos_dot"),
    )

def generate_vectors_oracle(dim: int = GEN_DIM) -> str:
    h = "(('0x' || substring(md5(text || ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT)"
    return f"""
WITH v AS (
  SELECT doc_id,
         list_transform(range(0, {dim}), i -> round({h} / 4294967296.0 - 0.5, 6)) AS emb
  FROM documents
)
SELECT doc_id, CAST(len(emb) AS INT) AS dim,
       round(list_dot_product(emb, emb), 6) AS norm2,
       round(list_dot_product(emb, list_transform(range(0, {dim}), i -> CAST(i AS DOUBLE))), 6) AS pos_dot
FROM v
"""

KNN_QUERIES = 5
KNN_K = 10

def knn_join(
    spark: SparkSession, sf_dir: str, n_queries: int = KNN_QUERIES, k: int = KNN_K
) -> DataFrame:
    """Batch k-NN join: top-k cosine neighbors for EVERY query vector in
    one pass — the retrieval-augmentation / hard-negative-mining shape
    (N queries × corpus), vs. ann_topk's single online query.

    Physical shape: the query block broadcasts (a query batch is MBs
    against a 100 TB corpus), the corpus scans once, and ranking is
    TWO-STAGE. A single per-query rank window would funnel every
    scored row into n_queries reducer partitions — the first thing to
    break at 100x corpus x small query batch. Stage 1 ranks on
    (scan-partition id, query_id): reducer-key cardinality is
    n_partitions x n_queries (no funnel, no skew) and it emits at most
    k rows per (partition, query). Stage 2 re-ranks only those
    n_partitions x k survivors per query — a superset of the true
    top-k by construction, so results are identical to the one-stage
    plan (oracle unchanged). Shuffled rows are narrow (query_id,
    vec_id, cosine) triples — the vector payload is projected away
    before any exchange."""
    e = tables.load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
    )
    scored = (
        parallelism.spread_scan(
            spark, sf_dir, e.filter(F.col("vec_id") >= n_queries), "embeddings"
        )
        .crossJoin(q)
        .selectExpr(
            "query_id",
            "vec_id",
            f"round({V.cosine_expr_sql('embedding', 'q_emb')}, 6) AS cosine",
            # materialized as a column so the (deterministic) reference
            # can key the local window; the id itself is assigned at
            # scan time, before any exchange
            "spark_partition_id() AS _pid",
        )
    )
    order = (F.col("cosine").desc_nulls_last(), F.col("vec_id"))
    w_local = Window.partitionBy("_pid", "query_id").orderBy(*order)
    local = (
        scored.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .select("query_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )

def knn_join_oracle(n_queries: int = KNN_QUERIES, k: int = KNN_K) -> str:
    cos = V.cosine_sql("e.embedding", "q.q_emb")
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.query_id, e.vec_id, round({cos}, 6) AS cosine,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY round({cos}, 6) DESC NULLS LAST, e.vec_id) AS rank
  FROM embeddings e CROSS JOIN q WHERE e.vec_id >= {n_queries}
)
SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM scored WHERE rank <= {k}
"""

def knn_label_accuracy(
    spark: SparkSession, sf_dir: str, n_queries: int = KNN_QUERIES, k: int = KNN_K
) -> DataFrame:
    """Embedding-quality evaluation by neighbor label agreement: for
    each held-out query vector, what fraction of its exact top-k cosine
    neighbors carries the query's own label — the standard k-NN
    classification proxy a pipeline reads before trusting an embedding
    model for dedup/clustering (a space whose neighbors ignore labels
    will near-dup unrelated docs). The reference ships embeddings but
    no intrinsic eval (src/lib/vectorSearch.ts stops at retrieval);
    this is the missing acceptance gate, the label-space companion of
    `ann_recall_at_k` (which scores the INDEX against brute force —
    this scores the SPACE against external labels).

    Physical shape: rides `knn_join`'s two-stage top-k (query block
    broadcast, one corpus scan, no reducer funnel). The n_queries x k
    result is tiny at any corpus size, so it broadcasts into the
    column-pruned (vec_id, label) scan for neighbor labels; query
    labels come from the same narrow scan pre-filtered to the query
    block (n_queries rows, broadcast). The final aggregation is over
    n_queries x k rows — driver-table-sized. Emits per query-label
    (label, n_queries, n_neighbors, n_matching, match_rate)."""
    e = tables.load_table(spark, sf_dir, "embeddings")
    labels = e.select("vec_id", "label")
    q_labels = F.broadcast(
        labels.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
        )
    )
    knn = knn_join(spark, sf_dir, n_queries, k)
    matched = (
        labels.join(F.broadcast(knn), "vec_id")
        .join(q_labels, "query_id")
        .select(
            "query_id",
            "q_label",
            (F.col("label") == F.col("q_label")).cast("long").alias("m"),
        )
    )
    return (
        matched.groupBy("q_label")
        .agg(
            F.countDistinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("n_neighbors"),
            F.sum("m").alias("n_matching"),
            F.round(F.sum("m") / F.count(F.lit(1)), 6).alias("match_rate"),
        )
        .select(
            F.col("q_label").alias("label"),
            "n_queries",
            "n_neighbors",
            "n_matching",
            "match_rate",
        )
    )

def knn_label_accuracy_oracle(n_queries: int = KNN_QUERIES, k: int = KNN_K) -> str:
    return f"""
WITH knn AS ({knn_join_oracle(n_queries, k)}),
lab AS (SELECT vec_id, label FROM embeddings)
SELECT q.label AS label,
       CAST(count(DISTINCT kn.query_id) AS BIGINT) AS n_queries,
       CAST(count(*) AS BIGINT) AS n_neighbors,
       CAST(sum(CASE WHEN n.label = q.label THEN 1 ELSE 0 END) AS BIGINT) AS n_matching,
       round(sum(CASE WHEN n.label = q.label THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS match_rate
FROM knn kn
JOIN lab n ON n.vec_id = kn.vec_id
JOIN lab q ON q.vec_id = kn.query_id
GROUP BY q.label
"""

# ---------------------------------------------------------------------------
# Product quantization (encode + ADC scan) — the compressed-index path
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces
PQ_DSUB = 64 // PQ_M  # dims per subspace
PQ_NCODES = 16  # centroids per subspace codebook

def _l2sq_expr(a, b) -> F.Column:
    """Σ (aᵢ-bᵢ)² with sequential double accumulation (mirrors the
    oracle's list_sum over an in-order transform)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v
    )

def _l2sq_expr_sql(a: str, b: str) -> str:
    """Spark-SQL text twin of _l2sq_expr (one parse round-trip; see
    functions/vector.py for the pattern and why the init is cast)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )

def _subvectors(df: DataFrame, id_col: str, out_id: str) -> DataFrame:
    """(id, m, sub): each vector split into PQ_M contiguous 8-dim double
    blocks. Explode of a literal sequence — output partitioning inherits
    the scan, no shuffle."""
    return df.selectExpr(
        f"{id_col} AS {out_id}",
        "embedding",
        f"explode(sequence(0, {PQ_M - 1})) AS m",
    ).selectExpr(
        out_id,
        "m",
        f"transform(slice(embedding, m * {PQ_DSUB} + 1, {PQ_DSUB}),"
        " x -> CAST(x AS DOUBLE)) AS sub",
    )

def _pq_codebook(e: DataFrame) -> DataFrame:
    """(m, cent_id, cent_sub): deterministic seed codebook — the
    sub-vectors of the PQ_NCODES smallest vec_ids (same seeding contract
    as ivf_assignments, keeps the oracle exact). K×M rows — broadcasts."""
    return _subvectors(e.filter(F.col("vec_id") < PQ_NCODES), "vec_id", "cent_id").select(
        "m", "cent_id", F.col("sub").alias("cent_sub")
    )

def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode: nearest codebook entry per (vector, subspace) by L2,
    emitted flat as (vec_id, m, code) — 8 one-byte codes replace 64
    floats, a 32× index compression.

    Physical shape: ONE corpus scan fans out to n×M sub-vector rows,
    the K×M codebook broadcasts, and the argmin is a map-side-combined
    min(struct(dist, cent_id)) aggregation — candidates collapse to one
    row per (vec_id, m) BEFORE the only exchange, so shuffle volume is
    n×M narrow rows independent of K."""
    e = tables.load_table(spark, sf_dir, "embeddings")
    subs = _subvectors(e, "vec_id", "vec_id")
    scored = subs.join(F.broadcast(_pq_codebook(e)), "m").selectExpr(
        "vec_id",
        "m",
        f"struct(round({_l2sq_expr_sql('sub', 'cent_sub')}, 6) AS dist,"
        " cent_id AS cent_id) AS cand",
    )
    best = scored.groupBy("vec_id", "m").agg(F.min("cand").alias("best"))
    # persisted: four registry queries (pq_adc_topk, pq_rerank_topk,
    # ivf_pq_topk, pq_recall_at_k) build on this encode pass, and the
    # CacheManager substitutes the cached table by canonicalized-plan
    # equality — one n-by-M encode per session instead of one per query
    return best.select(
        "vec_id",
        F.col("m").cast("int").alias("m"),
        F.col("best.cent_id").cast("int").alias("code"),
        F.col("best.dist").alias("dist"),
    ).persist()

def _pq_sub_sql(expr: str, m: str) -> str:
    return f"CAST({expr}[{m}*{PQ_DSUB}+1:({m}+1)*{PQ_DSUB}] AS DOUBLE[])"

def _pq_l2sq_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(range(1, {PQ_DSUB + 1}), i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i])))"

def pq_codes_oracle() -> str:
    sub = _pq_sub_sql("e.embedding", "g.m")
    cent_sub = _pq_sub_sql("c.embedding", "g.m")
    return f"""
WITH subs AS (
  SELECT e.vec_id, g.m, {sub} AS sub
  FROM embeddings e CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) g
),
cents AS (
  SELECT c.vec_id AS cent_id, g.m, {cent_sub} AS cent_sub
  FROM embeddings c CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) g
  WHERE c.vec_id < {PQ_NCODES}
),
best AS (
  SELECT s.vec_id, s.m,
         min(struct_pack(dist := round({_pq_l2sq_sql("s.sub", "c.cent_sub")}, 6),
                         cent_id := c.cent_id)) AS b
  FROM subs s JOIN cents c USING (m)
  GROUP BY s.vec_id, s.m
)
SELECT vec_id, CAST(m AS INT) AS m, CAST(b.cent_id AS INT) AS code, b.dist AS dist
FROM best
"""

def pq_adc_topk(
    spark: SparkSession, sf_dir: str, query_text: str = "vector similarity search", k: int = 20
) -> DataFrame:
    """PQ asymmetric-distance top-k: the query builds a K×M lookup table
    of sub-distances against the codebook, and each vector's approximate
    distance is the sum of its M table lookups — the scan reads CODES
    (8 ints/vector), never the raw vectors. At 100 TB this is the path
    that turns a 25 TB float scan into an 800 GB int scan; candidates
    from this pass get exact-reranked by ann_topk on the survivors."""
    e = tables.load_table(spark, sf_dir, "embeddings")
    qv = V.embed_query(query_text)
    q_subs = F.array(
        *[
            F.array(*[F.lit(float(v)) for v in qv[m * PQ_DSUB : (m + 1) * PQ_DSUB]])
            for m in range(PQ_M)
        ]
    )
    dtable = F.broadcast(
        _pq_codebook(e).select(
            "m",
            "cent_id",
            F.round(
                _l2sq_expr(F.element_at(q_subs, F.col("m") + 1), F.col("cent_sub")), 6
            ).alias("qd"),
        )
    )
    codes = pq_codes(spark, sf_dir).select("vec_id", "m", "code")
    adc = (
        codes.join(dtable, (codes["m"] == dtable["m"]) & (codes["code"] == dtable["cent_id"]))
        .groupBy("vec_id")
        # qd is already 6-dp, so qd*1e6 is integral: the quantized sum
        # is EXACT and independent of partition order (see functions.num)
        .agg(qsum6("qd").alias("approx_dist"))
    )
    return adc.orderBy(F.col("approx_dist").asc_nulls_last(), F.col("vec_id")).limit(k)

def pq_adc_topk_oracle(query_text: str = "vector similarity search", k: int = 20) -> str:
    qv = V.embed_query(query_text)
    q_subs = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(float(v)) for v in qv[m * PQ_DSUB : (m + 1) * PQ_DSUB]) + "]"
            for m in range(PQ_M)
        )
        + "]::DOUBLE[][]"
    )
    cent_sub = _pq_sub_sql("c.embedding", "g.m")
    codes = pq_codes_oracle()
    return f"""
WITH codes AS ({codes}),
cents AS (
  SELECT g.m, c.vec_id AS cent_id, {cent_sub} AS cent_sub
  FROM embeddings c CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) g
  WHERE c.vec_id < {PQ_NCODES}
),
dtable AS (
  SELECT m, cent_id,
         round({_pq_l2sq_sql(f"({q_subs})[m+1]", "cent_sub")}, 6) AS qd
  FROM cents
),
adc AS (
  SELECT codes.vec_id, round(sum(CAST(round((d.qd) * 1e6) AS BIGINT)) / 1e6, 6) AS approx_dist
  FROM codes JOIN dtable d ON codes.m = d.m AND codes.code = d.cent_id
  GROUP BY codes.vec_id
)
SELECT vec_id, approx_dist FROM adc
ORDER BY approx_dist ASC NULLS LAST, vec_id LIMIT {k}
"""

PQ_RERANK_FACTOR = 4

def pq_rerank_topk(
    spark: SparkSession, sf_dir: str, query_text: str = "vector similarity search", k: int = 20
) -> DataFrame:
    """Two-stage retrieval: PQ/ADC shortlists k×PQ_RERANK_FACTOR
    candidates from the compressed codes, then ONLY those rows re-read
    their raw vectors for an exact cosine re-rank — the standard
    recall-repair pattern (IVFADC + refine). At 100 TB the raw-vector
    scan collapses to a semi-join against an 80-row id list (a
    broadcast probe / index lookup at cluster scale), so the expensive
    float math touches 80 vectors instead of billions."""
    qv = V.vector_lit(V.embed_query(query_text))
    cands = pq_adc_topk(spark, sf_dir, query_text, k * PQ_RERANK_FACTOR).select("vec_id")
    e = tables.load_table(spark, sf_dir, "embeddings")
    exact = e.join(F.broadcast(cands), "vec_id").select(
        "vec_id", "label", F.round(V.cosine_expr(F.col("embedding"), qv), 6).alias("cosine")
    )
    return exact.orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id")).limit(k)

def pq_rerank_topk_oracle(
    query_text: str = "vector similarity search", k: int = 20
) -> str:
    qv = V.vector_sql_literal(V.embed_query(query_text))
    cos = V.cosine_sql("e.embedding", f"{qv}")
    cands = pq_adc_topk_oracle(query_text, k * PQ_RERANK_FACTOR)
    return f"""
WITH cands AS ({cands})
SELECT e.vec_id, e.label, round({cos}, 6) AS cosine
FROM embeddings e JOIN cands c ON c.vec_id = e.vec_id
ORDER BY cosine DESC NULLS LAST, e.vec_id LIMIT {k}
"""

def ivf_centroid_update(
    spark: SparkSession,
    sf_dir: str,
    k: int = IVF_K,
    assign: DataFrame | None = None,
) -> DataFrame:
    """IVF bulk build, update step (one Lloyd iteration): per-centroid
    element-wise mean of the assigned vectors, emitted flat as
    (cent_id, pos, mean) — the shape the next assignment pass joins on.

    posexplode fans each vector into dim rows ONCE, then a single
    (cent_id, pos) aggregation computes all means — no per-dimension
    scans, one shuffle keyed (cent_id, pos) whose cardinality is K×dim
    regardless of corpus size (map-side combine does the heavy sum).

    `assign` lets the stored-index path supply the (vec_id, cent_id)
    table directly (warehouse table + delta) so the Lloyd step joins a
    narrow stored table instead of re-deriving the bulk assignment
    from the corpus; default re-derives (the bulk-build regime)."""
    if assign is None:
        assign = ivf_assignments(spark, sf_dir, k)
    assign = assign.select("vec_id", "cent_id")
    e = parallelism.spread_scan(
        spark, sf_dir, tables.load_table(spark, sf_dir, "embeddings"), "embeddings", "vec_id"
    )
    dims = (
        e.join(assign, "vec_id")
        .select("cent_id", F.posexplode("embedding").alias("pos", "v"))
    )
    return (
        dims.groupBy("cent_id", "pos")
        .agg(qmean6(F.col("v").cast("double")).alias("mean_v"))
    )

def ivf_centroid_update_oracle(k: int = IVF_K) -> str:
    assign = ivf_assignments_oracle(k)
    return f"""
WITH assign AS ({assign}),
dims AS (
  SELECT a.cent_id, g.i - 1 AS pos, CAST(e.embedding[g.i] AS DOUBLE) AS v
  FROM assign a
  JOIN embeddings e ON e.vec_id = a.vec_id
  CROSS JOIN generate_series(1, 64) AS g(i)
)
SELECT cent_id, CAST(pos AS INT) AS pos,
       CAST(round(sum(CAST(round((v) * 1e6) AS BIGINT)) / count(v)) AS BIGINT) / 1e6 AS mean_v
FROM dims GROUP BY cent_id, pos
"""

# ---------------------------------------------------------------------------
# Index-quality evaluation: recall@k of the IVF path vs exact
# ---------------------------------------------------------------------------

def ann_recall_at_k(
    spark: SparkSession,
    sf_dir: str,
    query_text: str = "vector similarity search",
    k: int = 20,
    nprobe: int = 2,
) -> DataFrame:
    """Recall@k of `ann_ivf_topk` against the exact brute-force top-k —
    the metric that decides nprobe/nlist before an approximate index is
    trusted in production. Both rankings are narrow (vec_id, cosine)
    top-k plans (TakeOrderedAndProject — k rows per partition to the
    driver, no global sort); the overlap join touches 2k rows. Emits a
    single row (k, n_overlap, recall)."""
    qv = V.vector_lit(V.embed_query(query_text))
    e = tables.load_table(spark, sf_dir, "embeddings")
    scored = e.select(
        "vec_id", F.round(V.cosine_expr(F.col("embedding"), qv), 6).alias("cosine")
    )
    exact = scored.orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id")).limit(k).select("vec_id")
    approx = ann_ivf_topk(spark, sf_dir, query_text, k, nprobe).select("vec_id")
    return exact.join(approx, "vec_id").agg(
        F.lit(k).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_overlap"),
        F.round(F.count(F.lit(1)) / F.lit(float(k)), 6).alias("recall"),
    )

def ann_recall_at_k_oracle(
    query_text: str = "vector similarity search", k: int = 20, nprobe: int = 2
) -> str:
    qv = V.vector_sql_literal(V.embed_query(query_text))
    cos = V.cosine_sql("embedding", f"{qv}")
    ivf = ann_ivf_topk_oracle(query_text, k, nprobe)
    return f"""
WITH exact AS (
  SELECT vec_id FROM embeddings
  ORDER BY round({cos}, 6) DESC NULLS LAST, vec_id LIMIT {k}
),
approx AS (SELECT vec_id FROM ({ivf}) t)
SELECT CAST({k} AS INT) AS k, CAST(count(*) AS BIGINT) AS n_overlap,
       round(count(*) / {float(k)}, 6) AS recall
FROM exact JOIN approx USING (vec_id)
"""

# ---------------------------------------------------------------------------
# Scalar quantization (int8) — the storage-compression half of ANN
# ---------------------------------------------------------------------------

def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension distribution profile of the embedding column —
    the calibration table scalar quantization reads (the min/max become
    `sq_quantize`'s code range) and the drift monitor an embedding
    pipeline alerts on (a dimension whose mean/std shifts between model
    versions invalidates every stored code). Emits
    (pos, n, mn, mx, mean, std).

    Scale shape: one posexplode then ONE map-side-combined aggregation
    keyed by dimension index — |dims| output rows regardless of corpus
    size, the canonical mergeable-statistics shape. mean and std come
    from integer micro-unit moments (functions.num convention): with
    components quantized to q = round(x * 1e6), sum(q) and sum(q^2) are
    exact BIGINT sums (|x| <= 1 keeps sum(q^2) < 2^63 until ~9e6 rows
    per dimension; beyond that the same moments move to DECIMAL(38)),
    so both engines compute identical doubles before the final
    round(., 6)."""
    e = tables.load_table(spark, sf_dir, "embeddings")
    ex = e.select(F.posexplode("embedding").alias("pos", "xf")).select(
        "pos", F.col("xf").cast("double").alias("x")
    )
    q = F.round(F.col("x") * 1e6, 0).cast("bigint")
    agg = ex.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("x"), 6).alias("mn"),
        F.round(F.max("x"), 6).alias("mx"),
        F.sum(q).alias("_s1"),
        F.sum(q * q).alias("_s2"),
    )
    # mean rounded at integer micro-unit scale (functions/num.qmean6
    # rationale: decimal midpoints on doubles tie-break differently
    # across engines; integer midpoints are exact)
    mean_q = F.round(F.col("_s1") / F.col("n"), 0).cast("bigint") / F.lit(1e6)
    var = (F.col("_s2") / F.col("n") - (F.col("_s1") / F.col("n")) * (F.col("_s1") / F.col("n"))) / F.lit(1e12)
    return agg.select(
        "pos",
        "n",
        "mn",
        "mx",
        mean_q.alias("mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("std"),
    )

def embedding_dim_profile_oracle() -> str:
    return """
WITH ex AS (
  SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS x
  FROM embeddings
),
agg AS (
  SELECT pos, count(*) AS n,
         round(min(x), 6) AS mn,
         round(max(x), 6) AS mx,
         sum(CAST(round(x * 1e6) AS BIGINT)) AS s1,
         sum(CAST(round(x * 1e6) AS BIGINT) * CAST(round(x * 1e6) AS BIGINT)) AS s2
  FROM ex GROUP BY pos
)
SELECT pos, n, mn, mx,
       CAST(round(s1 / n) AS BIGINT) / 1e6 AS mean,
       round(sqrt(greatest((s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))) / 1e12, 0.0)), 6) AS std
FROM agg
"""

OUTLIER_K = 20

def embedding_outliers(spark: SparkSession, sf_dir: str, k: int = OUTLIER_K) -> DataFrame:
    """The k most ISOLATED vectors — lowest cosine to their nearest IVF
    centroid, with a z-score against the corpus's assignment-cosine
    distribution. This is the embedding-table review queue: a vector
    far from every centroid is a garbage/truncated input, an encoder-
    version straggler, or genuinely novel content, and it is both the
    hardest case for IVF recall (its cell boundary is meaningless) and
    the first candidate for a centroid re-seed. A fixed-k queue rather
    than a sigma cut because isolation distributions are skewed — the
    operational question is "what are the worst k", not "how many pass
    a threshold". Emits (vec_id, cent_id, cosine, z), most isolated
    first by (cosine asc, vec_id).

    Scale shape: reuses the `ivf_assignments` pass (cosine to nearest
    centroid is already computed), one 1-row integer-moment aggregate
    broadcasts mean/std (cosine is 6-dp so the moments are exact
    BIGINTs), and the k-cut is TakeOrderedAndProject — never a global
    sort."""
    assign = ivf_assignments(spark, sf_dir)
    q = F.round(F.col("cosine") * 1e6, 0).cast("bigint")
    stats = assign.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
    ).select(
        (F.col("s1") / (F.lit(1e6) * F.col("n"))).alias("mean_cos"),
        F.sqrt(
            F.greatest(
                (F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n")))
                / F.lit(1e12),
                F.lit(0.0),
            )
        ).alias("std_cos"),
    )
    z = F.when(
        F.col("std_cos") > 0,
        F.round((F.col("cosine") - F.col("mean_cos")) / F.col("std_cos"), 6),
    )
    return (
        assign.crossJoin(F.broadcast(stats))
        .select("vec_id", "cent_id", "cosine", z.alias("z"))
        .orderBy(F.asc_nulls_last("cosine"), "vec_id")
        .limit(k)
    )

def embedding_outliers_oracle(k: int = OUTLIER_K) -> str:
    s1 = "sum(CAST(round(cosine * 1e6) AS BIGINT))"
    s2 = "sum(CAST(round(cosine * 1e6) AS BIGINT) * CAST(round(cosine * 1e6) AS BIGINT))"
    return f"""
WITH a AS ({ivf_assignments_oracle()}),
st AS (
  SELECT {s1} / (1e6 * count(*)) AS mean_cos,
         sqrt(greatest(
           ({s2} / CAST(count(*) AS DOUBLE)
            - ({s1} / CAST(count(*) AS DOUBLE)) * ({s1} / CAST(count(*) AS DOUBLE))) / 1e12,
           0.0)) AS std_cos
  FROM a
)
SELECT vec_id, cent_id, cosine,
       CASE WHEN std_cos > 0 THEN round((cosine - mean_cos) / std_cos, 6) END AS z
FROM a CROSS JOIN st
ORDER BY cosine ASC NULLS LAST, vec_id
LIMIT {k}
"""

def sq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension min/max scalar quantization of the embedding
    column to 8-bit codes, verified by per-vector checksums: code_sum
    and code_pos_dot pin every code (value and position), mae is the
    mean absolute reconstruction error — the quality number that
    decides int8-vs-float16 storage. Emits (vec_id, n_dims, code_sum,
    code_pos_dot, mae).

    Scale shape: one posexplode streams each vector's components past
    the broadcast per-dimension stats (a dim-row aggregate — 64 rows
    here, still tiny at 4096 dims), and one per-vector aggregation
    rebuilds the checksums; shuffle cardinality is |vectors|, the
    explode never hits an exchange. Arithmetic is double on both
    engines (float32 components are widened before any subtraction) so
    the rounded codes match the oracle bit-for-bit."""
    e = tables.load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select("vec_id", "pos", F.col("xf").cast("double").alias("x"))
    stats = ex.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    coded = (
        ex.join(F.broadcast(stats), "pos")
        .select(
            "vec_id",
            "pos",
            "x",
            "mn",
            "mx",
            F.when(
                F.col("mx") > F.col("mn"),
                F.round((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255.0, 0),
            )
            .otherwise(F.lit(0.0))
            .cast("int")
            .alias("code"),
        )
    )
    recon = F.col("mn") + F.col("code").cast("double") / 255.0 * (F.col("mx") - F.col("mn"))
    return coded.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_dims"),
        F.sum("code").alias("code_sum"),
        F.sum(F.col("code") * F.col("pos")).alias("code_pos_dot"),
        qmean6(F.abs(F.col("x") - recon)).alias("mae"),
    )

def sq_quantize_oracle() -> str:
    return """
WITH ex AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS x
  FROM embeddings
),
st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex GROUP BY 1),
coded AS (
  SELECT ex.vec_id, ex.pos, ex.x, st.mn, st.mx,
         CAST(CASE WHEN st.mx > st.mn
                   THEN round((ex.x - st.mn) / (st.mx - st.mn) * 255.0, 0)
                   ELSE 0.0 END AS INT) AS code
  FROM ex JOIN st USING (pos)
)
SELECT vec_id, CAST(count(*) AS INT) AS n_dims,
       CAST(sum(code) AS BIGINT) AS code_sum,
       CAST(sum(code * pos) AS BIGINT) AS code_pos_dot,
       CAST(round(sum(CAST(round((abs(x - (mn + code / 255.0 * (mx - mn)))) * 1e6) AS BIGINT))
             / count(abs(x - (mn + code / 255.0 * (mx - mn))))) AS BIGINT) / 1e6 AS mae
FROM coded GROUP BY vec_id
"""

# ---------------------------------------------------------------------------
# Query over the persisted index (the online half of buildVectorIndex)
# ---------------------------------------------------------------------------

def ann_query_index(
    spark: SparkSession,
    index_dir: str,
    sf_dir: str,
    query_text: str = "vector similarity search",
    k: int = 20,
    nprobe: int = 2,
) -> DataFrame:
    """Serve a top-k query from the PERSISTED IVF artifacts that
    `cli.py buildVectorIndex` materializes — the online half of the
    index lifecycle (build offline, query online without recomputing
    assignments). Reads `ivf_assignments.parquet` (vec_id -> cent_id)
    and `ivf_centroids.parquet` (cent_id, pos, mean_v), scores the
    Lloyd-updated centroids against the query via a (cent_id)
    aggregation over the exploded centroid table (K×dim rows — tiny),
    probes the top `nprobe` cells, and brute-forces only the member
    vectors. With nprobe >= nlist this is EXACTLY brute force
    (asserted in tests), which is the correctness anchor for the
    pruned path.

    Scale shape: the assignment table join prunes the vector scan by
    cell id (partition pruning when assignments are written partitioned
    by cent_id); the probed-cell list and centroid scores broadcast."""
    qv = V.embed_query(query_text)
    assignments = spark.read.parquet(f"{index_dir}/ivf_assignments.parquet").select(
        "vec_id", "cent_id"
    )
    centroids = spark.read.parquet(f"{index_dir}/ivf_centroids.parquet")
    q_at = F.element_at(V.vector_lit(qv), F.col("pos").cast("int") + 1)
    cent_scores = (
        centroids.groupBy("cent_id")
        .agg(
            F.sum(F.col("mean_v") * q_at).alias("dot"),
            F.sqrt(F.sum(F.col("mean_v") * F.col("mean_v"))).alias("nrm"),
        )
        .select(
            "cent_id",
            F.when(F.col("nrm") == 0, F.lit(None).cast("double"))
            .otherwise(F.col("dot") / (F.col("nrm") * F.lit(float(sum(x * x for x in qv) ** 0.5))))
            .alias("cent_cos"),
        )
    )
    probed = (
        cent_scores.orderBy(F.col("cent_cos").desc_nulls_last(), F.col("cent_id"))
        .limit(nprobe)
        .select("cent_id")
    )
    e = tables.load_table(spark, sf_dir, "embeddings")
    members = assignments.join(F.broadcast(probed), "cent_id").select("vec_id")
    scored = e.join(members, "vec_id").select(
        "vec_id",
        "label",
        F.round(V.cosine_expr(F.col("embedding"), V.vector_lit(qv)), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id")).limit(k)

def ivf_cluster_quality(spark: SparkSession, sf_dir: str, k: int = IVF_K) -> DataFrame:
    """Per-cell IVF health report: member count and mean member-to-
    centroid cosine — the number that says which cells need a re-seed
    or split before recall degrades. Reuses `ivf_assignments` (each
    member's cosine to its centroid is already computed there), so
    this is one tiny aggregation over the assignment table. Emits
    (cent_id, n_members, mean_cosine).

    The mean is computed over exact integers: `cosine` is already
    rounded to 6 dp upstream, so `round(cosine*1e6)` is integral and a
    BIGINT sum is independent of partition/summation order — a plain
    avg(double) here differs in the last ulp between engines and flips
    the 6th decimal (observed: r2 driver hash mismatch)."""
    assign = ivf_assignments(spark, sf_dir, k)
    return assign.groupBy("cent_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        (
            F.round(
                F.sum(F.round(F.col("cosine") * 1e6, 0).cast("bigint"))
                / F.count(F.lit(1)),
                0,
            ).cast("bigint")
            / F.lit(1e6)
        ).alias("mean_cosine"),
    )

def ivf_cluster_quality_oracle(k: int = IVF_K) -> str:
    return f"""
WITH assign AS ({ivf_assignments_oracle(k)})
SELECT cent_id, CAST(count(*) AS BIGINT) AS n_members,
       CAST(round(sum(CAST(round(cosine * 1e6) AS BIGINT)) / count(*)) AS BIGINT) / 1e6 AS mean_cosine
FROM assign GROUP BY cent_id
"""

def ivf_label_purity(spark: SparkSession, sf_dir: str, k: int = IVF_K) -> DataFrame:
    """External-label cluster quality: per IVF cell, the share of
    members carrying the cell's majority label — the purity metric
    that validates a geometric clustering against ground-truth classes
    (`ivf_cluster_quality` is the INTERNAL eval: member-to-centroid
    tightness; this is the EXTERNAL one; together they are the
    standard pair for accepting a coarse quantizer). A low-purity cell
    mixes classes, so semantic dedup within it risks collapsing
    distinct content.

    Physical shape: reuses the persisted `ivf_assignments` subtree
    (shared with five other index queries), joined to the
    column-pruned (vec_id, label) scan — a narrow equi-join on vec_id,
    then one (cent_id, label) aggregation whose output is at most
    cells x labels rows; the majority pick is a window over that tiny
    table. Purity is an exact integer ratio rounded to 6 dp, so the
    hash is partition-order independent. Ties break to the smallest
    label. Emits (cent_id, n_members, n_labels, top_label,
    top_label_n, purity)."""
    assign = ivf_assignments(spark, sf_dir, k).select("vec_id", "cent_id")
    labels = tables.load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    cell_label = (
        assign.join(labels, "vec_id")
        .groupBy("cent_id", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("cent_id")
    w = Window.partitionBy("cent_id").orderBy(
        F.col("n").desc_nulls_last(), F.col("label").asc()
    )
    return (
        cell_label.withColumn("n_members", F.sum("n").over(tot))
        .withColumn("n_labels", F.count(F.lit(1)).over(tot))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "cent_id",
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col("n_labels").cast("bigint").alias("n_labels"),
            F.col("label").alias("top_label"),
            F.col("n").alias("top_label_n"),
            F.round(F.col("n") / F.col("n_members"), 6).alias("purity"),
        )
    )

def ivf_label_purity_oracle(k: int = IVF_K) -> str:
    return f"""
WITH assign AS ({ivf_assignments_oracle(k)}),
cl AS (
  SELECT a.cent_id, e.label, CAST(count(*) AS BIGINT) AS n
  FROM assign a JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
),
ranked AS (
  SELECT cent_id, label, n,
         sum(n) OVER (PARTITION BY cent_id) AS n_members,
         count(*) OVER (PARTITION BY cent_id) AS n_labels,
         row_number() OVER (PARTITION BY cent_id
                            ORDER BY n DESC NULLS LAST, label ASC) AS rn
  FROM cl
)
SELECT cent_id, CAST(n_members AS BIGINT) AS n_members,
       CAST(n_labels AS BIGINT) AS n_labels,
       label AS top_label, n AS top_label_n,
       round(n / CAST(n_members AS DOUBLE), 6) AS purity
FROM ranked WHERE rn = 1
"""

def index_build_report(spark: SparkSession, sf_dir: str, k: int = IVF_K) -> DataFrame:
    """One row per index-build health metric — the ANN counterpart of
    `dedup_funnel_report`, read after an IVF build before serving from
    it: vector count, list count, non-empty cells, min/max cell size
    and the balance ratio (max cell over mean cell — the number that
    prices worst-case probe latency; a ratio far above 1 means a hot
    cell and a re-seed), plus the member-weighted mean of the per-cell
    mean cosines (overall assignment tightness). Emits (metric, value)
    with every value as DOUBLE.

    Scale shape: one aggregation over the |cells|-row
    `ivf_cluster_quality` table — the report costs nothing beyond the
    assignment pass it summarizes. The weighted mean multiplies each
    cell's 6-dp mean (exact at 1e-6 grid) by its BIGINT member count,
    so the sum is order-independent in both engines."""
    q = ivf_cluster_quality(spark, sf_dir, k)
    agg = q.agg(
        F.sum("n_members").cast("bigint").alias("n_vectors"),
        F.count(F.lit(1)).cast("bigint").alias("nonempty_cells"),
        F.min("n_members").cast("bigint").alias("min_cell"),
        F.max("n_members").cast("bigint").alias("max_cell"),
        (
            F.round(
                F.sum(F.round(F.col("mean_cosine") * 1e6, 0).cast("bigint") * F.col("n_members"))
                / F.sum("n_members"),
                0,
            ).cast("bigint")
            / F.lit(1e6)
        ).alias("wmc"),
    )
    balance = F.round(
        F.col("max_cell") / (F.col("n_vectors") / F.col("nonempty_cells")), 6
    )
    metrics = [
        ("n_vectors", F.col("n_vectors").cast("double")),
        ("nlist", F.lit(float(k))),
        ("nonempty_cells", F.col("nonempty_cells").cast("double")),
        ("min_cell_size", F.col("min_cell").cast("double")),
        ("max_cell_size", F.col("max_cell").cast("double")),
        ("cell_balance", balance.cast("double")),
        ("mean_member_cosine", F.col("wmc").cast("double")),
    ]
    rows = F.array(
        *[
            F.struct(F.lit(name).alias("metric"), value.alias("value"))
            for name, value in metrics
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.metric", "r.value")

def index_build_report_oracle(k: int = IVF_K) -> str:
    return f"""
WITH q AS ({ivf_cluster_quality_oracle(k)}),
agg AS (
  SELECT CAST(sum(n_members) AS BIGINT) AS n_vectors,
         CAST(count(*) AS BIGINT) AS nonempty_cells,
         CAST(min(n_members) AS BIGINT) AS min_cell,
         CAST(max(n_members) AS BIGINT) AS max_cell,
         CAST(round(sum(CAST(round(mean_cosine * 1e6) AS BIGINT) * n_members)
               / sum(n_members)) AS BIGINT) / 1e6 AS wmc
  FROM q
)
SELECT 'n_vectors' AS metric, CAST(n_vectors AS DOUBLE) AS value FROM agg
UNION ALL SELECT 'nlist', CAST({k} AS DOUBLE) FROM agg
UNION ALL SELECT 'nonempty_cells', CAST(nonempty_cells AS DOUBLE) FROM agg
UNION ALL SELECT 'min_cell_size', CAST(min_cell AS DOUBLE) FROM agg
UNION ALL SELECT 'max_cell_size', CAST(max_cell AS DOUBLE) FROM agg
UNION ALL SELECT 'cell_balance',
  round(max_cell / (CAST(n_vectors AS DOUBLE) / nonempty_cells), 6) FROM agg
UNION ALL SELECT 'mean_member_cosine', wmc FROM agg
"""

# ---------------------------------------------------------------------------
# IVF training (unrolled Lloyd iteration with convergence report)
# ---------------------------------------------------------------------------

def ivf_train(spark: SparkSession, sf_dir: str, k: int = IVF_K) -> DataFrame:
    """One full unrolled Lloyd iteration of the IVF coarse quantizer,
    oracle-checkable end to end: seed centroids (k smallest vec_ids) →
    assignment → element-wise centroid update → RE-assignment against
    the updated centroids, reported per centroid with its L1 shift from
    the seed — the convergence signal a training loop monitors. This is
    the iteration body of the k-means build (dedup_clusters shows the
    loop-until-converged driver pattern; here the body itself is pinned
    against DuckDB, which a while-loop's data-dependent iteration count
    would prevent).

    Scale shape: the flat (cent_id, pos, mean) update table is K×dim
    rows regardless of corpus size; it re-assembles into arrays with
    one tiny aggregation, broadcasts into the second assignment scan,
    and the quantized means (functions.num) make every downstream
    cosine bit-identical across engines. The update table feeds both
    the re-assembly and the shift join, so it is persisted. Emits
    (cent_id, n_members, mean_cos, shift)."""
    e = tables.load_table(spark, sf_dir, "embeddings")
    upd = persist_if(ivf_centroid_update(spark, sf_dir, k), k == IVF_K)
    c1 = (
        upd.groupBy("cent_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mean_v"))).alias("ps"))
        .select("cent_id", F.transform("ps", lambda s: s["mean_v"]).alias("cent"))
    )
    seed = (
        e.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cent_id"), F.posexplode("embedding").alias("pos", "v0"))
    )
    shift = (
        upd.join(seed, ["cent_id", "pos"])
        .groupBy("cent_id")
        .agg(qsum6(F.abs(F.col("mean_v") - F.col("v0").cast("double"))).alias("shift"))
    )
    scored = parallelism.spread_scan(spark, sf_dir, e, "embeddings", "vec_id").crossJoin(
        F.broadcast(c1)
    ).selectExpr(
        "vec_id",
        "cent_id",
        f"round({V.cosine_expr_sql('embedding', 'cent')}, 6) AS cosine",
    )
    a2 = _argmax_centroid(scored)
    report = a2.groupBy("cent_id").agg(
        F.count(F.lit(1)).alias("n_members"), qmean6("cosine").alias("mean_cos")
    )
    return report.join(shift, "cent_id").select(
        "cent_id", "n_members", "mean_cos", "shift"
    )

def ivf_train_oracle(k: int = IVF_K) -> str:
    from ..functions.num import qmean6_sql, qsum6_sql

    cos = V.cosine_sql("e.embedding", "c.cent")
    return f"""
WITH upd AS ({ivf_centroid_update_oracle(k)}),
c1 AS (SELECT cent_id, list(mean_v ORDER BY pos) AS cent FROM upd GROUP BY 1),
seed AS (
  SELECT vec_id AS cent_id, g.i - 1 AS pos, CAST(embedding[g.i] AS DOUBLE) AS v0
  FROM embeddings CROSS JOIN generate_series(1, {GEN_DIM}) AS g(i)
  WHERE vec_id < {k}
),
shift AS (
  SELECT u.cent_id, {qsum6_sql("abs(u.mean_v - s.v0)")} AS shift
  FROM upd u JOIN seed s ON s.cent_id = u.cent_id AND s.pos = u.pos
  GROUP BY u.cent_id
),
scored AS (
  SELECT e.vec_id, c.cent_id, round({cos}, 6) AS cosine,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({cos}, 6) DESC NULLS LAST, c.cent_id) AS rn
  FROM embeddings e CROSS JOIN c1 c
),
a2 AS (SELECT vec_id, cent_id, cosine FROM scored WHERE rn = 1),
report AS (
  SELECT cent_id, CAST(count(*) AS BIGINT) AS n_members,
         {qmean6_sql("cosine")} AS mean_cos
  FROM a2 GROUP BY cent_id
)
SELECT r.cent_id, r.n_members, r.mean_cos, s.shift
FROM report r JOIN shift s USING (cent_id)
"""


# ---------------------------------------------------------------------------
# Multi-iteration Lloyd training (unrolled + train-to-convergence loop)
# ---------------------------------------------------------------------------

IVF_TRAIN_ROUNDS = 2


def _cents_from_flat(flat: DataFrame) -> DataFrame:
    """Re-assemble a flat (cent_id, pos, val) centroid table into
    (cent_id, cent array) — K×dim rows in, K rows out."""
    return (
        flat.groupBy("cent_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("ps"))
        .select("cent_id", F.transform("ps", lambda s: s["val"]).alias("cent"))
    )


def _lloyd_round(e: DataFrame, flat: DataFrame, invariant: bool):
    """One Lloyd iteration against the flat centroid table: assign every
    vector to its max-cosine centroid, recompute element-wise means,
    carry empty cells' centroids forward unchanged. Returns
    (new_flat with old_val column, assignment). The corpus is scanned
    once for scoring and once for the update fan-out; the K×dim update
    table and the n-row assignment are persisted under default args
    because each feeds two downstream branches (Catalyst instantiates
    a subtree once per reference)."""
    cents = F.broadcast(_cents_from_flat(flat))
    scored = e.crossJoin(cents).selectExpr(
        "vec_id",
        "cent_id",
        f"round({V.cosine_expr_sql('embedding', 'cent')}, 6) AS cosine",
    )
    assign = persist_if(_argmax_centroid(scored, with_cosine=False), invariant)
    upd = persist_if(
        e.join(assign, "vec_id")
        .select("cent_id", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cent_id", "pos")
        .agg(qmean6(F.col("v").cast("double")).alias("mean_v")),
        invariant,
    )
    new_flat = flat.join(upd, ["cent_id", "pos"], "left").select(
        "cent_id",
        "pos",
        F.coalesce("mean_v", "val").alias("val"),
        F.col("val").alias("old_val"),
    )
    return new_flat, assign


def ivf_train_iters(
    spark: SparkSession, sf_dir: str, k: int = IVF_K, rounds: int = IVF_TRAIN_ROUNDS
) -> DataFrame:
    """`rounds` unrolled Lloyd iterations of the IVF coarse quantizer
    with per-round telemetry — the oracle-pinned iteration body of
    `ivf_train_converged` (`ivf_train` pins ONE iteration; this pins
    the round-to-round composition: round 2 assigns against round 1's
    UPDATED means, so a transposed join or a missed empty-cell
    carry-forward shows up as a hash mismatch, which a single
    iteration cannot catch). Reference parity: the ANN index build the
    reference delegates to its embeddings API (src/endpoints/
    vectorSearch.get.ts) needs a trained coarse quantizer at corpus
    scale.

    Scale shape per round: one corpus scan scores against the
    broadcast K×dim centroids, one corpus fan-out feeds a (cent_id,
    pos)-keyed aggregate whose cardinality is K×dim regardless of
    corpus size; shifts and member counts ride the same tiny tables.
    Emits (round, cent_id, n_members, shift) — shift is the L1
    distance each centroid moved that round, the scalar a training
    loop thresholds on."""
    e = parallelism.spread_scan(
        spark, sf_dir, tables.load_table(spark, sf_dir, "embeddings"), "embeddings", "vec_id"
    )
    invariant = k == IVF_K and rounds == IVF_TRAIN_ROUNDS
    flat = (
        e.filter(F.col("vec_id") < k)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.posexplode("embedding").alias("pos", "val"),
        )
        .withColumn("val", F.col("val").cast("double"))
    )
    reports = []
    for r in range(1, rounds + 1):
        new_flat, assign = _lloyd_round(e, flat, invariant)
        shift = new_flat.groupBy("cent_id").agg(
            qsum6(F.abs(F.col("val") - F.col("old_val"))).alias("shift")
        )
        n_members = assign.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n"))
        reports.append(
            shift.join(n_members, "cent_id", "left").select(
                F.lit(r).alias("round"),
                "cent_id",
                F.coalesce("n", F.lit(0)).cast("bigint").alias("n_members"),
                "shift",
            )
        )
        flat = new_flat.select("cent_id", "pos", "val")
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out


def ivf_train_iters_oracle(k: int = IVF_K, rounds: int = IVF_TRAIN_ROUNDS) -> str:
    from ..functions.num import qmean6_sql, qsum6_sql

    if rounds != 2:
        raise ValueError("oracle pins exactly 2 unrolled rounds")
    cos = V.cosine_sql("e.embedding", "c.cent")

    def round_sql(i: int) -> str:
        prev = f"flat{i - 1}"
        return f"""
cents{i - 1} AS (
  SELECT cent_id, list(val ORDER BY pos) AS cent FROM {prev} GROUP BY cent_id
),
scored{i} AS (
  SELECT e.vec_id, c.cent_id, round({cos}, 6) AS cosine,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({cos}, 6) DESC NULLS LAST, c.cent_id) AS rn
  FROM embeddings e CROSS JOIN cents{i - 1} c
),
a{i} AS (SELECT vec_id, cent_id FROM scored{i} WHERE rn = 1),
upd{i} AS (
  SELECT a.cent_id, g.i - 1 AS pos,
         {qmean6_sql("CAST(e.embedding[g.i] AS DOUBLE)")} AS mean_v
  FROM embeddings e
  JOIN a{i} a USING (vec_id)
  CROSS JOIN generate_series(1, {GEN_DIM}) AS g(i)
  GROUP BY a.cent_id, g.i - 1
),
flat{i} AS (
  SELECT f.cent_id, f.pos, COALESCE(u.mean_v, f.val) AS val, f.val AS old_val
  FROM {prev} f LEFT JOIN upd{i} u USING (cent_id, pos)
),
shift{i} AS (
  SELECT cent_id, {qsum6_sql("abs(val - old_val)")} AS shift
  FROM flat{i} GROUP BY cent_id
),
n{i} AS (SELECT cent_id, count(*) AS n FROM a{i} GROUP BY cent_id)"""

    return f"""
WITH flat0 AS (
  SELECT vec_id AS cent_id, g.i - 1 AS pos, CAST(embedding[g.i] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN generate_series(1, {GEN_DIM}) AS g(i)
  WHERE vec_id < {k}
),{round_sql(1)},{round_sql(2)}
SELECT 1 AS round, s.cent_id, CAST(COALESCE(n.n, 0) AS BIGINT) AS n_members, s.shift
FROM shift1 s LEFT JOIN n1 n USING (cent_id)
UNION ALL
SELECT 2 AS round, s.cent_id, CAST(COALESCE(n.n, 0) AS BIGINT) AS n_members, s.shift
FROM shift2 s LEFT JOIN n2 n USING (cent_id)
"""


def ivf_train_converged(
    spark: SparkSession,
    sf_dir: str,
    k: int = IVF_K,
    max_iter: int = 30,
    tol: float = 1e-6,
) -> DataFrame:
    """Train-to-convergence Lloyd loop: iterate `_lloyd_round` until no
    centroid's L1 shift exceeds `tol`, RAISE on budget exhaustion —
    the same loop discipline as `_connected_components`
    (operators/dedup.py): localCheckpoint per round so lineage stays
    flat, one cheap driver-side scalar per round as the convergence
    signal, and refusal to return a half-trained index silently (a
    wrong index serves wrong neighbors with no downstream signal).

    The per-round body is exactly `ivf_train_iters`' oracle-pinned
    iteration (assign → quantized means → empty-cell carry-forward),
    so this loop's correctness is inherited; what the loop adds —
    fixpoint detection, budget raise, telemetry — is pytest-pinned
    (tests/test_pipeline_ops.py). Emits one row per executed round:
    (round, max_shift, total_shift, n_reassigned) — n_reassigned is
    how many vectors changed cells that round, the other scalar
    production training monitors.

    Scale: per round, two corpus scans (score + update fan-out) and
    K×dim-sized everything else; the loop state checkpointed between
    rounds is K×dim rows. Driver-side data is O(rounds) scalars."""
    e = parallelism.spread_scan(
        spark, sf_dir, tables.load_table(spark, sf_dir, "embeddings"), "embeddings", "vec_id"
    )
    flat = (
        e.filter(F.col("vec_id") < k)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.posexplode("embedding").alias("pos", "val"),
        )
        .withColumn("val", F.col("val").cast("double"))
        .localCheckpoint()
    )
    prev_assign = None
    telemetry = []
    for r in range(1, max_iter + 1):
        new_flat, assign = _lloyd_round(e, flat, invariant=False)
        # round-local persist with explicit release: each round's plan
        # has fresh lineage, so persist_if's session-invariant cache
        # would mint one entry per round and accumulate — the exact
        # leak functions/caching.py guards against. Lifecycle here is
        # explicit instead: persist, consume both branches, unpersist.
        assign = assign.persist()
        new_flat = new_flat.localCheckpoint()
        row = new_flat.agg(
            F.max(F.abs(F.col("val") - F.col("old_val"))).alias("max_shift"),
            qsum6(F.abs(F.col("val") - F.col("old_val"))).alias("total_shift"),
        ).collect()[0]
        if prev_assign is None:
            n_reassigned = assign.count()
        else:
            n_reassigned = (
                assign.alias("a")
                .join(prev_assign.alias("p"), "vec_id")
                .filter(F.col("a.cent_id") != F.col("p.cent_id"))
                .count()
            )
        telemetry.append((r, float(row.max_shift), float(row.total_shift), n_reassigned))
        if prev_assign is not None:
            prev_assign.unpersist()
        prev_assign = assign
        flat = new_flat.select("cent_id", "pos", "val").localCheckpoint()
        if row.max_shift <= tol:
            prev_assign.unpersist()
            return spark.createDataFrame(
                telemetry, "round int, max_shift double, total_shift double, n_reassigned bigint"
            )
    if prev_assign is not None:
        prev_assign.unpersist()
    raise RuntimeError(
        f"ivf_train_converged: max centroid shift {telemetry[-1][1]} still above "
        f"tol={tol} after {max_iter} rounds — refusing to return a half-trained index"
    )


# ---------------------------------------------------------------------------
# Incremental index maintenance: delta-only assignment + staleness
# ---------------------------------------------------------------------------

IVF_UPSERT_HWM = 400  # vec_id high-water mark of the frozen index
IVF_STALE_THRESHOLD = 0.1


def ivf_upsert_assignments(
    spark: SparkSession,
    sf_dir: str,
    k: int = IVF_K,
    hwm: int = IVF_UPSERT_HWM,
    index: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Incremental IVF maintenance, assignment step: assign ONLY the
    vectors not yet in the index against the FROZEN centroids — the
    ANN twin of `needs_embeddings_worklist` (reference worklist shape,
    src/lib/corpus.ts maintenance cycle). A corpus pipeline upserts
    continuously; rebuilding the whole index per batch
    (`ivf_assignments`) re-scans 100 TB to place a few GB of new
    vectors. Here the existing index contributes only its vec_id set
    to an anti-join, the delta scan is |new vectors|, and the K x dim
    frozen-centroid table broadcasts exactly as in the bulk build —
    cost is proportional to the DELTA, not the corpus. Emits
    (vec_id, cent_id, cosine) for delta vectors only; union with the
    stored index is the caller's write step.

    `index` is the stored index table (needs a `vec_id` column); pass
    it in production and the plan touches the corpus only for the
    anti-joined delta — that is when the delta-cost claim above is
    literal. When None (the test-harness default, which has no stored
    index to read), the frozen index is SIMULATED by re-running the
    bulk assignment and filtering to the high-water mark, so that
    fixture stand-in pays one extra corpus pass the real deployment
    does not (`test_plans.py` pins the scan count of the
    materialized-index path). `centroids` likewise routes the frozen
    K x dim table through the stored warehouse copy
    (`ivf_stored_centroids`, columns cent_id + cent) — with both
    passed, the corpus is scanned exactly ONCE, for the delta."""
    default_invocation = index is None and centroids is None
    e = tables.load_table(spark, sf_dir, "embeddings")
    if index is None:
        index = ivf_assignments(spark, sf_dir, k).filter(F.col("vec_id") < hwm)
    delta = e.join(index.select("vec_id"), "vec_id", "left_anti")
    if centroids is None:
        centroids = e.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
        )
    cents = F.broadcast(centroids.select("cent_id", "cent"))
    delta = parallelism.spread_scan(spark, sf_dir, delta, "embeddings", "vec_id")
    scored = delta.crossJoin(cents).selectExpr(
        "vec_id",
        "cent_id",
        f"round({V.cosine_expr_sql('embedding', 'cent')}, 6) AS cosine",
    )
    # the default (simulated-index) invocation is session-invariant and
    # its delta scoring feeds three consumers (this registry query,
    # ivf_index_merge's upsert side, the bulk staleness compare) —
    # persist the narrow result like the stored path's
    # _stored_delta_assignments twin; parameterized invocations and
    # caller-supplied index/centroids skip the cache per the discipline
    return persist_if(
        _argmax_centroid(scored),
        default_invocation and k == IVF_K and hwm == IVF_UPSERT_HWM,
    )


def ivf_upsert_assignments_oracle(k: int = IVF_K, hwm: int = IVF_UPSERT_HWM) -> str:
    cos = V.cosine_sql("e.embedding", "c.cent")
    return f"""
WITH idx AS (
  SELECT vec_id FROM ({ivf_assignments_oracle(k)}) t WHERE vec_id < {hwm}
),
delta AS (
  SELECT e.* FROM embeddings e ANTI JOIN idx USING (vec_id)
),
cents AS (
  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id < {k}
),
scored AS (
  SELECT e.vec_id, c.cent_id, round({cos}, 6) AS cosine,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({cos}, 6) DESC NULLS LAST, c.cent_id) AS rn
  FROM delta e CROSS JOIN cents c
)
SELECT vec_id, cent_id, cosine FROM scored WHERE rn = 1
"""


def ivf_staleness_report(
    spark: SparkSession,
    sf_dir: str,
    k: int = IVF_K,
    threshold: float = IVF_STALE_THRESHOLD,
    index: DataFrame | None = None,
) -> DataFrame:
    """Staleness audit of the frozen index: per centroid, the fraction
    of members whose nearest UPDATED centroid (one Lloyd step,
    `ivf_centroid_update`) differs from their frozen assignment — the
    reassignment-rate signal that decides WHEN the incremental-upsert
    regime must give way to a rebuild (`split_centroid_drift` profiles
    the drift magnitude; this profiles its routing impact). The
    updated K x dim centroid table re-assembles with one K*dim-row
    aggregation and broadcasts into a single corpus scan; the compare
    joins two (vec_id, cent_id) narrow tables. Emits (cent_id, n,
    n_reassigned, reassign_rate, stale).

    `index` routes the frozen side through the STORED warehouse table
    (`ivf_stored_index`): the full frozen assignment set is the stored
    rows unioned with the delta upsert — content-identical to the bulk
    re-derivation (same centroids, same argmax), so the oracle is
    unchanged, but the corpus is scanned only for the delta and the
    Lloyd/rescore passes, never to reconstruct what the index already
    knows. `ivf_staleness_stored` is the registry twin that also
    persists the merged assignment set (it feeds both the frozen
    compare and the Lloyd step), so the delta computes once."""
    if index is not None:
        assign_full = index.select("vec_id", "cent_id").unionByName(
            ivf_upsert_assignments(spark, sf_dir, k, index=index).select(
                "vec_id", "cent_id"
            )
        )
    else:
        assign_full = ivf_assignments(spark, sf_dir, k).select("vec_id", "cent_id")
    return _staleness_core(spark, sf_dir, assign_full, k, threshold)


def _staleness_core(
    spark: SparkSession,
    sf_dir: str,
    assign_full: DataFrame,
    k: int,
    threshold: float,
) -> DataFrame:
    """Shared staleness body: frozen assignments from `assign_full`
    (vec_id, cent_id — full corpus coverage), one Lloyd step over the
    same set, re-assign against the updated centroids, per-centroid
    reassignment rates."""
    frozen = assign_full.select("vec_id", F.col("cent_id").alias("frozen_cent"))
    upd = ivf_centroid_update(spark, sf_dir, k, assign=assign_full)
    c1 = (
        upd.groupBy("cent_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mean_v"))).alias("ps"))
        .select("cent_id", F.transform("ps", lambda s: s["mean_v"]).alias("cent"))
    )
    e = tables.load_table(spark, sf_dir, "embeddings")
    scored = parallelism.spread_scan(spark, sf_dir, e, "embeddings", "vec_id").crossJoin(
        F.broadcast(c1)
    ).selectExpr(
        "vec_id",
        "cent_id",
        f"round({V.cosine_expr_sql('embedding', 'cent')}, 6) AS cosine",
    )
    nearest = _argmax_centroid(scored, with_cosine=False).select(
        "vec_id", F.col("cent_id").alias("new_cent")
    )
    moved = (F.col("new_cent") != F.col("frozen_cent")).cast("long")
    return (
        frozen.join(nearest, "vec_id")
        .groupBy(F.col("frozen_cent").alias("cent_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(moved).alias("n_reassigned"),
            F.round(F.sum(moved) / F.count(F.lit(1)), 6).alias("reassign_rate"),
        )
        .withColumn("stale", F.col("reassign_rate") > threshold)
    )


def ivf_staleness_report_oracle(
    k: int = IVF_K, threshold: float = IVF_STALE_THRESHOLD
) -> str:
    cos = V.cosine_sql("e.embedding", "c.cent")
    return f"""
WITH frozen AS (
  SELECT vec_id, cent_id AS frozen_cent FROM ({ivf_assignments_oracle(k)}) t
),
upd AS ({ivf_centroid_update_oracle(k)}),
c1 AS (SELECT cent_id, list(mean_v ORDER BY pos) AS cent FROM upd GROUP BY 1),
scored AS (
  SELECT e.vec_id, c.cent_id, round({cos}, 6) AS cosine,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({cos}, 6) DESC NULLS LAST, c.cent_id) AS rn
  FROM embeddings e CROSS JOIN c1 c
),
nearest AS (SELECT vec_id, cent_id AS new_cent FROM scored WHERE rn = 1)
SELECT f.frozen_cent AS cent_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN n.new_cent <> f.frozen_cent THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reassigned,
       round(sum(CASE WHEN n.new_cent <> f.frozen_cent THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS reassign_rate,
       round(sum(CASE WHEN n.new_cent <> f.frozen_cent THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) > {threshold} AS stale
FROM frozen f JOIN nearest n USING (vec_id)
GROUP BY f.frozen_cent
"""


def ivf_index_merge(
    spark: SparkSession,
    sf_dir: str,
    k: int = IVF_K,
    hwm: int = IVF_UPSERT_HWM,
) -> DataFrame:
    """Post-merge balance audit of the incremental index: the stored
    rows (frozen assignments below the high-water mark) unioned with
    the upsert delta (ivf_upsert_assignments), profiled per centroid —
    how much of each cell is newly ingested mass. This is the write
    step's acceptance report: a cell whose upsert share runs far above
    the corpus-wide delta fraction is absorbing drifted data the
    frozen quantizer routes badly (ivf_staleness_report profiles the
    re-routing impact; this profiles the accumulation), and is the
    first candidate when `split_centroid_drift` picks cells to split.

    Scale shape: both inputs are (vec_id, cent_id) narrow tables the
    cache manager already shares across the IVF family; the union
    feeds one K-row aggregation with map-side partial combine — no
    join, no vector payload, no new corpus pass. Emits (cent_id,
    n_kept, n_upserted, n_total, upsert_share), largest cells first.
    """
    kept = (
        ivf_assignments(spark, sf_dir, k)
        .filter(F.col("vec_id") < hwm)
        .select("cent_id", F.lit(0).alias("is_new"))
    )
    new = ivf_upsert_assignments(spark, sf_dir, k, hwm).select(
        "cent_id", F.lit(1).alias("is_new")
    )
    return (
        kept.unionByName(new)
        .groupBy("cent_id")
        .agg(
            F.sum(1 - F.col("is_new")).alias("n_kept"),
            F.sum("is_new").alias("n_upserted"),
            F.count(F.lit(1)).alias("n_total"),
            F.round(F.sum("is_new") / F.count(F.lit(1)), 6).alias("upsert_share"),
        )
        .orderBy(F.col("n_total").desc(), "cent_id")
    )


def ivf_index_merge_oracle(k: int = IVF_K, hwm: int = IVF_UPSERT_HWM) -> str:
    return f"""
WITH kept AS (
  SELECT cent_id, 0 AS is_new FROM ({ivf_assignments_oracle(k)}) t WHERE vec_id < {hwm}
),
delta AS (
  SELECT cent_id, 1 AS is_new FROM ({ivf_upsert_assignments_oracle(k, hwm)}) t
),
merged AS (SELECT * FROM kept UNION ALL SELECT * FROM delta)
SELECT cent_id,
       CAST(sum(1 - is_new) AS BIGINT) AS n_kept,
       CAST(sum(is_new) AS BIGINT) AS n_upserted,
       CAST(count(*) AS BIGINT) AS n_total,
       round(sum(is_new) / CAST(count(*) AS DOUBLE), 6) AS upsert_share
FROM merged GROUP BY cent_id
ORDER BY n_total DESC, cent_id
"""


# ---------------------------------------------------------------------------
# Stored-index lifecycle: build -> store -> load -> serve
# ---------------------------------------------------------------------------

IVF_WAREHOUSE = warehouse.WAREHOUSE_DIR


def ivf_index_store(
    spark: SparkSession,
    sf_dir: str,
    k: int = IVF_K,
    hwm: int = IVF_UPSERT_HWM,
    rebuild: bool = False,
) -> str:
    """BUILD -> STORE step of the index lifecycle: materialize the
    frozen IVF index (vec_id, cent_id, cosine below the high-water
    mark) as a parquet warehouse table and return its path. This is
    the table a 100 TB deployment actually serves from — the
    in-memory `index=` parameter of `ivf_upsert_assignments` made the
    delta-cost claim testable, this makes it OPERATIONAL: the index
    survives the session, and every maintenance query (upsert, merge
    audit, staleness) reads the narrow stored table instead of
    re-deriving the assignment set from the corpus.

    The index is TWO tables under one directory: `assignments`
    (vec_id, cent_id, cosine below the high-water mark — the narrow
    membership table) and `centroids` (cent_id, cent — the frozen
    K x dim quantizer). Storing the centroids too is what lets the
    serve path touch the corpus only for the anti-joined delta: the
    quantizer no longer needs the embeddings scan that the in-memory
    `index=` harness still paid.

    Write-if-absent keyed by (sf tag, k, hwm), where the tag digests
    the fixture's absolute path AND the embeddings table's
    (size, mtime) (functions/warehouse.py: same-leaf roots must not
    share an index, and a regenerated/mutated fixture must rebuild
    rather than serve the stale store): the content is a pure function
    of the fixture tables and the defaults, so rebuilding per call
    would only burn the bench.

    `rebuild=True` (the explicit invalidation hook —
    `streaming.vectors.commit_ingest_batch` calls it, paired with
    `dedup.clear_session_memos(spark)`) is a VERSIONED commit since
    r9: the fresh index is built OUT OF PLACE into `<base>_v<N>` and a
    `<base>.CURRENT` marker is atomically repointed (os.replace), so a
    reader racing a commit sees either the old complete version or the
    new complete version — never the half-written table the old
    rebuild-in-place could expose. Resolution order for readers: the
    CURRENT-marked version if one exists, else the unversioned base
    (built if absent). Since r11 commits are SELF-CLEANING: the same
    commit collects the versions it superseded (retain = pointed,
    `warehouse.collect_superseded`), so the family's footprint is
    always exactly {pointed version, marker} — single-driver safe by
    the same argument as write-if-absent; `gcWarehouse` remains the
    janitor for dead TAGS (regenerated/removed fixtures)."""
    tag = warehouse.sf_tag(sf_dir, "embeddings")
    base = os.path.join(IVF_WAREHOUSE, f"ivf_index_{tag}_k{k}_hwm{hwm}")
    if rebuild:
        vpath = warehouse.next_version_path(base)
        _ivf_index_build(spark, sf_dir, k, hwm, vpath)
        warehouse.repoint_current(base, vpath)
        # commit-time retention (retain = pointed): collect the versions
        # this commit just superseded — and the unversioned base once the
        # pointed version serves everything it serves — so repeated
        # harness runs stop accreting _vN dirs between explicit
        # gcWarehouse invocations (r10 verdict). The warehouse stays
        # self-cleaning: after any commit, this family holds exactly
        # {pointed version, marker}.
        warehouse.collect_superseded(base)
        return vpath
    cur = warehouse.read_current(base)
    if cur is not None and warehouse.tables_ready(
        os.path.join(cur, "assignments"), os.path.join(cur, "centroids")
    ):
        return cur
    if not warehouse.tables_ready(
        os.path.join(base, "assignments"), os.path.join(base, "centroids")
    ):
        _ivf_index_build(spark, sf_dir, k, hwm, base)
    return base


def _ivf_index_build(
    spark: SparkSession, sf_dir: str, k: int, hwm: int, path: str
) -> None:
    """One full index build into `path` (centroids + assignments)."""
    assign_path = os.path.join(path, "assignments")
    cent_path = os.path.join(path, "centroids")
    e = tables.load_table(spark, sf_dir, "embeddings")
    # both tables are coalesced at write time: the K-row quantizer
    # and the hwm-row membership otherwise fragment into one file
    # per shuffle partition, and every serve query pays the file
    # listing. At 100 TB the membership write would instead
    # repartition to a width sized by row count (it is read WHOLE
    # by the anti-join, so partition pruning buys nothing — file
    # count is the only layout lever here).
    (
        e.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(cent_path)
    )
    (
        ivf_assignments(spark, sf_dir, k)
        .filter(F.col("vec_id") < hwm)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(assign_path)
    )


def ivf_stored_index(
    spark: SparkSession,
    sf_dir: str,
    k: int = IVF_K,
    hwm: int = IVF_UPSERT_HWM,
) -> DataFrame:
    """LOAD step: the frozen membership as a DataFrame backed by the
    stored parquet table (writing it first if absent). Downstream
    plans that take this as their `index=` input scan the narrow
    (vec_id, cent_id, cosine) table — never the corpus — for the
    frozen side."""
    path = ivf_index_store(spark, sf_dir, k, hwm)
    return spark.read.parquet(os.path.join(path, "assignments"))


def ivf_stored_centroids(
    spark: SparkSession,
    sf_dir: str,
    k: int = IVF_K,
    hwm: int = IVF_UPSERT_HWM,
) -> DataFrame:
    """LOAD step, quantizer half: the frozen K x dim centroid table
    from the warehouse (cent_id, cent) — what the serve path
    broadcasts instead of re-slicing the corpus."""
    path = ivf_index_store(spark, sf_dir, k, hwm)
    return spark.read.parquet(os.path.join(path, "centroids"))


def index_lifecycle_report(
    spark: SparkSession,
    sf_dir: str,
    k: int = IVF_K,
    hwm: int = IVF_UPSERT_HWM,
) -> DataFrame:
    """SERVE step — the registry's end-to-end stored-index path:
    load the frozen index from the warehouse table, assign the
    anti-joined delta against the broadcast frozen centroids
    (`ivf_upsert_assignments(index=stored)`), and emit the merge
    acceptance audit (`ivf_index_merge` schema: cent_id, n_kept,
    n_upserted, n_total, upsert_share).

    This is the plan a production deployment runs per ingest batch,
    and its cost is LITERALLY the delta: the corpus (embeddings)
    parquet is scanned exactly ONCE — for the anti-joined delta —
    because both halves of the frozen index come from the warehouse
    (membership feeds the anti-join, centroids broadcast into the
    scoring) (`test_plans.py` pins the per-location scan counts on
    this exact registry builder, closing the round-6 gap where the
    delta-cost plan existed only under a test harness).

    The oracle intentionally does NOT read the warehouse table: it
    re-derives the frozen index from the base tables
    (`ivf_index_merge_oracle`), so a hash-green row certifies the full
    build -> store -> load -> serve roundtrip preserved every value."""
    stored = ivf_stored_index(spark, sf_dir, k, hwm)
    new = _stored_delta_assignments(spark, sf_dir, k, hwm).select(
        "cent_id", F.lit(1).alias("is_new")
    )
    kept = stored.select("cent_id", F.lit(0).alias("is_new"))
    return (
        kept.unionByName(new)
        .groupBy("cent_id")
        .agg(
            F.sum(1 - F.col("is_new")).alias("n_kept"),
            F.sum("is_new").alias("n_upserted"),
            F.count(F.lit(1)).alias("n_total"),
            F.round(F.sum("is_new") / F.count(F.lit(1)), 6).alias("upsert_share"),
        )
        .orderBy(F.col("n_total").desc(), "cent_id")
    )


def index_lifecycle_report_oracle(k: int = IVF_K, hwm: int = IVF_UPSERT_HWM) -> str:
    return ivf_index_merge_oracle(k, hwm)


def _stored_delta_assignments(
    spark: SparkSession, sf_dir: str, k: int, hwm: int
) -> DataFrame:
    """The stored-path DELTA assignment subtree — the one corpus-sized
    computation on the serve path — shared by `index_lifecycle_report`
    (merge audit) and `ivf_staleness_stored` (frozen-set union).
    Persisted for the session-invariant defaults: the bulk twin's
    frozen side rides the shared `ivf_assignments` cache, and without
    this persist the stored path would re-score the delta per query
    AND per reference while its twin reads memory — the stored path
    must never bench slower than the rebuild it replaces."""
    stored = ivf_stored_index(spark, sf_dir, k, hwm)
    return persist_if(
        ivf_upsert_assignments(
            spark,
            sf_dir,
            k,
            hwm,
            index=stored,
            centroids=ivf_stored_centroids(spark, sf_dir, k, hwm),
        ),
        k == IVF_K and hwm == IVF_UPSERT_HWM,
    )


def ivf_staleness_stored(
    spark: SparkSession,
    sf_dir: str,
    k: int = IVF_K,
    threshold: float = IVF_STALE_THRESHOLD,
    hwm: int = IVF_UPSERT_HWM,
) -> DataFrame:
    """Staleness audit on the STORED-index path — the registry twin of
    `ivf_staleness_report(index=...)`. The full frozen assignment set
    is (warehouse table) UNION (delta upsert against the frozen
    centroids) — content-identical to the bulk re-derivation, so the
    oracle is `ivf_staleness_report_oracle` unchanged and a green row
    certifies the stored path value-for-value.

    The merged set feeds BOTH the frozen compare and the Lloyd update
    join; its delta half is the shared persisted
    `_stored_delta_assignments` subtree (one materialization serves
    this query AND the merge audit), so each reference re-reads only
    the narrow stored parquet plus the cache. Corpus scans on this
    path: the (cached) delta + Lloyd join + re-score — never a scan
    to reconstruct what the index already knows."""
    stored = ivf_stored_index(spark, sf_dir, k, hwm)
    assign_full = stored.select("vec_id", "cent_id").unionByName(
        _stored_delta_assignments(spark, sf_dir, k, hwm).select("vec_id", "cent_id")
    )
    return _staleness_core(spark, sf_dir, assign_full, k, threshold)


def ivf_staleness_stored_oracle(
    k: int = IVF_K, threshold: float = IVF_STALE_THRESHOLD
) -> str:
    return ivf_staleness_report_oracle(k, threshold)


def pq_recall_at_k(
    spark: SparkSession,
    sf_dir: str,
    query_text: str = "vector similarity search",
    k: int = 20,
) -> DataFrame:
    """Recall@k of the full compressed retrieval path (`pq_rerank_topk`:
    ADC shortlist over int codes -> exact cosine re-rank of the
    k×PQ_RERANK_FACTOR survivors) against the exact brute-force top-k —
    the companion of `ann_recall_at_k` for the storage-compressed index.
    Together they are the two numbers an index rollout decides on:
    IVF recall prices the probe count, PQ recall prices the code budget
    (M×nbits) and the rerank factor. Both inputs are k-row
    TakeOrderedAndProject plans; the overlap join touches 2k rows.
    Emits one row (k, rerank_factor, n_overlap, recall)."""
    qv = V.vector_lit(V.embed_query(query_text))
    e = tables.load_table(spark, sf_dir, "embeddings")
    scored = e.select(
        "vec_id", F.round(V.cosine_expr(F.col("embedding"), qv), 6).alias("cosine")
    )
    exact = (
        scored.orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id"))
        .limit(k)
        .select("vec_id")
    )
    approx = pq_rerank_topk(spark, sf_dir, query_text, k).select("vec_id")
    return exact.join(approx, "vec_id").agg(
        F.lit(k).cast("int").alias("k"),
        F.lit(PQ_RERANK_FACTOR).cast("int").alias("rerank_factor"),
        F.count(F.lit(1)).alias("n_overlap"),
        F.round(F.count(F.lit(1)) / F.lit(float(k)), 6).alias("recall"),
    )


def pq_recall_at_k_oracle(
    query_text: str = "vector similarity search", k: int = 20
) -> str:
    qv = V.vector_sql_literal(V.embed_query(query_text))
    cos = V.cosine_sql("embedding", f"{qv}")
    rerank = pq_rerank_topk_oracle(query_text, k)
    return f"""
WITH exact AS (
  SELECT vec_id FROM embeddings
  ORDER BY round({cos}, 6) DESC NULLS LAST, vec_id LIMIT {k}
),
approx AS (SELECT vec_id FROM ({rerank}) t)
SELECT CAST({k} AS INT) AS k, CAST({PQ_RERANK_FACTOR} AS INT) AS rerank_factor,
       CAST(count(*) AS BIGINT) AS n_overlap,
       round(count(*) / {float(k)}, 6) AS recall
FROM exact JOIN approx USING (vec_id)
"""

# ---------------------------------------------------------------------------
# IVF + PQ composed retrieval (the FAISS IVFADC production query shape)
# ---------------------------------------------------------------------------

def ivf_pq_topk(
    spark: SparkSession,
    sf_dir: str,
    query_text: str = "vector similarity search",
    k: int = 20,
    nprobe: int = 2,
) -> DataFrame:
    """The full production ANN query: IVF coarse probe -> PQ/ADC rank
    inside the probed cells -> exact rerank of the shortlist (Jégou et
    al. 2011, IVFADC + refine). Composes the three primitives this
    module already oracle-checks (`ann_ivf_topk`'s probe,
    `pq_adc_topk`'s distance table, `pq_rerank_topk`'s refine) into the
    one plan a 100 TB vector store actually executes per query:

    * the coarse probe scores nlist representatives (broadcast-sized);
    * the codes scan is restricted to the probed cells BEFORE any
      distance math — at scale the codes table is stored partitioned by
      cell id (IVF posting-list layout), so this filter is partition
      pruning: 1/nlist of the code bytes are read, and codes are 8
      ints/vector, not 64 floats;
    * ADC is a broadcast K×M lookup-table join + one integer-quantized
      sum per surviving vector;
    * only k×PQ_RERANK_FACTOR raw vectors are ever re-read for the
      exact cosine rerank (a broadcast semi-join probe).

    Emits (vec_id, label, cosine)."""
    e = tables.load_table(spark, sf_dir, "embeddings")
    qv_list = V.embed_query(query_text)
    qv = V.vector_lit(qv_list)
    reps = (
        e.groupBy("label").agg(F.min("vec_id").alias("rep_id"))
        .join(
            e.select(F.col("vec_id").alias("rep_id"), F.col("embedding").alias("rep_emb")),
            "rep_id",
        )
    )
    probed = (
        reps.select("label", F.round(V.cosine_expr(F.col("rep_emb"), qv), 6).alias("rep_cos"))
        .orderBy(F.col("rep_cos").desc_nulls_last(), F.col("label"))
        .limit(nprobe)
        .select("label")
    )
    q_subs = F.array(
        *[
            F.array(*[F.lit(float(v)) for v in qv_list[m * PQ_DSUB : (m + 1) * PQ_DSUB]])
            for m in range(PQ_M)
        ]
    )
    dtable = F.broadcast(
        _pq_codebook(e).select(
            "m",
            "cent_id",
            F.round(
                _l2sq_expr(F.element_at(q_subs, F.col("m") + 1), F.col("cent_sub")), 6
            ).alias("qd"),
        )
    )
    # cell membership rides with the codes in an IVFADC layout; the
    # fixture's pq_codes table doesn't carry label, so join it in (at
    # scale: partition pruning, zero join)
    codes = (
        pq_codes(spark, sf_dir)
        .select("vec_id", "m", "code")
        .join(e.select("vec_id", "label"), "vec_id")
        .join(F.broadcast(probed), "label")
    )
    adc = (
        codes.join(dtable, (codes["m"] == dtable["m"]) & (codes["code"] == dtable["cent_id"]))
        .groupBy("vec_id")
        .agg(qsum6("qd").alias("approx_dist"))
    )
    shortlist = (
        adc.orderBy(F.col("approx_dist").asc_nulls_last(), F.col("vec_id"))
        .limit(k * PQ_RERANK_FACTOR)
        .select("vec_id")
    )
    exact = e.join(F.broadcast(shortlist), "vec_id").select(
        "vec_id", "label", F.round(V.cosine_expr(F.col("embedding"), qv), 6).alias("cosine")
    )
    return exact.orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id")).limit(k)

def ivf_pq_topk_oracle(
    query_text: str = "vector similarity search", k: int = 20, nprobe: int = 2
) -> str:
    qv = V.embed_query(query_text)
    qv_lit = V.vector_sql_literal(qv)
    cos_rep = V.cosine_sql("r.embedding", f"{qv_lit}")
    cos_e = V.cosine_sql("e.embedding", f"{qv_lit}")
    q_subs = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(float(v)) for v in qv[m * PQ_DSUB : (m + 1) * PQ_DSUB]) + "]"
            for m in range(PQ_M)
        )
        + "]::DOUBLE[][]"
    )
    cent_sub = _pq_sub_sql("c.embedding", "g.m")
    return f"""
WITH reps AS (
  SELECT e.label, min(e.vec_id) AS rep_id FROM embeddings e GROUP BY e.label
),
probed AS (
  SELECT reps.label FROM reps JOIN embeddings r ON r.vec_id = reps.rep_id
  ORDER BY round({cos_rep}, 6) DESC NULLS LAST, reps.label LIMIT {nprobe}
),
codes AS ({pq_codes_oracle()}),
cents AS (
  SELECT g.m, c.vec_id AS cent_id, {cent_sub} AS cent_sub
  FROM embeddings c CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) g
  WHERE c.vec_id < {PQ_NCODES}
),
dtable AS (
  SELECT m, cent_id,
         round({_pq_l2sq_sql(f"({q_subs})[m+1]", "cent_sub")}, 6) AS qd
  FROM cents
),
cell_codes AS (
  SELECT codes.* FROM codes
  JOIN embeddings e ON e.vec_id = codes.vec_id
  JOIN probed p ON p.label = e.label
),
adc AS (
  SELECT cc.vec_id, round(sum(CAST(round((d.qd) * 1e6) AS BIGINT)) / 1e6, 6) AS approx_dist
  FROM cell_codes cc JOIN dtable d ON cc.m = d.m AND cc.code = d.cent_id
  GROUP BY cc.vec_id
),
short AS (
  SELECT vec_id FROM adc ORDER BY approx_dist ASC NULLS LAST, vec_id
  LIMIT {k * PQ_RERANK_FACTOR}
)
SELECT e.vec_id, e.label, round({cos_e}, 6) AS cosine
FROM embeddings e JOIN short s ON s.vec_id = e.vec_id
ORDER BY cosine DESC NULLS LAST, e.vec_id LIMIT {k}
"""

# ---------------------------------------------------------------------------
# Matryoshka-style dimension-truncation evaluation
# ---------------------------------------------------------------------------

TRUNC_DIM = 32

def dim_truncation_recall(
    spark: SparkSession,
    sf_dir: str,
    query_text: str = "vector similarity search",
    k: int = 20,
    d_trunc: int = TRUNC_DIM,
) -> DataFrame:
    """Recall@k of cosine search over the FIRST d_trunc dims against the
    full-dimension exact top-k — the evaluation behind
    Matryoshka-truncated retrieval (Kusupati et al. 2022): if recall
    holds at d/2, the index stores and scans HALF the vector bytes,
    which at 100 TB is the difference between a 25 TB and a 12.5 TB
    float scan before any quantization. Both rankings are narrow
    TakeOrderedAndProject plans; the overlap join touches 2k rows.
    Emits one row (k, d_full, d_trunc, n_overlap, recall).

    The scan takes the layout-gated spread (r13): both rankings score
    every vector with an interpreted-HOF cosine, which on the 1-split
    fixture layout ran BOTH passes on one core (1.8 s bench — the one
    ANN scoring probe the r12 spread sweep missed). The two rankings
    share the same repartition subtree, so the shuffle executes once
    (ReusedExchange) and each branch's top-k runs partition-parallel;
    on any healthy multi-split layout the plan is unchanged."""
    from ..functions import parallelism

    qv_list = V.embed_query(query_text)
    e = parallelism.spread_scan(
        spark, sf_dir, tables.load_table(spark, sf_dir, "embeddings"), "embeddings", "vec_id"
    )
    full_q = V.vector_lit(qv_list)
    trunc_q = V.vector_lit(qv_list[:d_trunc])
    scored_full = e.select(
        "vec_id", F.round(V.cosine_expr(F.col("embedding"), full_q), 6).alias("cos")
    )
    scored_trunc = e.select(
        "vec_id",
        F.round(
            V.cosine_expr(F.slice(F.col("embedding"), 1, d_trunc), trunc_q), 6
        ).alias("cos"),
    )
    full = scored_full.orderBy(F.col("cos").desc_nulls_last(), F.col("vec_id")).limit(k).select("vec_id")
    trunc = (
        scored_trunc.orderBy(F.col("cos").desc_nulls_last(), F.col("vec_id")).limit(k).select("vec_id")
    )
    return full.join(trunc, "vec_id").agg(
        F.lit(k).cast("int").alias("k"),
        F.lit(len(qv_list)).cast("int").alias("d_full"),
        F.lit(d_trunc).cast("int").alias("d_trunc"),
        F.count(F.lit(1)).alias("n_overlap"),
        F.round(F.count(F.lit(1)) / F.lit(float(k)), 6).alias("recall"),
    )

def dim_truncation_recall_oracle(
    query_text: str = "vector similarity search", k: int = 20, d_trunc: int = TRUNC_DIM
) -> str:
    qv = V.embed_query(query_text)
    full_lit = V.vector_sql_literal(qv)
    trunc_lit = V.vector_sql_literal(qv[:d_trunc])
    cos_full = V.cosine_sql("embedding", full_lit)
    cos_trunc = V.cosine_sql(f"embedding[1:{d_trunc}]", trunc_lit)
    return f"""
WITH full_k AS (
  SELECT vec_id FROM embeddings
  ORDER BY round({cos_full}, 6) DESC NULLS LAST, vec_id LIMIT {k}
),
trunc_k AS (
  SELECT vec_id FROM embeddings
  ORDER BY round({cos_trunc}, 6) DESC NULLS LAST, vec_id LIMIT {k}
)
SELECT CAST({k} AS INT) AS k, CAST({len(qv)} AS INT) AS d_full,
       CAST({d_trunc} AS INT) AS d_trunc,
       CAST(count(*) AS BIGINT) AS n_overlap,
       round(count(*) / {float(k)}, 6) AS recall
FROM full_k JOIN trunc_k USING (vec_id)
"""

# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep)
# ---------------------------------------------------------------------------

HN_ANCHORS = 10
HN_K = 5
HN_LO = 0.15  # below: trivially-easy negative, no gradient signal
HN_HI = 0.95  # at/above: probable duplicate/positive, would poison training

def hard_negative_mining(
    spark: SparkSession,
    sf_dir: str,
    n_anchors: int = HN_ANCHORS,
    k: int = HN_K,
    lo: float = HN_LO,
    hi: float = HN_HI,
) -> DataFrame:
    """Top-k hard negatives per anchor: corpus vectors whose cosine to
    the anchor falls in [lo, hi) — close enough to be informative for a
    contrastive/embedding training objective, below the duplicate band
    that would make them false negatives. The mining step every
    retrieval-model training pipeline runs between dedup and batch
    construction (cf. DPR, Karpukhin et al. 2020).

    Physical shape = `knn_join` with a band predicate: the anchor block
    broadcasts, the corpus scans ONCE, the band filter drops most pairs
    BEFORE ranking, and ranking is the same TWO-STAGE shape as
    `knn_join` — a local window on (scan-partition id, anchor_id)
    prunes to k rows per partition, then the global per-anchor window
    ranks only the survivors, so no anchor ever funnels the whole
    banded corpus into one reducer partition. Only narrow (anchor_id,
    neg_id, cosine) triples cross an exchange. At 100 TB the shortlist
    could come from the IVF/PQ index instead of the brute scan; the
    band-then-rank shape is unchanged. Emits
    (anchor_id, neg_id, cosine, rank)."""
    e = tables.load_table(spark, sf_dir, "embeddings")
    anchors = F.broadcast(
        e.filter(F.col("vec_id") < n_anchors).select(
            F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("a_emb")
        )
    )
    scored = (
        parallelism.spread_scan(
            spark, sf_dir, e.filter(F.col("vec_id") >= n_anchors), "embeddings"
        )
        .crossJoin(anchors)
        .selectExpr(
            "anchor_id",
            "vec_id AS neg_id",
            f"round({V.cosine_expr_sql('embedding', 'a_emb')}, 6) AS cosine",
            "spark_partition_id() AS _pid",
        )
        .filter((F.col("cosine") >= lo) & (F.col("cosine") < hi))
    )
    order = (F.col("cosine").desc_nulls_last(), F.col("neg_id"))
    w_local = Window.partitionBy("_pid", "anchor_id").orderBy(*order)
    local = (
        scored.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .select("anchor_id", "neg_id", "cosine")
    )
    w = Window.partitionBy("anchor_id").orderBy(*order)
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "neg_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )

def hard_negative_mining_oracle(
    n_anchors: int = HN_ANCHORS, k: int = HN_K, lo: float = HN_LO, hi: float = HN_HI
) -> str:
    cos = V.cosine_sql("e.embedding", "a.a_emb")
    return f"""
WITH a AS (
  SELECT vec_id AS anchor_id, embedding AS a_emb FROM embeddings WHERE vec_id < {n_anchors}
),
scored AS (
  SELECT a.anchor_id, e.vec_id AS neg_id, round({cos}, 6) AS cosine
  FROM embeddings e CROSS JOIN a WHERE e.vec_id >= {n_anchors}
),
banded AS (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
                               ORDER BY cosine DESC NULLS LAST, neg_id) AS rank
  FROM scored WHERE cosine >= {lo} AND cosine < {hi}
)
SELECT anchor_id, neg_id, cosine, CAST(rank AS INT) AS rank
FROM banded WHERE rank <= {k}
"""

# ---------------------------------------------------------------------------
# Split-centroid drift (distribution shift between dataset splits)
# ---------------------------------------------------------------------------

def split_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space distribution shift between the train/val/test
    splits: per-split centroid (the same hash-bucket assignment as
    `dataset_splits`, applied to vec_id), then pairwise centroid L2²
    and cosine — the eval-harness check that a hash split didn't land
    the holdout in a different region of embedding space (a drifted
    split makes validation loss lie). Run the same query against
    time- or source-based splits to monitor real drift.

    One posexplode pass feeds a (split, pos) mean aggregation (3×64
    rows out — map-side combined, corpus-size-independent shuffle);
    the pairwise stage joins the tiny centroid tables on the dimension
    index. All sums integer-quantized so partition order can't wobble
    the hash. Emits (split_a, split_b, l2_sq, cosine)."""
    from ..functions import hashing as H
    from .textstats import SPLIT_TRAIN_PCT, SPLIT_VAL_PCT

    e = tables.load_table(spark, sf_dir, "embeddings")
    bucket = H.h32_expr(F.col("vec_id").cast("string")) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    dims = e.select(split.alias("split"), F.posexplode("embedding").alias("pos", "v"))
    cent = dims.groupBy("split", "pos").agg(qmean6(F.col("v").cast("double")).alias("c"))
    a = cent.select(F.col("split").alias("split_a"), "pos", F.col("c").alias("ca"))
    b = cent.select(F.col("split").alias("split_b"), "pos", F.col("c").alias("cb"))
    joined = a.join(b, "pos").filter(F.col("split_a") < F.col("split_b"))
    sums = joined.groupBy("split_a", "split_b").agg(
        qsum6((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))).alias("l2_sq"),
        qsum6(F.col("ca") * F.col("cb")).alias("dot"),
        qsum6(F.col("ca") * F.col("ca")).alias("na"),
        qsum6(F.col("cb") * F.col("cb")).alias("nb"),
    )
    return sums.select(
        "split_a",
        "split_b",
        "l2_sq",
        F.when(
            F.sqrt(F.col("na")) * F.sqrt(F.col("nb")) == 0, F.lit(None).cast("double")
        )
        .otherwise(
            F.round(F.col("dot") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))), 6)
        )
        .alias("cosine"),
    )

def split_centroid_drift_oracle() -> str:
    from ..functions import hashing as H
    from ..functions.num import qmean6_sql, qsum6_sql
    from .textstats import SPLIT_TRAIN_PCT, SPLIT_VAL_PCT

    h = H.h32_sql("CAST(vec_id AS VARCHAR)")
    return f"""
WITH dims AS (
  SELECT CASE WHEN {h} % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN {h} % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split,
         g.i - 1 AS pos, CAST(embedding[g.i] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)
),
cent AS (
  SELECT split, pos, {qmean6_sql("v")} AS c FROM dims GROUP BY split, pos
),
j AS (
  SELECT a.split AS split_a, b.split AS split_b, a.c AS ca, b.c AS cb
  FROM cent a JOIN cent b ON a.pos = b.pos AND a.split < b.split
),
sums AS (
  SELECT split_a, split_b,
         {qsum6_sql("(ca - cb) * (ca - cb)")} AS l2_sq,
         {qsum6_sql("ca * cb")} AS dot,
         {qsum6_sql("ca * ca")} AS na,
         {qsum6_sql("cb * cb")} AS nb
  FROM j GROUP BY split_a, split_b
)
SELECT split_a, split_b, l2_sq,
       CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN NULL
            ELSE round(dot / (sqrt(na) * sqrt(nb)), 6) END AS cosine
FROM sums
"""

# ---------------------------------------------------------------------------
# Embedding norm audit (index-build input validation)
# ---------------------------------------------------------------------------

NORM_UNIT_TOL = 1e-4

def embedding_norm_audit(
    spark: SparkSession, sf_dir: str, tol: float = NORM_UNIT_TOL
) -> DataFrame:
    """Per-label L2-norm audit of the embedding table — the input
    validation an index build runs before trusting cosine math: a
    zero-norm vector makes cosine NULL, a non-unit-norm population
    means dot-product and cosine rankings diverge (so an IP-metric
    index would silently mis-rank). Emits per label: count, min/max
    norm (6 dp), the number of exactly-representable unit vectors
    within `tol`, and the all_unit / none_zero contract booleans the
    build job asserts on.

    One scan, one per-row higher-order-function norm, one
    map-side-combined aggregation keyed by label — nothing else."""
    e = tables.load_table(spark, sf_dir, "embeddings")
    nrm = V.norm_expr(F.col("embedding"))
    rows = e.select("label", nrm.alias("nrm"))
    return rows.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
        F.sum((F.abs(F.col("nrm") - 1.0) <= tol).cast("long")).alias("n_unit"),
        F.min((F.abs(F.col("nrm") - 1.0) <= tol).cast("int")).cast("boolean").alias("all_unit"),
        F.min((F.col("nrm") > 0).cast("int")).cast("boolean").alias("none_zero"),
    )

def embedding_norm_audit_oracle(tol: float = NORM_UNIT_TOL) -> str:
    nrm = "sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))"
    return f"""
WITH rows_ AS (SELECT label, {nrm} AS nrm FROM embeddings)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(min(nrm), 6) AS min_norm,
       round(max(nrm), 6) AS max_norm,
       CAST(sum(CASE WHEN abs(nrm - 1.0) <= {tol} THEN 1 ELSE 0 END) AS BIGINT) AS n_unit,
       CAST(min(CASE WHEN abs(nrm - 1.0) <= {tol} THEN 1 ELSE 0 END) AS BOOLEAN) AS all_unit,
       CAST(min(CASE WHEN nrm > 0 THEN 1 ELSE 0 END) AS BOOLEAN) AS none_zero
FROM rows_ GROUP BY label
"""


def ivf_silhouette(spark: SparkSession, sf_dir: str, k: int = IVF_K) -> DataFrame:
    """Per-cell simplified (centroid-based) silhouette for the IVF
    clustering: for each vector, a = cosine distance to its assigned
    centroid and b = distance to the nearest OTHER centroid, and
    s = (b - a) / max(a, b) — the internal quality number that says
    whether a cell is compact-and-separated (s -> 1) or straddling a
    boundary (s -> 0) and should be split before it hurts recall.
    Complements `ivf_cluster_quality` (tightness only) and
    `ivf_label_purity` (external labels). Emits
    (cent_id, n_members, mean_silhouette).

    The classic silhouette's all-pairs distances are O(n^2) — at scale
    everyone uses the centroid-based simplification (a/b against the
    K centroids, not the members), which keeps this ONE scan of the
    vector table: the K x dim centroids broadcast, each vector scores
    K cosines, and a per-vector rank window keeps the top two. The
    per-point s is fed to the micro-unit-quantized mean so the
    per-cell aggregate is summation-order-independent (functions/
    num.py:qmean6)."""
    scored = _centroid_scored(spark, sf_dir, k)
    w = Window.partitionBy("vec_id").orderBy(
        F.desc_nulls_last("cosine"), F.asc("cent_id")
    )
    top2 = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    paired = (
        top2.groupBy("vec_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("cent_id"))).alias("cent_id"),
            F.max(F.when(F.col("rn") == 1, F.col("cosine"))).alias("cos1"),
            F.max(F.when(F.col("rn") == 2, F.col("cosine"))).alias("cos2"),
        )
        .withColumn(
            # a = 1 - cos1, b = 1 - cos2 with cos2 <= cos1, so
            # max(a, b) = b; nullif guards a duplicate-of-centroid
            # second-best (b = 0) out of the mean, matching count(col)
            # null semantics on both engines
            "s",
            (F.col("cos1") - F.col("cos2"))
            / F.nullif(F.lit(1.0) - F.col("cos2"), F.lit(0.0)),
        )
    )
    return paired.groupBy("cent_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        qmean6(F.col("s")).alias("mean_silhouette"),
    )


def ivf_silhouette_oracle(k: int = IVF_K) -> str:
    from ..functions.num import qmean6_sql

    return f"""
WITH {_scored_sql(k)},
paired AS (
  SELECT vec_id,
         max(CASE WHEN rn = 1 THEN cent_id END) AS cent_id,
         max(CASE WHEN rn = 1 THEN cosine END) AS cos1,
         max(CASE WHEN rn = 2 THEN cosine END) AS cos2
  FROM scored WHERE rn <= 2 GROUP BY vec_id
),
svals AS (
  SELECT cent_id,
         (cos1 - cos2) / nullif(1.0 - cos2, 0.0) AS s
  FROM paired
)
SELECT cent_id, CAST(count(*) AS BIGINT) AS n_members,
       {qmean6_sql("s")} AS mean_silhouette
FROM svals GROUP BY cent_id
"""


DIVERSE_PER_CELL = 5


def semantic_diverse_sample(
    spark: SparkSession, sf_dir: str, k: int = IVF_K, r: int = DIVERSE_PER_CELL
) -> DataFrame:
    """Cluster-stratified diversity sample over the embedding space:
    per IVF cell, the r members CLOSEST to the centroid (prototypes —
    the redundancy a SemDeDup-style pass would collapse toward) and the
    r FARTHEST (frontier — the long-tail examples a diversity-seeking
    curation keeps). Sampling BY CELL instead of uniformly guarantees
    every semantic region contributes, which a global top-k never does.
    Emits (cent_id, role, rank, vec_id, cosine); a member of a cell
    smaller than 2r can legitimately carry both roles.

    Physical shape: rides the persisted `ivf_assignments` subtree (one
    corpus scan shared with the whole IVF family), then two per-cell
    rank windows over (cent_id) — partition-parallel, no global sort;
    the output is 2*r*k rows regardless of corpus size."""
    assign = ivf_assignments(spark, sf_dir, k)
    # a NULL cosine (zero-norm vector, undefined similarity) ranks
    # frontier-most and prototype-last; NULL order pinned on BOTH
    # engines (Spark asc defaults NULLS FIRST, DuckDB NULLS LAST)
    w_proto = Window.partitionBy("cent_id").orderBy(
        F.desc_nulls_last("cosine"), F.asc("vec_id")
    )
    w_front = Window.partitionBy("cent_id").orderBy(
        F.asc_nulls_first("cosine"), F.asc("vec_id")
    )
    proto = (
        assign.withColumn("rank", F.row_number().over(w_proto))
        .filter(F.col("rank") <= r)
        .select(
            "cent_id",
            F.lit("prototype").alias("role"),
            F.col("rank").cast("int").alias("rank"),
            "vec_id",
            "cosine",
        )
    )
    front = (
        assign.withColumn("rank", F.row_number().over(w_front))
        .filter(F.col("rank") <= r)
        .select(
            "cent_id",
            F.lit("frontier").alias("role"),
            F.col("rank").cast("int").alias("rank"),
            "vec_id",
            "cosine",
        )
    )
    return proto.unionByName(front)


def semantic_diverse_sample_oracle(
    k: int = IVF_K, r: int = DIVERSE_PER_CELL
) -> str:
    return f"""
WITH assign AS ({ivf_assignments_oracle(k)}),
ranked AS (
  SELECT cent_id, vec_id, cosine,
         row_number() OVER (PARTITION BY cent_id
                            ORDER BY cosine DESC NULLS LAST, vec_id ASC) AS r_proto,
         row_number() OVER (PARTITION BY cent_id
                            ORDER BY cosine ASC NULLS FIRST, vec_id ASC) AS r_front
  FROM assign
)
SELECT cent_id, 'prototype' AS role, CAST(r_proto AS INT) AS rank, vec_id, cosine
FROM ranked WHERE r_proto <= {r}
UNION ALL
SELECT cent_id, 'frontier', CAST(r_front AS INT), vec_id, cosine
FROM ranked WHERE r_front <= {r}
"""
