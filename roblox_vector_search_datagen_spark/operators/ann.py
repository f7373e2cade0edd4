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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector as V
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

    e = tables.load_table(spark, sf_dir, "embeddings")
    cents = F.broadcast(
        e.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
        )
    )
    scored = e.crossJoin(cents).select(
        "vec_id",
        "cent_id",
        F.round(V.cosine_expr(F.col("embedding"), F.col("cent")), 6).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc_nulls_last(), F.col("cent_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "cent_id", "cosine")
    )

def ivf_assignments_oracle(k: int = IVF_K) -> str:
    cos = V.cosine_sql("e.embedding", "c.cent")
    return f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id < {k}
),
scored AS (
  SELECT e.vec_id, c.cent_id, round({cos}, 6) AS cosine,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({cos}, 6) DESC NULLS LAST, c.cent_id) AS rn
  FROM embeddings e CROSS JOIN cents c
)
SELECT vec_id, cent_id, cosine FROM scored WHERE rn = 1
"""

def ivf_centroid_update(spark: SparkSession, sf_dir: str, k: int = IVF_K) -> DataFrame:
    """IVF bulk build, update step (one Lloyd iteration): per-centroid
    element-wise mean of the assigned vectors, emitted flat as
    (cent_id, pos, mean) — the shape the next assignment pass joins on.

    posexplode fans each vector into dim rows ONCE, then a single
    (cent_id, pos) aggregation computes all means — no per-dimension
    scans, one shuffle keyed (cent_id, pos) whose cardinality is K×dim
    regardless of corpus size (map-side combine does the heavy sum)."""
    assign = ivf_assignments(spark, sf_dir, k).select("vec_id", "cent_id")
    e = tables.load_table(spark, sf_dir, "embeddings")
    dims = (
        e.join(assign, "vec_id")
        .select("cent_id", F.posexplode("embedding").alias("pos", "v"))
    )
    return (
        dims.groupBy("cent_id", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("mean_v"))
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
SELECT cent_id, CAST(pos AS INT) AS pos, round(avg(v), 6) AS mean_v
FROM dims GROUP BY cent_id, pos
"""
