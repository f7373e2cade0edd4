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
