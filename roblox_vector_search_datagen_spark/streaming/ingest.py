"""Streaming corpus ingestion with dedup-at-ingest: the arriving
document stream is anti-joined against the known corpus's content
digests, so only never-seen content reaches the sink — the streaming
front door of the dedup family in operators/dedup.py.

Fixture roles are deterministic: even doc_ids play the already-ingested
corpus, odd doc_ids play the arriving stream. The digest set is a
static DataFrame (broadcast per microbatch, so a growing corpus is
picked up between batches without restarting the query); a stream-
static LEFT ANTI join keeps no stream state, which is what makes this
shape safe on an unbounded stream. The batch twin is DuckDB-oracle
checked and the stream==batch test drains Trigger.AvailableNow over
the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..sources import tables

def _digest() -> F.Column:
    return H.digest_expr(F.col("text"))

def ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: arriving (odd doc_id) documents whose normalized
    content digest does not appear in the known (even doc_id) corpus.
    Emits (doc_id, digest). One scan feeds both sides; the known-digest
    side aggregates to distinct digests before the anti-join so the
    join's build side is content-unique."""
    d = tables.load_table(spark, sf_dir, "documents")
    arriving = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", _digest().alias("digest"))
    known = d.filter(F.col("doc_id") % 2 == 0).select(_digest().alias("digest")).distinct()
    return arriving.join(F.broadcast(known), "digest", "left_anti").select("doc_id", "digest")

def ingest_dedup_oracle() -> str:
    d = H.digest_sql("text")
    return f"""
SELECT doc_id, {d} AS digest
FROM documents
WHERE doc_id % 2 = 1
  AND {d} NOT IN (
    SELECT {d} FROM documents WHERE doc_id % 2 = 0
  )
"""

def stream_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin: file-source stream of arriving documents,
    stream-static LEFT ANTI join against the known-corpus digest set.
    No watermark needed — anti join against a static side keeps no
    stream state."""
    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    arriving = stream.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", _digest().alias("digest")
    )
    d = tables.load_table(spark, sf_dir, "documents")
    known = d.filter(F.col("doc_id") % 2 == 0).select(_digest().alias("digest")).distinct()
    return arriving.join(F.broadcast(known), "digest", "left_anti").select("doc_id", "digest")
