"""Explicit schemas for every dataset the engine touches.

The engine never infers schemas (reference enforces types via TS strict
mode + Zod at the API edge — src/types.d.ts:59-66, src/api.ts:32-41;
here the equivalent contract is an explicit StructType on every read).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The central row type — reference `Game` (src/types.d.ts:59-66).
# Tri-state text encoding (SURVEY.md §7.4.2): NULL = never fetched,
# '' = fetched-but-blank ("known blank", reference `null`), text = present.
GAME_SCHEMA = T.StructType(
    [
        T.StructField("universeId", T.LongType(), nullable=False),
        T.StructField("rootPlaceId", T.LongType(), nullable=False),
        T.StructField("name", T.StringType(), nullable=False),
        T.StructField("description", T.StringType(), nullable=True),
        T.StructField("gameplayDescription", T.StringType(), nullable=True),
        T.StructField("playerCount", T.IntegerType(), nullable=True),
    ]
)

# Reference embeddings.json is Record<universeId, number[]>
# (src/lib/commands/generateEmbeddings.ts:17-21); modeled relationally.
EMBEDDING_SCHEMA = T.StructType(
    [
        T.StructField("universeId", T.LongType(), nullable=False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), nullable=False),
    ]
)

# Job table mirrors the SQLite DDL (src/lib/jobManager.ts:46-60).
JOB_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("command", T.StringType(), nullable=False),
        T.StructField("status", T.StringType(), nullable=False),
        T.StructField("progress_current", T.IntegerType(), nullable=True),
        T.StructField("progress_total", T.IntegerType(), nullable=True),
        T.StructField("progress_message", T.StringType(), nullable=True),
        T.StructField("result", T.StringType(), nullable=True),
        T.StructField("error", T.StringType(), nullable=True),
        T.StructField("created_at", T.TimestampType(), nullable=False),
        T.StructField("started_at", T.TimestampType(), nullable=True),
        T.StructField("completed_at", T.TimestampType(), nullable=True),
    ]
)

JOB_STATUSES = ("pending", "running", "completed", "failed")

# Image inventory (reference: data/games/images/<id>/{icon,thumbnail}.png,
# src/lib/commands/downloadImages.ts:42-44) as a binary-column table.
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("universeId", T.LongType(), nullable=False),
        T.StructField("kind", T.StringType(), nullable=False),  # icon|thumbnail
        T.StructField("path", T.StringType(), nullable=False),
        T.StructField("content", T.BinaryType(), nullable=True),
    ]
)

# LLM gameplay-analysis struct (prompts/localAnalysis.json:7-41;
# generateGameplayDescriptions.ts:152-158).
GAMEPLAY_ANALYSIS_SCHEMA = T.StructType(
    [
        T.StructField("gameplaySummary", T.StringType(), nullable=False),
        T.StructField("genreTags", T.ArrayType(T.StringType()), nullable=False),
        T.StructField("gameFeatures", T.ArrayType(T.StringType()), nullable=False),
    ]
)
