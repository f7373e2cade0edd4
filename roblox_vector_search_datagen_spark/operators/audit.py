"""Dataset-governance audits: the checks a pipeline runs BEFORE a
training job trusts a snapshot, and the accounting a privacy request
triggers against one.

* `constraint_audit` is the declarative data-validation pass (the
  Deequ/Great-Expectations shape re-expressed as plain aggregations):
  uniqueness, non-null, referential-integrity and range constraints
  evaluated table-by-table with ONE scan per table — every per-table
  constraint is fused into a single aggregation so a 100 TB snapshot
  pays exactly one pass per table, and the FK probes ride the same
  scan as a null-counted left join rather than separate anti-joins.
* `deletion_impact` is the right-to-be-forgotten planner: given a
  deterministic forget-set predicate over the subject keys, it counts
  the cascade (customer -> orders -> lineitem, plus the event log) the
  way a deletion job would size its tombstone writes — semi-join
  accounting only, no row payload ever moves.

Reference parity: the reference has no governance surface (its closest
analog is the prune-games maintenance pass, src/lib/commands/
pruneGames.ts); these are the beyond-reference pipeline operators the
build mandate names. Both queries are oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.caching import persist_if
from ..sources import tables

# The audited constraint set. Kept as module data so the CLI, the
# registry query and the oracle enumerate the SAME contract, and so a
# new constraint is one tuple — not four code sites.
EXPECTED_EMBEDDING_DIM = 64
KNOWN_LANGS = ("de", "en", "es", "fr", "zh")


def _stack_constraints(agged: DataFrame, table: str, names: list[str]) -> DataFrame:
    """Unpivot one fused per-table aggregation row into one row per
    constraint: (table_name, constraint, n_checked, n_violations,
    passed). `agged` must carry `<name>_checked` / `<name>_viol`
    columns for every name."""
    pairs = ", ".join(
        f"'{n}', {n}_checked, {n}_viol" for n in names
    )
    stacked = agged.select(
        F.expr(
            f"stack({len(names)}, {pairs}) AS (constraint, n_checked, n_violations)"
        )
    )
    return stacked.select(
        F.lit(table).alias("table_name"),
        "constraint",
        F.col("n_checked").cast("bigint").alias("n_checked"),
        # sum() over an empty table is NULL, not 0 — zero rows violate
        # nothing, and the CLI strict gate must not fail on it
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("bigint").alias(
            "n_violations"
        ),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).alias("passed"),
    )


def constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot validation report: every declared constraint with its
    checked-row and violation counts. Emits (table_name, constraint,
    n_checked, n_violations, passed), one row per constraint.

    Physical shape: one payload-bearing pass per audited table (the
    FK dimension sides re-scan only their pruned key column — a
    metadata-cheap second touch, not a second payload pass). Uniqueness is
    count(*) - count(distinct key) on the same pass as the null and
    range counts (map-side combined, the exchange carries one partial
    row per partition); each FK probe is a left join whose null-count
    rides the fused aggregation — customer keys broadcast under
    orders, orders keys are the one genuinely big-big join (lineitem ->
    orders) and shuffle on the key both sides are already
    bucket-friendly on. At 100 TB nothing here materializes violating
    ROWS — the report is counts; a remediation pass would re-run the
    single violated predicate as a filter."""
    cust = tables.load_table(spark, sf_dir, "customer")
    orders = tables.load_table(spark, sf_dir, "orders")
    li = tables.load_table(spark, sf_dir, "lineitem")
    docs = tables.load_table(spark, sf_dir, "documents")
    emb = tables.load_table(spark, sf_dir, "embeddings")

    n = F.count(F.lit(1))

    cust_agg = cust.agg(
        n.alias("custkey_unique_checked"),
        (n - F.count_distinct(F.col("c_custkey"))).alias("custkey_unique_viol"),
        n.alias("custkey_not_null_checked"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias(
            "custkey_not_null_viol"
        ),
    )
    cust_rows = _stack_constraints(
        cust_agg, "customer", ["custkey_unique", "custkey_not_null"]
    )

    # orders: PK uniqueness + price range + FK -> customer, one scan.
    # The FK probe is a null-counted left join against the (distinct)
    # key column only — the dimension side broadcasts.
    cust_keys = F.broadcast(
        cust.select(F.col("c_custkey").alias("fk_custkey")).distinct()
    )
    ord_agg = (
        orders.join(cust_keys, orders.o_custkey == F.col("fk_custkey"), "left")
        .agg(
            n.alias("orderkey_unique_checked"),
            (n - F.count_distinct(F.col("o_orderkey"))).alias("orderkey_unique_viol"),
            n.alias("custkey_fk_checked"),
            F.sum(F.when(F.col("fk_custkey").isNull(), 1).otherwise(0)).alias(
                "custkey_fk_viol"
            ),
            n.alias("totalprice_positive_checked"),
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
                "totalprice_positive_viol"
            ),
        )
    )
    ord_rows = _stack_constraints(
        ord_agg, "orders", ["orderkey_unique", "custkey_fk", "totalprice_positive"]
    )

    # lineitem: composite PK + FK -> orders + value ranges, one scan.
    # orders' key column broadcasts at fixture scale; at 100 TB this is
    # the one shuffle join in the audit and both sides bucket on
    # orderkey, so a bucketed warehouse runs it exchange-free.
    ord_keys = F.broadcast(
        orders.select(F.col("o_orderkey").alias("fk_orderkey")).distinct()
    )
    li_agg = (
        li.join(ord_keys, li.l_orderkey == F.col("fk_orderkey"), "left")
        .agg(
            n.alias("pk_unique_checked"),
            (
                # struct form, NOT multi-arg: Spark's multi-column
                # COUNT DISTINCT drops any-NULL rows while DuckDB's
                # tuple DISTINCT counts them — the struct is non-null
                # even with null fields, matching the oracle exactly
                n
                - F.count_distinct(F.struct("l_orderkey", "l_linenumber"))
            ).alias("pk_unique_viol"),
            n.alias("orderkey_fk_checked"),
            F.sum(F.when(F.col("fk_orderkey").isNull(), 1).otherwise(0)).alias(
                "orderkey_fk_viol"
            ),
            n.alias("quantity_range_checked"),
            F.sum(
                F.when(
                    (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
                ).otherwise(0)
            ).alias("quantity_range_viol"),
            n.alias("discount_range_checked"),
            F.sum(
                F.when(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1
                ).otherwise(0)
            ).alias("discount_range_viol"),
        )
    )
    li_rows = _stack_constraints(
        li_agg,
        "lineitem",
        ["pk_unique", "orderkey_fk", "quantity_range", "discount_range"],
    )

    # documents: PK + derived-column consistency + closed lang domain.
    doc_agg = docs.agg(
        n.alias("doc_id_unique_checked"),
        (n - F.count_distinct(F.col("doc_id"))).alias("doc_id_unique_viol"),
        n.alias("n_chars_consistent_checked"),
        F.sum(
            F.when(F.col("n_chars") != F.length(F.col("text")), 1).otherwise(0)
        ).alias("n_chars_consistent_viol"),
        n.alias("lang_known_checked"),
        F.sum(
            F.when(~F.col("lang").isin(*KNOWN_LANGS) | F.col("lang").isNull(), 1)
            .otherwise(0)
        ).alias("lang_known_viol"),
    )
    doc_rows = _stack_constraints(
        doc_agg, "documents", ["doc_id_unique", "n_chars_consistent", "lang_known"]
    )

    # embeddings: FK -> documents + uniform dimensionality, one scan.
    doc_keys = F.broadcast(docs.select(F.col("doc_id").alias("fk_doc_id")).distinct())
    emb_agg = (
        emb.join(doc_keys, emb.vec_id == F.col("fk_doc_id"), "left")
        .agg(
            n.alias("vec_id_fk_checked"),
            F.sum(F.when(F.col("fk_doc_id").isNull(), 1).otherwise(0)).alias(
                "vec_id_fk_viol"
            ),
            n.alias("dim_uniform_checked"),
            F.sum(
                F.when(F.size(F.col("embedding")) != EXPECTED_EMBEDDING_DIM, 1)
                .otherwise(0)
            ).alias("dim_uniform_viol"),
        )
    )
    emb_rows = _stack_constraints(emb_agg, "embeddings", ["vec_id_fk", "dim_uniform"])

    out = cust_rows
    for part in (ord_rows, li_rows, doc_rows, emb_rows):
        out = out.unionByName(part)
    return out


def constraint_audit_oracle() -> str:
    langs = ", ".join(f"'{l}'" for l in KNOWN_LANGS)
    return f"""
WITH cust AS (
  SELECT count(*) AS n, count(*) - count(DISTINCT c_custkey) AS uniq_viol,
         sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS null_viol
  FROM customer
),
ord AS (
  SELECT count(*) AS n,
         count(*) - count(DISTINCT o_orderkey) AS uniq_viol,
         sum(CASE WHEN c.fk IS NULL THEN 1 ELSE 0 END) AS fk_viol,
         sum(CASE WHEN o.o_totalprice <= 0 THEN 1 ELSE 0 END) AS price_viol
  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey AS fk FROM customer) c
    ON o.o_custkey = c.fk
),
li AS (
  SELECT count(*) AS n,
         count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS pk_viol,
         sum(CASE WHEN ok.fk IS NULL THEN 1 ELSE 0 END) AS fk_viol,
         sum(CASE WHEN l.l_quantity < 1 OR l.l_quantity > 50 THEN 1 ELSE 0 END) AS qty_viol,
         sum(CASE WHEN l.l_discount < 0 OR l.l_discount > 0.1 THEN 1 ELSE 0 END) AS disc_viol
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey AS fk FROM orders) ok
    ON l.l_orderkey = ok.fk
),
doc AS (
  SELECT count(*) AS n,
         count(*) - count(DISTINCT doc_id) AS uniq_viol,
         sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END) AS chars_viol,
         sum(CASE WHEN lang IS NULL OR lang NOT IN ({langs}) THEN 1 ELSE 0 END) AS lang_viol
  FROM documents
),
emb AS (
  SELECT count(*) AS n,
         sum(CASE WHEN dk.fk IS NULL THEN 1 ELSE 0 END) AS fk_viol,
         sum(CASE WHEN len(e.embedding) != {EXPECTED_EMBEDDING_DIM} THEN 1 ELSE 0 END) AS dim_viol
  FROM embeddings e LEFT JOIN (SELECT DISTINCT doc_id AS fk FROM documents) dk
    ON e.vec_id = dk.fk
),
stacked AS (
  SELECT 'customer' AS table_name, 'custkey_unique' AS constraint, n AS n_checked, uniq_viol AS n_violations FROM cust
  UNION ALL SELECT 'customer', 'custkey_not_null', n, null_viol FROM cust
  UNION ALL SELECT 'orders', 'orderkey_unique', n, uniq_viol FROM ord
  UNION ALL SELECT 'orders', 'custkey_fk', n, fk_viol FROM ord
  UNION ALL SELECT 'orders', 'totalprice_positive', n, price_viol FROM ord
  UNION ALL SELECT 'lineitem', 'pk_unique', n, pk_viol FROM li
  UNION ALL SELECT 'lineitem', 'orderkey_fk', n, fk_viol FROM li
  UNION ALL SELECT 'lineitem', 'quantity_range', n, qty_viol FROM li
  UNION ALL SELECT 'lineitem', 'discount_range', n, disc_viol FROM li
  UNION ALL SELECT 'documents', 'doc_id_unique', n, uniq_viol FROM doc
  UNION ALL SELECT 'documents', 'n_chars_consistent', n, chars_viol FROM doc
  UNION ALL SELECT 'documents', 'lang_known', n, lang_viol FROM doc
  UNION ALL SELECT 'embeddings', 'vec_id_fk', n, fk_viol FROM emb
  UNION ALL SELECT 'embeddings', 'dim_uniform', n, dim_viol FROM emb
)
SELECT table_name, "constraint", CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM stacked
"""


# ---------------------------------------------------------------------------
# Right-to-be-forgotten cascade accounting
# ---------------------------------------------------------------------------

# Deterministic forget-set predicate: every 50th subject key. A real
# deployment feeds an explicit request table; the modulus keeps the
# fixture-driven oracle exact while exercising the same join shapes.
FORGET_MODULUS = 50


def deletion_impact(
    spark: SparkSession, sf_dir: str, modulus: int = FORGET_MODULUS
) -> DataFrame:
    """Cascade accounting for a deletion (right-to-be-forgotten) batch:
    for each impacted table, total rows, rows to delete, and the
    deleted share. Customers in the forget set cascade to their orders
    and those orders' lineitems; the event log is keyed by its own
    user_id subject space. Emits (table_name, n_rows, n_delete, share).

    Physical shape: the forget set and the deleted-order key set are
    key-only projections that broadcast (a deletion batch is small by
    nature); every cascade count is a broadcast LEFT SEMI-shaped
    conditional sum fused into one scan per table, so the audit costs
    one pass over each fact table and moves zero row payloads. At
    100 TB the same plan sizes the tombstone write for a merge-on-read
    delete; the lineitem leg rides the orderkey bucketing the audit
    join already wants."""
    cust = tables.load_table(spark, sf_dir, "customer")
    orders = tables.load_table(spark, sf_dir, "orders")
    li = tables.load_table(spark, sf_dir, "lineitem")
    events = tables.load_table(spark, sf_dir, "events")

    n = F.count(F.lit(1))
    forget = F.broadcast(
        cust.filter(F.col("c_custkey") % modulus == 0)
        .select(F.col("c_custkey").alias("forget_key"))
        .distinct()
    )

    cust_row = cust.agg(
        n.alias("n_rows"),
        F.sum(F.when(F.col("c_custkey") % modulus == 0, 1).otherwise(0)).alias(
            "n_delete"
        ),
    ).select(F.lit("customer").alias("table_name"), "n_rows", "n_delete")

    # persisted: both the orders count row and the deleted-order key
    # set for the lineitem leg read this 2-column projection — one
    # orders scan, as the docstring promises
    ord_marked = persist_if(
        orders.join(forget, orders.o_custkey == F.col("forget_key"), "left")
        .select("o_orderkey", F.col("forget_key").isNotNull().alias("deleted")),
        modulus == FORGET_MODULUS,
    )
    ord_row = ord_marked.agg(
        n.alias("n_rows"),
        F.sum(F.when(F.col("deleted"), 1).otherwise(0)).alias("n_delete"),
    ).select(F.lit("orders").alias("table_name"), "n_rows", "n_delete")

    deleted_orders = F.broadcast(
        ord_marked.filter(F.col("deleted")).select(
            F.col("o_orderkey").alias("del_orderkey")
        )
    )
    li_row = (
        li.join(deleted_orders, li.l_orderkey == F.col("del_orderkey"), "left")
        .agg(
            n.alias("n_rows"),
            F.sum(F.when(F.col("del_orderkey").isNotNull(), 1).otherwise(0)).alias(
                "n_delete"
            ),
        )
        .select(F.lit("lineitem").alias("table_name"), "n_rows", "n_delete")
    )

    ev_row = events.agg(
        n.alias("n_rows"),
        F.sum(F.when(F.col("user_id") % modulus == 0, 1).otherwise(0)).alias(
            "n_delete"
        ),
    ).select(F.lit("events").alias("table_name"), "n_rows", "n_delete")

    out = cust_row
    for part in (ord_row, li_row, ev_row):
        out = out.unionByName(part)
    return out.select(
        "table_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        # sum() over an EMPTY table is NULL in both engines; 0 is the
        # honest delete count for a table with no rows
        F.coalesce(F.col("n_delete"), F.lit(0)).cast("bigint").alias("n_delete"),
        # try_divide: an empty audited table still yields one agg row with
        # n_rows=0; ANSI `/` would throw where the oracle's nullif yields NULL
        F.round(F.try_divide(F.col("n_delete"), F.col("n_rows")), 6).alias("share"),
    )


def deletion_impact_oracle(modulus: int = FORGET_MODULUS) -> str:
    return f"""
WITH forget AS (
  SELECT DISTINCT c_custkey AS forget_key FROM customer WHERE c_custkey % {modulus} = 0
),
del_orders AS (
  SELECT o.o_orderkey FROM orders o JOIN forget f ON o.o_custkey = f.forget_key
),
rows AS (
  SELECT 'customer' AS table_name, count(*) AS n_rows,
         sum(CASE WHEN c_custkey % {modulus} = 0 THEN 1 ELSE 0 END) AS n_delete
  FROM customer
  UNION ALL
  SELECT 'orders', count(*),
         sum(CASE WHEN f.forget_key IS NOT NULL THEN 1 ELSE 0 END)
  FROM orders o LEFT JOIN forget f ON o.o_custkey = f.forget_key
  UNION ALL
  SELECT 'lineitem', count(*),
         sum(CASE WHEN d.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
  FROM lineitem l LEFT JOIN del_orders d ON l.l_orderkey = d.o_orderkey
  UNION ALL
  SELECT 'events', count(*),
         sum(CASE WHEN user_id % {modulus} = 0 THEN 1 ELSE 0 END)
  FROM events
)
SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(coalesce(n_delete, 0) AS BIGINT) AS n_delete,
       round(CAST(n_delete AS DOUBLE) / nullif(n_rows, 0), 6) AS share
FROM rows
"""


# ---------------------------------------------------------------------------
# k-anonymity risk profile
# ---------------------------------------------------------------------------

# Quasi-identifier projection for the event log: the attacker-visible
# combination (what happened, which day, coarse magnitude). VALUE_BUCKET
# coarsens the continuous column the way a publisher would before
# release.
KANON_VALUE_BUCKET = 50.0
KANON_BUCKETS = ((1, 1, "k=1"), (2, 4, "k=2-4"), (5, 19, "k=5-19"))
KANON_TAIL = "k>=20"


def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk profile before releasing the event log:
    rows sharing a quasi-identifier tuple (event_type, event day,
    value bucket) form an equivalence class of size k; a row alone in
    its class (k=1) is uniquely re-identifiable by anyone who knows
    those three facts. Emits one row per k-band: (k_bucket, n_groups,
    n_rows, row_share) — the table that decides whether the release
    needs further generalization. Pairs with `pii_scrub` (direct
    identifiers) and `deletion_impact` (erasure): the governance
    triad.

    Physical shape: one groupBy over the quasi-identifier tuple (the
    only pass that sees row payloads), then a bucketing re-aggregation
    over |classes| rows — at 100 TB the first aggregation map-side
    combines and everything after is metadata-sized."""
    e = tables.load_table(spark, sf_dir, "events")
    classes = (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") / KANON_VALUE_BUCKET).alias("vbucket"),
        )
        .groupBy("event_type", "day", "vbucket")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    bucket = F.lit(KANON_TAIL)
    for lo, hi, name in reversed(KANON_BUCKETS):
        bucket = F.when(F.col("k").between(lo, hi), F.lit(name)).otherwise(bucket)
    total = classes.agg(F.sum("k").alias("total_rows"))
    return (
        classes.select(bucket.alias("k_bucket"), "k")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("k").cast("bigint").alias("n_rows"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "k_bucket",
            "n_groups",
            "n_rows",
            F.round(F.col("n_rows") / F.col("total_rows"), 6).alias("row_share"),
        )
    )


def k_anonymity_report_oracle() -> str:
    cases = " ".join(
        f"WHEN k BETWEEN {lo} AND {hi} THEN '{name}'" for lo, hi, name in KANON_BUCKETS
    )
    return f"""
WITH classes AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value / {KANON_VALUE_BUCKET}) AS BIGINT) AS vbucket,
         count(*) AS k
  FROM events GROUP BY 1, 2, 3
),
bucketed AS (
  SELECT CASE {cases} ELSE '{KANON_TAIL}' END AS k_bucket, k FROM classes
),
total AS (SELECT sum(k) AS total_rows FROM classes)
SELECT k_bucket, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(k) AS BIGINT) AS n_rows,
       round(CAST(sum(k) AS DOUBLE) / total_rows, 6) AS row_share
FROM bucketed CROSS JOIN total
GROUP BY k_bucket, total_rows
"""
