"""Behavioral tests for the corpus-quality, retrieval and layout
operators (oracle parity is covered by test_oracle.py; these pin the
semantics the oracles can't see — redaction contracts, ranking
monotonicity, the Morton bit layout)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from roblox_vector_search_datagen_spark.operators import layout, quality, textstats

def test_pii_scrub_redacts_every_injected_token(spark, sf_dir):
    out = quality.pii_scrub(spark, sf_dir)
    # every decorated class is counted and its clean text carries the tag
    emails = out.filter(F.col("doc_id") % 4 == 0)
    assert emails.filter((F.col("n_emails") >= 1) & F.col("clean_text").contains("<EMAIL>")).count() == emails.count()
    ips = out.filter(F.col("doc_id") % 4 == 2)
    assert ips.filter((F.col("n_ips") >= 1) & F.col("clean_text").contains("<IP>")).count() == ips.count()
    phones = out.filter(F.col("doc_id") % 4 == 1)
    assert phones.filter((F.col("n_phones") >= 1) & F.col("clean_text").contains("<PHONE>")).count() == phones.count()
    # nothing PII-shaped survives scrubbing
    assert out.filter(F.col("clean_text").rlike(quality.EMAIL_RE)).count() == 0
    assert out.filter(F.col("clean_text").rlike(quality.PHONE_RE)).count() == 0

def test_unigram_logprob_rare_words_score_lower(spark, sf_dir):
    """A document's mean logprob is <= 0 always, and n_tokens matches
    the tokenizer used by token-counting ops."""
    out = quality.unigram_logprob(spark, sf_dir)
    assert out.filter(F.col("avg_logprob") > 0).count() == 0
    assert out.filter(F.col("n_tokens") <= 0).count() == 0

def test_quality_filter_keep_is_conjunction(spark, sf_dir):
    out = quality.quality_filter(spark, sf_dir)
    bad = out.filter(
        F.col("keep")
        != (F.col("r_nwords") & F.col("r_wlen") & F.col("r_alpha") & F.col("r_stop"))
    )
    assert bad.count() == 0

def test_bm25_scores_descend_and_match_terms(spark, sf_dir):
    rows = textstats.bm25_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= textstats.BM25_TOPK
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r.n_terms <= len(textstats.BM25_QUERY) for r in rows)

def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 3), (65535, 65535)], "a long, b long"
    ).select(layout._morton_expr(F.col("a"), F.col("b")).alias("z"))
    assert [r.z for r in df.collect()] == [1, 2, 15, 4294967295]

def test_skew_profile_shares_sum_to_at_most_one(spark, sf_dir):
    out = layout.skew_profile(spark, sf_dir)
    sums = out.groupBy("key_col").agg(F.sum("share").alias("s")).collect()
    assert len(sums) == 3
    for r in sums:
        assert r.s <= 1.000001

def test_ann_query_index_full_probe_equals_brute_force(spark, sf_dir, tmp_path):
    """Querying the persisted IVF index with nprobe == nlist must
    reproduce the exact brute-force top-k — the correctness anchor of
    the pruned online path."""
    from roblox_vector_search_datagen_spark.operators import ann

    idx = str(tmp_path / "idx")
    ann.ivf_assignments(spark, sf_dir).write.parquet(f"{idx}/ivf_assignments.parquet")
    ann.ivf_centroid_update(spark, sf_dir).write.parquet(f"{idx}/ivf_centroids.parquet")
    exact = [r.vec_id for r in ann.ann_topk(spark, sf_dir, k=20).select("vec_id").collect()]
    full = ann.ann_query_index(spark, idx, sf_dir, k=20, nprobe=ann.IVF_K)
    got = [r.vec_id for r in full.select("vec_id").collect()]
    assert sorted(got) == sorted(exact)
    pruned = ann.ann_query_index(spark, idx, sf_dir, k=20, nprobe=4)
    overlap = len(set(r.vec_id for r in pruned.collect()) & set(exact))
    assert overlap >= 1  # pruned path returns a sane approximate subset

def test_sq_quantize_error_bounded_by_half_step(spark, sf_dir):
    """Scalar quantization's reconstruction error is bounded by half a
    quantization step in every dimension, so each vector's MAE must be
    <= max_dim (mx - mn) / 255 / 2 (+ float slack)."""
    from pyspark.sql import functions as F

    from roblox_vector_search_datagen_spark.operators import ann
    from roblox_vector_search_datagen_spark.sources import tables

    e = tables.load_table(spark, sf_dir, "embeddings")
    ex = e.select(F.posexplode("embedding").alias("pos", "x"))
    step = (
        ex.groupBy("pos")
        .agg(((F.max("x") - F.min("x")) / 255.0).alias("step"))
        .agg(F.max("step").alias("max_step"))
        .collect()[0]
        .max_step
    )
    worst = ann.sq_quantize(spark, sf_dir).agg(F.max("mae").alias("m")).collect()[0].m
    assert worst <= step / 2 + 1e-9

def test_quality_buckets_approx_agrees_with_exact(spark, sf_dir):
    """The approx (t-digest cutpoint) decile assignment must agree with
    the exact ntile twin within one decile everywhere and exactly for
    most documents."""
    from roblox_vector_search_datagen_spark.operators import quality

    exact = {r.doc_id: r.decile for r in quality.quality_buckets(spark, sf_dir).collect()}
    approx = {r.doc_id: r.decile for r in quality.quality_buckets_approx(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    diffs = [abs(exact[d] - approx[d]) for d in exact]
    assert max(diffs) <= 1
    assert sum(1 for x in diffs if x == 0) / len(diffs) >= 0.8

def test_morton_roundtrip_property(spark):
    """Interleave then de-interleave recovers every (a, b) pair — run
    over a deterministic pseudo-random sample of the 16-bit domain."""
    df = (
        spark.range(0, 2000)
        .select(
            ((F.col("id") * 2654435761) % 65536).alias("a"),
            ((F.col("id") * 40503 + 12345) % 65536).alias("b"),
        )
        .select("a", "b", layout._morton_expr(F.col("a"), F.col("b")).alias("z"))
        .select("a", "b", layout._morton_inverse_expr(F.col("z")).alias("inv"))
    )
    bad = df.filter((F.col("inv.a") != F.col("a")) | (F.col("inv.b") != F.col("b"))).count()
    assert bad == 0

def test_hll_daily_users_estimates_within_bound(spark, sf_dir):
    """Sketch estimates (per cell and merged) must sit within a few
    percent of exact distinct counts — the HLL accuracy contract."""
    from roblox_vector_search_datagen_spark.operators import timeseries
    from roblox_vector_search_datagen_spark.sources import tables

    est = timeseries.hll_daily_users(spark, sf_dir).collect()
    e = tables.load_table(spark, sf_dir, "events")
    exact_cell = {
        (r.day, r.event_type): r.n
        for r in e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact_day = {
        r.day: r.n
        for r in e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert len(est) == len(exact_cell) > 0
    for r in est:
        # the in-plan contract booleans (what the oracle hashes) plus
        # exact-twin parity with an independent computation
        assert r.est_in_bounds and r.day_est_in_bounds, (r.day, r.event_type)
        assert r.n_users == exact_cell[(r.day, r.event_type)]
        assert r.day_total_users == exact_day[r.day]

def test_epoch_us_is_session_timezone_independent(spark):
    """epoch_us must interpret the NTZ wall-clock as UTC under ANY
    session timezone — including DST-gap wall times that do not exist
    in the session zone (the round-1 failure class: the driver's own
    session does not pin spark.sql.session.timeZone)."""
    from roblox_vector_search_datagen_spark.functions.timeutil import epoch_us

    df = spark.createDataFrame(
        [("2026-01-15 12:00:00.123456",), ("2026-03-08 02:30:00.000001",)], "s string"
    ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
    expected = [1768478400123456, 1772937000000001]
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("America/New_York", "Asia/Tokyo", "UTC"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = [r.us for r in df.select(epoch_us("ts").alias("us")).collect()]
            assert got == expected, (tz, got)
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)


def test_zone_map_pruning_layout_dominance(spark, sf_dir):
    """Structural invariants of the file-skipping report: a scan never
    reads fewer rows than it matches; the user-sorted layout prunes the
    user predicate at least as well as natural order; Z-order prunes
    the value predicate strictly better than either value-blind layout
    (they must read everything)."""
    from roblox_vector_search_datagen_spark.operators import layout

    rows = {
        (r.layout, r.pred_id): r
        for r in layout.zone_map_pruning(spark, sf_dir).collect()
    }
    for r in rows.values():
        assert r.rows_scanned >= r.n_match, r
        assert 0 < r.files_scanned <= r.n_files or r.n_match == 0, r
    assert (
        rows[("by_user", "user_10_40")].scan_fraction
        <= rows[("natural", "user_10_40")].scan_fraction
    )
    # value-blind layouts cannot skip a single file on a value-only
    # predicate; the Z-order layout must
    for blind in ("natural", "by_user"):
        assert rows[(blind, "value_100_200")].scan_fraction == 1.0
    assert rows[("zorder", "value_100_200")].scan_fraction < 1.0


def test_constraint_audit_clean_fixtures_pass_and_violations_count(spark, sf_dir):
    """The driver fixtures satisfy every declared constraint; a
    corrupted row is actually counted (the audit is not a tautology)."""
    from pyspark.sql import functions as F

    from roblox_vector_search_datagen_spark.operators import audit
    from roblox_vector_search_datagen_spark.sources import tables

    out = {(r.table_name, r.constraint): r for r in audit.constraint_audit(spark, sf_dir).collect()}
    assert len(out) == 14
    # the synthetic generator does NOT enforce TPC-H's lineitem PK —
    # the audit must SURFACE that, not paper over it
    pk = out[("lineitem", "pk_unique")]
    li = tables.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    ).collect()
    expected_viol = len(li) - len({(r.l_orderkey, r.l_linenumber) for r in li})
    assert pk.n_violations == expected_viol and pk.passed == (expected_viol == 0)
    for key, r in out.items():
        if key == ("lineitem", "pk_unique"):
            continue
        assert r.passed and r.n_violations == 0, r

    # corrupt one doc (n_chars off by one) through the same fused agg
    docs = tables.load_table(spark, sf_dir, "documents")
    broken = docs.withColumn(
        "n_chars",
        F.when(F.col("doc_id") == 0, F.col("n_chars") + 1).otherwise(
            F.col("n_chars")
        ),
    )
    agged = broken.agg(
        F.sum(
            F.when(F.col("n_chars") != F.length(F.col("text")), 1).otherwise(0)
        ).alias("viol")
    ).collect()[0]
    assert agged.viol == 1


def test_deletion_impact_cascade_is_consistent(spark, sf_dir):
    """Orders deleted / lineitems deleted agree with an independent
    recount, and every share is n_delete/n_rows."""
    from roblox_vector_search_datagen_spark.operators import audit
    from roblox_vector_search_datagen_spark.sources import tables

    rows = {r.table_name: r for r in audit.deletion_impact(spark, sf_dir).collect()}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    for r in rows.values():
        assert 0 <= r.n_delete <= r.n_rows
        assert abs(r.share - r.n_delete / r.n_rows) < 1e-6

    orders = tables.load_table(spark, sf_dir, "orders").collect()
    forget = {
        r.c_custkey
        for r in tables.load_table(spark, sf_dir, "customer").collect()
        if r.c_custkey % audit.FORGET_MODULUS == 0
    }
    del_orders = {r.o_orderkey for r in orders if r.o_custkey in forget}
    assert rows["orders"].n_delete == len(del_orders)
    li = tables.load_table(spark, sf_dir, "lineitem").collect()
    assert rows["lineitem"].n_delete == sum(1 for r in li if r.l_orderkey in del_orders)


def test_ivf_silhouette_bounded_and_covers_all_cells(spark, sf_dir):
    """Simplified silhouette lies in [0, 1] under the rn-1/rn-2
    construction (cos1 >= cos2) and members sum to the corpus size."""
    from roblox_vector_search_datagen_spark.operators import ann
    from roblox_vector_search_datagen_spark.sources import tables

    rows = ann.ivf_silhouette(spark, sf_dir).collect()
    n_vecs = tables.load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs
    for r in rows:
        assert r.mean_silhouette is None or 0.0 <= r.mean_silhouette <= 1.0, r


def test_repetition_budget_plan_decay_economics(spark, sf_dir):
    """The data-constrained planner's invariants: effective tokens
    never exceed the allocation, never fall below the unique tokens
    actually seen, and efficiency strictly degrades as epochs rise
    (more repetition -> each budgeted token is worth less)."""
    from roblox_vector_search_datagen_spark.operators import textprep

    rows = textprep.repetition_budget_plan(spark, sf_dir).collect()
    assert rows
    for r in rows:
        seen_unique = min(r.alloc_tokens, r.unique_tokens)
        assert seen_unique <= r.effective_tokens <= r.alloc_tokens + 1e-6, r
        assert abs(r.alloc_tokens - (seen_unique + r.repeated_tokens)) <= 1, r
    by_epochs = sorted(rows, key=lambda r: r.epochs)
    effs = [r.efficiency for r in by_epochs]
    # repetition-free sources are fully efficient; beyond 1 epoch the
    # efficiency ordering follows the epoch ordering (monotone decay)
    over = [(r.epochs, r.efficiency) for r in by_epochs if r.epochs > 1]
    assert all(e2 <= e1 + 1e-9 for (_, e1), (_, e2) in zip(over, over[1:])), effs


def test_zone_map_scan_never_misses_a_match(spark, sf_dir):
    """Zone-map pruning soundness: for every (layout, predicate), every
    row matching the predicate lives in a file the scan keeps — pruning
    may over-read (that's read_amplification) but can NEVER skip a
    match. Recomputed independently row-by-row in python."""
    import math

    from roblox_vector_search_datagen_spark.operators import layout
    from roblox_vector_search_datagen_spark.sources import tables

    events = tables.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    ).collect()

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    def file_of(r, lay):
        if lay == "natural":
            return r.event_id // layout.ZM_NATURAL_ROWS
        if lay == "by_user":
            return r.user_id // layout.ZM_USER_WIDTH
        z = morton(r.user_id % 65536, int(abs(math.floor(r.value))) % 65536)
        return z >> layout.ZM_ZSHIFT

    def matches(r, pred):
        _, u_lo, u_hi, v_lo, v_hi = pred
        return (u_lo is None or u_lo <= r.user_id <= u_hi) and (
            v_lo is None or v_lo <= r.value <= v_hi
        )

    # scanned file sets from the operator's own zone-map math
    # (collected ONCE; the loop below reads the local list)
    report_rows = layout.zone_map_pruning(spark, sf_dir).collect()
    # rebuild per-(layout,pred) scanned file ids independently
    zone = {}
    for r in events:
        for lay in ("natural", "by_user", "zorder"):
            key = (lay, file_of(r, lay))
            lo = zone.setdefault(key, [r.user_id, r.user_id, r.value, r.value, 0])
            lo[0] = min(lo[0], r.user_id); lo[1] = max(lo[1], r.user_id)
            lo[2] = min(lo[2], r.value); lo[3] = max(lo[3], r.value)
            lo[4] += 1
    for pred in layout.ZM_PREDICATES:
        pid, u_lo, u_hi, v_lo, v_hi = pred
        for lay in ("natural", "by_user", "zorder"):
            scanned = {
                f for (l, f), (mnu, mxu, mnv, mxv, _) in zone.items()
                if l == lay
                and (u_lo is None or (mnu <= u_hi and mxu >= u_lo))
                and (v_lo is None or (mnv <= v_hi and mxv >= v_lo))
            }
            for r in events:
                if matches(r, pred):
                    assert file_of(r, lay) in scanned, (lay, pid, r)
            # and the operator's counts agree with the independent rebuild
            row = [x for x in report_rows if x.layout == lay and x.pred_id == pid][0]
            assert row.files_scanned == len(scanned)
            assert row.rows_scanned == sum(
                v[4] for (l, f), v in zone.items() if l == lay and f in scanned
            )


def test_semantic_diverse_sample_roles_and_coverage(spark, sf_dir):
    """Every IVF cell contributes both roles, ranks are dense from 1,
    prototypes are at least as central as frontiers cell-by-cell, and
    nothing exceeds the per-cell budget."""
    from collections import defaultdict

    from roblox_vector_search_datagen_spark.operators import ann

    rows = ann.semantic_diverse_sample(spark, sf_dir).collect()
    cells = defaultdict(lambda: defaultdict(list))
    for r in rows:
        cells[r.cent_id][r.role].append(r)
    for cent_id, roles in cells.items():
        assert set(roles) == {"prototype", "frontier"}
        for role, members in roles.items():
            assert len(members) <= ann.DIVERSE_PER_CELL
            assert sorted(m.rank for m in members) == list(range(1, len(members) + 1))
        protos = [m.cosine for m in roles["prototype"] if m.cosine is not None]
        fronts = [m.cosine for m in roles["frontier"] if m.cosine is not None]
        if protos and fronts:
            assert min(protos) >= min(fronts) - 1e-9, cent_id


def test_funnel_within_is_tighter_than_unbounded(spark, sf_dir):
    """The gap-bounded funnel can never convert MORE users than the
    unbounded funnel at any stage, stage 1 is identical, and every
    conversion ratio is in (0, 1]."""
    from roblox_vector_search_datagen_spark.operators import timeseries

    bounded = {r.stage: r for r in timeseries.funnel_within(spark, sf_dir).collect()}
    unbounded = {r.stage: r.users for r in timeseries.funnel_counts(spark, sf_dir).collect()}
    assert bounded[1].users == unbounded[1]
    for stage, r in bounded.items():
        assert r.users <= unbounded[stage]
        assert 0 < r.conversion <= 1.0


def test_constraint_stack_handles_empty_and_null_key_tables(spark):
    """Review regressions: (a) sum() over an EMPTY table is NULL, not
    0 — the stacked report must still say passed=True with 0
    violations; (b) the lineitem PK distinct must count NULL-field
    rows the way DuckDB's tuple DISTINCT does (struct form — the
    multi-arg form silently drops any-NULL rows)."""
    import duckdb
    from pyspark.sql import functions as F

    from roblox_vector_search_datagen_spark.operators.audit import _stack_constraints

    empty = spark.createDataFrame([], "x bigint")
    agged = empty.agg(
        F.count(F.lit(1)).alias("c_checked"),
        F.sum(F.when(F.col("x") < 0, 1).otherwise(0)).alias("c_viol"),
    )
    row = _stack_constraints(agged, "empty_table", ["c"]).collect()[0]
    assert row.passed is True and row.n_violations == 0 and row.n_checked == 0

    data = [(1, None), (1, None), (1, 2), (None, None)]
    df = spark.createDataFrame(data, "a int, b int")
    spark_distinct = df.agg(
        F.count_distinct(F.struct("a", "b")).alias("d")
    ).collect()[0].d
    duck_distinct = duckdb.connect().execute(
        "SELECT count(DISTINCT (a, b)) FROM (VALUES (1,NULL),(1,NULL),(1,2),(NULL,NULL)) t(a,b)"
    ).fetchone()[0]
    assert spark_distinct == duck_distinct == 3


def test_k_anonymity_bands_partition_the_rows(spark, sf_dir):
    """The k-bands are a partition of the event log: row counts sum to
    the table size, shares sum to 1, and a k=1 band (if present) has
    n_groups == n_rows by definition."""
    from roblox_vector_search_datagen_spark.operators import audit
    from roblox_vector_search_datagen_spark.sources import tables

    rows = audit.k_anonymity_report(spark, sf_dir).collect()
    n_events = tables.load_table(spark, sf_dir, "events").count()
    assert sum(r.n_rows for r in rows) == n_events
    assert abs(sum(r.row_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        if r.k_bucket == "k=1":
            assert r.n_groups == r.n_rows
        assert r.n_groups <= r.n_rows


def test_mixture_reweight_is_a_distribution_that_upweights_lossy_sources(spark, sf_dir):
    """Weights sum to 1; every zero-excess source shares the floor
    weight; weight is monotone non-decreasing in excess loss."""
    from roblox_vector_search_datagen_spark.operators import quality

    rows = quality.mixture_reweight(spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    floor = min(r.weight for r in rows)
    for r in rows:
        if r.excess == 0.0:
            assert abs(r.weight - floor) < 2e-6, r
    by_excess = sorted(rows, key=lambda r: r.excess)
    for a, b in zip(by_excess, by_excess[1:]):
        assert a.weight <= b.weight + 2e-6


def test_join_skew_advisor_respects_the_task_budget(spark, sf_dir):
    """Every recommended salt brings the post-salt rows under the
    budget, never over-salts (salt-1 would still exceed it), and keys
    already under budget get salt 1."""
    import math

    from roblox_vector_search_datagen_spark.operators import layout

    for r in layout.join_skew_advisor(spark, sf_dir).collect():
        assert r.post_salt_rows <= layout.SKEW_TARGET_ROWS
        assert r.post_salt_rows == math.ceil(r.n / r.salt_factor)
        if r.salt_factor > 1:
            assert math.ceil(r.n / (r.salt_factor - 1)) > layout.SKEW_TARGET_ROWS
        else:
            assert r.n <= layout.SKEW_TARGET_ROWS or r.salt_factor == 1


def test_funnel_within_empty_stage_yields_null_not_crash(spark, tmp_path):
    """ADVICE r9: with ANSI mode on, a funnel stage with 0 users made
    the NEXT stage's ratio raise DIVIDE_BY_ZERO while the DuckDB
    oracle returned NULL. Corpus with signups but no clicks: stage 2
    converts 0.0, stage 3 divides 0/0 and must yield NULL on BOTH
    engines (try_divide / nullif)."""
    import datetime as dt

    import duckdb

    from roblox_vector_search_datagen_spark.operators import timeseries

    base = dt.datetime(2025, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), i, "signup", 1.0, "{}")
        for i in range(5)
    ]
    d = str(tmp_path / "fixture")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")

    got = {r.stage: r for r in timeseries.funnel_within(spark, d).collect()}
    assert got[1].users == 5 and got[1].conversion == 1.0
    assert got[2].users == 0 and got[2].conversion == 0.0
    assert got[3].users == 0 and got[3].conversion is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    oracle = {
        r[0]: r for r in con.execute(timeseries.funnel_within_oracle()).fetchall()
    }
    assert oracle[3][3] is None and got[2].conversion == oracle[2][3]


def test_deletion_impact_empty_tables_yield_null_share(spark, sf_dir, tmp_path):
    """ADVICE r9: an empty audited table still yields one agg row with
    n_rows=0; the share must be NULL (try_divide), not a
    DIVIDE_BY_ZERO crash — matching the oracle's nullif."""
    from roblox_vector_search_datagen_spark.operators import audit
    from roblox_vector_search_datagen_spark.sources import tables

    d = str(tmp_path / "empty")
    for name in ("customer", "orders", "lineitem", "events"):
        tables.load_table(spark, sf_dir, name).limit(0).coalesce(1).write.parquet(
            f"{d}/{name}.parquet"
        )
    rows = audit.deletion_impact(spark, d).collect()
    assert {r.table_name for r in rows} == {"customer", "orders", "lineitem", "events"}
    for r in rows:
        assert r.n_rows == 0 and r.n_delete == 0 and r.share is None


@pytest.mark.slow
def test_scrub_store_file_count_scales_with_corpus_bytes(spark, tmp_path):
    """r9 verdict 'what's wrong #2': the scrub store must size its file
    count by target bytes (compaction_plan's constant), not a fixed 8 —
    a corpus 4x the chars gets ~4x the files, and both match
    ceil(total_chars / COMPACT_TARGET_CHARS) exactly. Also pins the
    manifest sibling: same doc set, committed (_SUCCESS) in the same
    store call."""
    import glob
    import math

    from roblox_vector_search_datagen_spark.functions import warehouse
    from roblox_vector_search_datagen_spark.operators import textprep
    from roblox_vector_search_datagen_spark.operators.layout import (
        COMPACT_TARGET_CHARS,
    )

    word = "lorem ipsum dolor sit amet consectetur adipiscing elit sed "

    def mk(name: str, n_docs: int) -> str:
        d = str(tmp_path / name)
        rows = [
            (i, word * 40 + f"tail {i}", "en", f"s{i % 3}", len(word * 40) + 6)
            for i in range(n_docs)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(f"{d}/documents.parquet")
        return d

    for n_docs in (30, 120):
        d = mk(f"corpus{n_docs}", n_docs)
        path = textprep.scrub_store(spark, d, rebuild=True)
        total = n_docs * (len(word * 40) + 6)
        expect = max(1, math.ceil(total / COMPACT_TARGET_CHARS))
        got = len(glob.glob(f"{path}/part-*.parquet"))
        assert got == expect, (n_docs, got, expect)
        manifest = textprep._scrub_manifest_path(path)
        assert warehouse.tables_ready(path, manifest)
        stored_ids = {r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()}
        mani_ids = {r.doc_id for r in spark.read.parquet(manifest).select("doc_id").collect()}
        assert stored_ids == mani_ids and len(mani_ids) == n_docs
        # tmp-fixture tags die with tmp_path; don't leave warehouse garbage
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(manifest, ignore_errors=True)


def test_manifest_file_count_scales_and_floors():
    """The manifest sizing rule (r10 review): ceil(rows * row-bytes /
    compaction target), floored at one file — 0 rows still writes a
    valid single-file table, fixture scales stay at 1, and the count
    grows linearly at warehouse scale."""
    from roblox_vector_search_datagen_spark.operators.layout import (
        COMPACT_TARGET_CHARS,
        MANIFEST_ROW_BYTES,
        manifest_file_count,
    )

    assert manifest_file_count(0) == 1
    assert manifest_file_count(1) == 1
    assert manifest_file_count(500) == 1  # fixture scale: same layout as before
    per_file = COMPACT_TARGET_CHARS // MANIFEST_ROW_BYTES
    assert manifest_file_count(per_file) == 1
    assert manifest_file_count(per_file + 1) == 2
    assert manifest_file_count(per_file * 1000) == 1000
