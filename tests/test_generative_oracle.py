"""Generative oracle parity: the driver validates every oracle only on
the driver-generated fixtures, so a Spark/DuckDB semantic divergence
that the fixture distribution never exercises (empty documents,
whitespace-only text, unicode, zero-norm vectors, identical-vector
blocks, duplicate-saturated groups) would sail through every gate.
These tests replay the driver compare on two SEEDED synthetic corpora
built to hit exactly those edges. Deterministic (seeded rng, no
Date.now-style inputs), so a pass is stable."""

from __future__ import annotations

import random

import duckdb
import pytest

from roblox_vector_search_datagen_spark.plans.registry import QUERIES

from .oracle_utils import normalize

# documents+embeddings-only queries — the two tables the generators
# emit; every name resolves in the central registry
GEN_QUERIES = [
    "dedup_exact",
    "lsh_candidate_pairs",
    "minhash_jaccard_estimates",
    "simhash_banded_near_dups",
    "simhash_dropped_bands",
    "ngram_jaccard_pairs",
    "lang_id",
    "token_counts",
    "doc_fingerprints",
    "text_quality",
    "quality_filter",
    "dataset_splits",
    "doc_chunks",
    "repetition_stats",
    "per_group_sample",
    "repeated_substring_spans",
    "substring_scrub",
    "stratified_sample",
    "top_quality_per_source",
    "vocab_coverage",
    "token_length_histogram",
    "training_corpus",
    "lsh_dropped_buckets",
    "embedding_lsh_near_dups",
    "embedding_lsh_dropped_buckets",
    "embedding_near_dups",
    "cross_lingual_near_dups",
    "ivf_assignments",
    "ivf_train_iters",
    "ivf_label_purity",
    "ivf_index_merge",
    "knn_join",
    "bpe_merges",
    "bpe_fertility_report",
    "bpe_vocab",
    "bpe_encode_sample",
    "token_shards",
    "pack_token_sequences",
    "scrubbed_token_counts",
    "token_shards_stored",
    "stored_roundtrip_audit",
    "token_shards_upsert",
    "tokenizer_lifecycle_report",
    "media_resize",
    # r10: the real-arm contract — the generative corpus's %16 docs
    # synthesize real PNGs whatever the text payload is
    "media_resize_contract",
    # r11: the JPEG twin on the residue-8 docs (vendored baseline
    # JPEGs through the same contract)
    "media_resize_contract_jpeg",
    # r11: perceptual-hash family on the residue-4 constructed-dup
    # corpus (value-pinned real decode; hash-keyed pair self-join)
    "media_phash",
    "media_phash_dup_pairs",
    # r12: the perceptual image front door (registered this round;
    # built+pytest-pinned in r11) — same constructed-dup corpus
    "media_ingest_dedup",
    # r12: Hamming<=3 banded near-dup pairs on the near-twin corpus
    # (residue-12 docs), their dropped-bucket twin, and the image
    # admission ledger
    "media_phash_near_dup_pairs",
    "media_phash_dropped_bands",
    "media_ingest_decision_report",
    # r12: real-decode audio family (vendored WAV codec, residue-2
    # square-wave corpus)
    "audio_features",
    "audio_frame_energy",
    # r12: near-dup escalation of the image front door
    "media_ingest_near_dedup",
    # r12: loudness-invariant audio dedup
    "audio_dup_pairs",
    "scrub_stored_report",
    "length_bucket_plan",
    "source_divergence",
    # r9 late: identical-vector blocks drive cos2 -> 1 (the nullif
    # guard), empty/duplicate docs drive the repetition decay edges
    "ivf_silhouette",
    "repetition_budget_plan",
    "semantic_diverse_sample",
    "mixture_reweight",
]

LANGS = ["en", "de", "fr", "es", "zh"]


def _compare(spark_df, oracle: str, sf_dir: str, tables: list[str], label: str):
    """oracle_utils.compare_spark_duckdb, but registering only the
    tables the synthetic dir actually contains."""
    con = duckdb.connect()
    for t in tables:
        # Spark writes <table>.parquet as a DIRECTORY of part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    res = con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    assert sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in d_cols), (
        f"{label}: schema spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{label}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    _, sn = normalize(s_cols, s_rows)
    _, dn = normalize(d_cols, d_rows)
    bad = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not bad, f"{label}: {len(bad)} value mismatches, first: {bad[0]}"


def _write(spark, d, docs, embs):
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")


def _rand_vec(rng):
    return [rng.uniform(-1, 1) for _ in range(64)]


def _cleanup_warehouse(sf_dir):
    """Stored-artifact queries (token_shards_stored,
    stored_roundtrip_audit) write warehouse tables tagged by the
    corpus dir; the generative corpora are tmp dirs with fresh tags
    every run, so their entries must not accumulate in
    data/warehouse."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from roblox_vector_search_datagen_spark.functions import warehouse as W

    base = _os.path.basename(sf_dir.rstrip("/"))
    for path in _glob.glob(_os.path.join(W.WAREHOUSE_DIR, f"*_{base}_*")):
        _shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="module")
def organic_dir(spark, tmp_path_factory):
    """Plausible corpus: word soup across langs/sources with one exact
    -dup group, a near-dup pair, and unit edge docs (empty, one-word,
    unicode, tab/multi-space whitespace)."""
    rng = random.Random(42)
    docs = []
    dup_text = "the shared duplicated body of the gathered document set"
    for i in range(60):
        if i in (3, 17, 29, 41, 44, 52, 58):
            text = dup_text
        elif i == 5:
            text = ""
        elif i == 6:
            text = "solo"
        elif i == 7:
            text = "数据 去重 管道 数据 去重 管道 流 处理 数据 去重"
        elif i == 8:
            text = "alpha\tbeta  gamma\tdelta epsilon  zeta"
        elif i in (21, 22):  # near-dup pair: one word differs
            tail = "tailA" if i == 21 else "tailB"
            text = "common prefix words shared by the near duplicate pair " + tail
        else:
            text = " ".join(
                f"w{rng.randint(0, 300)}" for _ in range(rng.randint(3, 30))
            )
        docs.append((i, text, LANGS[i % 5], f"src{i % 3}", len(text)))
    embs = []
    for i in range(60):
        if i in (21, 22):  # identical vectors for the near-dup pair
            rng2 = random.Random(99)
            v = [rng2.uniform(-1, 1) for _ in range(64)]
        elif i == 5:
            v = [0.0] * 64  # zero norm -> NULL cosine path
        else:
            v = _rand_vec(rng)
        embs.append((i, v, i % 10))
    d = str(tmp_path_factory.mktemp("organic"))
    _write(spark, d, docs, embs)
    yield d
    _cleanup_warehouse(d)


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    """Hostile corpus: a 30-doc identical block (saturation below the
    caps, so the cap plumbing itself is compared), a 20-doc common-
    phrase family, whitespace-only and empty docs, and an embedding
    side with an identical-vector block plus zero vectors."""
    rng = random.Random(7)
    docs = []
    block = "every one of these documents is byte identical to the others"
    phrase = "subscribe to our newsletter for updates and offers"
    did = 0
    for _ in range(30):
        docs.append((did, block, "en", "hot", len(block)))
        did += 1
    for _ in range(20):
        noise = " ".join(f"n{rng.randint(0, 200)}" for _ in range(rng.randint(2, 8)))
        text = f"{noise} {phrase}"
        docs.append((did, text, LANGS[did % 5], "warm", len(text)))
        did += 1
    for text in ("", "   ", "\t\t"):
        docs.append((did, text, "en", "cold", len(text)))
        did += 1
    for _ in range(27):
        text = " ".join(f"u{did}x{rng.randint(0, 10**6)}" for _ in range(12))
        docs.append((did, text, LANGS[did % 5], "cold", len(text)))
        did += 1
    rng2 = random.Random(13)
    shared = [rng2.uniform(-1, 1) for _ in range(64)]
    embs = []
    for i in range(did):
        if i < 30:
            v = list(shared)  # identical-vector block
        elif i in (50, 51):
            v = [0.0] * 64
        else:
            v = _rand_vec(rng)
        embs.append((i, v, i % 10))
    d = str(tmp_path_factory.mktemp("adversarial"))
    _write(spark, d, docs, embs)
    yield d
    _cleanup_warehouse(d)


@pytest.mark.parametrize("name", GEN_QUERIES)
def test_generative_parity_organic(spark, organic_dir, name):
    q = QUERIES[name]
    _compare(
        q.builder(spark, organic_dir),
        q.oracle,
        organic_dir,
        ["documents", "embeddings"],
        f"organic/{name}",
    )


@pytest.mark.parametrize("name", GEN_QUERIES)
def test_generative_parity_adversarial(spark, adversarial_dir, name):
    q = QUERIES[name]
    _compare(
        q.builder(spark, adversarial_dir),
        q.oracle,
        adversarial_dir,
        ["documents", "embeddings"],
        f"adversarial/{name}",
    )


EVENT_QUERIES = [
    "sessionize",
    "funnel_counts",
    "user_retention",
    "retention_curve",
    "asof_next_action",
    "asof_attribution",
    "interval_click_counts",
    # event_rollup joins the customer dimension — not an events-only query
    "event_props_rollup",
    "event_value_quantiles",
    "event_value_quantiles_approx",
    "winsorized_event_stats",
    "winsorized_event_stats_approx",
    "windowed_event_counts",
    "sliding_event_counts",
    "latest_event_per_user",
    "event_anomalies",
    "event_value_histogram",
    "scd2_user_state",
    "point_in_time_state",
    # r9 late: negative/zero values + tie bursts exercise the morton
    # dims and zone-map boundary intersections
    "zone_map_pruning",
    "funnel_within",
    "user_activity_entropy",
    "k_anonymity_report",
    "rate_limited_events",
    "event_minmax_downsample",
    "hll_daily_users",
    "sketch_event_profile",
    "events_zorder",
]

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory):
    """Event stream built to hit ordering/window edges the fixture's
    uniform generator rarely produces: same-microsecond ties (click and
    purchase at one instant — the as-of tie-break), single-event users,
    events exactly ON hour/day boundaries, repeated exact values
    (quantile ties), zero/negative values, bursts inside one rate-limit
    window, and empty/missing props keys."""
    import datetime as dt

    rng = random.Random(23)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0

    def add(ts, uid, etype, value, props='{"k": 1}'):
        nonlocal eid
        rows.append((eid, ts, uid, etype, float(value), props))
        eid += 1

    # user 1: single event, value 0, empty props
    add(base + dt.timedelta(hours=1), 1, "view", 0.0, "{}")
    # user 2: same-instant tie burst — click and purchase at one μs,
    # then a second click at the same μs (event_id must break the tie)
    t = base + dt.timedelta(hours=2, microseconds=123)
    add(t, 2, "click", 10.0)
    add(t, 2, "purchase", -5.5)
    add(t, 2, "click", 10.0)
    # user 3: events exactly on hour and day boundaries
    add(base, 3, "signup", 1.0)
    add(base + dt.timedelta(hours=3), 3, "click", 2.0)
    add(base + dt.timedelta(days=1), 3, "purchase", 2.0)
    add(base + dt.timedelta(days=2), 3, "view", 3.0)
    # user 4: burst of 8 events in 10 seconds (rate-limit pressure),
    # all with the same exact value (quantile ties)
    for j in range(8):
        add(base + dt.timedelta(hours=5, seconds=j), 4, "click", 7.25)
    # user 5: signup only after activity (funnel out-of-order)
    add(base + dt.timedelta(hours=6), 5, "purchase", 100.0)
    add(base + dt.timedelta(hours=7), 5, "signup", 1.0)
    # users 10..24: random multi-day streams
    for uid in range(10, 25):
        t = base + dt.timedelta(minutes=rng.randint(0, 600))
        for _ in range(rng.randint(2, 20)):
            t = t + dt.timedelta(seconds=rng.randint(1, 40000))
            props = rng.choice(['{"k": %d}' % rng.randint(0, 99), "{}", '{"x": 3}'])
            add(t, uid, rng.choice(EVENT_TYPES), round(rng.uniform(-50, 300), 2), props)

    d = str(tmp_path_factory.mktemp("edgeevents"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    return d


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_generative_parity_events(spark, edge_events_dir, name):
    q = QUERIES[name]
    _compare(
        q.builder(spark, edge_events_dir),
        q.oracle,
        edge_events_dir,
        ["events"],
        f"events/{name}",
    )


@pytest.fixture(scope="module")
def exhausted_dir(spark, tmp_path_factory):
    """Pair-exhaustion corpus: every word collapses to one symbol
    after a single merge ('ab' everywhere, plus bare single chars), so
    BPE training runs dry before the m-round budget. The trainer
    breaks early; the oracle must carry segmentations forward through
    the empty argmax rounds instead of emptying them."""
    docs = []
    for i in range(12):
        text = "ab ab a b ab" if i % 2 == 0 else "a b ab"
        docs.append((i, text, "en", f"s{i % 2}", len(text)))
    embs = [(i, [float(i % 3)] * 64, i % 2) for i in range(12)]
    d = str(tmp_path_factory.mktemp("exhausted"))
    _write(spark, d, docs, embs)
    return d


@pytest.mark.parametrize(
    "name", ["bpe_merges", "bpe_vocab", "bpe_fertility_report", "bpe_encode_sample"]
)
def test_bpe_parity_survives_pair_exhaustion(spark, exhausted_dir, name):
    q = QUERIES[name]
    _compare(
        q.builder(spark, exhausted_dir),
        q.oracle,
        exhausted_dir,
        ["documents", "embeddings"],
        f"exhausted/{name}",
    )
