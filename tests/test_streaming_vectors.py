"""Streaming vector-index maintenance (streaming/vectors.py) vs the
oracle-pinned batch twin (operators/ann.py:ivf_upsert_assignments), plus
the routing expression's edge semantics."""

from __future__ import annotations

import pytest

import glob
import os
import shutil
import time as _time

from pyspark.sql import functions as F

from roblox_vector_search_datagen_spark.operators import ann
from roblox_vector_search_datagen_spark.streaming import vectors as SV
from roblox_vector_search_datagen_spark.streaming.events import run_stream_to_memory


def test_stream_ivf_upsert_matches_batch(spark, sf_dir):
    """AvailableNow drain over the static fixture == the DuckDB-pinned
    batch twin row-for-row, cosine values included."""
    batch = {
        (r.vec_id, r.cent_id, r.cosine)
        for r in ann.ivf_upsert_assignments(spark, sf_dir).collect()
    }
    q = run_stream_to_memory(
        SV.stream_ivf_upsert(spark, sf_dir), "vec_upsert", output_mode="append"
    )
    q.awaitTermination(120)
    streamed = {
        (r.vec_id, r.cent_id, r.cosine)
        for r in spark.sql("SELECT * FROM vec_upsert").collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def _embedding_feed(spark, tmp_path, batches):
    """One parquet file per microbatch with increasing mtimes (same
    ordered-replay trick as tests/test_streaming.py:_feed_dir)."""
    feed = tmp_path / "vfeed"
    feed.mkdir()
    t0 = _time.time() - 1000
    for i, rows in enumerate(batches):
        stage = tmp_path / f"vstage{i}"
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        dst = feed / f"b{i:02d}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    return str(feed)


@pytest.mark.slow
def test_stream_ivf_upsert_multibatch_anti_join_drops_indexed(spark, sf_dir, tmp_path):
    """Multi-microbatch feed: vectors already in the stored index are
    dropped by the stream-static anti-join in whichever microbatch
    they arrive, new vectors come out exactly once, and routing agrees
    with the batch expression on the same rows."""
    hwm = ann.IVF_UPSERT_HWM
    emb = lambda seed: [float((seed * 31 + j) % 7 - 3) for j in range(64)]
    b0 = [(hwm + 1, emb(1), 0), (hwm + 2, emb(2), 0)]
    # microbatch 1 replays two already-merged vectors + brings one new
    b1 = [(2, emb(3), 0), (3, emb(4), 0), (hwm + 3, emb(5), 0)]
    feed = _embedding_feed(spark, tmp_path, [b0, b1])
    raw = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = run_stream_to_memory(
        SV.stream_ivf_upsert(spark, sf_dir, raw=raw), "vec_upsert_mb", output_mode="append"
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM vec_upsert_mb").collect()
    assert sorted(r.vec_id for r in out) == [hwm + 1, hwm + 2, hwm + 3]
    # routing parity: the same rows through the batch-side expression
    cents = SV._frozen_centroids(spark, sf_dir, ann.IVF_K)
    cent_col, cos_col = SV._nearest_centroid_cols(F.col("embedding"), cents)
    expected = {
        (r.vec_id, r.cent_id, r.cosine)
        for r in spark.createDataFrame(
            b0 + b1[2:], "vec_id long, embedding array<float>, label int"
        )
        .select("vec_id", cent_col.alias("cent_id"), cos_col.alias("cosine"))
        .collect()
    }
    assert {(r.vec_id, r.cent_id, r.cosine) for r in out} == expected


def test_nearest_centroid_expr_tie_breaks_to_smallest_cent(spark):
    """Two identical centroids: the argmax must pick the smaller
    cent_id, matching the batch window's cosine DESC, cent_id ASC."""
    cents = [(5, [1.0, 0.0]), (7, [1.0, 0.0])]
    cent_col, cos_col = SV._nearest_centroid_cols(F.col("embedding"), cents)
    row = (
        spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
        .select(cent_col.alias("cent_id"), cos_col.alias("cosine"))
        .collect()[0]
    )
    assert row.cent_id == 5
    assert row.cosine == 1.0


def test_nearest_centroid_expr_zero_norm_degrades_to_null(spark):
    """A zero-norm vector has NULL cosine against every centroid; the
    batch window's DESC NULLS LAST ordering then lands on the smallest
    cent_id with NULL cosine — the expression must do the same."""
    cents = [(3, [1.0, 0.0]), (9, [0.0, 1.0])]
    cent_col, cos_col = SV._nearest_centroid_cols(F.col("embedding"), cents)
    row = (
        spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, embedding array<float>")
        .select(cent_col.alias("cent_id"), cos_col.alias("cosine"))
        .collect()[0]
    )
    assert row.cent_id == 3
    assert row.cosine is None


@pytest.mark.slow
def test_stream_ivf_upsert_through_idempotent_sink_feeds_merge(spark, sf_dir, tmp_path):
    """The full continuous-ingestion loop: drain the streaming upsert
    through the batchId-idempotent parquet sink (twice — the second
    drain simulates a reprocess and must self-replace, not
    double-append), then hand the landed delta to ivf_index_merge as
    the stored-index write step would. The merge totals must conserve
    mass: n_kept sums to the frozen index size, n_upserted to the
    landed delta, and per-centroid n_upserted must equal the landed
    delta's own centroid histogram."""
    from pyspark.sql import functions as F

    from roblox_vector_search_datagen_spark.streaming import sinks

    out = str(tmp_path / "delta_out")
    for i in range(2):
        q = sinks.stream_to_parquet_idempotent(
            SV.stream_ivf_upsert(spark, sf_dir), out, str(tmp_path / f"ck{i}")
        )
        q.awaitTermination(120)
    landed = spark.read.parquet(out)
    batch = ann.ivf_upsert_assignments(spark, sf_dir)
    assert landed.count() == batch.count()  # reprocess did not duplicate
    merge = ann.ivf_index_merge(spark, sf_dir).collect()
    n_kept = sum(r.n_kept for r in merge)
    n_upserted = sum(r.n_upserted for r in merge)
    assert n_kept == ann.IVF_UPSERT_HWM
    assert n_upserted == landed.count()
    landed_hist = {
        r.cent_id: r.n for r in landed.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    merge_hist = {r.cent_id: r.n_upserted for r in merge if r.n_upserted > 0}
    assert merge_hist == landed_hist


def test_warehouse_tag_distinguishes_same_leaf_roots(sf_dir, tmp_path):
    """Two fixture roots with the same leaf name must map to distinct
    warehouse entries — basename-only keying silently served the first
    corpus's stored index to the second session. And the tag is
    content-addressed: rewriting a source table (regenerated fixture,
    in-place mutation) must change the tag so write-if-absent rebuilds
    instead of serving the stale store."""
    from roblox_vector_search_datagen_spark.functions import warehouse as W

    a, b = W.sf_tag("/a/sf0.1"), W.sf_tag("/b/sf0.1")
    assert a != b
    assert a.startswith("sf0.1_") and b.startswith("sf0.1_")
    assert W.sf_tag("/a/sf0.1/") == a  # trailing-slash insensitive

    # content address: same path, touched source table -> new tag
    sf2 = str(tmp_path / "sfcontent")
    shutil.copytree(sf_dir, sf2)
    t0 = W.sf_tag(sf2, "embeddings")
    t_doc = W.sf_tag(sf2, "documents")
    assert t0 != W.sf_tag(sf2)  # the source stat participates
    os.utime(os.path.join(sf2, "embeddings.parquet"))
    assert W.sf_tag(sf2, "embeddings") != t0
    # tables the artifact does not derive from do not disturb its tag:
    # touching embeddings.parquet leaves a documents-keyed tag unchanged
    assert W.sf_tag(sf2, "documents") == t_doc


def test_commit_ingest_batch_serves_fresh_index(spark, sf_dir, tmp_path):
    """The ingestion loop's commit step: after new vectors land in the
    corpus dir, `commit_ingest_batch` must retire ALL session-lifetime
    state keyed on it — the eager memos, every persisted subtree
    (a materialized InMemoryRelation never re-reads parquet), and the
    warehouse-stored index (whose write-if-absent guard would serve
    the pre-ingestion build silently). After the commit,
    index_lifecycle_report serves the fresh index: the landed vectors
    appear in its upsert column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf2 = str(tmp_path / "sfmut")
    shutil.copytree(sf_dir, sf2)
    paths = []
    try:
        paths.append(ann.ivf_index_store(spark, sf2))
        before = ann.index_lifecycle_report(spark, sf2).collect()
        n_up_before = sum(r.n_upserted for r in before)
        n_total_before = sum(r.n_total for r in before)

        # an ingest batch lands: three new vectors above the HWM
        t = pq.read_table(f"{sf2}/embeddings.parquet")
        mx = max(t.column("vec_id").to_pylist())
        dim = len(t.column("embedding")[0].as_py())
        new = pa.table(
            {
                "vec_id": pa.array([mx + 1, mx + 2, mx + 3], pa.int64()),
                "embedding": pa.array(
                    [[float((i + j) % 5 - 2) for j in range(dim)] for i in range(3)],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 1, 2], pa.int32()),
            }
        ).cast(t.schema)
        pq.write_table(pa.concat_tables([t, new]), f"{sf2}/embeddings.parquet")

        # WITHOUT the commit the stale persisted delta (a materialized
        # InMemoryRelation never re-reads parquet) would keep
        # answering; the commit invalidates caches and rebuilds
        idx_path = SV.commit_ingest_batch(spark, sf2)
        paths.append(idx_path)
        assert os.path.exists(os.path.join(idx_path, "assignments", "_SUCCESS"))
        after = ann.index_lifecycle_report(spark, sf2).collect()
        assert sum(r.n_upserted for r in after) == n_up_before + 3
        assert sum(r.n_total for r in after) == n_total_before + 3
        # the frozen membership is unchanged — only the delta grew
        assert sum(r.n_kept for r in after) == sum(r.n_kept for r in before)
    finally:
        for p in paths:
            if os.path.exists(p):
                shutil.rmtree(p)


def test_versioned_index_commit_repoints_current_atomically(spark, sf_dir, tmp_path):
    """rebuild=True is a versioned commit (r9): each commit builds
    <base>_v<N> OUT OF PLACE and atomically repoints the .CURRENT
    marker; readers resolve the newest and the stored values match the
    live derivation. Since r11 commits are also SELF-CLEANING
    (retain = pointed): each commit collects the version it superseded
    — and the unversioned base once the pointed version serves
    everything it did — so the family's footprint is always exactly
    {pointed version, marker} with no gcWarehouse run needed."""
    import re

    from roblox_vector_search_datagen_spark.functions import warehouse as W

    sf2 = str(tmp_path / "sfver")
    shutil.copytree(sf_dir, sf2)
    base_build = ann.ivf_index_store(spark, sf2)  # unversioned first build
    assert not re.search(r"_v\d+$", base_build)

    v1 = ann.ivf_index_store(spark, sf2, rebuild=True)
    v2 = ann.ivf_index_store(spark, sf2, rebuild=True)
    assert v1.endswith("_v1") and v2.endswith("_v2")
    base = re.sub(r"_v\d+$", "", v2)
    assert base == base_build
    # readers resolve the marker -> newest committed version
    assert W.read_current(base) == v2
    assert ann.ivf_index_store(spark, sf2) == v2
    # the served version's values equal the live derivation
    stored = {
        (r.vec_id, r.cent_id) for r in ann.ivf_stored_index(spark, sf2).collect()
    }
    live = {
        (r.vec_id, r.cent_id)
        for r in ann.ivf_assignments(spark, sf2)
        .filter(F.col("vec_id") < ann.IVF_UPSERT_HWM)
        .collect()
    }
    assert stored == live and len(stored) > 0

    # commit-time retention already collected v1 (superseded by v2's
    # commit) and the unversioned base (superseded by v1's commit, whose
    # pointed version served everything the base did) — the marker
    # points at v2, so readers could never reach either
    assert not os.path.isdir(v1) and not os.path.isdir(base)
    # and GC therefore has NOTHING to collect for this family: the
    # r10-verdict contract ({pointed version, marker}) now holds at
    # every commit, not just after a gcWarehouse cycle
    live_roots = [sf2] + sorted(glob.glob(os.path.join(os.path.dirname(sf_dir), "sf*")))
    rep = W.gc_warehouse(live_roots, dry_run=True)
    assert os.path.basename(v2) in rep["kept"]
    assert os.path.basename(W.current_marker_path(base)) in rep["kept"]
    fam_removed = [n for n in rep["removed"] if n.startswith(os.path.basename(base))]
    assert fam_removed == [], fam_removed


def test_gc_warehouse_collects_stale_tags_keeps_live_and_rebuilds(
    spark, sf_dir, tmp_path
):
    """The round-lifecycle leak the r8 verdict flagged: fixtures are
    regenerated every round, each regeneration mints a new content tag,
    and the old tags' entries were never removed. gcWarehouse must
    collect entries whose tag matches no live fixture root, keep the
    live ones untouched (byte-identical), never touch unknown names,
    and a store call after a collection must rebuild cleanly."""
    from roblox_vector_search_datagen_spark.functions import warehouse as W

    sf2 = str(tmp_path / "sfgcroot")
    shutil.copytree(sf_dir, sf2)
    old_path = ann.ivf_index_store(spark, sf2)
    old_name = os.path.basename(old_path)

    # "regenerate" the fixture in place: content tag changes, the old
    # entry becomes unreachable garbage
    os.utime(os.path.join(sf2, "embeddings.parquet"))
    assert os.path.basename(ann.ivf_index_store(spark, sf2)) != old_name
    new_path = ann.ivf_index_store(spark, sf2)

    # an unknown directory must never be touched
    stranger = os.path.join(W.WAREHOUSE_DIR, "not_a_known_family_deadbeef")
    os.makedirs(stranger, exist_ok=True)
    try:
        live_roots = [sf2] + sorted(
            glob.glob(os.path.join(os.path.dirname(sf_dir), "sf*"))
        )
        listing = {e["name"]: e for e in W.list_entries()}
        assert listing[old_name]["family"] == "ivf_index"
        assert listing[old_name]["n_bytes"] > 0

        rep = W.gc_warehouse(live_roots)
        assert old_name in rep["removed"]
        assert os.path.basename(new_path) in rep["kept"]
        assert "not_a_known_family_deadbeef" in rep["skipped"]
        assert not os.path.exists(old_path)
        assert os.path.exists(os.path.join(new_path, "assignments", "_SUCCESS"))
        assert rep["reclaimed_bytes"] > 0

        # a store call after GC serves the kept entry / rebuilds cleanly
        again = ann.ivf_index_store(spark, sf2)
        assert os.path.exists(os.path.join(again, "assignments", "_SUCCESS"))
        n = spark.read.parquet(os.path.join(again, "assignments")).count()
        assert n > 0
    finally:
        shutil.rmtree(stranger, ignore_errors=True)


def test_commit_plus_gc_leaves_exactly_current_version_and_marker(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The r9 verdict's round-cycle contract: after a versioned commit
    and a (real, not dry-run) gcWarehouse, a family's warehouse
    footprint is EXACTLY {the CURRENT-pointed version dir, the marker}
    — no superseded versions, no unreachable unversioned base."""
    import re

    from roblox_vector_search_datagen_spark.functions import warehouse as W

    wdir = str(tmp_path / "wh")
    os.makedirs(wdir)
    monkeypatch.setattr(W, "WAREHOUSE_DIR", wdir)
    # ann binds the dir into a module constant at import time
    monkeypatch.setattr(ann, "IVF_WAREHOUSE", wdir)

    sf2 = str(tmp_path / "sfcycle")
    shutil.copytree(sf_dir, sf2)
    ann.ivf_index_store(spark, sf2)  # unversioned base
    ann.ivf_index_store(spark, sf2, rebuild=True)  # v1
    v2 = ann.ivf_index_store(spark, sf2, rebuild=True)  # v2, CURRENT

    rep = W.gc_warehouse([sf2], warehouse_dir=wdir)
    assert rep["skipped"] == []
    survivors = sorted(os.listdir(wdir))
    base = re.sub(r"_v\d+$", "", v2)
    assert survivors == sorted(
        [os.path.basename(v2), os.path.basename(W.current_marker_path(base))]
    ), (survivors, rep)
    # the store still serves (readers resolve the marker to v2)
    assert ann.ivf_index_store(spark, sf2) == v2


def test_gc_keeps_base_when_pointed_version_is_uncommitted(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Review regression (r10): the reader falls back to the
    unversioned base whenever the marker-pointed version fails its
    commit probe (tables_ready), so GC must NOT collect the base on a
    bare isdir() of the pointed dir — an incomplete version (lost
    _SUCCESS) would otherwise take the only servable copy with it."""
    import re

    from roblox_vector_search_datagen_spark.functions import warehouse as W

    wdir = str(tmp_path / "wh")
    os.makedirs(wdir)
    monkeypatch.setattr(W, "WAREHOUSE_DIR", wdir)
    monkeypatch.setattr(ann, "IVF_WAREHOUSE", wdir)

    sf2 = str(tmp_path / "sfuncommitted")
    shutil.copytree(sf_dir, sf2)
    ann.ivf_index_store(spark, sf2)  # unversioned base
    v1 = ann.ivf_index_store(spark, sf2, rebuild=True)
    base = re.sub(r"_v\d+$", "", v1)

    # v1's commit collected the base (retain = pointed, r11); corrupt
    # the pointed version AFTER that: drop a subtable's commit marker
    os.remove(os.path.join(v1, "assignments", "_SUCCESS"))
    # the reader falls back to the base path and REBUILDS it there
    # (the self-cleaning commit removed the old copy, so fallback is a
    # rebuild, not a stale-copy read — either way, a servable table)
    assert ann.ivf_index_store(spark, sf2) == base
    # ...and GC must keep it (and may not treat v1 as the family's copy)
    rep = W.gc_warehouse([sf2], warehouse_dir=wdir)
    assert os.path.basename(base) in rep["kept"], rep
    assert os.path.isdir(base)

    # second arm (second review pass): the version loses a WHOLE
    # subtable, not just its marker — a root-or-every-subdir probe on
    # the version alone would call it committed; the probe must check
    # the version serves every unit the BASE serves
    v2 = ann.ivf_index_store(spark, sf2, rebuild=True)
    shutil.rmtree(os.path.join(v2, "centroids"))
    assert ann.ivf_index_store(spark, sf2) == base  # fallback rebuild
    rep = W.gc_warehouse([sf2], warehouse_dir=wdir)
    assert os.path.basename(base) in rep["kept"], rep
    assert os.path.isdir(base)


def test_commit_is_self_cleaning_without_gc(spark, sf_dir, tmp_path, monkeypatch):
    """r10 verdict (What's missing #3): retention belongs at COMMIT
    time. Two consecutive rebuild commits — with no gcWarehouse run at
    all — must leave the family's warehouse footprint as exactly
    {the CURRENT-pointed version dir, the marker}: the unversioned base
    and every superseded version are collected by the commit that made
    them unreachable, so harness runs stop accreting _vN dirs."""
    import re

    from roblox_vector_search_datagen_spark.functions import warehouse as W

    wdir = str(tmp_path / "wh")
    os.makedirs(wdir)
    monkeypatch.setattr(W, "WAREHOUSE_DIR", wdir)
    monkeypatch.setattr(ann, "IVF_WAREHOUSE", wdir)

    sf2 = str(tmp_path / "sfselfclean")
    shutil.copytree(sf_dir, sf2)
    ann.ivf_index_store(spark, sf2)  # unversioned base
    ann.ivf_index_store(spark, sf2, rebuild=True)  # v1: collects base
    v2 = ann.ivf_index_store(spark, sf2, rebuild=True)  # v2: collects v1

    base = re.sub(r"_v\d+$", "", v2)
    survivors = sorted(os.listdir(wdir))
    assert survivors == sorted(
        [os.path.basename(v2), os.path.basename(W.current_marker_path(base))]
    ), survivors
    # the sole survivor still serves
    assert ann.ivf_index_store(spark, sf2) == v2
    n = spark.read.parquet(os.path.join(v2, "assignments")).count()
    assert n > 0


def test_serves_like_requires_partition_subdirs(tmp_path):
    """r10 advisory: for a ROOT-marker partitioned layout (root
    _SUCCESS + data subdirs like shard=N that carry no per-subdir
    marker), a version holding only a root _SUCCESS must NOT count as
    'serves like' the base — it is missing every data subtable the
    base's readers scan. The version qualifies only once it carries
    every data-bearing subdirectory name the base has."""
    from roblox_vector_search_datagen_spark.functions import warehouse as W

    base = tmp_path / "fam_base"
    for shard in ("shard=0", "shard=1"):
        (base / shard).mkdir(parents=True)
        (base / shard / "part-0.parquet").write_bytes(b"x")
    (base / "_SUCCESS").touch()

    # root-marker-only version: must not serve
    v_empty = tmp_path / "fam_base_v1"
    v_empty.mkdir()
    (v_empty / "_SUCCESS").touch()
    assert not W._version_serves_like(str(v_empty), str(base))

    # version with one of two partition dirs: still must not serve
    (v_empty / "shard=0").mkdir()
    assert not W._version_serves_like(str(v_empty), str(base))

    # version with every data-bearing subdir name + root marker: serves
    (v_empty / "shard=1").mkdir()
    assert W._version_serves_like(str(v_empty), str(base))

    # per-subtable-marker layouts keep their stricter contract: a
    # committed base subtable requires the SAME subtable committed
    base2 = tmp_path / "fam2_base"
    (base2 / "assignments").mkdir(parents=True)
    (base2 / "assignments" / "_SUCCESS").touch()
    v2 = tmp_path / "fam2_base_v1"
    (v2 / "assignments").mkdir(parents=True)
    assert not W._version_serves_like(str(v2), str(base2))
    (v2 / "assignments" / "_SUCCESS").touch()
    assert W._version_serves_like(str(v2), str(base2))
