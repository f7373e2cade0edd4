"""API parity layer: all 12 endpoints, param clamping, schema
validation, async-job lifecycle."""

from __future__ import annotations

import time

import pytest

from roblox_vector_search_datagen_spark.api import ApiError, ApiService
from roblox_vector_search_datagen_spark.corpus import Corpus
from roblox_vector_search_datagen_spark.jobs.manager import JobManager
from roblox_vector_search_datagen_spark.schemas import EMBEDDING_SCHEMA, GAME_SCHEMA

from .test_cli import SEED_GAMES, FakeRoblox

@pytest.fixture()
def svc(spark, tmp_path):
    corpus = Corpus(spark, str(tmp_path / "data"))
    corpus.write_games(spark.createDataFrame(SEED_GAMES, GAME_SCHEMA))
    corpus.write_embeddings(
        spark.createDataFrame([(1, [1.0, 0.0, 0.5]), (999, [0.1, 0.2, 0.3])], EMBEDDING_SCHEMA)
    )
    s = ApiService(
        corpus,
        JobManager(spark, str(tmp_path / "joblog")),
        transport_factory=lambda: FakeRoblox(),
    )
    yield s
    s.shutdown()

def test_endpoint_registry_complete(svc):
    assert len(svc.endpoints) == 12
    assert sum(1 for m, _ in svc.endpoints if m == "POST") == 5

def test_get_games_sorted(svc):
    rows = svc.get_games()
    assert [r["name"] for r in rows] == sorted(r["name"] for r in rows)
    assert set(rows[0]) == {"universeId", "name", "rootPlaceId"}
    assert len(svc.get_games(limit=2)) == 2

def test_search_endpoints_validate(svc):
    with pytest.raises(ApiError) as e:
        svc.get_search("")
    assert e.value.status == 400
    rows = svc.get_search("alpha")
    assert rows and rows[0]["matchType"] == "title"
    with pytest.raises(ApiError):
        svc.get_search("x", limit="NaN")
    # limit clamped to 1..100, not errored
    assert isinstance(svc.get_search("a", limit=10_000), list)

def test_vector_and_similar_search(svc):
    assert svc.get_vector_search("castle") == []  # dim guard: 3-dim corpus vs 64-dim query
    rows = svc.get_similar_search(999)
    assert [r["universeId"] for r in rows] == [1]
    assert rows[0]["similarity"] is not None
    with pytest.raises(ApiError) as e:
        svc.get_similar_search(12345)
    assert e.value.status == 404

def test_stats(svc):
    s = svc.get_stats()
    assert s["total_games"] == 6
    assert s["lacking_embeddings"] == 5  # only universe 1 has an embedding

@pytest.mark.slow
def test_async_job_roundtrip(svc):
    resp = svc.post_gather_games()
    jid = resp["jobId"]
    assert resp["status"] == "pending"
    for _ in range(120):
        job = svc.get_job(jid)
        if job["status"] in ("completed", "failed"):
            break
        time.sleep(1)
    assert job["status"] == "completed", job.get("error")
    assert job["result"] == "4"  # four gathered rows (same fixture as test_cli)
    listed = svc.get_jobs()
    assert any(j["id"] == jid for j in listed)
    with pytest.raises(ApiError) as e:
        svc.get_job("missing")
    assert e.value.status == 404

def test_openapi_spec(svc):
    spec = svc.openapi_spec()
    ops = [(m, p) for p, methods in spec["paths"].items() for m in methods]
    assert len(ops) == 12
    assert "/similar-search/{universeId}" in spec["paths"]
    assert spec["paths"]["/stats"]["get"]["summary"].startswith("GET /stats")
