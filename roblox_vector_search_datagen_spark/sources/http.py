"""HTTP enrichment sources (SURVEY.md §2.1 S5-S16) as Arrow-batched
executor UDFs over an injectable transport.

The reference talks to Roblox/LLM/embedding APIs from a single Node
process with hand-rolled batching, 429 backoff, and bisect-on-400
failure isolation (src/lib/commands/roblox.ts:16-61,
gatherGamesRolimons.ts:76-188, generateEmbeddings.ts:53-96). Here the
same policies live INSIDE mapInPandas functions, so a cluster gets:

* concurrency = partition count (the reference's DESCRIPTION_CONCURRENCY
  knob becomes `df.repartition(n)`)
* batching = explicit chunking inside each Arrow batch
* retry/bisect = per-executor, isolated to the failing id range

Every function takes a `transport` callable so tests (and air-gapped
runs) inject canned responses — no live network calls are made by any
test or registry query. Spark task retries can re-fire HTTP calls;
callers keep sources idempotent by anti-joining to missing-only
worklists first (operators.maintenance.needs_* — the reference's own
resume pattern, downloadImages.ts:48-58).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# transport(method, url, headers, body) -> (status_code, body_bytes)
Transport = Callable[[str, str, dict, bytes | None], tuple[int, bytes]]

def urllib_transport(method: str, url: str, headers: dict, body: bytes | None) -> tuple[int, bytes]:
    """Default stdlib transport (no third-party HTTP deps)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still carries a body
        return e.code, e.read()

@dataclass
class RetryPolicy:
    """Reference policy: HTTP 429 -> sleep 30 s -> retry, unbounded
    (roblox.ts:28-34). Tests shrink the sleep."""

    backoff_seconds: float = 30.0
    max_retries: int | None = None
    retry_statuses: tuple[int, ...] = (429,)

def request_json(
    transport: Transport,
    method: str,
    url: str,
    *,
    headers: dict | None = None,
    payload: dict | None = None,
    retry: RetryPolicy | None = None,
    sleep: Callable[[float], None] = time.sleep,
):
    """Single JSON request with the 429 retry loop."""
    retry = retry or RetryPolicy()
    headers = dict(headers or {})
    body = None
    if payload is not None:
        headers.setdefault("Content-Type", "application/json")
        body = json.dumps(payload).encode()
    attempts = 0
    while True:
        status, raw = transport(method, url, headers, body)
        if status in retry.retry_statuses and (
            retry.max_retries is None or attempts < retry.max_retries
        ):
            attempts += 1
            sleep(retry.backoff_seconds)
            continue
        if status >= 400:
            raise HttpSourceError(status, url, raw[:500])
        return json.loads(raw) if raw else None

class HttpSourceError(RuntimeError):
    def __init__(self, status: int, url: str, body: bytes):
        super().__init__(f"HTTP {status} from {url}: {body!r}")
        self.status = status
        self.url = url

def chunked(seq: list, size: int) -> Iterator[list]:
    for i in range(0, len(seq), size):
        yield seq[i : i + size]

def bisect_batches(
    ids: list,
    fetch: Callable[[list], list],
    *,
    on_single_failure: Callable[[object], list] | None = None,
) -> list:
    """Failure-isolation from gatherGamesRolimons.ts:120-156: when a
    batch request 4xx-es, recursively split it to isolate poisoned ids;
    optionally fall back to a per-id alternate source at size 1."""
    try:
        return fetch(ids)
    except HttpSourceError:
        if len(ids) == 1:
            if on_single_failure is not None:
                return on_single_failure(ids[0])
            return []
        mid = len(ids) // 2
        return bisect_batches(ids[:mid], fetch, on_single_failure=on_single_failure) + bisect_batches(
            ids[mid:], fetch, on_single_failure=on_single_failure
        )

# ---------------------------------------------------------------------------
# Concrete reference sources (public Roblox / OpenAI-compatible APIs)
# ---------------------------------------------------------------------------

GAME_DETAILS_URL = "https://games.roblox.com/v1/games?universeIds={ids}"
GAME_DETAILS_BATCH = 50  # roblox.ts:25
EMBEDDINGS_BATCH = 10  # generateEmbeddings.ts:53

def fetch_game_details_batch(
    transport: Transport, ids: list[int], retry: RetryPolicy | None = None, sleep=time.sleep
) -> list[dict]:
    """S10 (roblox.ts:16-61): batch-50 universe-id lookup -> rows of
    {universeId, description, playing}."""
    out: list[dict] = []
    for chunk in chunked(ids, GAME_DETAILS_BATCH):
        url = GAME_DETAILS_URL.format(ids=",".join(str(i) for i in chunk))
        data = request_json(transport, "GET", url, retry=retry, sleep=sleep) or {}
        for entry in data.get("data", []):
            out.append(
                {
                    "universeId": int(entry["id"]),
                    "description": entry.get("description"),
                    "playing": int(entry.get("playing", 0)),
                }
            )
    return out

DETAILS_SCHEMA = T.StructType(
    [
        T.StructField("universeId", T.LongType()),
        T.StructField("description", T.StringType()),
        T.StructField("playing", T.IntegerType()),
    ]
)

def enrich_with_game_details(
    worklist: DataFrame,
    transport_factory: Callable[[], Transport],
    *,
    concurrency: int = 4,
    retry: RetryPolicy | None = None,
) -> DataFrame:
    """Distributed S10: each partition batches its ids 50-at-a-time.
    transport_factory is called once per partition ON THE EXECUTOR so
    the closure ships only picklable config, never live sockets."""
    import pandas as pd

    def run(batches: Iterable) -> Iterator:
        transport = transport_factory()
        for pdf in batches:
            ids = [int(x) for x in pdf["universeId"]]
            rows = bisect_batches(ids, lambda c: fetch_game_details_batch(transport, c, retry=retry))
            yield pd.DataFrame(rows, columns=["universeId", "description", "playing"])

    return worklist.select("universeId").repartition(concurrency).mapInPandas(run, DETAILS_SCHEMA)

def embed_texts(
    texts_df: DataFrame,
    transport_factory: Callable[[], Transport],
    *,
    base_url: str,
    model: str,
    id_col: str = "universeId",
    text_col: str = "gameplayDescription",
    concurrency: int = 4,
    retry: RetryPolicy | None = None,
) -> DataFrame:
    """S15 (generateEmbeddings.ts:53-96): batch-10 embedding calls over
    an OpenAI-compatible /embeddings endpoint, executor-side."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterable) -> Iterator:
        transport = transport_factory()
        for pdf in batches:
            out_ids, out_vecs = [], []
            rows = list(zip(pdf[id_col], pdf[text_col]))
            for chunk in chunked(rows, EMBEDDINGS_BATCH):
                payload = {"model": model, "input": [t for _, t in chunk]}
                data = request_json(
                    transport, "POST", f"{base_url}/embeddings", payload=payload, retry=retry
                )
                for (i, _), item in zip(chunk, data["data"]):
                    out_ids.append(int(i))
                    out_vecs.append([float(v) for v in item["embedding"]])
            yield pd.DataFrame({id_col: out_ids, "embedding": out_vecs})

    return texts_df.select(id_col, text_col).repartition(concurrency).mapInPandas(run, schema)

# ---------------------------------------------------------------------------
# Driver-side cursor sources (inherently sequential)
# ---------------------------------------------------------------------------

EXPLORE_SORTS_URL = "https://apis.roblox.com/explore-api/v1/get-sorts?sessionId={sid}{token}"

def gather_games_pages(
    transport: Transport, session_id: str, retry: RetryPolicy | None = None, sleep=time.sleep
) -> list[dict]:
    """S5 (gatherGames.ts:9-40): paginated explore-sorts cursor loop.
    A remote cursor is sequential by nature — this stays on the driver
    and the RESULT becomes a DataFrame for the merge operator."""
    games: list[dict] = []
    token = ""
    while True:
        url = EXPLORE_SORTS_URL.format(sid=session_id, token=f"&sortsPageToken={token}" if token else "")
        data = request_json(transport, "GET", url, retry=retry, sleep=sleep)
        for sort in data.get("sorts", []):
            if sort.get("contentType") != "Games":  # P2
                continue
            for g in sort.get("games", []):  # P1 projection
                games.append(
                    {
                        "universeId": int(g["universeId"]),
                        "rootPlaceId": int(g["rootPlaceId"]),
                        "name": g["name"],
                    }
                )
        token = data.get("nextSortsPageToken") or ""
        if not token:
            return games

def parse_rolimons_games(html: str) -> dict[str, dict]:
    """S7/F15 (gatherGamesRolimons.ts:18-36): extract the embedded
    `var games = {...}` JS object from the scraped HTML. Pure function
    — the fetch is a one-line driver call through the transport."""
    payload = html.split("var games = ")[1].split("document.addEventListener")[0].strip()
    return json.loads(payload[:-1])  # trailing ';'

def games_df_from_rows(spark, rows: list[dict]) -> DataFrame:
    """Lift a driver-side gather result into a DataFrame with the core
    projection schema (P1)."""
    schema = T.StructType(
        [
            T.StructField("universeId", T.LongType(), False),
            T.StructField("rootPlaceId", T.LongType(), False),
            T.StructField("name", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)

def skip_existing(worklist: DataFrame, existing: DataFrame, key: str = "universeId") -> DataFrame:
    """P6 idempotence guard: drop ids that already have results — the
    anti-join that makes task-retry double-fires harmless."""
    return worklist.join(existing.select(key), key, "left_anti")

def base64_image_expr(content_col: str = "content") -> F.Column:
    """F17 (generateGameplayDescriptions.ts:81,97): data-URL encoding of
    an image binary column, JVM-side."""
    return F.concat(F.lit("data:image/png;base64,"), F.base64(F.col(content_col)))
