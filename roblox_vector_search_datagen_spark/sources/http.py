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

OMNI_SEARCH_URL = "https://apis.roblox.com/search-api/omni-search?searchQuery={q}&sessionId={sid}"

def gather_games_from_search(
    transport: Transport, query: str, session_id: str, retry: RetryPolicy | None = None, sleep=time.sleep
) -> list[dict]:
    """S6 (gatherGamesFromSearch.ts:32-51): single omni-search page;
    keep contentGroupType=='Game' groups (P3), flatten their contents to
    core rows + playerCount."""
    from urllib.parse import quote

    url = OMNI_SEARCH_URL.format(q=quote(query), sid=session_id)
    data = request_json(transport, "GET", url, retry=retry, sleep=sleep) or {}
    out: list[dict] = []
    for group in data.get("searchResults", []):
        if group.get("contentGroupType") != "Game":
            continue
        for g in group.get("contents", []):
            out.append(
                {
                    "universeId": int(g["universeId"]),
                    "rootPlaceId": int(g["rootPlaceId"]),
                    "name": g["name"],
                    "playerCount": int(g.get("playerCount") or 0),
                }
            )
    return out

PLACE_DETAILS_URL = "https://games.roblox.com/v1/games/multiget-place-details?placeIds={ids}"
UNIVERSE_URL = "https://apis.roblox.com/universes/v1/places/{pid}/universe"
PLACE_DETAILS_BATCH = 50  # gatherGamesRolimons.ts:77

def rolimons_rows(
    transport: Transport,
    html: str,
    *,
    retry: RetryPolicy | None = None,
    sleep=time.sleep,
) -> list[dict]:
    """S7+S8+S9 (gatherGamesRolimons.ts:18-188): parse the scraped
    `var games = {...}` map, resolve placeId -> universe details in
    batches of 50 with bisect-on-4xx isolation, and fall back to the
    per-id universe endpoint for ids the batch API rejects (name then
    comes from the scrape, description stays never-fetched)."""
    games_map = parse_rolimons_games(html)
    place_ids = [int(p) for p in games_map]

    def fetch(ids: list) -> list[dict]:
        url = PLACE_DETAILS_URL.format(ids=",".join(str(i) for i in ids))
        data = request_json(transport, "GET", url, retry=retry, sleep=sleep) or []
        return [
            {
                "universeId": int(d["universeId"]),
                "rootPlaceId": int(d["placeId"]),
                "name": d.get("name") or games_map[str(d["placeId"])].get("name"),
                "description": d.get("description"),
            }
            for d in data
        ]

    def single_fallback(pid) -> list[dict]:
        data = request_json(
            transport, "GET", UNIVERSE_URL.format(pid=pid), retry=retry, sleep=sleep
        ) or {}
        uid = data.get("universeId")
        if uid is None:
            return []
        return [
            {
                "universeId": int(uid),
                "rootPlaceId": int(pid),
                "name": games_map[str(pid)].get("name"),
                "description": None,
            }
        ]

    rows: list[dict] = []
    for chunk in chunked(place_ids, PLACE_DETAILS_BATCH):
        rows.extend(bisect_batches(chunk, fetch, on_single_failure=single_fallback))
    return rows

# ---------------------------------------------------------------------------
# Image pipeline (S11 icon URLs, S12 thumbnail URLs, S13 binary sink)
# ---------------------------------------------------------------------------

ICONS_URL = "https://thumbnails.roblox.com/v1/games/icons?universeIds={ids}&size=512x512&format=Png"
THUMBS_URL = (
    "https://thumbnails.roblox.com/v1/games/multiget/thumbnails"
    "?universeIds={ids}&size=768x432&format=Png"
)
IMAGE_BATCH = 50  # downloadImages.ts:14

IMAGE_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("universeId", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)

def download_images(
    worklist: DataFrame,
    transport_factory: Callable[[], Transport],
    *,
    concurrency: int = 4,
    retry: RetryPolicy | None = None,
) -> DataFrame:
    """Distributed S11/S12/S13 (downloadImages.ts:60-219): per partition,
    batch-50 CDN-URL lookups for icons and thumbnails, then one GET per
    completed image; yields IMAGE_SCHEMA rows (binary column sink —
    the engine's images table replaces the reference's loose PNG files).
    Skipped states (not 'Completed') produce no row, matching the
    reference's continue-on-missing behavior."""
    import pandas as pd

    def run(batches: Iterable) -> Iterator:
        transport = transport_factory()

        def get_bytes(url: str) -> bytes:
            policy = retry or RetryPolicy()
            while True:
                status, raw = transport("GET", url, {}, None)
                if status in policy.retry_statuses:
                    time.sleep(policy.backoff_seconds)
                    continue
                if status >= 400:
                    raise HttpSourceError(status, url, raw[:200])
                return raw

        for pdf in batches:
            rows = []
            ids = [int(x) for x in pdf["universeId"]]
            for chunk in chunked(ids, IMAGE_BATCH):
                idstr = ",".join(str(i) for i in chunk)
                icons = request_json(transport, "GET", ICONS_URL.format(ids=idstr), retry=retry) or {}
                for item in icons.get("data", []):
                    if item.get("state") == "Completed" and item.get("imageUrl"):
                        uid = int(item["targetId"])
                        rows.append((uid, "icon", f"images/{uid}/icon.png", get_bytes(item["imageUrl"])))
                thumbs = request_json(transport, "GET", THUMBS_URL.format(ids=idstr), retry=retry) or {}
                for item in thumbs.get("data", []):
                    # reference takes thumbnails[0] (downloadImages.ts:186)
                    tlist = item.get("thumbnails") or []
                    first = tlist[0] if tlist else None
                    if first and first.get("state") == "Completed" and first.get("imageUrl"):
                        uid = int(item["universeId"])
                        rows.append(
                            (uid, "thumbnail", f"images/{uid}/thumbnail.png", get_bytes(first["imageUrl"]))
                        )
            yield pd.DataFrame(rows, columns=["universeId", "kind", "path", "content"])

    return worklist.select("universeId").repartition(concurrency).mapInPandas(run, IMAGE_ROWS_SCHEMA)

# ---------------------------------------------------------------------------
# S14: LLM gameplay-description source
# ---------------------------------------------------------------------------

GAMEPLAY_JSON_SCHEMA = {
    "type": "object",
    "properties": {
        "gameplaySummary": {"type": "string"},
        "genreTags": {"type": "array", "items": {"type": "string"}},
        "gameFeatures": {"type": "array", "items": {"type": "string"}},
    },
    "required": ["gameplaySummary", "genreTags", "gameFeatures"],
    "additionalProperties": False,
}

def format_gameplay_markdown(parsed: dict) -> str:
    """F19 markdown assembly (generateGameplayDescriptions.ts:160-163)."""
    return (
        f"**Gameplay Summary**: {parsed['gameplaySummary']}\n\n"
        f"**Genre Tags**: {', '.join(parsed['genreTags'])}\n\n"
        f"**Game Features**: {', '.join(parsed['gameFeatures'])}"
    )

def generate_descriptions(
    worklist: DataFrame,
    transport_factory: Callable[[], Transport],
    *,
    base_url: str,
    model: str,
    system_prompt: str = "Describe the gameplay of this Roblox game.",
    concurrency: int = 4,
    retry: RetryPolicy | None = None,
) -> DataFrame:
    """Distributed S14 (generateGameplayDescriptions.ts:99-163): one
    chat-completions call per game with a strict json_schema response
    format; the validated struct is rendered to the reference's markdown
    shape. Partition count bounds concurrency (the reference's
    DESCRIPTION_CONCURRENCY knob). Worklist columns: universeId, name,
    description, optional icon_b64/thumb_b64 data-URLs."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("universeId", T.LongType()),
            T.StructField("gameplayDescription", T.StringType()),
        ]
    )

    def run(batches: Iterable) -> Iterator:
        transport = transport_factory()
        for pdf in batches:
            out_ids, out_md = [], []
            has_imgs = {"icon_b64", "thumb_b64"} <= set(pdf.columns)
            for row in pdf.itertuples(index=False):
                user_content: list | str = f"Title: {row.name}\n\nDescription: {row.description}"
                if has_imgs and (row.icon_b64 or row.thumb_b64):
                    parts = [{"type": "text", "text": user_content}]
                    for url in (row.icon_b64, row.thumb_b64):
                        if url:
                            parts.append({"type": "image_url", "image_url": {"url": url}})
                    user_content = parts
                payload = {
                    "model": model,
                    "messages": [
                        {"role": "system", "content": system_prompt},
                        {"role": "user", "content": user_content},
                    ],
                    "response_format": {
                        "type": "json_schema",
                        "json_schema": {
                            "name": "gameplay_analysis",
                            "strict": True,
                            "schema": GAMEPLAY_JSON_SCHEMA,
                        },
                    },
                }
                data = request_json(
                    transport, "POST", f"{base_url}/chat/completions", payload=payload, retry=retry
                )
                parsed = json.loads(data["choices"][0]["message"]["content"])
                out_ids.append(int(row.universeId))
                out_md.append(format_gameplay_markdown(parsed))
            yield pd.DataFrame({"universeId": out_ids, "gameplayDescription": out_md})

    cols = [c for c in ("universeId", "name", "description", "icon_b64", "thumb_b64") if c in worklist.columns]
    return worklist.select(*cols).repartition(concurrency).mapInPandas(run, schema)
