"""Warehouse-table path discipline for stored artifacts.

Operators that STORE a derived table (the IVF index, the token shards)
key the warehouse directory by a tag of the fixture root plus their
build parameters, with a `_SUCCESS`-marker write-if-absent guard. Two
rules, both learned the hard way:

* The tag includes a short digest of the ABSOLUTE fixture path, not
  just its basename: two fixture roots with the same leaf name
  (`/a/sf0.1` and `/b/sf0.1`) must get distinct warehouse entries —
  with basename-only keying the second session silently serves the
  first corpus's stored artifact.
* The tag is also CONTENT-ADDRESSED on the source table(s) the
  artifact derives from — their (size, mtime_ns) fold into the
  digest — so a fixture dir regenerated or mutated IN PLACE can never
  be served a stale artifact: the new bytes produce a new tag and the
  write-if-absent guard rebuilds. This closes the failure mode where
  a `_SUCCESS`-guarded store outlives the data it was built from
  (e.g. the test harness regenerating fixtures between rounds).
* Write-if-absent is a driver-side `_SUCCESS` check — correct for the
  single-driver deployments this repo targets (a multi-writer cluster
  would use a transactional catalog commit instead). `rebuild=True`
  remains the explicit invalidation hook
  (`streaming.vectors.commit_ingest_batch` pairs it with the
  in-memory cache clear, which content-addressing cannot cover).
"""

from __future__ import annotations

import hashlib
import os

# <repo>/data/warehouse — sibling of the package directory
WAREHOUSE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
    "warehouse",
)


def sf_tag(sf_dir: str, *source_tables: str) -> str:
    """`<basename>_<8-hex sha1>` over the absolute fixture path plus
    each named source table's (size, mtime_ns): human-readable leaf
    name for operators; path digest for same-leaf collision safety;
    content address so regenerated fixtures rebuild instead of serving
    stale stored artifacts."""
    p = os.path.abspath(sf_dir.rstrip("/"))
    h = hashlib.sha1(p.encode())
    for name in source_tables:
        try:
            st = os.stat(os.path.join(p, f"{name}.parquet"))
            h.update(f":{name}:{st.st_size}:{st.st_mtime_ns}".encode())
        except OSError:
            h.update(f":{name}:absent".encode())
    return f"{os.path.basename(p)}_{h.hexdigest()[:8]}"


def tables_ready(*paths: str) -> bool:
    """True iff every directory carries the parquet commit marker."""
    return all(os.path.exists(os.path.join(p, "_SUCCESS")) for p in paths)
