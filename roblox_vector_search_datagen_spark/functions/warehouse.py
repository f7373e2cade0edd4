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
* Write-if-absent is a driver-side `_SUCCESS` check — correct for the
  single-driver deployments this repo targets (a multi-writer cluster
  would use a transactional catalog commit instead), and it means a
  fixture dir REGENERATED IN PLACE serves stale data until a caller
  passes `rebuild=True`; `streaming.vectors.commit_ingest_batch` is
  the ingestion-loop hook that does exactly that.
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


def sf_tag(sf_dir: str) -> str:
    """`<basename>_<8-hex sha1 of the absolute path>` — human-readable
    leaf name for operators, path digest for collision safety."""
    p = os.path.abspath(sf_dir.rstrip("/"))
    return f"{os.path.basename(p)}_{hashlib.sha1(p.encode()).hexdigest()[:8]}"


def tables_ready(*paths: str) -> bool:
    """True iff every directory carries the parquet commit marker."""
    return all(os.path.exists(os.path.join(p, "_SUCCESS")) for p in paths)
