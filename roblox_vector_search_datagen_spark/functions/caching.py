"""Persist discipline for parameterized operators.

Operators persist multiply-referenced subtrees because Catalyst
instantiates a subtree once per reference (self-joins, agg+join fans).
For DEFAULT-argument invocations that is safe in a long-lived session:
every call builds the same canonicalized plan, the CacheManager keeps
ONE entry, and later queries legitimately reuse it (the measured bench
win). A NON-default invocation, however, would mint a fresh cache
entry per distinct argument set and accumulate for the session's
lifetime (HTTP service, parameter sweeps) with only LRU eviction as
backstop — so those plans skip the cache and recompute the subtree,
trading a bounded amount of work for bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def persist_if(df: DataFrame, session_invariant: bool) -> DataFrame:
    """Persist `df` only when it is a session-invariant (all-defaults)
    subtree; see module docstring for why."""
    return df.persist() if session_invariant else df
