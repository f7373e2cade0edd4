"""Order-independent rounded aggregates.

A plain ``sum``/``avg`` over DOUBLE accumulates in whatever order
partitions happen to arrive; the last-ulp difference between Spark's
partition order and an oracle engine's scan order flips ``round(x, 6)``
whenever x lands near a 6th-decimal midpoint (observed: the
ivf_cluster_quality driver hash mismatch in round 2). Quantizing every
summand to integer micro-units first turns the aggregate into a BIGINT
sum — associative, commutative, exact — and the single final division is
an IEEE-deterministic op on identical operands in both engines.

Each Spark builder has a ``*_sql`` twin that MUST be used in the
matching DuckDB oracle so both engines quantize identically. The
quantization error is bounded by 5e-7 per summand and does not
accumulate order-dependently, which is the whole point.

Caveat: summands produced by libm calls (log/exp/pow) are not
guaranteed bit-identical across engines; the 1e-6 quantization grid is
~9 orders of magnitude coarser than a double ulp at unit scale, so a
per-row last-ulp wobble only matters if the true value sits within an
ulp of a micro-unit midpoint — negligible, and crucially it no longer
compounds across rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def _q(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 1e6, 0).cast("bigint")

def qsum6(col: Column | str) -> Column:
    """round(sum(col), 6) with order-independent integer accumulation."""
    return F.round(F.sum(_q(col)) / 1e6, 6)

def qmean6(col: Column | str) -> Column:
    """round(avg(col), 6) with order-independent integer accumulation.

    Uses count(col) (non-null count), matching avg() null semantics.

    The mean is rounded at INTEGER micro-unit scale — round(Σq/n) —
    not by round(x, 6) on the double: decimal midpoints like 2.5e-6
    are not binary-representable, and Spark (BigDecimal HALF_UP on the
    double's exact expansion) and DuckDB (multiply-shift) break the
    tie differently, a 1-ulp divergence the generative parity suite
    caught on ivf_train_iters. Integer-scale midpoints (k + 0.5,
    k < 2^52) ARE exact doubles, and both engines round them half-away
    identically, so Σq/n → round → /1e6 is bit-reproducible."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(_q(c)) / F.count(c), 0).cast("bigint") / F.lit(1e6)

def qsum6_sql(expr: str) -> str:
    return f"round(sum(CAST(round(({expr}) * 1e6) AS BIGINT)) / 1e6, 6)"

def qmean6_sql(expr: str) -> str:
    # integer-scale rounding, mirroring qmean6 (see its docstring)
    return (
        f"CAST(round(sum(CAST(round(({expr}) * 1e6) AS BIGINT))"
        f" / count({expr})) AS BIGINT) / 1e6"
    )
