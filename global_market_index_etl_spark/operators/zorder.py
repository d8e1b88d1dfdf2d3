"""Z-order (Morton-curve) clustering — multi-column data skipping for
the manifest storage layer.

Linear ``cluster_by`` gives tight per-file min/max ranges on the FIRST
sort column only: a predicate on the second column still intersects
every file. Z-ordering interleaves the bits of rank-bucketed column
values so that sorting by the single interleaved key keeps files tight
on EVERY participating column at once — the same trade Delta Lake's
``OPTIMIZE ZORDER BY`` and Iceberg's ``rewrite_data_files(strategy =>
'sort', sort_order => 'zorder(...)')`` make (re-expressing their layout
idea under this module's manifest protocol; the reference ETL,
``/root/reference/src/data_storage/postgres_handler.py``, delegates
layout entirely to Postgres indexes and has no analog).

Scale design:

- rank-bucketing uses ``approxQuantile`` boundaries — one distributed
  Greenwald-Khanna pass, a bounded driver action of ``2^bits − 1``
  doubles per column (255 at the default 8 bits), never a global sort;
- bucket assignment is a BALANCED ``when``-tree binary search over the
  boundary literals — depth ``bits`` (8 comparisons/row at 256
  buckets), fully inside whole-stage codegen, no UDF, no join;
- the interleave is ``bits × n_cols`` shift/mask/or terms on longs —
  pure JVM expressions;
- the key is computed, sorted on, and DROPPED before the write: files
  carry no extra column, only tighter stats.

Like all stats-based skipping here, the layout is an OPTIMIZATION with
no correctness surface: readers apply real predicates regardless, and
files without stats are never pruned away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_buckets"]

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "float", "double")


def _bucket_search(col: Column, bounds: list[float], lo: int, hi: int):
    """Balanced binary-search ``when``-tree: the bucket id in [lo, hi]
    for a value, given ascending boundaries (``bounds[i]`` separates
    bucket i from i+1). Depth ``ceil(log2(n_buckets))``; NULLs fail
    every ``>=`` comparison and land deterministically in bucket
    ``lo``-most = 0."""
    if lo == hi:
        return F.lit(lo)
    mid = (lo + hi) // 2
    return F.when(
        col >= F.lit(float(bounds[mid])), _bucket_search(col, bounds, mid + 1, hi)
    ).otherwise(_bucket_search(col, bounds, lo, mid))


def zorder_buckets(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    relative_error: float = 0.001,
) -> dict[str, Column]:
    """Per-column rank-bucket expressions (``0 .. 2^bits − 1``) from one
    ``approxQuantile`` pass over ``df`` — the ingredient
    :func:`zorder_key` interleaves, exposed for tests and for callers
    that want the buckets themselves (e.g. coarse histogram keys)."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    dtypes = dict(df.dtypes)
    for c in cols:
        t = dtypes.get(c)
        if t is None:
            raise ValueError(f"column {c!r} not in {sorted(dtypes)}")
        if t not in _NUMERIC and not t.startswith("decimal"):
            raise ValueError(
                f"zorder supports numeric columns; {c!r} is {t} — cast "
                "dates/timestamps to epoch numbers first"
            )
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    # one distributed quantile pass for ALL columns; driver receives
    # (2^bits − 1) doubles per column — bounded by construction
    all_bounds = df.approxQuantile(list(cols), probs, relative_error)
    out: dict[str, Column] = {}
    for c, bounds in zip(cols, all_bounds):
        if not bounds:  # empty input: every row (there are none) → 0
            out[c] = F.lit(0)
        else:
            out[c] = _bucket_search(
                F.col(c).cast("double"), bounds, 0, n - 1
            )
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    relative_error: float = 0.001,
) -> Column:
    """The Morton key: bit ``i`` of column ``j``'s bucket lands at
    position ``i * n_cols + j`` of a single long — sort by this one
    column and every participating column's values are spatially
    clustered. ``bits * len(cols)`` must fit a long (≤ 63)."""
    if bits * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} columns at {bits} bits = {bits * len(cols)} "
            "interleaved bits — does not fit a long; lower bits"
        )
    buckets = zorder_buckets(
        df, cols, bits=bits, relative_error=relative_error
    )
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        b = buckets[c].cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + j,
                )
            )
    return z
