"""Resolution router: pick the tier a range query should read.

The continuous-aggregate economics (1m/1h/1d cascade + retention)
only pay off if QUERIES actually land on the coarsest tier that
satisfies them.  Grafana/Prometheus clients ask for "this range at at
most N points" (`max_data_points`); the router maps that request to
the FINEST tier whose point count over the range still fits — the
query-path twin of the write-path cascade (reference analog: the
dataflow picks the one output variable a request resolves to,
``dataflow.py``; here a request resolves to one tier).

Routing is a plan-time decision — pure integer arithmetic on the
request, no data scan, no Spark action — so it composes with any
downstream DataFrame logic and costs nothing at 100 TB.  The chosen
tier's read is partition-pruned by the range filter exactly like
``tiered_read`` / ``read_tier``.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyconform_spark import pipeline

#: tier name -> bucket length in seconds, finest first
TIER_SECONDS: dict[str, int] = {"1m": 60, "1h": 3600, "1d": 86400}


def choose_tier(
    range_seconds: int,
    max_points: int,
    tiers: dict[str, int] | None = None,
) -> tuple[str, int]:
    """Finest tier whose ceil(range/step) point count fits
    ``max_points``; falls back to the coarsest tier when even that
    overflows (the caller gets the fewest-points answer available).

    >>> choose_tier(7200, 200)
    ('1m', 60)
    >>> choose_tier(7 * 86400, 500)
    ('1h', 3600)
    >>> choose_tier(365 * 86400, 12)
    ('1d', 86400)
    """
    if range_seconds <= 0:
        raise ValueError(f"range_seconds must be positive, got {range_seconds}")
    if max_points < 1:
        raise ValueError(f"max_points must be >= 1, got {max_points}")
    order = sorted((tiers or TIER_SECONDS).items(), key=lambda kv: kv[1])
    for name, step in order:
        if -(-range_seconds // step) <= max_points:
            return name, step
    return order[-1]


def route_read(
    spark: SparkSession,
    root: str,
    start: datetime,
    end: datetime,
    max_points: int,
    tiers: dict[str, int] | None = None,
) -> tuple[str, DataFrame]:
    """Read [start, end) from the tier store at the routed resolution.

    Returns ``(tier_name, frame)``; the range filter is applied on
    ``bucket_start`` so parquet row-group pruning sees it.  Naive
    datetimes are treated as UTC (testdata convention)."""

    def _sec(d: datetime) -> int:
        if d.tzinfo is None:
            d = d.replace(tzinfo=timezone.utc)
        return int(d.timestamp())

    s, e = _sec(start), _sec(end)
    name, _step = choose_tier(e - s, max_points, tiers)
    df = pipeline.read_tier(spark, root, name)
    out = df.where(
        (F.col("bucket_start").cast("timestamp").cast("long") >= F.lit(s))
        & (F.col("bucket_start").cast("timestamp").cast("long") < F.lit(e))
    )
    return name, out
