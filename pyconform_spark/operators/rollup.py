"""Retention-tier rollup: continuous aggregates over transcripts.

Reference analog: the calendar-bucket rollups ``oclim`` (monthly
climatology) and ``monthtoyear_noleap`` (weighted month→year
downsample) at ``/root/reference/source/pyconform/modules/
commonfunctions.py:35-188``, generalized to tumbling 1m/1h/1d windows.

Design points for 100 TB:

* ONE shuffle per tier — ``groupBy(series_keys, bucket)`` with Spark's
  automatic partial (map-side) + final aggregation; no window functions
  in the hot path.
* The tier CASCADE computes 1h from the 1m output and 1d from 1h —
  each coarser tier aggregates ~60x fewer rows than raw, fixing the
  reference's no-reuse weakness (every PyConform pull re-reads inputs,
  ``flownodes.py:227-231``).  Integer sums compose exactly, so the
  cascade is bit-identical to rolling up from raw.
* ``turn_rate`` normalizes counts to per-second rates so tiers are
  unit-consistent (the ``chunits``/ValidateNode convert analog,
  ``flownodes.py:528-541``); it and ``text_len_avg`` are single double
  divisions of exact integers → bit-for-bit reproducible across any
  partitioning, which is what makes the north rule's tier-exact match
  testable at all.
* Bucketing uses integer epoch division, not ``F.window``: one
  arithmetic expression inside whole-stage codegen, no struct
  allocation, and identical semantics in DuckDB / pandas oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pyconform_spark.tables import SERIES_KEYS, TIERS


def bucket_ts(ts: Column, seconds: int) -> Column:
    """Tumbling-window bucket start: floor(epoch/len)*len, as ntz ts."""
    epoch = ts.cast("timestamp").cast("long")
    return F.timestamp_seconds(epoch - (epoch % seconds)).cast("timestamp_ntz")


def tier_rollup(transcripts: DataFrame, tier: str = "1m") -> DataFrame:
    """Roll raw transcripts into one retention tier.

    Output schema = tables.TIER_SCHEMA.  ``text_len`` of NULL text
    counts as 0 (the reference masks missing data rather than dropping
    rows, ``physarray.py`` masked semantics).
    """
    t = TIERS[tier]
    text_len = F.coalesce(F.length("text"), F.lit(0)).cast("long")
    out = (
        transcripts.select(
            *SERIES_KEYS,
            bucket_ts(F.col("ts"), t.seconds).alias("bucket_start"),
            text_len.alias("text_len"),
        )
        .groupBy(*SERIES_KEYS, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.sum("text_len").alias("text_len_sum"),
        )
    )
    return _finish_tier(out, t.seconds)


def cascade_rollup(finer: DataFrame, tier: str) -> DataFrame:
    """Aggregate a finer tier table into a coarser tier (1m→1h, 1h→1d).

    Exact because the composed statistics are integer sums; rates/avgs
    are re-derived, never averaged-of-averages.
    """
    t = TIERS[tier]
    out = (
        finer.select(
            *SERIES_KEYS,
            bucket_ts(F.col("bucket_start"), t.seconds).alias("bucket_start"),
            "turn_count",
            "text_len_sum",
        )
        .groupBy(*SERIES_KEYS, "bucket_start")
        .agg(
            F.sum("turn_count").alias("turn_count"),
            F.sum("text_len_sum").alias("text_len_sum"),
        )
    )
    return _finish_tier(out, t.seconds)


def _finish_tier(agg: DataFrame, seconds: int) -> DataFrame:
    from pyconform_spark import units

    out = agg.select(
        *SERIES_KEYS,
        "bucket_start",
        F.col("turn_count").cast("long").alias("turn_count"),
        (F.col("turn_count") / F.lit(float(seconds))).alias("turn_rate"),
        F.col("text_len_sum").cast("long").alias("text_len_sum"),
        (F.col("text_len_sum") / F.col("turn_count")).alias("text_len_avg"),
        F.lit(False).alias("gap_filled"),
    )
    # rate/size columns carry units metadata (PhysArray.units analog);
    # metadata-only — no expression change, survives parquet round trips
    out = units.with_units(out, "turn_rate", "1/s")
    out = units.with_units(out, "text_len_sum", "B")
    return units.with_units(out, "text_len_avg", "B")


def all_tiers(transcripts: DataFrame) -> dict[str, DataFrame]:
    """The full cascade.  Callers should persist/write the 1m result
    before deriving 1h (and 1h before 1d) so each tier is computed from
    the previous, not from raw — at 10^12 turns the 1m tier is the only
    pass over the raw table."""
    t1m = tier_rollup(transcripts, "1m")
    t1h = cascade_rollup(t1m, "1h")
    t1d = cascade_rollup(t1h, "1d")
    return {"1m": t1m, "1h": t1h, "1d": t1d}
