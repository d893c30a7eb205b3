"""Table schemas and retention-tier specs.

The input table is the north-rule ``transcripts`` shape
(BASELINE.json input_hint)::

    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string, ts:timestamp

Retention tiers mirror the reference's calendar rollup ladder
(monthly climatology / month→year downsampling,
``/root/reference/source/pyconform/modules/commonfunctions.py:35-188``)
recast as 1-minute / 1-hour / 1-day tumbling windows.  Each tier
declares its bucket length so rates are unit-normalized across tiers
(the ``ValidateNode`` unit-conversion analog, ``flownodes.py:528-541``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampNTZType(), False),
    ]
)

# Grouping keys of every derived series: one series per (conv_id, tool, role).
SERIES_KEYS = ["conv_id", "tool", "role"]


@dataclass(frozen=True)
class Tier:
    name: str            # "1m" | "1h" | "1d"
    seconds: int         # bucket length
    trunc: str           # date_trunc unit
    parent: str | None   # tier this one cascades from (None = raw input)


TIERS: dict[str, Tier] = {
    "1m": Tier("1m", 60, "minute", None),
    "1h": Tier("1h", 3600, "hour", "1m"),
    "1d": Tier("1d", 86400, "day", "1h"),
}

# Rollup tier output schema (FIXTURES.md F2).
TIER_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("role", T.StringType(), False),
        T.StructField("bucket_start", T.TimestampNTZType(), False),
        T.StructField("turn_count", T.LongType(), False),
        T.StructField("turn_rate", T.DoubleType(), False),
        T.StructField("text_len_sum", T.LongType(), False),
        T.StructField("text_len_avg", T.DoubleType(), False),
        T.StructField("gap_filled", T.BooleanType(), False),
    ]
)

# Lineage table (FIXTURES.md F3); reference analog: chunk-dedup set +
# atomic rename commit (flownodes.py:851-861,940-972).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("tier", T.StringType(), False),
        T.StructField("input_range_start", T.TimestampNTZType(), True),
        T.StructField("input_range_end", T.TimestampNTZType(), True),
        T.StructField("checkpoint_epoch", T.LongType(), False),
        T.StructField("point_count", T.LongType(), False),
        # non-null only for rows committed by refresh_late: the
        # idempotency key that makes streaming refresh exactly-once
        T.StructField("refresh_marker", T.StringType(), True),
        # monotone per-store commit ordinal: the LATEST generation per
        # (tier, epoch) is the current truth (refreshes re-commit an
        # epoch's lineage); verify_store audits against it
        T.StructField("commit_seq", T.LongType(), False),
        # per-partition conv_id min/max recorded at commit time — the
        # Iceberg file-stats analog: read_tier prunes whole epoch dirs
        # whose key range cannot match a point predicate BEFORE Spark
        # lists them.  Nullable: rows from ledgers written before these
        # columns existed (or sentinel/tombstone rows) disable pruning
        # for their epoch, never correctness
        T.StructField("conv_id_min", T.StringType(), True),
        T.StructField("conv_id_max", T.StringType(), True),
    ]
)
