"""Retention policy enforcement over the epoch-checkpointed tier store.

The "retention" half of the rollup+downsample+retention engine: fine
tiers are kept briefly, coarse tiers long — e.g. 1m for 7 days, 1h for
90, 1d forever — exactly the economics that motivate the cascade (the
1m points a query would have hit past the horizon are answered by the
1h/1d tiers).

Deletion is epoch-granular: an expired epoch's directory is removed
and a tombstone row is appended to ``retention_log``; the lineage rows
stay (provenance of what was rolled up survives the data's expiry,
like the reference keeps file history in metadata while files rotate).
On Iceberg this maps to ``DELETE WHERE days(ts) < cutoff`` +
``expire_snapshots``; the epoch-directory layout makes it a metadata
operation here too — no data rewrite, no scan.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from pyconform_spark import pipeline


@dataclass(frozen=True)
class RetentionPolicy:
    """keep_epochs[tier] = age horizon in epochs (days): an epoch is
    expired when ``epoch < now - keep`` (None = keep forever).

    Age-based, not count-based: a backfill landing 100 historical-but-
    recent epochs at once keeps all of them as long as they are within
    the horizon — the '1m for 7 days' economics measure wall-clock
    age, not directory count."""

    keep_epochs: dict[str, int | None]


DEFAULT_POLICY = RetentionPolicy({"1m": 7, "1h": 90, "1d": None})

_LOG_SCHEMA = T.StructType(
    [
        T.StructField("tier", T.StringType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("expired_at_epoch", T.LongType(), False),
    ]
)


def _tier_epochs(root: str, tier: str) -> list[int]:
    d = os.path.join(root, "tiers", tier)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("epoch="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def apply_retention(
    spark: SparkSession,
    root: str,
    policy: RetentionPolicy = DEFAULT_POLICY,
    now_epoch: int | None = None,
) -> dict[str, list[int]]:
    """Expire epochs older than each tier's age horizon
    (``epoch < now - keep``); returns {tier: [expired epoch ids]}.
    Idempotent.  ``now_epoch`` defaults to the max live epoch across
    all tiers (the store's logical "now"), so a catch-up run without a
    wall clock still measures age against the newest data."""
    expired: dict[str, list[int]] = {}
    log_rows = []
    all_epochs = [e for t in policy.keep_epochs for e in _tier_epochs(root, t)]
    now = now_epoch if now_epoch is not None else (max(all_epochs) if all_epochs else 0)
    for tier, keep in policy.keep_epochs.items():
        epochs = _tier_epochs(root, tier)
        if keep is None:
            expired[tier] = []
            continue
        drop = [e for e in epochs if e < now - keep]
        for e in drop:
            shutil.rmtree(pipeline._tier_path(root, tier, e), ignore_errors=True)
            log_rows.append((tier, e, now))
        expired[tier] = drop
    if log_rows:
        spark.createDataFrame(log_rows, _LOG_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(root, "retention_log"))
    return expired


def retention_log(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "retention_log"))


def live_epochs(root: str) -> dict[str, list[int]]:
    return {t: _tier_epochs(root, t) for t in pipeline.TIER_ORDER}
