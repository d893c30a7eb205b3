"""Iceberg-analog schema evolution over the epoch-dir tier store:
columns added by a newer writer surface as NULL for older epochs,
integral types widen (int -> long), and resolution is BY NAME so a
writer that reorders columns cannot misbind them.  The parquet footers
are the schema metadata; readers never need a side file."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyconform_spark import pipeline, synth
from pyconform_spark.operators import rollup


@pytest.fixture(scope="module")
def tx(spark):
    df = synth.transcripts(spark, 30_000)
    df.persist().count()
    yield df
    df.unpersist()


def _commit_epoch(spark, root, sl, epoch, transform=None):
    """Write one epoch of all three tiers (the 1m tier optionally
    transformed to simulate a different writer release) and commit
    lineage the way pipeline.run does."""
    base = rollup.tier_rollup(sl, "1m")
    t1m = transform(base) if transform is not None else base
    seq = pipeline._next_commit_seq(spark, root)
    pipeline._write_tier(t1m, pipeline._tier_path(root, "1m", epoch))
    parts = []
    back = spark.read.parquet(pipeline._tier_path(root, "1m", epoch))
    parts.append(pipeline._lineage_rows(back, "1m", epoch, seq))
    prev = base
    for tier in ("1h", "1d"):
        prev = rollup.cascade_rollup(prev, tier)
        pipeline._write_tier(prev, pipeline._tier_path(root, tier, epoch))
        parts.append(
            pipeline._lineage_rows(
                spark.read.parquet(pipeline._tier_path(root, tier, epoch)),
                tier, epoch, seq,
            )
        )
    lin = parts[0]
    for extra in parts[1:]:
        lin = lin.unionByName(extra)
    lin.coalesce(1).write.mode("append").parquet(pipeline._lineage_path(root))


def test_added_column_is_null_for_old_epochs(spark, tx, tmp_path):
    root = str(tmp_path / "store")
    epochs = pipeline.list_epochs(tx)
    assert len(epochs) >= 3
    old, new = epochs[0], epochs[1]
    _commit_epoch(spark, root, pipeline._epoch_filter(tx, [old]), old)
    # release N+1 adds a tool_call_count aggregate column
    _commit_epoch(
        spark, root, pipeline._epoch_filter(tx, [new]), new,
        transform=lambda df: df.withColumn(
            "tool_call_count", (F.col("turn_count") * 2).cast("long")
        ),
    )
    got = pipeline.read_tier_evolved(spark, root, "1m")
    assert "tool_call_count" in got.columns
    # old epoch rows: NULL; new epoch rows: populated and correct
    assert got.where(F.col("tool_call_count").isNull()).count() == (
        rollup.tier_rollup(pipeline._epoch_filter(tx, [old]), "1m").count()
    )
    bad = got.where(
        F.col("tool_call_count").isNotNull()
        & (F.col("tool_call_count") != F.col("turn_count") * 2)
    ).count()
    assert bad == 0
    # total row count is the union of both epochs
    n_new = rollup.tier_rollup(pipeline._epoch_filter(tx, [new]), "1m").count()
    assert got.count() == n_new + rollup.tier_rollup(
        pipeline._epoch_filter(tx, [old]), "1m"
    ).count()


def test_int_epoch_widens_to_long(spark, tx, tmp_path):
    root = str(tmp_path / "store")
    epochs = pipeline.list_epochs(tx)
    old, new = epochs[0], epochs[1]
    # release N wrote turn_count as INT
    _commit_epoch(
        spark, root, pipeline._epoch_filter(tx, [old]), old,
        transform=lambda df: df.withColumn(
            "turn_count", F.col("turn_count").cast("int")
        ),
    )
    _commit_epoch(spark, root, pipeline._epoch_filter(tx, [new]), new)
    got = pipeline.read_tier_evolved(spark, root, "1m")
    assert dict(got.dtypes)["turn_count"] == "bigint"
    # values from the int epoch survive the widening bit-for-bit
    want = rollup.tier_rollup(pipeline._epoch_filter(tx, [old]), "1m")
    merged = got.join(
        want.select(
            *[F.col(c).alias(f"w_{c}") for c in want.columns]
        ),
        on=[
            F.col("conv_id") == F.col("w_conv_id"),
            F.col("tool").eqNullSafe(F.col("w_tool")),
            F.col("role") == F.col("w_role"),
            F.col("bucket_start") == F.col("w_bucket_start"),
        ],
    )
    assert merged.where(F.col("turn_count") != F.col("w_turn_count")).count() == 0


def test_reordered_columns_resolve_by_name(spark, tx, tmp_path):
    root = str(tmp_path / "store")
    epochs = pipeline.list_epochs(tx)
    old, new = epochs[0], epochs[1]
    _commit_epoch(spark, root, pipeline._epoch_filter(tx, [old]), old)
    # a writer that emits the same columns in a different order
    _commit_epoch(
        spark, root, pipeline._epoch_filter(tx, [new]), new,
        transform=lambda df: df.select(*sorted(df.columns, reverse=True)),
    )
    got = pipeline.read_tier_evolved(spark, root, "1m")
    direct = rollup.tier_rollup(
        pipeline._epoch_filter(tx, [old, new]), "1m"
    )
    # the union equals the direct two-epoch rollup row-for-row
    a = sorted(
        map(tuple, got.select(*sorted(got.columns)).collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )
    b = sorted(
        map(tuple, direct.select(*sorted(direct.columns)).collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )
    assert a == b


def test_incompatible_evolution_refuses(spark, tx, tmp_path):
    root = str(tmp_path / "store")
    epochs = pipeline.list_epochs(tx)
    old, new = epochs[0], epochs[1]
    _commit_epoch(spark, root, pipeline._epoch_filter(tx, [old]), old)
    # a writer that changed turn_count to a STRING: refuse loudly
    _commit_epoch(
        spark, root, pipeline._epoch_filter(tx, [new]), new,
        transform=lambda df: df.withColumn(
            "turn_count", F.col("turn_count").cast("string")
        ),
    )
    with pytest.raises(ValueError, match="incompatible evolution"):
        pipeline.read_tier_evolved(spark, root, "1m")


def test_single_generation_reads_as_one_scan(spark, tx, tmp_path):
    """Epochs sharing a schema must stay ONE multi-path scan — schema
    evolution support cannot cost the common case anything."""
    import contextlib, io

    root = str(tmp_path / "store")
    epochs = pipeline.list_epochs(tx)[:3]
    for e in epochs:
        _commit_epoch(spark, root, pipeline._epoch_filter(tx, [e]), e)
    got = pipeline.read_tier_evolved(spark, root, "1m")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    import re

    assert len(re.findall(r"^\(\d+\) Scan parquet", buf.getvalue(), re.M)) == 1
    assert "Union" not in buf.getvalue()
