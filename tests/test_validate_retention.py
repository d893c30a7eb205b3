"""ValidateNode-analog (cast/mask/observe) and retention-policy tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyconform_spark import pipeline, retention, synth, validate


# ------------------------------------------------------------- validate
def test_validate_masks_and_observes(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 500.0), (4, -10.0)], ["id", "v"]
    )
    specs = [
        validate.ColumnSpec(
            "v", dtype="double", valid_min=0.0, valid_max=100.0,
            ok_max_mean_abs=10.0,
        )
    ]
    out, obs = validate.validate(df, specs)
    rows = {r["id"]: r["v"] for r in out.collect()}
    assert rows == {1: 5.0, 2: 50.0, 3: None, 4: None}
    metrics = obs.get
    assert metrics["v_masked"] == 2
    # mean_abs over the masked frame: (5+50)/2
    assert metrics["v_mean_abs"] == 27.5
    warns = validate.warnings_from(metrics, specs)
    assert any("mean_abs" in w for w in warns)
    assert any("masked" in w for w in warns)


def test_validate_same_kind_cast_guard(spark):
    df = spark.createDataFrame([(1.5,)], ["v"])
    with pytest.raises(validate.CastKindError):
        validate.validate(df, [validate.ColumnSpec("v", dtype="long")])
    # int -> double is same-kind and fine
    df2 = spark.createDataFrame([(3,)], ["n"])
    out, _ = validate.validate(df2, [validate.ColumnSpec("n", dtype="double")], observe=False)
    assert out.schema["n"].dataType.simpleString() == "double"
    assert out.first()["n"] == 3.0


def test_validate_single_pass(spark):
    """Metrics ride the same job as the output action (no second scan)."""
    df = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    specs = [validate.ColumnSpec("v", valid_min=100.0)]
    out, obs = validate.validate(df, specs)
    n = out.count()  # ONE action
    assert n == 1000
    assert obs.get["v_masked"] == 100  # 0..99 masked


# ------------------------------------------------------------- retention
def test_retention_expires_fine_tier_keeps_coarse(spark, tmp_path):
    root = str(tmp_path / "store")
    tx = synth.transcripts(spark, 60_000)
    pipeline.run(spark, tx, root)
    before = retention.live_epochs(root)
    n_epochs = len(before["1m"])
    assert n_epochs >= 3

    # age-based horizons: keep 1m for 0 days past "now", 1h for 1 day;
    # now is DERIVED (max live epoch) when not supplied
    policy = retention.RetentionPolicy({"1m": 0, "1h": 1, "1d": None})
    expired = retention.apply_retention(spark, root, policy)

    now = max(before["1m"])
    after = retention.live_epochs(root)
    assert after["1m"] == [e for e in before["1m"] if e >= now]
    assert after["1h"] == [e for e in before["1h"] if e >= now - 1]
    assert after["1d"] == before["1d"]  # keep forever
    assert expired["1m"] == [e for e in before["1m"] if e < now]

    # tombstones logged; lineage untouched (provenance survives expiry)
    log = retention.retention_log(spark, root)
    assert log.count() == len(expired["1m"]) + len(expired["1h"])
    assert log.first()["expired_at_epoch"] == now
    lin = pipeline.lineage(spark, root)
    assert lin.where(F.col("tier") == "1m").count() > 0

    # idempotent
    again = retention.apply_retention(spark, root, policy, now_epoch=now)
    assert all(not v for v in again.values())
    assert retention.retention_log(spark, root).count() == log.count()


def test_retention_is_age_based_not_count_based(spark, tmp_path):
    """A backfill landing many historical-but-recent epochs keeps ALL
    of them while they are inside the horizon (the ADVICE r1 finding:
    count-based semantics would have expired all but N immediately)."""
    root = str(tmp_path / "store")
    tx = synth.transcripts(spark, 60_000)
    pipeline.run(spark, tx, root)
    before = retention.live_epochs(root)
    span = max(before["1m"]) - min(before["1m"])
    policy = retention.RetentionPolicy({"1m": span, "1h": span, "1d": None})
    expired = retention.apply_retention(spark, root, policy)
    assert all(not v for v in expired.values())
    assert retention.live_epochs(root) == before
