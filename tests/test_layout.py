"""Layout clustering: row-group pruning becomes real, data unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyconform_spark import layout


def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet")


def test_clustered_layout_prunes_point_queries(spark, tmp_path):
    df = _events(spark)
    plain = str(tmp_path / "plain")
    clustered = str(tmp_path / "clustered")
    # arbitrary layout: whatever partitioning the shuffle dealt
    df.repartition(8).write.parquet(plain)
    layout.cluster_by(df, ["user_id"], n_files=8).write.parquet(clustered)

    key = 42
    f_plain = layout.pruning_fraction(plain, "user_id", key)
    f_clustered = layout.pruning_fraction(clustered, "user_id", key)
    # hash-shuffled files all span ~the full key range: nothing prunes
    assert f_plain <= 0.2
    # range-clustered files exclude the key everywhere but one range
    assert f_clustered >= 0.8
    assert f_clustered > f_plain


def test_cluster_by_preserves_rows_exactly(spark, tmp_path):
    df = _events(spark)
    path = str(tmp_path / "c")
    layout.cluster_by(df, ["user_id", "ts"]).write.parquet(path)
    back = spark.read.parquet(path)
    a = df.groupBy().agg(
        F.count(F.lit(1)), F.sum(F.hash("user_id", "event_type", "ts")),
    ).first()
    b = back.groupBy().agg(
        F.count(F.lit(1)), F.sum(F.hash("user_id", "event_type", "ts")),
    ).first()
    assert tuple(a) == tuple(b)


def test_rowgroup_ranges_are_narrow_after_clustering(spark, tmp_path):
    df = _events(spark)
    path = str(tmp_path / "n")
    layout.cluster_by(df, ["user_id"], n_files=8).write.parquet(path)
    ranges = layout.rowgroup_ranges(path, "user_id")
    total_span = max(hi for _, hi in ranges) - min(lo for lo, _ in ranges)
    avg_span = sum(hi - lo for lo, hi in ranges) / len(ranges)
    # each group covers a small slice of the key domain
    assert avg_span <= total_span / 4


def test_zorder_prunes_both_columns(spark, tmp_path):
    """Z-order on (user_id, ts): BOTH a user point query and a time
    range prune substantially — 1-D clustering on user_id alone leaves
    the time predicate unprunable."""
    from datetime import datetime

    df = _events(spark)
    oneD = str(tmp_path / "oneD")
    zord = str(tmp_path / "zord")
    layout.cluster_by(df, ["user_id"], n_files=16).write.parquet(oneD)
    layout.zorder_by(df, ["user_id", "ts"], bits=8, n_files=16).write.parquet(
        zord
    )

    # user point predicate: 1-D is best-in-class, z-order still strong
    u1 = layout.pruning_fraction(oneD, "user_id", 42)
    uz = layout.pruning_fraction(zord, "user_id", 42)
    assert u1 >= 0.8
    assert uz >= 0.4

    # one-day time range: 1-D layout can't prune it, z-order can
    lo = datetime(2024, 1, 10)
    hi = datetime(2024, 1, 11)
    t1 = layout.pruning_fraction_range(oneD, "ts", lo, hi)
    tz = layout.pruning_fraction_range(zord, "ts", lo, hi)
    assert t1 <= 0.2
    assert tz >= 0.4
    assert tz > t1 and uz > t1


def test_zorder_preserves_rows_and_validates(spark, tmp_path):
    import pytest as _pytest

    df = _events(spark)
    path = str(tmp_path / "z")
    layout.zorder_by(df, ["user_id", "value"], bits=6).write.parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    a = df.agg(F.sum(F.hash("user_id", "event_type", "ts"))).first()[0]
    b = back.agg(F.sum(F.hash("user_id", "event_type", "ts"))).first()[0]
    assert a == b
    with _pytest.raises(ValueError):
        layout.zorder_by(df, [], bits=8)
    with _pytest.raises(ValueError):
        layout.zorder_by(df, ["user_id", "value"], bits=32)


def test_dynamic_partition_pruning_fires_on_day_join(spark, tmp_path):
    """A selective dim filter joined on the partition column must
    become a dynamicpruningexpression PartitionFilter on the fact
    scan — run-time pruning, no manual predicate copying."""
    import re

    from pyspark.sql import functions as F

    from pyconform_spark import layout

    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).withColumn("d", F.to_date("ts"))
    fact_path = str(tmp_path / "fact")
    layout.write_partitioned(ev, fact_path, "d")
    dim_path = str(tmp_path / "dim")
    rows = [
        (f"2024-01-{i:02d}", "keep" if i in (3, 5, 9) else "drop")
        for i in range(1, 31)
    ]
    spark.createDataFrame(rows, "ds string, tag string").select(
        F.to_date("ds").alias("d"), "tag"
    ).write.parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).where(F.col("tag") == "keep")
    j = fact.join(dim, "d").groupBy("tag").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m and "dynamicpruningexpression" in m.group(0)
    # and the result is the plain-join answer (pruning lost nothing)
    got = {r["tag"]: r["n"] for r in j.collect()}
    exp = (
        ev.where(F.to_date("ts").isin("2024-01-03", "2024-01-05", "2024-01-09"))
        .count()
    )
    assert got == {"keep": exp}
