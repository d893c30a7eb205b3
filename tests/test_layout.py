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
