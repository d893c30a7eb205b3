"""Data layout clustering: make parquet min/max statistics selective.

At 100 TB the cheapest scan is the one that never reads the page: a
point or range predicate prunes a parquet row group iff the group's
[min, max] footer statistics exclude the value — which only happens
when the write path CLUSTERED rows by that column.  ``cluster_by``
is the one-liner that turns a shuffled-arbitrary table into a
range-partitioned, partition-sorted layout (Iceberg's
``write.sort-order`` / Delta OPTIMIZE ZORDER's 1-D case), and the
``rowgroup_*`` helpers read the footers back so tests and benches can
measure the effect as a pruning FRACTION — deterministic evidence, no
timing noise.

Composition: cluster the tier store by (conv_id) and every
per-conversation query (sessionize, cascade, as-of) scans only the
row groups whose key range overlaps; cluster by (bucket_start) and
the resolution router's range reads prune to the requested window.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame


def cluster_by(df: DataFrame, cols: list[str], n_files: int | None = None) -> DataFrame:
    """Range-partition on ``cols`` and sort within each partition, so
    every output file (and every row group inside it) covers a narrow,
    non-overlapping key range.  Write the result with plain
    ``.write.parquet`` — the layout, not the writer, is the feature."""
    parted = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    return parted.sortWithinPartitions(*cols)


def rowgroup_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) footer statistics of ``col`` for every row group of
    every parquet file under ``path``."""
    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            out.append((st.min, st.max))
    return out


def pruning_fraction(path: str, col: str, value) -> float:
    """Fraction of row groups a ``col = value`` predicate can skip
    from footer statistics alone — the number parquet readers
    (Spark's included) use before touching any page."""
    ranges = rowgroup_ranges(path, col)
    if not ranges:
        return 0.0
    pruned = sum(1 for lo, hi in ranges if value < lo or value > hi)
    return pruned / len(ranges)


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_files: int | None = None,
) -> DataFrame:
    """Multi-column Z-order clustering: interleave the bits of each
    column's quantized rank so files stay selective on EVERY listed
    column at once — 1-D ``cluster_by`` makes one predicate prunable
    and leaves the others shuffled; Z-order splits the budget (Delta
    OPTIMIZE ZORDER semantics, built from Catalyst bit arithmetic —
    no UDF).

    Columns must be numeric or timestamp.  Quantization uses a single
    min/max stats pass (one small driver action, the standard layout-
    write cost).  ``bits`` per column; total key width
    ``bits * len(cols)`` must fit int64."""
    if not cols:
        raise ValueError("zorder_by needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit a signed int64")
    from pyspark.sql import functions as F

    def _num(c: str):
        return F.col(c).cast("timestamp").cast("long") if dict(df.dtypes)[c].startswith("timestamp") else F.col(c).cast("double")

    stats = df.agg(
        *[F.min(_num(c)).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(_num(c)).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).first()
    scale = (1 << bits) - 1
    qs = []
    for i, c in enumerate(cols):
        mn, mx = float(stats[f"mn_{i}"]), float(stats[f"mx_{i}"])
        span = (mx - mn) or 1.0
        q = F.floor(
            (_num(c).cast("double") - F.lit(mn)) * F.lit(scale / span)
        ).cast("long")
        qs.append(F.least(F.greatest(q, F.lit(0)), F.lit(scale)))
    z = F.lit(0).cast("long")
    for k in range(bits):
        for i, q in enumerate(qs):
            bit = F.shiftright(q, k).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, k * len(cols) + i)
    tagged = df.withColumn("_zorder", z)
    parted = (
        tagged.repartitionByRange(n_files, "_zorder")
        if n_files
        else tagged.repartitionByRange("_zorder")
    )
    return parted.sortWithinPartitions("_zorder").drop("_zorder")


def pruning_fraction_range(path: str, col: str, lo, hi) -> float:
    """Fraction of row groups a ``col BETWEEN lo AND hi`` predicate
    can skip from footer statistics alone."""
    ranges = rowgroup_ranges(path, col)
    if not ranges:
        return 0.0
    pruned = sum(1 for gmin, gmax in ranges if hi < gmin or lo > gmax)
    return pruned / len(ranges)


def write_partitioned(df: DataFrame, path: str, col: str) -> None:
    """Hive-style directory partitioning on ``col`` — the layout that
    lets Catalyst prune whole partitions at PLAN time (static filters)
    and at RUN time (dynamic partition pruning: a selective dim-side
    filter on a join against the partition column is turned into a
    ``dynamicpruningexpression`` partition filter on the fact scan, so
    only the joined days' directories are ever listed or read).

    This is the tier store's directory discipline generalized: at
    100 TB, day-partitioned facts + DPP mean a 3-day dim filter reads
    3/365ths of the table with no manual predicate copying.  The
    pruning requires the dim side to be a real source with a filter
    (not a local relation) — pinned by the plan gate in
    tests/test_layout.py."""
    df.write.partitionBy(col).parquet(path)
