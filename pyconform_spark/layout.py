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
