"""Slowly-changing-dimension (SCD type 2) operators: build validity
intervals from a change log, and join facts point-in-interval.

The warehouse pattern PyConform's static per-variable attribute tables
never needed but a transcripts rollup engine does: a dimension whose
attributes change over time (a user's plan, a tool's version, a
conversation's routing config) is stored as a CHANGE LOG (key, ts,
attrs), expanded to validity intervals [valid_from, valid_to), and
every fact row joins the interval containing its event time.

Scale shape, both halves:

* ``scd2_intervals`` — one shuffle on the key, one frame pass
  (``lead`` for valid_to, ``row_number`` for the version ordinal).
  Never materializes per-day snapshots; the interval table is exactly
  |change log| rows.
* ``scd2_join`` — the containing interval of ``fact.ts`` is the
  LATEST change at or before it, so the interval join collapses to a
  backward as-of join and reuses :mod:`.asof`'s union-sort
  formulation: one shuffle on the key, one key-local sort, linear in
  |facts| + |dim| — never the range cross-join a naive
  ``BETWEEN valid_from AND valid_to`` join plans at scale.  The
  DuckDB oracle IS that explicit interval join, so a green row proves
  the as-of collapse equals the interval semantics.

Facts before the first change get NULL attributes (left semantics) —
they predate the dimension, the standard SCD2 convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pyconform_spark.operators.asof import asof_join


def scd2_intervals(
    changes: DataFrame,
    keys: list[str],
    ts: str,
    attr_cols: list[str],
) -> DataFrame:
    """Expand a change log to SCD2 validity intervals.

    Input rows are (keys, ts, attrs) — one row per attribute change;
    (keys, ts) must be unique (pre-aggregate duplicates).  Output adds

    * ``valid_from``  — the change timestamp (renamed from ``ts``),
    * ``valid_to``    — the next change's timestamp (NULL = current),
    * ``scd_version`` — 1-based change ordinal per key.
    """
    w = Window.partitionBy(*keys).orderBy(ts)
    return changes.select(
        *keys,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.row_number().over(w).alias("scd_version"),
        *attr_cols,
    )


def scd2_join(
    facts: DataFrame,
    changes: DataFrame,
    keys: list[str],
    fact_ts: str,
    change_ts: str,
    attr_cols: list[str],
) -> DataFrame:
    """Join each fact row to the dimension attributes valid at its
    event time: the latest change with ``change_ts <= fact_ts`` per
    key (equivalently, the interval containing ``fact_ts``).

    Returns ``facts`` plus ``asof_<attr>`` for each attribute and
    ``asof_scd_version`` (NULL when the fact predates every change).
    Exactly-at-a-change-timestamp facts see the NEW attributes
    (closed-open interval semantics — the as-of tie rule matches).
    """
    w = Window.partitionBy(*keys).orderBy(change_ts)
    versioned = changes.select(
        *keys,
        change_ts,
        F.row_number().over(w).alias("scd_version"),
        *attr_cols,
    )
    return asof_join(
        facts,
        versioned,
        keys,
        fact_ts,
        change_ts,
        [*attr_cols, "scd_version"],
    )
