"""Neighbor-stencil and running-aggregate operators.

These are the window-function analogs the reference implements as
array-slice arithmetic:

* first difference with zero boundary — ``diff_axis1_ind0bczero_4d``
  (``modules/commonfunctions.py:558-596``)
* forward difference with boundary — ``rsdoabsorb``
  (``commonfunctions.py:602-645``)
* cell bounds from midpoints — ``bounds`` (``commonfunctions.py:256-341``)
* running integral — ``dynvarmip_psitem`` cumulative sum
  (``modules/dynvarmipdiags.py:161-185``)
* weighted downsample — ``monthtoyear_noleap``
  (``commonfunctions.py:143-188``)
* 3-point nonuniform derivative — ``idl.deriv`` (``idl.py:24-70``)

All are single-window / single-shuffle Catalyst plans; every window
below shares one (partitionBy keys, orderBy ts) sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _w(keys: list[str], order: str):
    return Window.partitionBy(*keys).orderBy(order)


def diff(
    df: DataFrame, value: str, keys: list[str], order: str, zero_boundary: bool = True
) -> DataFrame:
    """Backward first difference; boundary row gets v-0 (reference's
    index-0 boundary-condition-zero) or NULL."""
    w = _w(keys, order)
    prev = F.lag(F.col(value), 1, 0 if zero_boundary else None).over(w)
    return df.withColumn(f"{value}_diff", (F.col(value) - prev).cast("double"))


def lead_diff(df: DataFrame, value: str, keys: list[str], order: str) -> DataFrame:
    """Forward difference v[i] - v[i+1], last row keeps v[i] (rsdoabsorb
    bottom-boundary semantics)."""
    w = _w(keys, order)
    nxt = F.lead(F.col(value), 1, 0).over(w)
    return df.withColumn(f"{value}_absorb", (F.col(value) - nxt).cast("double"))


def bounds(df: DataFrame, coord: str, keys: list[str]) -> DataFrame:
    """Cell bounds from midpoints: lower/upper = half-distance to the
    neighboring midpoint, endpoint cells extrapolated symmetrically
    (reference ``bounds`` location=1 semantics)."""
    w = _w(keys, coord)
    c = F.col(coord).cast("double")
    prev = F.lag(c).over(w)
    nxt = F.lead(c).over(w)
    lower = F.when(prev.isNull(), c - (nxt - c) / 2).otherwise((prev + c) / 2)
    upper = F.when(nxt.isNull(), c + (c - prev) / 2).otherwise((c + nxt) / 2)
    return df.withColumn(f"{coord}_lb", lower).withColumn(f"{coord}_ub", upper)


def running_sum(df: DataFrame, value: str, keys: list[str], order: str) -> DataFrame:
    w = _w(keys, order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(f"{value}_cum", F.sum(value).over(w).cast("double"))


def weighted_mean(
    df: DataFrame, value: str, weight: Column, group_keys: list[Column | str]
) -> DataFrame:
    """Weighted rollup: sum(w*v)/sum(w) — the month→year downsample
    pattern.  Partial+final aggregation is automatic."""
    return df.groupBy(*group_keys).agg(
        (F.sum(weight * F.col(value)) / F.sum(weight)).alias(f"{value}_wmean")
    )


def deriv3(df: DataFrame, x: str, y: str, keys: list[str]) -> DataFrame:
    """IDL ``deriv``: 3-point Lagrange derivative on a possibly
    nonuniform grid, with the reference's distinct boundary stencils
    (``idl.py:24-70``), as lag/lead expressions — no Python.

    interior: y' = y0*(x12/(x01*x02)) + y1*(1/x12 - 1/x01)
                   - y2*(x01/(x02*x12))
    where x01 = x0-x1, x02 = x0-x2, x12 = x1-x2 for neighbors
    (x0,y0) previous, (x1,y1) current, (x2,y2) next.
    """
    w = _w(keys, x)
    x1, y1 = F.col(x).cast("double"), F.col(y).cast("double")
    x0, y0 = F.lag(x1).over(w), F.lag(y1).over(w)
    x2, y2 = F.lead(x1).over(w), F.lead(y1).over(w)

    x01, x02, x12 = x0 - x1, x0 - x2, x1 - x2
    interior = (
        y0 * (x12 / (x01 * x02)) + y1 * (1.0 / x12 - 1.0 / x01) - y2 * (x01 / (x02 * x12))
    )
    # left boundary (first point): stencil over (x1,x2,x3) — shift roles
    x3, y3 = F.lead(x1, 2).over(w), F.lead(y1, 2).over(w)
    l01, l02, l12 = x1 - x2, x1 - x3, x2 - x3
    left = (
        y1 * (l01 + l02) / (l01 * l02) - y2 * (l02 / (l01 * l12)) + y3 * (l01 / (l02 * l12))
    )
    # right boundary (last point): stencil over (x_-3, x_-2, x_-1)
    xm2, ym2 = F.lag(x1, 2).over(w), F.lag(y1, 2).over(w)
    r01, r02, r12 = xm2 - x0, xm2 - x1, x0 - x1
    right = (
        -ym2 * (r12 / (r01 * r02)) + y0 * (r02 / (r01 * r12)) - y1 * (r02 + r12) / (r02 * r12)
    )
    d = (
        F.when(x0.isNull(), left)
        .when(x2.isNull(), right)
        .otherwise(interior)
    )
    return df.withColumn(f"{y}_deriv", d)
