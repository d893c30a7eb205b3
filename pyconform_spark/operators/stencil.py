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


def bounds(
    df: DataFrame,
    coord: str,
    keys: list[str],
    location: int = 1,
    endpoints: bool = True,
) -> DataFrame:
    """Cell bounds from coordinate values (reference ``bounds``,
    ``modules/commonfunctions.py:256-341``, computed-idata branch):

    * ``location=0`` — value sits at the LOWER edge: lower = x,
      upper = next x (open end extrapolated ``x + dx`` when
      ``endpoints``).
    * ``location=1`` — value is the midpoint: lower/upper are half-way
      to the neighbors, both open ends extrapolated symmetrically.
    * ``location=2`` — value sits at the UPPER edge: lower = previous
      x, upper = x (open end extrapolated ``x - dx``).

    ``endpoints=False`` reproduces the reference's untouched-endpoint
    init (lower = upper = x at the open ends).  All three locations
    ride the same (keys, coord) window sort."""
    if location not in (0, 1, 2):
        raise ValueError("bounds: location must be 0, 1, or 2")
    w = _w(keys, coord)
    c = F.col(coord).cast("double")
    prev = F.lag(c).over(w)
    nxt = F.lead(c).over(w)
    if location == 1:
        lo_end = c - (nxt - c) / 2 if endpoints else c
        hi_end = c + (c - prev) / 2 if endpoints else c
        lower = F.when(prev.isNull(), lo_end).otherwise((prev + c) / 2)
        upper = F.when(nxt.isNull(), hi_end).otherwise((c + nxt) / 2)
    elif location == 0:
        lower = c
        hi_end = c + (c - prev) if endpoints else c
        upper = F.when(nxt.isNull(), hi_end).otherwise(nxt)
    else:  # location == 2
        lo_end = c - (nxt - c) if endpoints else c
        lower = F.when(prev.isNull(), lo_end).otherwise(prev)
        upper = c
    return df.withColumn(f"{coord}_lb", lower).withColumn(f"{coord}_ub", upper)


def bounds_from_interfaces(
    cells: DataFrame,
    ifc: DataFrame,
    coord: str,
    ival: str,
    keys: list[str],
    location: int = 1,
    inner: bool = True,
) -> DataFrame:
    """Bounds taken from an explicit interface table (the reference's
    ``idata`` branch, ``commonfunctions.py:313-341``): per series the
    interfaces are either the full n+1 edges (``inner=False``, used
    directly) or the n-1 INNER edges (``inner=True``), whose two open
    ends are padded by the location rule —

    * location 0: ``ifc[0] = x[0]``, ``ifc[n] = 2*x[-1] - x[-2]``
    * location 1: ``ifc[0] = 2*x[0] - idata[0]``,
      ``ifc[n] = 2*x[-1] - idata[-1]``
    * location 2: ``ifc[0] = 2*x[0] - x[1]``, ``ifc[n] = x[-1]``

    Scale shape: one window rank per table, one hash-agg for the
    per-series pad scalars (inner mode only), one shuffle equi-join on
    (keys, position) — no Python, no broadcast of anything unbounded.
    """
    if location not in (0, 1, 2):
        raise ValueError("bounds: location must be 0, 1, or 2")
    wc = _w(keys, coord)
    c = F.col(coord).cast("double")
    cells_r = (
        cells.select(*keys, c.alias(coord))
        .withColumn("_i", F.row_number().over(wc) - 1)
    )
    v = F.col(ival).cast("double")
    wi = _w(keys, "_v")
    if inner:
        # inner interface j sits between cells j and j+1 → position j+1
        # in the full edge sequence 0..n
        ifc_pos = ifc.select(*keys, v.alias("_v")).withColumn(
            "_j", F.row_number().over(wi)
        )
        wn = Window.partitionBy(*keys)
        ranked = cells_r.withColumn("_n", F.count(F.lit(1)).over(wn))
        i_ = F.col("_i")
        n_ = F.col("_n")
        stats = ranked.groupBy(*keys, "_n").agg(
            F.min(F.when(i_ == 0, F.col(coord))).alias("_x0"),
            F.min(F.when(i_ == 1, F.col(coord))).alias("_x1"),
            F.min(F.when(i_ == n_ - 2, F.col(coord))).alias("_xm2"),
            F.min(F.when(i_ == n_ - 1, F.col(coord))).alias("_xm1"),
        )
        istats = ifc.groupBy(*keys).agg(
            F.min(v).alias("_i0"), F.max(v).alias("_iN")
        )
        s = stats.join(istats, keys)
        if location == 0:
            pad_lo = F.col("_x0")
            pad_hi = 2.0 * F.col("_xm1") - F.col("_xm2")
        elif location == 1:
            pad_lo = 2.0 * F.col("_x0") - F.col("_i0")
            pad_hi = 2.0 * F.col("_xm1") - F.col("_iN")
        else:
            pad_lo = 2.0 * F.col("_x0") - F.col("_x1")
            pad_hi = F.col("_xm1")
        pads = s.select(
            *keys,
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("_j"), pad_lo.alias("_v")),
                    F.struct(F.col("_n").alias("_j"), pad_hi.alias("_v")),
                )
            ).alias("_e"),
        ).select(*keys, F.col("_e._j").alias("_j"), F.col("_e._v").alias("_v"))
        edges = ifc_pos.unionByName(pads)
    else:
        edges = ifc.select(*keys, v.alias("_v")).withColumn(
            "_j", F.row_number().over(wi) - 1
        )  # full edge sequence: positions 0..n directly
    we = _w(keys, "_j")
    paired = edges.withColumn("_vn", F.lead("_v").over(we))
    # equi-join on (keys, position): cell i spans edges i and i+1
    out = cells_r.join(
        paired.withColumnRenamed("_j", "_i"), [*keys, "_i"]
    )
    return out.select(
        *keys,
        coord,
        F.col("_v").alias(f"{coord}_lb"),
        F.col("_vn").alias(f"{coord}_ub"),
    )


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
