"""Vertical-coordinate interpolation — the ``vinth2p`` analog.

The reference's most-used domain function (73 uses in its CMIP6
definitions) wraps NCAR's hybrid-sigma→pressure interpolation
(``/root/reference/source/pyconform/modules/pnglfunctions.py:12-77``):
per column of air, input pressure at model level k is
``p(k) = hyam(k)*p0 + hybm(k)*psfc``; the field is interpolated from
those pressures onto fixed output levels ``plevo``, linearly in p
(``intyp=1``) or in log p (``intyp=2``); with extrapolation off
(``ixtrp=0``) output levels outside the column's pressure range become
missing (the reference remaps 1e30→1e20; here: SQL NULL, the engine's
mask convention).

Spark-first shape — NOT a port of the Fortran:

* the long-form column-of-air table (keys..., p, v) is cross-joined
  with the (tiny, literal) target-level array via ``explode`` — a
  narrow map-side fan-out of n_plev per row, no shuffle;
* the bracketing knots come from ONE hash aggregate per
  (column, target): ``max(struct(p,v)) where p <= plev`` /
  ``min(struct(p,v)) where p >= plev`` — lexicographic struct
  min/max, partial+final, fully parallel;
* the interpolation itself is a closed-form Catalyst expression, so
  the linear variant has a bit-exact DuckDB twin.  log p uses
  transcendental ``ln`` (NOT cross-engine ulp-stable), so the log
  variant is golden-tested against the numpy twin instead.

``vertical_interp_pandas`` is the grouped-Arrow-UDF hosting pattern
the reference's external-library call would ride (one numpy call per
column of air) — kept as the extension point for richer schemes and
proven bit-identical to the Catalyst path in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def hybrid_pressure(
    hyam: Column, hybm: Column, psfc: Column, p0: float = 1000.0
) -> Column:
    """p = hyam*p0 + hybm*psfc (the hybrid-sigma coordinate law)."""
    return hyam * F.lit(float(p0)) + hybm * psfc


def vertical_interp(
    df: DataFrame,
    keys: list[str],
    p_col: str,
    v_col: str,
    plevs: list[float],
    log_space: bool = False,
) -> DataFrame:
    """Interpolate each column-of-air's (p, v) samples onto the fixed
    target levels ``plevs``; targets outside [min p, max p] yield NULL
    (ixtrp=0 semantics).  Output: (keys..., plev, v_interp)."""
    tgt = F.explode(F.array(*[F.lit(float(p)) for p in plevs])).alias("plev")
    x = df.select(
        *keys,
        F.col(p_col).cast("double").alias("_p"),
        F.col(v_col).cast("double").alias("_v"),
    ).select(*keys, "_p", "_v", tgt)
    below = F.when(
        F.col("_p") <= F.col("plev"),
        F.struct(F.col("_p").alias("p"), F.col("_v").alias("v")),
    )
    above = F.when(
        F.col("_p") >= F.col("plev"),
        F.struct(F.col("_p").alias("p"), F.col("_v").alias("v")),
    )
    agg = x.groupBy(*keys, "plev").agg(
        F.max(below).alias("_lo"), F.min(above).alias("_hi")
    )
    p_lo, v_lo = F.col("_lo.p"), F.col("_lo.v")
    p_hi, v_hi = F.col("_hi.p"), F.col("_hi.v")
    if log_space:
        frac = (F.log(F.col("plev")) - F.log(p_lo)) / (
            F.log(p_hi) - F.log(p_lo)
        )
    else:
        frac = (F.col("plev") - p_lo) / (p_hi - p_lo)
    val = (
        F.when(p_lo.isNull() | p_hi.isNull(), F.lit(None))
        .when(p_hi == p_lo, v_lo)
        .otherwise(v_lo + (v_hi - v_lo) * frac)
    )
    return agg.select(
        *keys, "plev", val.cast("double").alias("v_interp")
    )


def vertical_interp_pandas(
    df: DataFrame,
    keys: list[str],
    p_col: str,
    v_col: str,
    plevs: list[float],
    log_space: bool = False,
) -> DataFrame:
    """Grouped-Arrow-UDF twin of :func:`vertical_interp` (the hosting
    pattern an external interpolation library would ride): one numpy
    bracketing pass per column of air, identical arithmetic order to
    the Catalyst expression so the outputs are bit-identical."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.select(*keys).schema]
        + ["plev double", "v_interp double"]
    )
    targets = np.asarray(plevs, dtype=np.float64)

    def _interp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(p_col, kind="mergesort")
        p = pdf[p_col].to_numpy(dtype=np.float64)
        v = pdf[v_col].to_numpy(dtype=np.float64)
        xq = np.log(targets) if log_space else targets
        xp = np.log(p) if log_space else p
        # bracket indices: hi = first knot with p >= plev
        hi = np.searchsorted(p, targets, side="left")
        lo = hi - 1
        exact = (hi < len(p)) & (p[np.clip(hi, 0, len(p) - 1)] == targets)
        oob = (hi == 0) & ~exact | (hi == len(p))
        hi_c = np.clip(hi, 0, len(p) - 1)
        lo_c = np.clip(lo, 0, len(p) - 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = (xq - xp[lo_c]) / (xp[hi_c] - xp[lo_c])
            vi = v[lo_c] + (v[hi_c] - v[lo_c]) * frac
        vi = np.where(exact, v[hi_c], vi)
        vi = np.where(oob, np.nan, vi)
        head = pdf.iloc[:1][list(keys)]
        out = pd.concat([head] * len(targets), ignore_index=True)
        out["plev"] = targets
        out["v_interp"] = vi
        return out

    return df.groupBy(*keys).applyInPandas(_interp, schema=out_schema)
