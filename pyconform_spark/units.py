"""Unit-carrying columns — the PhysArray units analog.

Reference semantics (``/root/reference/source/pyconform/physarray.py``):
every array carries a ``units`` (cf_units, `:214-255`); ``+``/``-``
convert the right operand to the left's units (`:418-421`), ``*``/``/``
multiply/divide units (`:455-484`), incompatible units raise
``UnitsError`` (`:250-255`), and ``chunits`` reinterprets units without
touching data (``functions.py:456-509``).

Spark-native recast: units ride **column metadata** (Spark's schema
metadata survives projections, writes, and reads), conversions are
affine Catalyst expressions (``x*a + b`` — free inside codegen), and
the compatibility check happens at PLAN time in Python, like the
reference's zero-size analysis pass (``dataflow.py:166-181``) — a bad
unit mix fails before any data moves.

The registry is intentionally small and explicit (time/size/rate for
the transcripts domain) — the general lesson is the mechanism, not a
full UDUNITS port.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

UNITS_KEY = "units"


class UnitsError(ValueError):
    pass


@dataclass(frozen=True)
class Unit:
    name: str
    dimension: str      # "time" | "bytes" | "rate" | "dimensionless" | ...
    scale: float        # multiples of the dimension's base unit
    offset: float = 0.0  # affine offset (e.g. degC -> K)


_REGISTRY: dict[str, Unit] = {}


def register(unit: Unit) -> Unit:
    _REGISTRY[unit.name] = unit
    return unit


for u in [
    # time (base: second)
    Unit("ms", "time", 1e-3),
    Unit("s", "time", 1.0),
    Unit("min", "time", 60.0),
    Unit("h", "time", 3600.0),
    Unit("d", "time", 86400.0),
    # size (base: byte)
    Unit("B", "bytes", 1.0),
    Unit("KiB", "bytes", 1024.0),
    Unit("MiB", "bytes", 1024.0**2),
    # rates (base: per-second)
    Unit("1/s", "rate", 1.0),
    Unit("1/min", "rate", 1.0 / 60.0),
    Unit("1/h", "rate", 1.0 / 3600.0),
    # temperature-style affine example
    Unit("K", "temperature", 1.0),
    Unit("degC", "temperature", 1.0, 273.15),
    Unit("", "dimensionless", 1.0),
]:
    register(u)


def _lookup(name: str) -> Unit:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise UnitsError(f"unknown unit {name!r}") from None


def unit_of(df: DataFrame, col: str) -> str | None:
    meta = df.schema[col].metadata or {}
    return meta.get(UNITS_KEY)


def with_units(df: DataFrame, col: str, units: str) -> DataFrame:
    """Attach units metadata (chunits reinterpretation: data untouched,
    functions.py:456-509)."""
    _lookup(units)
    meta = dict(df.schema[col].metadata or {})
    meta[UNITS_KEY] = units
    return df.withMetadata(col, meta)


def convert(df: DataFrame, col: str, to: str, out: str | None = None) -> DataFrame:
    """Convert a unit-carrying column: one affine expression, plan-time
    compatibility check (ValidateNode convert, flownodes.py:528-541)."""
    src_name = unit_of(df, col)
    if src_name is None:
        raise UnitsError(f"column {col!r} carries no units metadata")
    src, dst = _lookup(src_name), _lookup(to)
    if src.dimension != dst.dimension:
        raise UnitsError(
            f"cannot convert {col!r}: {src_name} ({src.dimension}) -> "
            f"{to} ({dst.dimension})"
        )
    out = out or col
    # value_base = x*scale + offset; value_dst = (base - off_d)/scale_d
    expr = (
        (F.col(col) * F.lit(src.scale) + F.lit(src.offset) - F.lit(dst.offset))
        / F.lit(dst.scale)
    ).alias(out)
    res = df.withColumn(out, expr)
    return with_units(res, out, to)


def add_compatible(
    df: DataFrame, left: str, right: str, out: str
) -> DataFrame:
    """``left + right`` with the reference's +/- rule: the right operand
    is converted to the LEFT's units first (physarray.py:418-421);
    incompatible dimensions raise UnitsError at plan time."""
    lu = unit_of(df, left)
    ru = unit_of(df, right)
    if lu is None or ru is None:
        raise UnitsError("both operands must carry units metadata")
    if lu != ru:
        df = convert(df, right, lu, out=f"__conv_{right}")
        right = f"__conv_{right}"
    res = df.withColumn(out, F.col(left) + F.col(right))
    res = res.drop(f"__conv_{right}") if right.startswith("__conv_") else res
    return with_units(res, out, lu)


def multiply(df: DataFrame, left: str, right: str, out: str) -> DataFrame:
    """``left * right``: units multiply (physarray.py:455-484).  The
    result's unit label is the symbolic product; only same-dimension
    scaling is resolved (general unit algebra out of scope)."""
    lu, ru = unit_of(df, left), unit_of(df, right)
    res = df.withColumn(out, F.col(left) * F.col(right))
    label = f"({lu})*({ru})" if lu and ru else (lu or ru or "")
    meta = dict(res.schema[out].metadata or {})
    meta[UNITS_KEY] = label
    return res.withMetadata(out, meta)
