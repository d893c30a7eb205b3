"""Data-quality validation — the ValidateNode analog.

Reference: ``/root/reference/source/pyconform/flownodes.py:425-598``:
cast to the declared dtype with a same-kind guard (`:517-526`), mask
values outside ``valid_min``/``valid_max`` (`:562-578`), and warn when
the mean of |x| falls outside ``ok_{min,max}_mean_abs`` (`:580-596`).

Spark-first: casting and masking are Catalyst expressions; the
mean-abs / masked-count statistics ride ``df.observe`` so they are
computed **in the same pass as the real work** — no second scan (the
reference pays a full evaluation per validation; at 100 TB a second
scan is the difference between one job and two).

INTENTIONAL DEVIATION from the reference's masking semantics: the
reference masks INCLUSIVELY (``indata <= valid_min`` /
``>= valid_max``) but only when the current CHUNK contains a strictly
out-of-range value (flownodes.py:562-578) — whether a boundary-equal
value survives depends on which chunk it lands in, i.e. on the
partitioning.  That is not a portable semantic for a distributed
engine, so this module masks STRICTLY (``< valid_min`` /
``> valid_max``) and unconditionally: boundary-equal values are always
kept, independent of partitioning, and the result is deterministic
under any row distribution.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, functions as F
from pyspark.sql import types as T

# same-kind cast lattice (reference: numpy can_cast 'same_kind',
# flownodes.py:517-526): int->int, int->float, float->float OK;
# float->int is a kind change and refused.
_KIND = {
    T.ByteType: "i", T.ShortType: "i", T.IntegerType: "i", T.LongType: "i",
    T.FloatType: "f", T.DoubleType: "f",
    T.StringType: "s", T.BooleanType: "b",
    T.TimestampType: "t", T.TimestampNTZType: "t", T.DateType: "t",
}
_ALLOWED = {("i", "i"), ("i", "f"), ("f", "f"), ("s", "s"), ("b", "b"), ("t", "t")}


@dataclass(frozen=True)
class ColumnSpec:
    """Declared output column (VariableDesc analog, datasets.py:192-249)."""

    name: str
    dtype: str | None = None          # target Spark type name, e.g. "double"
    valid_min: float | None = None    # values below -> NULL
    valid_max: float | None = None    # values above -> NULL
    ok_min_mean_abs: float | None = None  # warn thresholds on mean(|x|)
    ok_max_mean_abs: float | None = None


class CastKindError(TypeError):
    pass


def _kind_of(dt: T.DataType) -> str:
    return _KIND.get(type(dt), "?")


def validate(
    df: DataFrame, specs: list[ColumnSpec], observe: bool = True
) -> tuple[DataFrame, Observation | None]:
    """Cast + mask per spec; returns (validated df, Observation).

    The Observation (if requested) carries, per spec column:
    ``<col>_masked`` (rows nulled by min/max) and ``<col>_mean_abs``.
    Metrics become available after the first action on the returned df
    — read them with :func:`warnings_from`.
    """
    by_name = {f.name: f.dataType for f in df.schema.fields}
    out = df
    metric_exprs = []
    tmp_cols = []
    for s in specs:
        if s.name not in by_name:
            raise KeyError(f"column {s.name!r} not in frame")
        col = F.col(s.name)
        is_array = isinstance(by_name[s.name], T.ArrayType)
        if is_array:
            # bnds-dimension outputs (e.g. bounds(lat) -> array[2]): the
            # declared scalar dtype names the ELEMENT type, exactly as
            # the reference's dtype applies elementwise to the N-D
            # array; min/max masking and mean-abs apply to scalars only
            if s.dtype is not None:
                src_kind = _kind_of(by_name[s.name].elementType)
                dst = getattr(T, "_parse_datatype_string")(s.dtype)
                if (src_kind, _kind_of(dst)) not in _ALLOWED:
                    raise CastKindError(
                        f"cast {s.name}: {by_name[s.name].simpleString()} "
                        f"-> array<{s.dtype}> is not same-kind"
                    )
                out = out.withColumn(s.name, col.cast(f"array<{s.dtype}>"))
            continue
        if s.dtype is not None:
            src_kind = _kind_of(by_name[s.name])
            dst = getattr(T, "_parse_datatype_string")(s.dtype)
            dst_kind = _kind_of(dst)
            if (src_kind, dst_kind) not in _ALLOWED:
                raise CastKindError(
                    f"cast {s.name}: {by_name[s.name].simpleString()} -> "
                    f"{s.dtype} is not same-kind"
                )
            col = col.cast(s.dtype)
        masked_pred = F.lit(False)
        if s.valid_min is not None:
            masked_pred = masked_pred | (col < s.valid_min)
        if s.valid_max is not None:
            masked_pred = masked_pred | (col > s.valid_max)
        if observe:
            # the mask predicate must see the PRE-mask values: stash it
            # as a temp column that the observe node reads before the
            # final projection drops it
            tmp = f"__masked_{s.name}"
            out = out.withColumn(tmp, masked_pred)
            tmp_cols.append(tmp)
            metric_exprs.append(
                F.sum(F.col(tmp).cast("long")).alias(f"{s.name}_masked")
            )
        if s.valid_min is not None or s.valid_max is not None:
            out = out.withColumn(
                s.name, F.when(masked_pred, F.lit(None)).otherwise(col)
            )
        elif s.dtype is not None:
            out = out.withColumn(s.name, col)
        out_dtype = (
            getattr(T, "_parse_datatype_string")(s.dtype)
            if s.dtype is not None
            else by_name[s.name]
        )
        if observe and _kind_of(out_dtype) in ("i", "f"):
            # mean |x| of the data actually emitted (nulls ignored) —
            # what ValidateNode warns on (flownodes.py:580-596); only
            # meaningful for numeric columns
            metric_exprs.append(
                F.avg(F.abs(F.col(s.name))).alias(f"{s.name}_mean_abs")
            )

    obs = None
    if observe and metric_exprs:
        obs = Observation("validate")
        out = out.observe(obs, *metric_exprs).drop(*tmp_cols)
    return out, obs


def warnings_from(metrics: dict, specs: list[ColumnSpec]) -> list[str]:
    """ValidateNode-style warnings from observed metrics
    (flownodes.py:580-596)."""
    warns = []
    for s in specs:
        ma = metrics.get(f"{s.name}_mean_abs")
        if ma is None:
            continue
        if s.ok_min_mean_abs is not None and ma < s.ok_min_mean_abs:
            warns.append(
                f"{s.name}: mean_abs {ma:.6g} < ok_min_mean_abs {s.ok_min_mean_abs}"
            )
        if s.ok_max_mean_abs is not None and ma > s.ok_max_mean_abs:
            warns.append(
                f"{s.name}: mean_abs {ma:.6g} > ok_max_mean_abs {s.ok_max_mean_abs}"
            )
        n_masked = metrics.get(f"{s.name}_masked", 0)
        if n_masked:
            warns.append(f"{s.name}: {n_masked} values masked outside valid range")
    return warns
