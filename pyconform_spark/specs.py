"""Spec-driven output pipeline — the xconform lifecycle analog.

Reference flow (``/root/reference/scripts/xconform:100-165``): a JSON
standardization file maps each OUTPUT variable to a ``definition``
string, a ``datatype``, and an ``attributes`` dict; it is parsed into
an ``OutputDatasetDesc`` (``datasets.py:672-869``) whose variables with
empty/missing definitions are SKIPPED with a ``DefinitionWarning``
(``datasets.py:731-747``); ``DataFlow`` plans definition → validator →
writer chains (``dataflow.py:183-264``) where the ValidateNode converts
data to the declared units, flips the declared positive direction, casts
to the declared dtype, and masks/warns on valid_min/valid_max and
ok_{min,max}_mean_abs (``flownodes.py:425-598``).

Spark-native recast: the spec compiles to ONE declared projection —
every definition is a Catalyst column (``defs.py``), the declared
dtype/units/positive become cast + affine-convert + negate expressions
folded into the same projection, the valid-range mask and mean-abs
statistics ride ``validate.validate``'s single-pass ``observe``, and
the committed write reuses the epoch/lineage machinery of
``pipeline.py`` (lineage append = commit point, resume skips committed
epochs).  The whole output dataset is one job: scan → project →
validate → write, no per-variable passes.

Skip-with-warning semantics (mirroring datasets.py:731-747 and
extending it to the distributed case): a variable is skipped — with a
``SpecWarning`` — when its definition is missing/empty, fails to
parse, or references an input column (or another skipped output) that
does not exist.  Everything else in the spec still materializes, so
one bad entry in a 2,000-definition spec costs one variable, not the
job.
"""

from __future__ import annotations

import json
import os
import warnings as _warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F
from pyspark.sql import types as T

from pyconform_spark import defs as D
from pyconform_spark import units as U
from pyconform_spark import validate as V


class SpecError(ValueError):
    pass


class SpecWarning(UserWarning):
    """DefinitionWarning analog (datasets.py:744-746)."""


@dataclass
class VariableSpec:
    """One output variable (VariableDesc analog, datasets.py:192-249)."""

    name: str
    definition: str | None = None
    datatype: str = "double"
    attributes: dict = field(default_factory=dict)

    @property
    def units(self) -> str | None:
        return self.attributes.get("units")

    @property
    def positive(self) -> str | None:
        return self.attributes.get("positive")


# NetCDF/numpy datatype names (OutputDatasetDesc._NC_TYPES_,
# datasets.py:699-700) -> Spark type names; Spark names pass through.
_DTYPE_MAP = {
    "float64": "double",
    "float32": "float",
    "real": "float",
    "int32": "int",
    "int64": "bigint",
    "uint": "bigint",
    "uint64": "bigint",
    "ushort": "int",
    "short": "smallint",
    "byte": "tinyint",
    "char": "string",
}


def load_spec(spec) -> list[VariableSpec]:
    """JSON path / dict -> ordered VariableSpec list (the spec's own
    order is the evaluation order, so later definitions may reference
    earlier outputs by name, like DataFlow's dependency chaining).

    Accepts BOTH layouts the reference ships: flat
    ``{variable: {...}}`` (CESM CMIP tables) and the xconform
    standardization file with a ``"variables"`` section
    (examples/simple/calculator/calculator.json); NC datatype names
    (``float64``/``float32``/``char``/...) map to Spark types, and
    per-variable ``dimensions``/``file`` sections are accepted and
    ignored (relational frames carry no fixed axes)."""
    if isinstance(spec, str):
        with open(spec) as fh:
            spec = json.load(fh)
    if not isinstance(spec, dict):
        raise SpecError("spec must be a JSON object of {variable: {...}}")
    if isinstance(spec.get("variables"), dict):
        spec = spec["variables"]
    out = []
    for name, vdict in spec.items():
        if not isinstance(vdict, dict):
            raise SpecError(f"spec entry {name!r} must be an object")
        dt = str(vdict.get("datatype", "double"))
        out.append(
            VariableSpec(
                name=name,
                definition=vdict.get("definition"),
                datatype=_DTYPE_MAP.get(dt, dt),
                attributes=dict(vdict.get("attributes", {})),
            )
        )
    return out


def declared_schema(spec) -> T.StructType:
    """The declared output StructType (the OutputDatasetDesc header),
    with units/positive attributes as column metadata."""
    fields = []
    for v in load_spec(spec) if not _is_loaded(spec) else spec:
        meta = {}
        if v.units is not None:
            meta[U.UNITS_KEY] = v.units
        if v.positive is not None:
            meta[U.POSITIVE_KEY] = v.positive
        fields.append(
            T.StructField(
                v.name,
                T._parse_datatype_string(v.datatype),
                nullable=True,
                metadata=meta,
            )
        )
    return T.StructType(fields)


def _is_loaded(spec) -> bool:
    return (
        isinstance(spec, list)
        and all(isinstance(v, VariableSpec) for v in spec)
    )


def _referenced_names(ast) -> set[str]:
    if isinstance(ast, D.VarType):
        names = {ast.key}
        for i in ast.ind:
            if isinstance(i, slice):
                for part in (i.start, i.stop, i.step):
                    names |= _referenced_names(part) if part is not None else set()
            else:
                names |= _referenced_names(i)
        return names
    if isinstance(ast, D.OpType):
        out: set[str] = set()
        for a in ast.args:
            out |= _referenced_names(a)
        return out
    if isinstance(ast, D.FuncType):
        out = set()
        for a in ast.args:
            if not isinstance(a, str):
                out |= _referenced_names(a)
        for v in ast.kwds.values():
            if not isinstance(v, str):
                out |= _referenced_names(v)
        return out
    return set()


def plan_spec(
    df: DataFrame, spec, window_keys: tuple[str, ...] = ()
) -> tuple[list[tuple[VariableSpec, D.Compiled]], list[str]]:
    """Compile every spec variable against df; returns (planned,
    skip-warnings).  All failures surface HERE — before any action.

    ``window_keys`` partitions window-shaped definitions (``bounds``):
    empty = one global series (coordinate tables); pass the series
    keys for per-series data."""
    variables = spec if _is_loaded(spec) else load_spec(spec)
    ctx = D._context_from(df)
    compiler = D.Compiler(ctx, df.schema, window_keys=window_keys)
    planned: list[tuple[VariableSpec, D.Compiled]] = []
    warns: list[str] = []

    def skip(v: VariableSpec, why: str) -> None:
        msg = f"Skipping output variable {v.name!r}: {why}"
        warns.append(msg)
        _warnings.warn(msg, SpecWarning)

    for v in variables:
        if v.definition is None or not str(v.definition).strip():
            skip(v, "empty or missing definition")
            continue
        try:
            ast = D.parse_definition(str(v.definition))
        except D.DefinitionError as e:
            skip(v, f"definition does not parse ({e})")
            continue
        missing = _referenced_names(ast) - set(ctx)
        if missing:
            skip(v, f"unknown input(s) {sorted(missing)}")
            continue
        try:
            c = compiler.compile(ast)
        except D.DefinitionError as e:
            # e.g. a function outside the registry (window-shaped ops
            # like the reference's `bounds` have no row-wise Column
            # form) — one bad entry costs one variable, not the spec
            skip(v, str(e))
            continue
        c = _apply_declared(v, c)
        ctx[v.name] = c
        planned.append((v, c))
    return planned, warns


def _apply_declared(v: VariableSpec, c: D.Compiled) -> D.Compiled:
    """Fold the declared units/positive into the compiled expression
    (the ValidateNode convert/flip, flownodes.py:528-552): convert the
    computed column into the DECLARED units when both are known, and
    negate when the computed positive direction opposes the declared
    one."""
    col, unit, pos = c.col, c.unit, c.positive
    if v.units is not None:
        try:
            declared = U.parse_unit(v.units)
        except U.UnitsError:
            # a unit label outside the engine's registry (e.g. the
            # reference's CF strings like 'meters'): attach it as an
            # OPAQUE metadata label — unless the computed column
            # carries algebra-tracked units, where silently dropping
            # the conversion would be wrong
            if unit is not None:
                raise U.UnitsError(
                    f"{v.name}: declared units {v.units!r} are not in "
                    f"the unit registry but the computed column carries "
                    f"{unit.name!r}; register the unit or drop the "
                    "declaration"
                ) from None
            declared = None  # opaque label; attached by apply_spec
        if declared is not None:
            if unit is not None:
                a, b = U.conversion(unit, declared)  # plan-time check
                if a != 1.0 or b != 0.0:
                    col = col * F.lit(a) + F.lit(b)
            unit = declared
    if v.positive is not None:
        if pos is not None and pos != v.positive:
            col = -col
        pos = v.positive
    return D.Compiled(col=col, unit=unit, positive=pos, is_agg=c.is_agg)


def apply_spec(
    df: DataFrame,
    spec,
    observe: bool = True,
    passthrough: list[str] | None = None,
    window_keys: tuple[str, ...] = (),
) -> tuple[DataFrame, Observation | None, list[str]]:
    """definition evaluation → declared cast → valid-range mask +
    observed statistics, as ONE projection over one scan.

    Returns (output frame with exactly the declared columns — plus any
    ``passthrough`` input columns carried verbatim, e.g. a partition
    key — an Observation carrying per-column masked counts / mean-abs —
    read it with ``validate.warnings_from`` after the first action —
    and the skip warnings)."""
    planned, warns = plan_spec(df, spec, window_keys=window_keys)
    if not planned:
        raise SpecError("spec produced no output variables")
    # Materialize outputs under collision-proof temp names: Spark's
    # default case-INSENSITIVE resolution makes withColumn('u', ...)
    # silently replace an input column 'U', corrupting later
    # definitions that still reference it (the reference's calculator
    # spec does exactly this: output u/v from inputs U/V).  Def
    # chaining is unaffected — it composes compiled EXPRESSIONS, not
    # materialized columns.
    out = df
    col_specs = []
    names = [v.name for v, _ in planned]
    for v, c in planned:
        out = out.withColumn(f"__out_{v.name}", c.col)
        col_specs.append(
            V.ColumnSpec(
                v.name,
                dtype=v.datatype,
                valid_min=v.attributes.get("valid_min"),
                valid_max=v.attributes.get("valid_max"),
                ok_min_mean_abs=v.attributes.get("ok_min_mean_abs"),
                ok_max_mean_abs=v.attributes.get("ok_max_mean_abs"),
            )
        )
    carry = list(passthrough or [])
    out = out.select(
        *carry, *[F.col(f"__out_{n}").alias(n) for n in names]
    )
    validated, obs = V.validate(out, col_specs, observe=observe)
    final = validated.select(*carry, *names)
    for v, c in planned:
        final = D._attach_meta(final, v.name, c)
        if v.units is not None and c.unit is None:
            # opaque declared label (outside the unit registry): carry
            # it as plain metadata, exactly as the reference carries CF
            # unit strings it never interprets
            meta = dict(final.schema[v.name].metadata or {})
            meta[U.UNITS_KEY] = v.units
            final = final.withMetadata(v.name, meta)
    return final, obs, warns


# ------------------------------------------------------- committed writes
def _out_path(root: str, epoch: int) -> str:
    return os.path.join(root, "outputs", f"epoch={epoch}")


def _spec_lineage_path(root: str) -> str:
    return os.path.join(root, "spec_lineage")


def committed_spec_epochs(spark: SparkSession, root: str) -> set[int]:
    path = _spec_lineage_path(root)
    if not os.path.isdir(path) or not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return set()
    rows = spark.read.parquet(path).select("checkpoint_epoch").distinct().collect()
    return {r["checkpoint_epoch"] for r in rows}


def run_spec(
    spark: SparkSession,
    df: DataFrame,
    spec,
    root: str,
    ts_col: str = "ts",
    epochs: list[int] | None = None,
) -> dict:
    """The xconform job: spec + input table → epoch-committed declared
    outputs under ``root/outputs/epoch=<k>`` with per-partition lineage
    (``root/spec_lineage``).  The lineage append is the commit point;
    re-running resumes past committed epochs (pipeline.py contract).

    Returns {"epochs": [...], "skipped": [...], "rows": {epoch: n},
    "warnings": [...], "metrics": {epoch: observed}}."""
    from pyconform_spark import pipeline

    os.makedirs(root, exist_ok=True)
    all_epochs = epochs if epochs is not None else pipeline.list_epochs(
        df.withColumn("ts", F.col(ts_col))
    )
    done = committed_spec_epochs(spark, root)
    ran, skipped, rows, metrics = [], [], {}, {}
    all_warns: list[str] = []

    for epoch in all_epochs:
        if epoch in done:
            skipped.append(epoch)
            continue
        sl = pipeline._epoch_filter(df.withColumn("ts", F.col(ts_col)), [epoch])
        out, obs, warns = apply_spec(sl, spec)
        all_warns = warns  # identical per epoch (plan-time property)
        path = _out_path(root, epoch)
        out.write.mode("overwrite").parquet(path)
        written = spark.read.parquet(path)
        lin = (
            written.select(F.spark_partition_id().alias("partition_id"))
            .groupBy("partition_id")
            .agg(F.count(F.lit(1)).alias("point_count"))
            .select(
                "partition_id",
                F.lit("spec").alias("tier"),
                F.lit(epoch).cast("long").alias("checkpoint_epoch"),
                F.col("point_count").cast("long").alias("point_count"),
            )
        )
        # ---- commit point
        lin.coalesce(1).write.mode("append").parquet(_spec_lineage_path(root))
        rows[epoch] = written.count()
        if obs is not None:
            metrics[epoch] = dict(obs.get)
        ran.append(epoch)

    return {
        "epochs": ran,
        "skipped": skipped,
        "rows": rows,
        "warnings": all_warns,
        "metrics": metrics,
    }


def scaffold_spec(
    df: DataFrame, rename: dict[str, str] | None = None
) -> dict:
    """Author a starting output spec FROM an input table — the
    ``iconform`` analog (the reference generates output specs from
    standardization tables; here the input schema is the source of
    truth).  Each column becomes an identity-definition output variable
    carrying its dtype and any units/positive metadata already riding
    the schema; ``rename`` maps input column -> output variable name.
    The returned dict round-trips through :func:`load_spec` /
    :func:`run_spec`, and is the template users edit definitions into.
    """
    rename = rename or {}
    spec: dict = {}
    for fld in df.schema.fields:
        attrs: dict = {}
        meta = fld.metadata or {}
        if U.UNITS_KEY in meta:
            attrs["units"] = meta[U.UNITS_KEY]
        if U.POSITIVE_KEY in meta:
            attrs["positive"] = meta[U.POSITIVE_KEY]
        out_name = rename.get(fld.name, fld.name)
        entry: dict = {
            "datatype": fld.dataType.simpleString(),
            "definition": fld.name,
        }
        if attrs:
            entry["attributes"] = attrs
        spec[out_name] = entry
    return spec


def run_spec_batch(
    spark: SparkSession,
    df: DataFrame,
    spec,
    root: str,
    ts_col: str = "ts",
    epochs: list[int] | None = None,
    epochs_per_commit: int = 64,
) -> dict:
    """Batched spec materialization: ONE scan of the input per commit
    batch regardless of how many epochs it spans — ``run_spec`` scans
    once per epoch, which is fine for incremental ingest but quadratic
    for backfills (pipeline.run vs run_batch, same contract).  The
    outputs land in the same ``outputs/epoch=<k>`` layout via dynamic
    partition overwrite, lineage for the whole batch is appended at
    the end (the commit point), and both modes interoperate with
    ``read_spec_outputs``."""
    from pyconform_spark import pipeline

    os.makedirs(root, exist_ok=True)
    ts_df = df.withColumn("ts", F.col(ts_col))
    all_epochs = epochs if epochs is not None else pipeline.list_epochs(ts_df)
    done = committed_spec_epochs(spark, root)
    pending = [e for e in all_epochs if e not in done]
    skipped = [e for e in all_epochs if e in done]
    ran: list[int] = []
    rows: dict[int, int] = {}
    all_warns: list[str] = []

    epoch_col = (
        F.col("ts").cast("timestamp").cast("long") / pipeline.EPOCH_SECONDS
    ).cast("long")
    base = os.path.join(root, "outputs")
    for i in range(0, len(pending), epochs_per_commit):
        batch = pending[i : i + epochs_per_commit]
        sl = pipeline._epoch_filter(ts_df, batch).withColumn("epoch", epoch_col)
        out, _, warns = apply_spec(
            sl, spec, observe=False, passthrough=["epoch"]
        )
        all_warns = warns
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(base)
        )
        written = spark.read.parquet(base).where(F.col("epoch").isin(batch))
        lin = (
            written.select(
                F.spark_partition_id().alias("partition_id"), "epoch"
            )
            .groupBy("epoch", "partition_id")
            .agg(F.count(F.lit(1)).alias("point_count"))
            .select(
                "partition_id",
                F.lit("spec").alias("tier"),
                F.col("epoch").cast("long").alias("checkpoint_epoch"),
                F.col("point_count").cast("long").alias("point_count"),
            )
        )
        # ---- commit point for the whole batch
        lin.coalesce(1).write.mode("append").parquet(_spec_lineage_path(root))
        for r in (
            written.groupBy("epoch").agg(F.count(F.lit(1)).alias("n")).collect()
        ):
            rows[r["epoch"]] = r["n"]
        ran.extend(batch)

    return {
        "epochs": ran,
        "skipped": skipped,
        "rows": rows,
        "warnings": all_warns,
        "metrics": {},
    }


def read_spec_outputs(spark: SparkSession, root: str) -> DataFrame:
    done = committed_spec_epochs(spark, root)
    paths = [
        _out_path(root, e) for e in sorted(done) if os.path.isdir(_out_path(root, e))
    ]
    if not paths:
        raise FileNotFoundError(f"no committed spec outputs under {root}")
    return spark.read.parquet(*paths)


# --------------------------------------------- CMOR-JSON MIP ingestion
# The reference ingests MIP standards from three formats
# (miptableparser.py:15-638); the CMOR/CMIP JSON branch
# (ParseCmorTable, miptableparser.py:247-316) is the one that needs no
# external libraries — reimplemented here against the same table
# layout (Header / variable_entry / axis_entry).

def parse_cmor_table(table, variables: list[str] | None = None) -> dict:
    """One CMOR/CMIP JSON table (path or dict) -> the reference's
    standardized ``{'variables', 'axes', 'table_info'}`` dict
    (miptableparser.py:282-316): each requested variable is enriched
    with ``variable_id``/``realm``/``mipTable``/``frequency`` from the
    Header and pipe-joined ``coordinates``; every axis named in a
    variable's ``dimensions`` is pulled from ``axis_entry``."""
    if isinstance(table, str):
        with open(table) as fh:
            table = json.load(fh)
    if not isinstance(table, dict) or "variable_entry" not in table:
        raise SpecError("CMOR table must be a JSON object with variable_entry")
    header = dict(table.get("Header", {}))
    ventry = table["variable_entry"]
    aentry = table.get("axis_entry", {})
    v_list = list(variables) if variables else list(ventry)
    vars_out, axes = {}, {}
    for var in v_list:
        if var not in ventry:
            raise SpecError(f"variable {var!r} not in table variable_entry")
        v = dict(ventry[var])
        v["variable_id"] = var
        v["realm"] = header.get("realm")
        v["mipTable"] = str(header.get("table_id", "")).replace("Table ", "")
        v["frequency"] = header.get("frequency")
        dims = str(v.get("dimensions", ""))
        v["coordinates"] = dims.replace(" ", "|")
        vars_out[var] = v
        for dim in dims.split():
            if dim not in axes and dim in aentry:
                axes[dim] = dict(aentry[dim])
    return {"variables": vars_out, "axes": axes, "table_info": header}


# CMOR 'type' codes -> Spark types (CMOR writes 'real' for float32)
_CMOR_TYPE = {"real": "float", "double": "double", "integer": "int", "": "float"}

# declared metadata carried from the MIP table into spec attributes
_CMOR_ATTRS = (
    "units", "positive", "valid_min", "valid_max",
    "ok_min_mean_abs", "ok_max_mean_abs",
    "long_name", "standard_name", "cell_methods", "comment",
)


def cmor_to_spec(table_dict: dict, definitions: dict[str, str] | None = None) -> dict:
    """Standardized MIP table -> runnable spec dict (the iconform
    step, ``scripts/iconform``: MIP standards + an experiment's
    definition strings = the standardization spec).  Variables without
    a definition keep ``definition: None`` and are skipped-with-warning
    at plan time — exactly the xconform lifecycle for unrequested
    outputs.  Numeric valid-range / mean-abs bounds pass through as
    floats so ``validate`` picks them up."""
    defs_map = definitions or {}
    spec: dict = {}
    for name, v in table_dict["variables"].items():
        attrs = {}
        for k in _CMOR_ATTRS:
            val = v.get(k)
            if val in (None, ""):
                continue
            if k in ("valid_min", "valid_max", "ok_min_mean_abs", "ok_max_mean_abs"):
                try:
                    val = float(val)
                except (TypeError, ValueError):
                    continue
            attrs[k] = val
        spec[name] = {
            "definition": defs_map.get(name),
            "datatype": _CMOR_TYPE.get(str(v.get("type", "real")), "double"),
            "attributes": attrs,
        }
    return spec


# ------------------------------------------ declared-frequency tiers
# CMOR 'frequency' codes -> fixed bucket seconds; calendar-shaped
# frequencies (month/year) use date_trunc buckets.
CMOR_FREQ_SECONDS = {
    "subhr": 60, "1hr": 3600, "hr": 3600,
    "3hr": 3 * 3600, "6hr": 6 * 3600, "day": 86400,
}
_CMOR_FREQ_TRUNC = {"mon": "month", "monC": "month", "yr": "year"}


def frequency_bucket(freq: str, ts):
    """CMOR frequency string -> bucket-start Column over ``ts``."""
    from pyconform_spark.operators.rollup import bucket_ts

    if freq in CMOR_FREQ_SECONDS:
        return bucket_ts(ts, CMOR_FREQ_SECONDS[freq])
    if freq in _CMOR_FREQ_TRUNC:
        return F.date_trunc(_CMOR_FREQ_TRUNC[freq], ts.cast("timestamp")).cast(
            "timestamp_ntz"
        )
    raise SpecError(f"unsupported CMOR frequency {freq!r}")


def run_cmor_tier(
    df: DataFrame,
    table,
    definitions: dict[str, str],
    keys: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """MIP table + definition strings + a raw series frame -> the
    retention tier at the table's DECLARED frequency: each definition
    evaluates row-wise (Catalyst, unit-checked), then averages into
    (keys, frequency-bucket) groups — CMOR's default
    ``time: mean`` cell method — with n_samples carried per bucket.

    This is the full ``iconform → xconform`` loop landed on the rollup
    engine: the MIP standard decides the tier cadence, the definitions
    decide the measures, and the engine's one-shuffle partial+final
    aggregate computes it.  Sums ride DECIMAL so the mean is
    cross-engine exact (the repo-wide determinism convention)."""
    td = table if isinstance(table, dict) and "table_info" in table \
        else parse_cmor_table(table)
    freq = td["table_info"].get("frequency")
    if not freq:
        raise SpecError("CMOR table Header carries no frequency")
    spec = cmor_to_spec(td, definitions)
    planned, warns = plan_spec(df, spec)
    if not planned:
        raise SpecError("no variable in the table has a definition")
    bucket = frequency_bucket(str(freq), F.col(ts_col))
    src = df.withColumn("bucket_start", bucket)
    for v, c in planned:
        src = src.withColumn(f"__m_{v.name}", c.col)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_samples")]
    finals = []
    for v, _ in planned:
        aggs.append(
            F.sum(F.col(f"__m_{v.name}").cast("decimal(24,8)")).alias(
                f"__s_{v.name}"
            )
        )
        finals.append(
            (F.col(f"__s_{v.name}").cast("double") / F.col("n_samples"))
            .cast(v.datatype if v.datatype in ("double", "float") else "double")
            .alias(v.name)
        )
    out = src.groupBy(*keys, "bucket_start").agg(*aggs)
    return out.select(*keys, "bucket_start", "n_samples", *finals)


# ---------------------------------------------------------------- MIP
# table ingestion: the two remaining reference branches, stdlib-only.
# An .xlsx workbook is a ZIP of SpreadsheetML XML parts, so the Excel
# branch needs no openpyxl; the dreq branch parses the data-request
# ENTITY-LINK model (experiment -> requestItem -> requestLink ->
# requestVarGroup -> requestVar -> CMORvar) from its XML serialization
# with xml.etree.  Both return the reference's standardized
# ``{table_id: {'variables', 'axes', 'table_info'}}`` shape.


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _xlsx_cell_col(ref: str) -> int:
    """'BC12' -> 0-based column index 54."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


def _xlsx_sheet_rows(root, shared: list[str]) -> list[list]:
    """SpreadsheetML worksheet -> dense list-of-rows (None gaps)."""
    rows: list[list] = []
    for row in root.iter():
        if _localname(row.tag) != "row":
            continue
        cells: dict[int, object] = {}
        for c in row:
            if _localname(c.tag) != "c":
                continue
            idx = _xlsx_cell_col(c.get("r", "A"))
            ctype = c.get("t", "n")
            val = None
            for child in c:
                ln = _localname(child.tag)
                if ln == "v":
                    val = child.text
                elif ln == "is":  # inline string
                    val = "".join(
                        t.text or ""
                        for t in child.iter()
                        if _localname(t.tag) == "t"
                    )
            if val is None:
                cells[idx] = None
            elif ctype == "s":
                cells[idx] = shared[int(val)]
            elif ctype == "b":
                cells[idx] = bool(int(val))
            elif ctype in ("str", "inlineStr"):
                cells[idx] = val
            else:
                f = float(val)
                cells[idx] = int(f) if f.is_integer() else f
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i) for i in range(width)])
    return rows


def parse_mip_excel(path: str, variables: list[str] | None = None) -> dict:
    """MIP table WORKBOOK (.xlsx) -> the standardized ``{sheet:
    {'variables', 'axes', 'table_info'}}`` dict — the reference's
    ParseExcel branch (miptableparser.py:171-243) without openpyxl:
    the workbook ZIP's SpreadsheetML parts are parsed with
    zipfile + xml.etree.  Per non-'Notes' sheet, row 0 is the header,
    each later row is one variable keyed by its 'Variable Name' cell;
    the variable dict carries every column verbatim plus
    ``variable_id``, ``mipTable`` (the sheet name) and pipe-joined
    ``coordinates``; each name in ``dimensions`` becomes an (empty)
    axes entry; ``table_info['table_id']`` is the sheet name."""
    import xml.etree.ElementTree as ET
    import zipfile

    want = set(variables) if variables else None
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            for si in ET.fromstring(zf.read("xl/sharedStrings.xml")):
                shared.append(
                    "".join(
                        t.text or ""
                        for t in si.iter()
                        if _localname(t.tag) == "t"
                    )
                )
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target") for r in rels
        }
        sheets: list[tuple[str, str]] = []
        for el in wb.iter():
            if _localname(el.tag) != "sheet":
                continue
            rid = next(
                (v for k, v in el.attrib.items() if _localname(k) == "id"),
                None,
            )
            tgt = rel_target.get(rid, "")
            if not tgt.startswith("xl/"):
                tgt = "xl/" + tgt.lstrip("/")
            sheets.append((el.get("name"), tgt))
        out: dict = {}
        for name, tgt in sheets:
            if name == "Notes":
                continue
            rows = _xlsx_sheet_rows(ET.fromstring(zf.read(tgt)), shared)
            if not rows:
                continue
            cols = [str(c) if c is not None else "" for c in rows[0]]
            if "Variable Name" not in cols:
                raise SpecError(
                    f"sheet {name!r} has no 'Variable Name' column"
                )
            vnc = cols.index("Variable Name")
            vars_out: dict = {}
            axes: dict = {}
            for r in rows[1:]:
                if vnc >= len(r) or r[vnc] in (None, ""):
                    continue
                vn = str(r[vnc])
                if want is not None and vn not in want:
                    continue
                v = {
                    cols[i]: (r[i] if i < len(r) else None)
                    for i in range(len(cols))
                }
                v["variable_id"] = vn
                v["mipTable"] = name
                dims = str(v.get("dimensions") or "")
                v["coordinates"] = dims.strip().replace(" ", "|")
                vars_out[vn] = v
                for dim in dims.split():
                    axes.setdefault(dim, {})
            out[name] = {
                "variables": vars_out,
                "axes": axes,
                "table_info": {"table_id": name},
            }
    return out


def parse_dreq_xml(
    path: str,
    experiment: str,
    mips: list[str] | None = None,
    variables: list[str] | None = None,
) -> dict:
    """Data-request XML -> standardized ``{table_id: {'variables',
    'axes', 'table_info'}}`` — the reference's ParseXML/dreqPy branch
    (miptableparser.py:321-430) re-implemented over the dreq
    ENTITY-LINK model with stdlib etree (no dreqPy): the document
    holds flat sections of uid-keyed rows; the walk is

        experiment[label] -> requestItem[mip in mips, rlid] ->
        requestLink[refid] -> requestVar[group == refid, vid] ->
        CMORvar[uid] (+ its attribute payload)

    one output table per requestLink, keyed by the CMORvars'
    ``mipTable``; ``table_info`` carries experiment / experiment_id /
    data_specs_version / activity_id like the reference.  Unknown
    experiment -> {} (the reference prints-and-returns-{})."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    sect: dict[str, list[dict]] = {}
    for el in root.iter():
        ln = _localname(el.tag)
        if el.attrib and ("uid" in el.attrib or "label" in el.attrib):
            sect.setdefault(ln, []).append(dict(el.attrib))
    exps = [
        e
        for e in sect.get("experiment", [])
        if e.get("label") == experiment
    ]
    if not exps:
        return {}
    exp_row = exps[0]
    activity_id = exp_row.get("mip", "")
    mip_filter = set(mips) if mips else None
    want = set(variables) if variables else None
    by_uid = {
        r["uid"]: r
        for rows in sect.values()
        for r in rows
        if "uid" in r
    }
    version = next(
        (
            dict(el.attrib).get("version")
            for el in root.iter()
            if _localname(el.tag) == "prologue" and el.get("version")
        ),
        root.get("version", ""),
    )
    out: dict = {}
    for ri in sect.get("requestItem", []):
        if ri.get("esid") not in (None, "", exp_row.get("uid")):
            continue
        if mip_filter is not None and ri.get("mip") not in mip_filter:
            continue
        rl = by_uid.get(ri.get("rlid", ""))
        if rl is None:
            continue
        gid = rl.get("refid", "")
        for rv in sect.get("requestVar", []):
            if rv.get("group") != gid:
                continue
            cv = by_uid.get(rv.get("vid", ""))
            if cv is None:
                continue
            label = cv.get("label", "")
            if want is not None and label not in want:
                continue
            table_id = cv.get("mipTable", "")
            t = out.setdefault(
                table_id,
                {
                    "variables": {},
                    "axes": {},
                    "table_info": {
                        "experiment": exp_row.get("title", ""),
                        "experiment_id": experiment,
                        "data_specs_version": version,
                        "activity_id": activity_id,
                        "table_id": table_id,
                    },
                },
            )
            v = dict(cv)
            v["variable_id"] = label
            dims = str(v.get("dimensions") or "")
            v["coordinates"] = dims.strip().replace(" ", "|")
            t["variables"][label] = v
            for dim in dims.split():
                t["axes"].setdefault(dim, {})
    return out
