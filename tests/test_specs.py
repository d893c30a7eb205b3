"""Spec-driven output pipeline tests — the xconform E2E analog.

Mirrors dataflowTests.py:370-426 (multi-variable spec end to end):
a 13-variable JSON spec over a small input table, every declared
output compared bit-for-bit against an independent pandas/numpy
oracle, plus skip-with-warning semantics and the epoch-committed
resume contract.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyconform_spark import specs, units, validate


def _ts(day: int, hour: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1 + day, hour, 0, 0)


@pytest.fixture()
def events(spark):
    rows = []
    vals = [100.0, 250.0, 400.0, 900.0, -50.0, 0.0]
    i = 0
    for day in range(3):
        for hour in (0, 6, 12, 18):
            rows.append((i, _ts(day, hour), vals[i % len(vals)], float(i % 5 + 1)))
            i += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, value double, weight double"
    )


# 13 output variables (the dataflowTests E2E width), plus 3 skip cases.
SPEC = {
    "v_copy": {"datatype": "double", "definition": "value"},
    "v_scaled": {"datatype": "double", "definition": "value * 2.0 + 1.0"},
    "v_chain": {"datatype": "double", "definition": "v_scaled - value"},
    "v_sec": {
        "datatype": "double",
        "definition": "chunits(value, units='ms')",
        "attributes": {"units": "s"},  # declared units: convert ms -> s
    },
    "v_sqrt": {"datatype": "double", "definition": "sqrt(abs(value))"},
    "v_limit": {
        "datatype": "double",
        "definition": "limit(value, below=0.0, above=500.0)",
    },
    "v_where": {
        "datatype": "double",
        "definition": "where(value > 200.0, value, 0.0 - value)",
    },
    "v_poly": {"datatype": "double", "definition": "value**2 / 100.0"},
    "v_f32": {"datatype": "float", "definition": "value / 3.0"},
    "v_flag": {"datatype": "boolean", "definition": "value >= 250.0"},
    "v_masked": {
        "datatype": "double",
        "definition": "value",
        "attributes": {"valid_min": 0.0, "valid_max": 500.0,
                       "ok_max_mean_abs": 100.0},
    },
    "v_down": {
        "datatype": "double",
        "definition": "up(value)",
        "attributes": {"positive": "down"},  # declared flip: negate
    },
    "v_weighted": {"datatype": "double", "definition": "value * weight"},
    # --- skip-with-warning cases (datasets.py:731-747) ---
    "v_empty": {"datatype": "double", "definition": "   "},
    "v_unknown": {"datatype": "double", "definition": "no_such_col + 1"},
    "v_bad": {"datatype": "double", "definition": "value + "},
}

DECLARED = [
    "v_copy", "v_scaled", "v_chain", "v_sec", "v_sqrt", "v_limit",
    "v_where", "v_poly", "v_f32", "v_flag", "v_masked", "v_down",
    "v_weighted",
]


def _pandas_oracle(pdf):
    """Independent numpy twin of every declared output (bit-exact)."""
    v, w = pdf["value"].to_numpy(), pdf["weight"].to_numpy()
    out = {}
    out["v_copy"] = v
    out["v_scaled"] = v * 2.0 + 1.0
    out["v_chain"] = (v * 2.0 + 1.0) - v
    out["v_sec"] = v * 0.001 + 0.0
    out["v_sqrt"] = np.sqrt(np.abs(v))
    out["v_limit"] = np.minimum(np.maximum(v, 0.0), 500.0)
    out["v_where"] = np.where(v > 200.0, v, 0.0 - v)
    out["v_poly"] = (v * v) / 100.0
    out["v_f32"] = (v / 3.0).astype(np.float32)
    out["v_flag"] = v >= 250.0
    out["v_masked"] = np.where((v < 0.0) | (v > 500.0), np.nan, v)
    out["v_down"] = -v  # up(value) then declared positive=down flips
    out["v_weighted"] = v * w
    return out


def test_apply_spec_matches_pandas_oracle_bitwise(spark, events):
    out, obs, warns = specs.apply_spec(events, SPEC)
    assert out.columns == DECLARED  # declared outputs only, spec order

    got = out.toPandas()
    pdf = events.orderBy("event_id").toPandas()
    # row order is not guaranteed; align via a deterministic sort key
    got = got.sort_values("v_copy", kind="stable").reset_index(drop=True)

    want = _pandas_oracle(pdf)
    import pandas as pd

    wdf = pd.DataFrame(want).sort_values("v_copy", kind="stable").reset_index(drop=True)
    for name in DECLARED:
        a, b = got[name].to_numpy(), wdf[name].to_numpy()
        if a.dtype.kind == "f":
            assert np.array_equal(a, b, equal_nan=True), name  # bit-for-bit
        else:
            assert (a == b).all(), name

    # skip-with-warning: exactly the three bad entries, none fatal
    assert len(warns) == 3
    assert any("v_empty" in w and "empty" in w for w in warns)
    assert any("v_unknown" in w and "no_such_col" in w for w in warns)
    assert any("v_bad" in w for w in warns)

    # observed metrics rode the same action
    m = obs.get
    assert m["v_masked_masked"] == got["v_masked"].isna().sum()
    vw = validate.warnings_from(
        m, [validate.ColumnSpec("v_masked", ok_max_mean_abs=100.0)]
    )
    assert any("mean_abs" in x for x in vw)


def test_declared_schema_and_metadata(spark, events):
    schema = specs.declared_schema(SPEC)
    assert [f.name for f in schema.fields][:13] == DECLARED
    assert schema["v_f32"].dataType.simpleString() == "float"
    assert schema["v_flag"].dataType.simpleString() == "boolean"
    assert schema["v_sec"].metadata[units.UNITS_KEY] == "s"
    assert schema["v_down"].metadata[units.POSITIVE_KEY] == "down"

    out, _, _ = specs.apply_spec(events, SPEC)
    assert [f.name for f in out.schema.fields] == DECLARED
    assert out.schema["v_f32"].dataType.simpleString() == "float"
    assert units.unit_of(out, "v_sec") == "s"
    assert units.positive_of(out, "v_down") == "down"


def test_declared_units_must_be_convertible(spark, events):
    bad = {
        "v": {
            "datatype": "double",
            "definition": "chunits(value, units='ms')",
            "attributes": {"units": "B"},  # time -> bytes: refused
        }
    }
    with pytest.raises(units.UnitsError, match="time"):
        specs.apply_spec(events, bad)


def test_spec_with_nothing_usable_raises(spark, events):
    with pytest.raises(specs.SpecError, match="no output"):
        with pytest.warns(specs.SpecWarning):
            specs.apply_spec(events, {"v": {"definition": ""}})


def test_run_spec_commits_epochs_and_resumes(spark, events, tmp_path):
    root = str(tmp_path / "specout")
    res = specs.run_spec(spark, events, SPEC, root)
    assert res["epochs"] and not res["skipped"]
    assert sum(res["rows"].values()) == events.count()
    assert len(res["warnings"]) == 3
    # every epoch observed its masked-count metric
    for e in res["epochs"]:
        assert "v_masked_masked" in res["metrics"][e]

    back = specs.read_spec_outputs(spark, root)
    assert back.count() == events.count()
    assert sorted(back.columns) == sorted(DECLARED)

    # resume: everything committed -> all skipped, outputs untouched
    res2 = specs.run_spec(spark, events, SPEC, root)
    assert res2["epochs"] == [] and sorted(res2["skipped"]) == sorted(res["epochs"])
    assert specs.read_spec_outputs(spark, root).count() == events.count()

    # lineage rows exist per committed epoch
    lin = spark.read.parquet(str(tmp_path / "specout" / "spec_lineage"))
    assert set(
        r["checkpoint_epoch"] for r in lin.select("checkpoint_epoch").collect()
    ) == set(res["epochs"])


def test_scaffold_spec_roundtrips(spark, events):
    """iconform analog: a scaffolded spec (identity definitions +
    schema metadata) loads and runs unchanged, reproducing the input."""
    d = units.with_units(events, "value", "ms")
    d = units.with_positive(d, "value", "up")
    spec = specs.scaffold_spec(d, rename={"value": "v_out"})
    assert spec["v_out"]["definition"] == "value"
    assert spec["v_out"]["attributes"] == {"units": "ms", "positive": "up"}
    assert spec["event_id"]["datatype"] == "bigint"

    out, _, warns = specs.apply_spec(
        d, {k: v for k, v in spec.items() if k in ("event_id", "v_out")}
    )
    assert warns == []
    got = sorted((r["event_id"], r["v_out"]) for r in out.collect())
    want = sorted((r["event_id"], r["value"]) for r in events.collect())
    assert got == want
    assert units.unit_of(out, "v_out") == "ms"


def test_user_function_module_plugin(spark, events, tmp_path):
    """xconform -m analog: a user module registering a function via
    defs.register_function makes it callable from spec definitions."""
    mod = tmp_path / "user_funcs.py"
    mod.write_text(
        "from pyspark.sql import functions as F\n"
        "from pyconform_spark import defs\n"
        "\n"
        "@defs.register_function('double_it')\n"
        "def _double(args, kwds):\n"
        "    a = args[0]\n"
        "    return defs.Compiled(col=a.col * 2.0, unit=a.unit)\n"
    )
    import sys
    sys.path.insert(0, "/root/repo")
    from jobs.spec_job import load_user_modules

    try:
        load_user_modules([str(mod)])
        out, _, warns = specs.apply_spec(
            events, {"v2": {"datatype": "double", "definition": "double_it(value)"}}
        )
        assert warns == []
        got = sorted(r["v2"] for r in out.collect())
        want = sorted(r["value"] * 2.0 for r in events.collect())
        assert got == want
    finally:
        from pyconform_spark import defs as D
        D.FUNCTIONS.pop("double_it", None)


def test_reference_calculator_spec_runs_unmodified(spark):
    """THE parity demo: the reference's own shipped standardization
    file (examples/simple/calculator/calculator.json, read-only at
    test time) loads and runs through apply_spec unmodified —
    xconform-layout 'variables' section, NC dtype names (float64 /
    float32), CF unit strings outside the registry (opaque labels),
    valid_min/valid_max masking, and the U+V / U-V definitions."""
    import os

    path = "/root/reference/examples/simple/calculator/calculator.json"
    if not os.path.exists(path):
        pytest.skip("reference example not available")
    variables = specs.load_spec(path)
    names = [v.name for v in variables]
    assert {"x", "y", "t", "u", "v"} <= set(names)
    by_name = {v.name: v for v in variables}
    assert by_name["u"].datatype == "float"     # float32 -> float
    assert by_name["x"].datatype == "double"    # float64 -> double
    assert by_name["u"].definition == "U+V"

    # the reference generates gridded HORZ/VERT/TIME/U/V inputs
    # (mkinput.py); the relational frame carries them as columns
    import numpy as np

    rng = np.random.RandomState(11)
    n = 40
    rows = [
        (float(i), float(i) / 10.0, float(i * 3600),
         float(rng.uniform(-1, 1)), float(rng.uniform(-1, 1)))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "HORZ double, VERT double, TIME double, U double, V double"
    )
    out, obs, warns = specs.apply_spec(df, variables)
    assert warns == []
    assert out.columns == names

    pdf = out.toPandas().sort_values("x").reset_index(drop=True)
    src = df.toPandas().sort_values("HORZ").reset_index(drop=True)
    assert np.array_equal(pdf["x"], src["HORZ"])
    u = (src["U"] + src["V"]).to_numpy()
    want_u = np.where((u < -1.0) | (u > 1.0), np.nan, u).astype(np.float32)
    got_u = pdf["u"].to_numpy()
    assert got_u.dtype == np.float32  # declared float32 honored
    assert np.array_equal(got_u, want_u, equal_nan=True)
    want_v = (src["U"] - src["V"]).astype(np.float32).to_numpy()
    assert np.array_equal(pdf["v"].to_numpy(), want_v)

    # CF unit strings ride as opaque metadata labels
    assert units.unit_of(out, "x") == "meters"
    assert units.unit_of(out, "u") == "grams"


def test_reference_cesm_bounds_spec_runs_fully(spark):
    """The reference's own CESM CMIP6 create_bounds spec (flat layout)
    now runs END TO END: round 3 added `bounds` to the definition
    surface as a window function, so the bnds variables compile to
    array[2] columns instead of skipping.  Values checked against the
    reference's numpy semantics (location=1; lat_bnds has
    endpoints=0)."""
    import os

    path = "/root/reference/examples/CESM/CMIP6/create_bounds/lnd_bounds.json"
    if not os.path.exists(path):
        pytest.skip("reference example not available")
    variables = specs.load_spec(path)
    lats = [-90.0, -45.0, 10.0, 90.0]
    inputs = spark.createDataFrame(
        [(la, 0.5 * i + 0.1, 10.0 * i, 3.0, 4.0) for i, la in enumerate(lats)],
        "lat double, levgrnd double, lon double, SOILLIQ double, SOILICE double",
    )
    planned, warns = specs.plan_spec(inputs, variables)
    planned_names = {v.name for v, _ in planned}
    assert {"lat", "lon", "lat_bnds", "sdepth_bnds", "mrlsl"} <= planned_names
    assert not any("bounds" in w for w in warns)
    out, obs, _ = specs.apply_spec(inputs, variables, observe=False)
    rows = sorted(out.select("lat", "lat_bnds").collect(), key=lambda r: r["lat"])
    # endpoints=0 (lat_bnds): open ends keep lower=upper=lat
    assert rows[0]["lat_bnds"] == [-90.0, (-90.0 + -45.0) / 2]
    assert rows[1]["lat_bnds"] == [(-90.0 + -45.0) / 2, (-45.0 + 10.0) / 2]
    assert rows[-1]["lat_bnds"] == [(10.0 + 90.0) / 2, 90.0]
    # sdepth_bnds (default endpoints=1): ends extrapolate symmetrically
    sd = sorted(
        out.select("sdepth", "sdepth_bnds").collect(), key=lambda r: r["sdepth"]
    )
    # sdepth_bnds declares datatype "float": float32 element cast
    assert sd[0]["sdepth_bnds"][0] == np.float32(0.1 - 0.25)
    assert dict(out.dtypes)["sdepth_bnds"] == "array<float>"
    # declared float64 element type survives the array cast
    assert dict(out.dtypes)["lat_bnds"] == "array<double>"


def test_run_spec_batch_matches_per_epoch_mode(spark, events, tmp_path):
    """Batched spec materialization (one input scan per commit batch)
    produces exactly the per-epoch mode's outputs — same layout, same
    values, same resume contract (pipeline.run vs run_batch shape)."""
    root_a = str(tmp_path / "per_epoch")
    root_b = str(tmp_path / "batched")
    res_a = specs.run_spec(spark, events, SPEC, root_a)
    res_b = specs.run_spec_batch(spark, events, SPEC, root_b, epochs_per_commit=2)
    assert sorted(res_a["epochs"]) == sorted(res_b["epochs"])
    assert res_a["rows"] == res_b["rows"]
    assert len(res_b["warnings"]) == 3

    a = specs.read_spec_outputs(spark, root_a)
    b = specs.read_spec_outputs(spark, root_b)
    key = lambda t: tuple((x is None, x) for x in t)
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    ra = sorted(map(tuple, a.select(*cols).collect()), key=key)
    rb = sorted(map(tuple, b.select(*cols).collect()), key=key)
    assert ra == rb

    # resume: everything committed
    res_b2 = specs.run_spec_batch(spark, events, SPEC, root_b)
    assert res_b2["epochs"] == [] and sorted(res_b2["skipped"]) == sorted(
        res_b["epochs"]
    )


# ------------------------------------------------- CMOR-JSON ingestion
CMOR_TABLE = {
    "Header": {
        "table_id": "Table Amon",
        "realm": "atmos",
        "frequency": "mon",
        "mip_era": "CMIP6",
    },
    "variable_entry": {
        "tas": {
            "type": "real",
            "units": "s",
            "dimensions": "longitude latitude time",
            "long_name": "Near-Surface Air Temperature",
            "valid_min": "0.0",
            "valid_max": "1000.0",
            "cell_methods": "area: time: mean",
        },
        "rlut": {
            "type": "real",
            "units": "ms",
            "positive": "up",
            "dimensions": "longitude latitude time",
            "long_name": "TOA Outgoing Longwave Radiation",
        },
        "unrequested": {
            "type": "real",
            "units": "kg",
            "dimensions": "time",
        },
    },
    "axis_entry": {
        "time": {"axis": "T", "units": "days since 1850-01-01"},
        "latitude": {"axis": "Y", "units": "degrees_north"},
        "longitude": {"axis": "X", "units": "degrees_east"},
    },
}


def test_parse_cmor_table_standardizes_like_reference():
    td = specs.parse_cmor_table(CMOR_TABLE)
    assert set(td) == {"variables", "axes", "table_info"}
    tas = td["variables"]["tas"]
    assert tas["variable_id"] == "tas"
    assert tas["realm"] == "atmos"
    assert tas["mipTable"] == "Amon"  # 'Table ' prefix stripped
    assert tas["frequency"] == "mon"
    assert tas["coordinates"] == "longitude|latitude|time"
    # only axes referenced by requested variables are pulled in
    td2 = specs.parse_cmor_table(CMOR_TABLE, variables=["unrequested"])
    assert set(td2["axes"]) == {"time"}
    assert set(td["axes"]) == {"time", "latitude", "longitude"}
    with pytest.raises(specs.SpecError):
        specs.parse_cmor_table(CMOR_TABLE, variables=["nope"])


def test_cmor_table_builds_runnable_spec(spark, events):
    """MIP table + definitions -> spec -> apply_spec end to end: the
    declared CMOR units drive a real unit conversion (ms -> s on the
    definition's tracked units) and valid_min/max mask as floats; the
    definition-less variable skips with a warning (xconform
    lifecycle)."""
    td = specs.parse_cmor_table(CMOR_TABLE)
    spec = specs.cmor_to_spec(
        td,
        definitions={
            "tas": "convert(chunits(value, units='ms'), units='s')",
            "rlut": "up(rmunits(value) - 100.0)",
        },
    )
    assert spec["unrequested"]["definition"] is None
    assert spec["tas"]["datatype"] == "float"
    assert spec["tas"]["attributes"]["valid_min"] == 0.0
    with pytest.warns(specs.SpecWarning, match="unrequested"):
        out, obs, warns = specs.apply_spec(
            events, spec, passthrough=["event_id"]
        )
    pdf = out.orderBy("event_id").toPandas()
    assert list(pdf.columns) == ["event_id", "tas", "rlut"]
    # tas: value ms -> s (/1000), float32 cast, mask outside [0, 1000]
    vals = [100.0, 250.0, 400.0, 900.0, -50.0, 0.0]
    want_tas = [np.float32(v / 1000.0) for v in vals[:4]] + [None, np.float32(0.0)]
    got_tas = pdf["tas"].tolist()[:6]
    for g, w in zip(got_tas, want_tas):
        if w is None:
            assert g is None or math.isnan(g)
        else:
            assert g == w
    # rlut keeps the declared positive=up metadata
    meta = out.schema["rlut"].metadata
    assert meta.get(units.POSITIVE_KEY, meta.get("positive")) == "up"


@pytest.mark.parametrize(
    "fname, cols, idata_skips",
    [
        # a/b/ilev/lev _bnds use bounds(..., idata=...): the interface
        # values live on a DIFFERENT axis length (n vs n+1) — a
        # two-table operation in relational form, served by
        # operators.stencil.bounds_from_interfaces and skipped (with a
        # pointer) on the row-wise spec surface
        ("atmos_bounds.json",
         ["P0", "hyam", "hybm", "hyai", "hybi", "ilev", "lat", "lev", "lon",
          "CMFMC", "CMFMCDZM"],
         {"a_bnds", "b_bnds", "ilev_bnds", "lev_bnds"}),
        ("ocn_bounds.json", ["IAGE", "z_t"], set()),
        ("lnd_bounds.json", ["lat", "levgrnd", "lon", "SOILLIQ", "SOILICE"],
         set()),
    ],
)
def test_all_reference_bounds_specs_plan(spark, fname, cols, idata_skips):
    """Every create_bounds spec the reference ships plans:
    bounds-of-expression (`bounds(ilev * 0.001, ...)`), up(), and
    identity definitions all compile; only the idata= variants skip,
    each with a message naming the two-table operator that serves
    them."""
    import os

    path = f"/root/reference/examples/CESM/CMIP6/create_bounds/{fname}"
    if not os.path.exists(path):
        pytest.skip("reference example not available")
    variables = specs.load_spec(path)
    inputs = spark.createDataFrame(
        [tuple(float(i + 1) for i in range(len(cols)))],
        ", ".join(f"{c} double" for c in cols),
    )
    if idata_skips:
        with pytest.warns(specs.SpecWarning):
            planned, warns = specs.plan_spec(inputs, variables)
    else:
        planned, warns = specs.plan_spec(inputs, variables)
    assert len(planned) == len(variables) - len(idata_skips)
    skipped = {w.split("'")[1] for w in warns}
    assert skipped == idata_skips
    for w in warns:
        assert "bounds_from_interfaces" in w


def test_run_cmor_tier_declared_frequency(spark, events):
    """The full iconform->xconform loop landed on the rollup engine: a
    CMOR table's declared frequency decides the tier cadence, its
    definitions decide the measures; values checked against a pandas
    twin with the same decimal-mean convention."""
    import pandas as pd

    table = {
        "Header": {"table_id": "Table day", "realm": "atmos",
                   "frequency": "day"},
        "variable_entry": {
            "v_s": {"type": "double", "units": "s", "dimensions": "time"},
            "v_amp": {"type": "real", "units": "1", "dimensions": "time"},
        },
        "axis_entry": {"time": {"axis": "T"}},
    }
    out = specs.run_cmor_tier(
        events,
        table,
        definitions={
            "v_s": "convert(chunits(value, units='ms'), units='s')",
            "v_amp": "value * 2.0",
        },
        keys=[],
        ts_col="ts",
    ).toPandas().sort_values("bucket_start").reset_index(drop=True)

    pdf = events.toPandas()
    pdf["bucket_start"] = pdf["ts"].dt.floor("D")
    grp = pdf.groupby("bucket_start")
    want_n = grp.size()
    assert out["n_samples"].tolist() == want_n.tolist()
    for name, f in (("v_s", lambda v: v * 0.001 + 0.0), ("v_amp", lambda v: v * 2.0)):
        want = grp["value"].apply(lambda s, f=f: float(f(s).sum()) / len(s))
        got = out[name].to_numpy(dtype=float)
        assert got == pytest.approx(want.to_numpy(), rel=1e-12), name
    # declared float32 dtype applies to the mean column
    assert str(out["v_amp"].dtype) == "float32"

    # monthly frequency rides date_trunc buckets
    table["Header"]["frequency"] = "mon"
    mon = specs.run_cmor_tier(
        events, table, definitions={"v_amp": "value * 2.0"}, keys=[]
    ).toPandas()
    assert len(mon) == 1  # all January 2024
    with pytest.raises(specs.SpecError, match="frequency"):
        bad = {**table, "Header": {"table_id": "T", "realm": "a"}}
        specs.run_cmor_tier(events, bad, definitions={"v_amp": "value"}, keys=[])


def _write_min_xlsx(path, sheets):
    """Minimal SpreadsheetML workbook: {sheet_name: list-of-rows}.
    Strings go inline (t='inlineStr'); numbers as plain cells — enough
    surface for parse_mip_excel's stdlib reader."""
    import zipfile

    def colref(i):
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(ord("A") + r) + s
        return s

    def sheet_xml(rows):
        parts = ['<?xml version="1.0"?><worksheet xmlns='
                 '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                 "<sheetData>"]
        for ri, row in enumerate(rows, start=1):
            parts.append(f'<row r="{ri}">')
            for ci, val in enumerate(row):
                if val is None:
                    continue
                ref = f"{colref(ci)}{ri}"
                if isinstance(val, (int, float)) and not isinstance(val, bool):
                    parts.append(f'<c r="{ref}"><v>{val}</v></c>')
                else:
                    parts.append(
                        f'<c r="{ref}" t="inlineStr"><is><t>{val}</t></is></c>'
                    )
            parts.append("</row>")
        parts.append("</sheetData></worksheet>")
        return "".join(parts)

    names = list(sheets)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?><workbook xmlns='
            '"http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
            'relationships"><sheets>'
            + "".join(
                f'<sheet name="{n}" sheetId="{i+1}" r:id="rId{i+1}"/>'
                for i, n in enumerate(names)
            )
            + "</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns='
            '"http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i+1}" Type="x" '
                f'Target="worksheets/sheet{i+1}.xml"/>'
                for i in range(len(names))
            )
            + "</Relationships>",
        )
        for i, n in enumerate(names):
            zf.writestr(f"xl/worksheets/sheet{i+1}.xml", sheet_xml(sheets[n]))


def test_parse_mip_excel_standardizes_like_reference(tmp_path):
    """The Excel branch (reference miptableparser.py:171-243): per
    non-'Notes' sheet, header row + one variable per row, enriched
    with variable_id / mipTable / pipe-joined coordinates, and an
    (empty) axes entry per dimension — via the stdlib ZIP+XML reader,
    no openpyxl."""
    p = str(tmp_path / "mip.xlsx")
    _write_min_xlsx(
        p,
        {
            "Amon": [
                ["Variable Name", "units", "dimensions", "priority"],
                ["tas", "K", "longitude latitude time", 1],
                ["pr", "kg m-2 s-1", "longitude latitude time", 2],
            ],
            "Omon": [
                ["Variable Name", "units", "dimensions"],
                ["tos", "degC", "longitude latitude time"],
            ],
            "Notes": [["ignore me"]],
        },
    )
    out = specs.parse_mip_excel(p)
    assert set(out) == {"Amon", "Omon"}
    amon = out["Amon"]
    assert set(amon["variables"]) == {"tas", "pr"}
    tas = amon["variables"]["tas"]
    assert tas["variable_id"] == "tas"
    assert tas["mipTable"] == "Amon"
    assert tas["units"] == "K"
    assert tas["priority"] == 1
    assert tas["coordinates"] == "longitude|latitude|time"
    assert set(amon["axes"]) == {"longitude", "latitude", "time"}
    assert amon["table_info"]["table_id"] == "Amon"
    # variable filter
    only = specs.parse_mip_excel(p, variables=["tos"])
    assert set(only["Omon"]["variables"]) == {"tos"}
    assert only["Amon"]["variables"] == {}
    # the standardized sheet feeds the same spec builder as CMOR-JSON
    spec = specs.cmor_to_spec(amon, {"tas": "tas_c + 273.15"})
    assert "tas" in spec and spec["tas"]["attributes"]["units"] == "K"


def test_parse_dreq_xml_walks_entity_links(tmp_path):
    """The dreqPy branch (reference miptableparser.py:321-430) over
    the entity-link model: experiment -> requestItem (mip filter) ->
    requestLink -> requestVar(group) -> CMORvar, one table per
    mipTable, table_info carrying experiment/activity metadata."""
    p = str(tmp_path / "dreq.xml")
    with open(p, "w") as fh:
        fh.write(
            """<?xml version="1.0"?>
<dreq><prologue version="01.00.31"/>
 <main>
  <experiment uid="e1" label="historical" title="All-forcing run" mip="CMIP"/>
  <experiment uid="e2" label="piControl" title="Control" mip="CMIP"/>
  <requestItem uid="ri1" mip="CMIP" rlid="rl1" esid="e1"/>
  <requestItem uid="ri2" mip="OtherMIP" rlid="rl2" esid="e1"/>
  <requestLink uid="rl1" refid="g1"/>
  <requestLink uid="rl2" refid="g2"/>
  <requestVar uid="rv1" vid="cv1" group="g1"/>
  <requestVar uid="rv2" vid="cv2" group="g1"/>
  <requestVar uid="rv3" vid="cv3" group="g2"/>
  <CMORvar uid="cv1" label="tas" mipTable="Amon" units="K"
           dimensions="longitude latitude time"/>
  <CMORvar uid="cv2" label="pr" mipTable="Amon" units="kg m-2 s-1"
           dimensions="longitude latitude time"/>
  <CMORvar uid="cv3" label="tos" mipTable="Omon" units="degC"
           dimensions="longitude latitude time"/>
 </main></dreq>"""
        )
    out = specs.parse_dreq_xml(p, "historical")
    assert set(out) == {"Amon", "Omon"}
    amon = out["Amon"]
    assert set(amon["variables"]) == {"tas", "pr"}
    ti = amon["table_info"]
    assert ti["experiment_id"] == "historical"
    assert ti["experiment"] == "All-forcing run"
    assert ti["activity_id"] == "CMIP"
    assert ti["data_specs_version"] == "01.00.31"
    tas = amon["variables"]["tas"]
    assert tas["coordinates"] == "longitude|latitude|time"
    assert set(amon["axes"]) == {"longitude", "latitude", "time"}
    # mip filter drops the OtherMIP request item (and with it Omon)
    filtered = specs.parse_dreq_xml(p, "historical", mips=["CMIP"])
    assert set(filtered) == {"Amon"}
    # unknown experiment -> {} like the reference
    assert specs.parse_dreq_xml(p, "nope") == {}
