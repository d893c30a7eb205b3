"""Expression-definition front-end tests.

Golden AST cases mirror the reference test surface
(``/root/reference/source/test/parsingTests.py:107-790``) node shape
for node shape; compile/evaluate cases check Catalyst output, plan-time
unit checking, positive-flag reconciliation, and array indexing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyconform_spark import defs, units
from pyconform_spark.defs import (
    DefinitionError,
    FuncType,
    OpType,
    VarType,
    parse_definition,
)


# ----------------------------------------------------- golden AST parses
# (input, expected AST) — shapes identical to parsingTests expectations.
GOLDEN = [
    # integers / floats (parsingTests.py:154-307)
    ("1", 1),
    ("98734786423867234", 98734786423867234),
    ("1.", 1.0),
    ("1.8374755", 1.8374755),
    (".35457", 0.35457),
    ("1e7", 1e7),
    ("1e+7", 1e7),
    ("1e-7", 1e-7),
    ("1.e7", 1e7),
    ("1.324523e7", 1.324523e7),
    (".324523e-7", 0.324523e-7),
    # functions (parsingTests.py:311-370)
    ("f()", FuncType("f", [], {})),
    ("f(1)", FuncType("f", [1], {})),
    ("f(x)", FuncType("f", [VarType("x", [])], {})),
    ("f(1, 2)", FuncType("f", [1, 2], {})),
    ("f(x, y)", FuncType("f", [VarType("x", []), VarType("y", [])], {})),
    # quoted strings as arguments (parsingTests.py:107-150)
    ('f("1")', FuncType("f", ["1"], {})),
    ('f(a="1")', FuncType("f", [], {"a": "1"})),
    ('f("Hello, World!")', FuncType("f", ["Hello, World!"], {})),
    ('g("f(x,y,z)")', FuncType("g", ["f(x,y,z)"], {})),
    # keywords
    ("f(x, units='m')", FuncType("f", [VarType("x", [])], {"units": "m"})),
    ("f(a=1, b=2)", FuncType("f", [], {"a": 1, "b": 2})),
    # variables and indexing
    ("x", VarType("x", [])),
    ("x[2]", VarType("x", [2])),
    ("x[1:4]", VarType("x", [slice(1, 4, None)])),
    ("x[1:8:2]", VarType("x", [slice(1, 8, 2)])),
    ("x[:4]", VarType("x", [slice(None, 4, None)])),
    ("x[1, 2]", VarType("x", [1, 2])),
    # operators and precedence (parsing.py:82-87)
    ("-x", OpType("-", [VarType("x", [])])),
    ("+x", VarType("x", [])),
    ("a + b", OpType("+", [VarType("a", []), VarType("b", [])])),
    (
        "a + b * c",
        OpType("+", [VarType("a", []),
                     OpType("*", [VarType("b", []), VarType("c", [])])]),
    ),
    (
        "(a + b) * c",
        OpType("*", [OpType("+", [VarType("a", []), VarType("b", [])]),
                     VarType("c", [])]),
    ),
    # ** binds tighter than unary minus: -x**2 == -(x**2)
    (
        "-x**2",
        OpType("-", [OpType("**", [VarType("x", []), 2])]),
    ),
    # ** is LEFT-associative in the reference grammar
    (
        "x**2**3",
        OpType("**", [OpType("**", [VarType("x", []), 2]), 3]),
    ),
    (
        "a < b",
        OpType("<", [VarType("a", []), VarType("b", [])]),
    ),
    (
        "a == b + c",
        OpType("==", [VarType("a", []),
                      OpType("+", [VarType("b", []), VarType("c", [])])]),
    ),
    # parse-time constant folding (parsing.py:213-262)
    ("1 + 2", 3),
    ("2**3 + 1.5", 9.5),
    ("-5", -5),
    ("2 < 3", True),
    ("f(1 + 2)", FuncType("f", [3], {})),
    ("x + 1*3", OpType("+", [VarType("x", []), 3])),
]


@pytest.mark.parametrize("text,want", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_parse_golden(text, want):
    assert parse_definition(text) == want


def test_parse_errors():
    for bad in ["x +", "f(", "x[", "(a", "a ~ b", "f(a=1, 2)", "x 3"]:
        with pytest.raises(DefinitionError):
            parse_definition(bad)


def test_ast_str_matches_reference_forms():
    assert str(parse_definition("a + b")) == "(a+b)"
    assert str(parse_definition("-x")) == "(-x)"
    assert str(parse_definition("f(x, y, units='m')")) == "f(x,y,units=m)"
    # reference ind_str renders [start,stop,None] with trailing colon
    assert str(parse_definition("x[1:4]")) == "x[1:4:]"
    assert str(parse_definition("x[2]")) == "x[2]"


# ------------------------------------------------------------- evaluation
@pytest.fixture()
def df(spark):
    d = spark.createDataFrame(
        [(1, 100.0, 2.0), (2, 400.0, 0.5)],
        "id long, v double, w double",
    )
    return d


def _vals(out, col):
    return {r["id"]: r[col] for r in out.select("id", col).collect()}


def test_evaluate_defs_basic(df):
    out = defs.evaluate_defs(
        df,
        [
            "a = v + 1.5",
            "b = -v / 4.0",
            "c = v**2",
            "d = sqrt(v)",
            "e = limit(v, below=150.0, above=390.0)",
            "f = v > 200.0",
            "g = 2**3 + 1.0",
            "h = (a + b) * 2.0",  # later defs see earlier ones
        ],
    )
    assert _vals(out, "a") == {1: 101.5, 2: 401.5}
    assert _vals(out, "b") == {1: -25.0, 2: -100.0}
    assert _vals(out, "c") == {1: 10000.0, 2: 160000.0}
    assert _vals(out, "d") == {1: 10.0, 2: 20.0}
    assert _vals(out, "e") == {1: 150.0, 2: 390.0}
    assert _vals(out, "f") == {1: False, 2: True}
    assert _vals(out, "g") == {1: 9.0, 2: 9.0}
    assert _vals(out, "h") == {1: 153.0, 2: 603.0}


def test_unknown_variable_and_function_fail_at_compile_time(df):
    with pytest.raises(DefinitionError, match="unknown variable 'zz'"):
        defs.compile_defs(df, ["a = zz + 1"])
    with pytest.raises(DefinitionError, match="unknown function 'frobnicate'"):
        defs.compile_defs(df, ["a = frobnicate(v)"])


def test_units_ride_definitions(df):
    d = units.with_units(df, "v", "ms")
    d = units.with_units(d, "w", "s")
    out = defs.evaluate_defs(
        d,
        [
            "tot = v + w",            # w converted s->ms (+1000x)
            "prod = v * w",           # ms*s -> 0.001*s**2
            "rate = v / w",           # ms/s -> 0.001 (dimensionless)
            "v_s = convert(v, units='s')",
            "relab = chunits(v, units='B')",  # reinterpret, data untouched
            "bare = rmunits(v)",
        ],
    )
    assert _vals(out, "tot") == {1: 100.0 + 2000.0, 2: 400.0 + 500.0}
    assert units.unit_of(out, "tot") == "ms"
    assert units.parse_unit(units.unit_of(out, "prod")).dims == (("time", 2),)
    assert units.parse_unit(units.unit_of(out, "rate")).dims == ()
    assert _vals(out, "v_s") == {1: 0.1, 2: 0.4}
    assert units.unit_of(out, "v_s") == "s"
    assert _vals(out, "relab") == {1: 100.0, 2: 400.0}
    assert units.unit_of(out, "relab") == "B"
    assert units.unit_of(out, "bare") is None


def test_incompatible_units_fail_before_any_action(df):
    d = units.with_units(df, "v", "ms")
    d = units.with_units(d, "w", "B")
    with pytest.raises(units.UnitsError, match="time"):
        defs.compile_defs(d, ["bad = v + w"])  # no job ran


def test_sqrt_units_and_power_units(df):
    d = units.with_units(df, "v", "s")
    out = defs.evaluate_defs(d, ["sq = v**2", "back = sqrt(v**2)"])
    assert units.parse_unit(units.unit_of(out, "sq")).dims == (("time", 2),)
    assert units.unit_of(out, "back") == "s"
    with pytest.raises(units.UnitsError, match="fractional"):
        defs.compile_defs(d, ["bad = sqrt(v)"])  # sqrt(s) has no root


def test_positive_flag_reconciliation(df):
    """physarray.py:392-406: up + down -> right operand flipped."""
    d = units.with_positive(df, "v", "up")
    d = units.with_positive(d, "w", "down")
    out = defs.evaluate_defs(d, ["s = v + w", "m = v * w"])
    # w (down) flipped to up: s = v + (-w), m = v * (-w)
    assert _vals(out, "s") == {1: 98.0, 2: 399.5}
    assert _vals(out, "m") == {1: -200.0, 2: -200.0}
    assert units.positive_of(out, "s") == "up"
    assert units.positive_of(out, "m") == "up"

    # up()/down() functions (physarray.py:328-352)
    out2 = defs.evaluate_defs(df, ["dv = down(v)", "uv = up(down(v))"])
    assert _vals(out2, "dv") == {1: 100.0, 2: 400.0}  # was unset: no flip
    assert units.positive_of(out2, "dv") == "down"
    assert _vals(out2, "uv") == {1: -100.0, 2: -400.0}  # down->up: negated
    assert units.positive_of(out2, "uv") == "up"

    # even power clears the flag, odd keeps it (physarray.py:552-556)
    out3 = defs.evaluate_defs(d, ["e = v**2", "o = v**3"])
    assert units.positive_of(out3, "e") is None
    assert units.positive_of(out3, "o") == "up"


def test_array_indexing_maps_to_element_at_and_slice(spark):
    d = spark.createDataFrame(
        [(1, [10.0, 20.0, 30.0, 40.0])], "id long, emb array<double>"
    )
    out = defs.evaluate_defs(
        d, ["first = emb[0]", "mid = emb[1:3]", "tail = emb[2:]"]
    )
    row = out.first()
    assert row["first"] == 10.0
    assert row["mid"] == [20.0, 30.0]
    assert row["tail"] == [30.0, 40.0]
    with pytest.raises(DefinitionError, match="not an array"):
        defs.compile_defs(d, ["bad = id[0]"])


def test_aggregate_defs(spark):
    d = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "k string, v double"
    )
    out = defs.evaluate_agg_defs(
        d,
        ["k"],
        [
            "n = count(v)",
            "m = mean(v)",
            "tot = sum(v)",
            "span = max(v) - min(v)",
        ],
    )
    rows = {r["k"]: (r["n"], r["m"], r["tot"], r["span"]) for r in out.collect()}
    assert rows == {"a": (2, 2.0, 4.0, 2.0), "b": (1, 10.0, 10.0, 0.0)}
    # row-wise def in aggregate context (and vice versa) fail clearly
    with pytest.raises(DefinitionError, match="aggregate"):
        defs.evaluate_defs(d, ["m = mean(v)"])
    with pytest.raises(DefinitionError, match="row-wise"):
        defs.evaluate_agg_defs(d, ["k"], ["r = v + 1"])


def test_defs_stay_jvm_side(spark, df):
    """The compiled plan is pure Catalyst: one projection, no Python
    workers (BatchEvalPython/ArrowEvalPython absent)."""
    import contextlib
    import io

    out = defs.evaluate_defs(
        df, ["a = v*2 + w", "b = sqrt(abs(v - w))", "c = where(v > w, v, w)"]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Project" in plan


def test_parser_accepts_reference_example_corpus():
    """Grammar parity proof on REAL inputs: every definition string in
    the reference's shipped example specs (read at test time from the
    read-only reference checkout — nothing copied) must parse.  Skips
    when the reference tree is absent."""
    import glob
    import json
    import os

    root = "/root/reference/examples"
    if not os.path.isdir(root):
        pytest.skip("reference examples not available")
    seen = set()
    for p in glob.glob(f"{root}/**/*.json", recursive=True):
        try:
            d = json.load(open(p))
        except Exception:
            continue
        if not isinstance(d, dict):
            continue
        for vd in d.values():
            if isinstance(vd, dict) and isinstance(vd.get("definition"), str):
                s = vd["definition"].strip()
                if s:
                    seen.add(s)
    assert len(seen) >= 50  # the corpus is real, not a handful
    for s in sorted(seen):
        parse_definition(s)  # must not raise


# ----------------------------------------------- property-based parsing
from hypothesis import given, settings
from hypothesis import strategies as st

_names = st.from_regex(r"[a-z][a-z0-9_]{0,5}", fullmatch=True)
_ints = st.integers(min_value=0, max_value=10**6)
_floats = st.floats(
    min_value=0.0, max_value=1e9, allow_nan=False, allow_infinity=False
)
_strings = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           exclude_characters="\"'\\"),
    max_size=8,
)
_binops = st.sampled_from(["+", "-", "*", "/", "**", "<", ">", "<=", ">=", "=="])


def _render(ast) -> str:
    """Emit concrete syntax the grammar accepts (strings quoted —
    unlike __str__, which is the reference's display form)."""
    if isinstance(ast, OpType):
        if len(ast.args) == 1:
            return f"(-{_render(ast.args[0])})"
        return f"({_render(ast.args[0])} {ast.key} {_render(ast.args[1])})"
    if isinstance(ast, FuncType):
        parts = [
            f'"{a}"' if isinstance(a, str) else _render(a) for a in ast.args
        ]
        parts += [
            f'{k}={f_quote(v)}' for k, v in ast.kwds.items()
        ]
        return f"{ast.key}({', '.join(parts)})"
    if isinstance(ast, VarType):
        if not ast.ind:
            return ast.key
        def ind(i):
            if isinstance(i, slice):
                return ":".join(
                    "" if p is None else str(p)
                    for p in (i.start, i.stop, i.step)
                )
            return str(i)
        return f"{ast.key}[{', '.join(ind(i) for i in ast.ind)}]"
    if isinstance(ast, str):
        return f'"{ast}"'
    return repr(ast)


def f_quote(v):
    return f'"{v}"' if isinstance(v, str) else _render(v)


def _exprs(depth):
    """AST nodes that do NOT fold at parse time: every OpType keeps at
    least one symbolic child, unary minus never wraps a constant."""
    var = st.builds(lambda n: VarType(n, []), _names)
    ivar = st.builds(
        lambda n, i: VarType(n, [i]),
        _names,
        st.one_of(
            _ints,
            st.builds(slice, _ints, st.integers(min_value=0, max_value=10**6),
                      st.one_of(st.none(), _ints)),
        ),
    )
    if depth == 0:
        return st.one_of(var, ivar)
    sub = _exprs(depth - 1)
    leafy = st.one_of(sub, _ints, _floats)
    func = st.builds(
        lambda n, args, kwds: FuncType(n, args, kwds),
        _names,
        st.lists(st.one_of(leafy, _strings), max_size=3),
        st.dictionaries(_names, st.one_of(leafy, _strings), max_size=2),
    )
    binl = st.builds(lambda op, a, b: OpType(op, [a, b]), _binops, sub, leafy)
    binr = st.builds(lambda op, a, b: OpType(op, [a, b]), _binops, leafy, sub)
    neg = st.builds(lambda a: OpType("-", [a]), sub)
    return st.one_of(var, ivar, func, binl, binr, neg)


@settings(max_examples=300, deadline=None)
@given(_exprs(3))
def test_parse_render_roundtrip(ast):
    """Property: rendering any non-foldable AST to concrete syntax and
    re-parsing reproduces the AST exactly (the parser neither loses nor
    invents structure)."""
    assert parse_definition(_render(ast)) == ast


def test_case_insensitive_name_collision_refused(spark):
    """A def named 'u' over an input 'U' would make Spark's default
    case-insensitive resolver replace the input mid-chain — refused at
    compile time with a clear message."""
    d = spark.createDataFrame([(1.0, 2.0)], "U double, V double")
    with pytest.raises(DefinitionError, match="case-insensitively"):
        defs.evaluate_defs(d, ["u = U + V"])
    # exact-name redefinition (output shadows input) stays allowed
    out = defs.evaluate_defs(d, ["U = U + V"])
    assert out.first()["U"] == 3.0


def test_chdims_is_identity_and_registry_covers_all_reference_keys(spark, df):
    """Every §2.3 built-in function key of the reference exists in the
    registry (functions.py: sqrt/mean/sum/min/max/up/down/chunits/
    limit/rmunits/chdims); chdims is the documented identity."""
    for key in ["sqrt", "mean", "sum", "min", "max", "up", "down",
                "chunits", "limit", "rmunits", "chdims"]:
        assert key in defs.FUNCTIONS, key
    out = defs.evaluate_defs(df, ["r = chdims(v, 'time', 'lat')"])
    assert _vals(out, "r") == {1: 100.0, 2: 400.0}


def test_division_by_zero_yields_null_not_ansi_error(spark):
    """The session runs ANSI mode where ANY /0 raises; string-definition
    authors must not be able to crash a job — '/' compiles to
    try_divide (NULL at zero, the masked_invalid convention)."""
    d = spark.createDataFrame([(1.0, 0.0), (8.0, 2.0)], "a double, b double")
    out = defs.evaluate_defs(d, ["q = a / b", "z = a / (a - a)"])
    rows = {r["a"]: (r["q"], r["z"]) for r in out.collect()}
    assert rows[1.0] == (None, None)
    assert rows[8.0] == (4.0, None)


def test_array_index_out_of_bounds_yields_null(spark):
    """ANSI mode raises on out-of-bounds element_at; indexing compiles
    to try_element_at so ragged arrays yield NULL rows, not crashes."""
    d = spark.createDataFrame(
        [(1, [10.0, 20.0]), (2, [30.0])], "id long, emb array<double>"
    )
    out = defs.evaluate_defs(d, ["second = emb[1]"])
    rows = {r["id"]: r["second"] for r in out.collect()}
    assert rows == {1: 20.0, 2: None}


def test_modulo_is_refused_like_the_reference():
    """The reference explicitly declines '%' (physarray.py:534-541:
    NotImplementedError 'Modulus of PhysArray is not defined') — the
    parser matches: '%' is not a token."""
    import pytest

    from pyconform_spark import defs

    with pytest.raises(defs.DefinitionError, match="unexpected character"):
        defs.parse_definition("a % b")


def test_ewma_window_function_matches_query_twin(spark):
    """`s = ewma(value, ts)` from a definition string equals the
    registered ewma_smooth query on the same input."""
    from pyconform_spark import defs
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/events.parquet")
    got = defs.evaluate_defs(
        df, ["s = ewma(value, ts)"], window_keys=("user_id", "event_type")
    ).select("event_id", "s")
    want = Q.ewma_smooth(spark, sf).select("event_id", "ewma")
    g = {r.event_id: r.s for r in got.collect()}
    w = {r.event_id: r.ewma for r in want.collect()}
    assert g == w


def test_zscore_window_function_matches_query_twin(spark):
    from pyconform_spark import defs
    from pyconform_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/events.parquet")
    got = defs.evaluate_defs(
        df, ["z = zscore(value, ts)"], window_keys=("user_id", "event_type")
    ).select("event_id", "z")
    want = Q.anomaly_zscore(spark, sf).select("event_id", "zscore")
    g = {r.event_id: r.z for r in got.collect()}
    w = {r.event_id: r.zscore for r in want.collect()}
    assert g == w


def test_delta_and_irate_window_functions_match_duckdb(spark):
    """`d = delta(value, ts)` / `r = irate(value, ts)` from definition
    strings equal DuckDB computing the same exact-integer construction
    on the same parquet."""
    import duckdb
    import numpy as np

    from pyconform_spark import defs

    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/events.parquet")
    got = defs.evaluate_defs(
        df,
        ["d = delta(value, ts)", "r = irate(value, ts)"],
        window_keys=("user_id", "event_type"),
    ).select("event_id", "d", "r").toPandas()
    exp = duckdb.sql(
        f"""
        WITH q AS (
          SELECT event_id, user_id, event_type, ts,
                 floor(value * 100)::BIGINT AS vq, epoch_us(ts) AS us
          FROM read_parquet('{sf}/events.parquet')),
        l AS (
          SELECT event_id,
                 vq - lag(vq) OVER w AS dv,
                 us - lag(us) OVER w AS dt
          FROM q WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts))
        SELECT event_id, CAST(dv AS DOUBLE) / 100.0 AS d,
               CAST(dv * 10000 AS DOUBLE) / CAST(dt AS DOUBLE) AS r
        FROM l
        """
    ).df()
    got = got.sort_values("event_id").reset_index(drop=True)
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(exp) and len(got) > 500
    for c in ("d", "r"):
        g = got[c].to_numpy(dtype=np.float64)
        e = exp[c].to_numpy(dtype=np.float64)
        mask = np.isnan(g) | np.isnan(e)
        assert (np.isnan(g) == np.isnan(e)).all(), c
        assert (g[~mask].view(np.uint64) == e[~mask].view(np.uint64)).all(), c


def test_promql_range_functions_hand_computed(spark):
    """increase/rate/resets from definition strings on a crafted
    counter with one reset: hand-computed expectations."""
    import datetime as dt

    from pyconform_spark import defs

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "c", t0, 0, 10.0),
        (1, "c", t0 + dt.timedelta(seconds=10), 1, 25.0),
        (1, "c", t0 + dt.timedelta(seconds=20), 2, 3.0),   # reset
        (1, "c", t0 + dt.timedelta(seconds=30), 3, 8.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz, "
        "event_id long, value double"
    )
    out = defs.evaluate_defs(
        df,
        [
            "inc = increase(value, ts, window=3)",
            "r = rate(value, ts, window=3)",
            "nr = resets(value, ts, window=3)",
        ],
        window_keys=("user_id", "event_type"),
    )
    got = {row.event_id: row for row in out.collect()}
    # per-sample incs: 0, 15, 3 (reset -> post-reset value), 5
    assert got[0].inc == 0.0 and got[0].nr == 0
    assert got[1].inc == 15.0
    assert got[2].inc == 18.0 and got[2].nr == 1          # 0+15+3
    assert got[3].inc == 23.0 and got[3].nr == 1          # 15+3+5
    # rate over the last-3 frame of row 3: 23 centi-units over 20 s
    assert got[3].r == (2300 * 10000) / 20_000_000 / 100 * 100 or True
    assert abs(got[3].r - 23.0 / 20.0) < 1e-12
    # single-sample frame => NULL rate
    assert got[0].r is None
    # staged columns must not leak into the output
    assert not [c for c in out.columns if c.startswith("__")]


def test_promql_staged_function_refuses_composition_loudly(spark):
    """Composing a staged window function into a larger expression
    loses its stage and must fail analysis (self-describing column
    name), never silently compute garbage."""
    import pytest as _pt
    from pyspark.errors import AnalysisException

    from pyconform_spark import defs

    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/events.parquet")
    with _pt.raises((AnalysisException, defs.DefinitionError)):
        defs.evaluate_defs(
            df,
            ["x = increase(value, ts, window=5) * 2"],
            window_keys=("user_id", "event_type"),
        ).collect()


def test_new_range_functions_validate_their_knobs(spark):
    """quantile/slope/changes/over-time reject out-of-range knobs at
    PARSE time (DefinitionError, before any Spark job)."""
    df = spark.range(3).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
        F.timestamp_seconds(F.col("id")).alias("t"),
    )
    for bad in (
        "x = quantile(v, t, q=0, window=5)",
        "x = quantile(v, t, q=101, window=5)",
        "x = slope(v, t, window=0)",
        "x = changes(v, t, window=-1)",
        "x = min_over(v, t, window=0)",
    ):
        with pytest.raises(defs.DefinitionError):
            defs.evaluate_defs(df, [bad], window_keys=("k",))


def test_slope_constant_series_is_zero_and_flat_time_null(spark):
    """Analytic anchors for slope: a constant series has slope 0; a
    window with zero time spread (single sample) yields NULL."""
    df = spark.createDataFrame(
        [(1, float(7), i) for i in range(5)], "k int, v double, s long"
    ).select("k", "v", F.timestamp_seconds(F.col("s")).alias("t"))
    out = defs.evaluate_defs(
        df, ["sl = slope(v, t, window=3)"], window_keys=("k",)
    ).orderBy("t").collect()
    assert out[0]["sl"] is None  # first row: n=1, zero spread
    assert all(r["sl"] == 0.0 for r in out[1:])  # constant => slope 0


def test_predict_linear_analytic_line(spark):
    """On an exact line v = 2t + 5 the trailing-window regression must
    reproduce the line: predict_linear(horizon=h) == v + 2h at every
    sample past the first (first row: zero spread -> NULL)."""
    df = spark.createDataFrame(
        [(1, 5.0 + 2.0 * i, i) for i in range(6)],
        "k int, v double, s long",
    ).select("k", "v", F.timestamp_seconds(F.col("s")).alias("t"))
    out = (
        defs.evaluate_defs(
            df,
            ["p = predict_linear(v, t, window=4, horizon=10)"],
            window_keys=("k",),
        )
        .orderBy("t")
        .collect()
    )
    assert out[0]["p"] is None
    for r in out[1:]:
        assert abs(r["p"] - (r["v"] + 20.0)) < 1e-9


def test_predict_linear_constant_series_is_flat(spark):
    """A constant series predicts itself at any horizon."""
    df = spark.createDataFrame(
        [(1, 7.0, i) for i in range(5)], "k int, v double, s long"
    ).select("k", "v", F.timestamp_seconds(F.col("s")).alias("t"))
    out = (
        defs.evaluate_defs(
            df,
            ["p = predict_linear(v, t, window=3, horizon=3600)"],
            window_keys=("k",),
        )
        .orderBy("t")
        .collect()
    )
    assert out[0]["p"] is None
    assert all(r["p"] == 7.0 for r in out[1:])
