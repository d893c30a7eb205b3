"""String expression-definition front-end — the reference's core user
surface, compiled to Catalyst.

The reference's entire UX is a *string* definition per output variable
— ``pr = chunits(PRECC + PRECL, units='kg m-2 s-1')`` — lexed/parsed
by a PLY grammar into ``OpType``/``FuncType``/``VarType`` nodes
(``/root/reference/source/pyconform/parsing.py:14-87`` tokens and
precedence, ``:90-262`` grammar, ``:275-276`` entry), planned into a
DAG with function lookup (``dataflow.py:124-164``,
``functions.py:26-41,238-250``), and evaluated chunk by chunk.

Spark-native recast:

* the parser is a small self-contained tokenizer + precedence-climbing
  parser (no parser-generator dependency) producing the SAME AST node
  shapes (named tuples ``OpType``/``FuncType``/``VarType`` with the
  reference's ``__str__`` forms) and the SAME precedence table
  (parsing.py:82-87): ``== < cmp < +- < */ < unary ± < **``, with
  ``**`` LEFT-associative and binding tighter than unary minus;
* constant subtrees fold at PARSE time exactly like the reference's
  ``p_expression_binary``/``p_expression_unary`` (parsing.py:213-262):
  ``2**3 + 1.5`` parses to the literal ``9.5``;
* compilation emits a single Catalyst ``Column`` per definition —
  whole-stage-codegen JVM expressions, zero Python in the hot path;
* unit checking runs at COMPILE (plan) time through the dimensional
  algebra in :mod:`pyconform_spark.units`: ``+``/``-``/comparisons
  convert the right operand to the left's units
  (physarray.py:418-421), ``*``/``/`` add/subtract dimension vectors
  (`:455-506`), ``**`` requires a constant exponent and exponentiates
  units (`:543-556`) — a bad unit mix raises before any data moves;
* the ``positive`` up/down flag is reconciled on every binary op
  (physarray.py:392-406): opposite flags flip (negate) the right
  operand, a flagged operand imprints its direction on an unflagged
  one;
* integer powers 2..4 compile to repeated multiplication — IEEE-
  identical across engines, unlike ``Math.pow``;
* variable indexing ``v[i]`` / ``v[a:b]`` maps to Spark ARRAY columns
  (``element_at`` / ``slice``) — the N-D axis analog in a relational
  frame; the reference's 0-based indices are shifted to Spark's
  1-based ones at compile time.

Deviation (documented): the reference refuses ``a + 2`` when ``a``
carries units (a bare constant is dimensionless '1', physarray.py:419)
— here an operand with NO units metadata (untracked, the common Spark
case) adopts the other side's units instead of raising; tracked-but-
incompatible units still raise.
"""

from __future__ import annotations

import itertools
import re
from collections import namedtuple
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from pyconform_spark import units as U


class DefinitionError(ValueError):
    pass


# ---------------------------------------------------------------- AST nodes
# Shapes mirror parsing.py:66-79 so golden tests map 1:1.
def _ind_str(index):
    if isinstance(index, slice):
        parts = [index.start, index.stop, index.step]
        s = ":".join("" if i is None else str(i) for i in parts)
        return ":" if s == "::" else s
    return str(index)


def _op_str(self):
    if len(self.args) == 1:
        return "({}{})".format(self.key, self.args[0])
    return "({}{}{})".format(self.args[0], self.key, self.args[1])


OpType = namedtuple("OpType", ["key", "args"])
OpType.__new__.__defaults__ = (None, [])
OpType.__str__ = _op_str

FuncType = namedtuple("FuncType", ["key", "args", "kwds"])
FuncType.__new__.__defaults__ = (None, [], {})
FuncType.__str__ = lambda self: "{}({})".format(
    self.key,
    ",".join(
        [str(a) for a in self.args]
        + ["{}={}".format(k, self.kwds[k]) for k in self.kwds]
    ),
)

VarType = namedtuple("VarType", ["key", "ind"])
VarType.__new__.__defaults__ = (None, [])
VarType.__str__ = lambda self: "{}{}".format(
    self.key,
    "" if len(self.ind) == 0 else "[{}]".format(
        ",".join(_ind_str(a) for a in self.ind)
    ),
)


# ---------------------------------------------------------------- tokenizer
_TOKEN_RE = re.compile(
    r"""
    (?P<UFLOAT>(?:[0-9]+\.[0-9]*|[0-9]*\.[0-9]+)(?:[eE][+-]?[0-9]+)?
              |[0-9]+[eE][+-]?[0-9]+)
  | (?P<UINT>[0-9]+)
  | (?P<STRING>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<NAME>[a-zA-Z_][a-zA-Z0-9_]*)
  | (?P<POW>\*\*)
  | (?P<LEQ><=)
  | (?P<GEQ>>=)
  | (?P<EQ>==)
  | (?P<LIT>[*/+\-<>=,:()\[\]])
  | (?P<WS>[ \t]+)
""",
    re.VERBOSE,
)

Token = namedtuple("Token", ["kind", "value"])


def _tokenize(text: str) -> list[Token]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise DefinitionError(
                f"unexpected character {text[pos]!r} at position {pos} in {text!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        val = m.group()
        if kind == "WS":
            continue
        if kind == "UFLOAT":
            out.append(Token("NUM", float(val)))
        elif kind == "UINT":
            out.append(Token("NUM", int(val)))
        elif kind == "STRING":
            out.append(Token("STRING", val[1:-1]))
        elif kind in ("POW", "LEQ", "GEQ", "EQ"):
            out.append(Token("OP", val))
        elif kind == "LIT":
            out.append(Token("OP", val))
        else:
            out.append(Token("NAME", val))
    out.append(Token("END", None))
    return out


# ------------------------------------------------------------------- parser
# Binding powers mirror parsing.py:82-87 (lowest to highest); POW is
# LEFT-associative and tighter than unary +/- (so -x**2 == -(x**2)).
_BINARY_BP = {
    "==": 1,
    "<": 2, ">": 2, "<=": 2, ">=": 2,
    "+": 3, "-": 3,
    "*": 4, "/": 4,
    "**": 6,
}
_UNARY_BP = 5

_AST_NODES = (OpType, FuncType, VarType)


def _fold_unary(op: str, v):
    if isinstance(v, _AST_NODES):
        return v if op == "+" else OpType(op, [v])
    return v if op == "+" else -v


def _fold_binary(op: str, a, b):
    if isinstance(a, _AST_NODES) or isinstance(b, _AST_NODES):
        return OpType(op, [a, b])
    # parse-time constant folding (parsing.py:240-262)
    return {
        "**": lambda: a**b, "-": lambda: a - b, "+": lambda: a + b,
        "*": lambda: a * b, "/": lambda: a / b, "<": lambda: a < b,
        ">": lambda: a > b, "<=": lambda: a <= b, ">=": lambda: a >= b,
        "==": lambda: a == b,
    }[op]()


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0

    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, value: str) -> None:
        t = self.next()
        if t.kind != "OP" or t.value != value:
            raise DefinitionError(
                f"expected {value!r}, got {t.value!r} in {self.text!r}"
            )

    # -- expression (precedence climbing) --
    def expression(self, min_bp: int = 0):
        t = self.peek()
        if t.kind == "OP" and t.value in ("-", "+"):
            self.next()
            operand = self.expression(_UNARY_BP)
            left = _fold_unary(t.value, operand)
        else:
            left = self.atom()
        while True:
            t = self.peek()
            if t.kind != "OP" or t.value not in _BINARY_BP:
                break
            bp = _BINARY_BP[t.value]
            if bp < min_bp:
                break
            self.next()
            right = self.expression(bp + 1)  # all binaries left-assoc
            left = _fold_binary(t.value, left, right)
        return left

    def atom(self):
        t = self.next()
        if t.kind == "NUM":
            return t.value
        if t.kind == "OP" and t.value == "(":
            inner = self.expression(0)
            self.expect(")")
            return inner
        if t.kind == "NAME":
            nxt = self.peek()
            if nxt.kind == "OP" and nxt.value == "(":
                return self.call(t.value)
            if nxt.kind == "OP" and nxt.value == "[":
                return self.indexed(t.value)
            return VarType(t.value, [])
        raise DefinitionError(
            f"unexpected token {t.value!r} in {self.text!r}"
        )

    # -- function call: args then keywords (parsing.py:107-163) --
    def call(self, name: str) -> FuncType:
        self.expect("(")
        args: list = []
        kwds: dict = {}
        if self.peek() == Token("OP", ")"):
            self.next()
            return FuncType(name, args, kwds)
        while True:
            # keyword?  NAME '=' (but not NAME '==')
            if (
                self.peek().kind == "NAME"
                and self.toks[self.i + 1] == Token("OP", "=")
            ):
                k = self.next().value
                self.next()  # '='
                kwds[k] = self.argument()
            else:
                if kwds:
                    raise DefinitionError(
                        f"positional argument after keyword in {self.text!r}"
                    )
                args.append(self.argument())
            t = self.next()
            if t == Token("OP", ")"):
                return FuncType(name, args, kwds)
            if t != Token("OP", ","):
                raise DefinitionError(
                    f"expected ',' or ')', got {t.value!r} in {self.text!r}"
                )

    def argument(self):
        if self.peek().kind == "STRING":
            return self.next().value
        return self.expression(0)

    # -- variable with index list (parsing.py:166-210) --
    def indexed(self, name: str) -> VarType:
        self.expect("[")
        indices = [self.index()]
        while self.peek() == Token("OP", ","):
            self.next()
            indices.append(self.index())
        self.expect("]")
        return VarType(name, indices)

    def index(self):
        parts = [self.slice_argument()]
        while self.peek() == Token("OP", ":"):
            self.next()
            parts.append(self.slice_argument())
        if len(parts) == 1:
            if parts[0] is None:
                raise DefinitionError(f"empty index in {self.text!r}")
            return parts[0]
        if len(parts) > 3:
            raise DefinitionError(f"slice has too many parts in {self.text!r}")
        while len(parts) < 3:
            parts.append(None)
        return slice(*parts)

    def slice_argument(self):
        t = self.peek()
        if t.kind == "OP" and t.value in (":", ",", "]"):
            return None
        return self.expression(0)


def parse_definition(strexpr: str):
    """The reference's entry point (parsing.py:275-276): definition
    string -> AST (OpType/FuncType/VarType nodes, or a folded Python
    constant)."""
    p = _Parser(strexpr)
    ast = p.expression(0)
    if p.peek().kind != "END":
        raise DefinitionError(
            f"trailing input {p.peek().value!r} in {strexpr!r}"
        )
    return ast


# ----------------------------------------------------------------- compiler
@dataclass
class Compiled:
    """A compiled expression: Catalyst column + carried metadata."""

    col: Column
    unit: U.Unit | None = None        # None = untracked
    positive: str | None = None
    is_agg: bool = False
    const: Any = None                 # python value when a pure constant
    is_const: bool = False
    # two-stage window compile: (name, Column) intermediates that must
    # be materialized in a projection BEFORE ``col`` (window-over-window
    # is illegal in one select).  Only top-level window-function
    # definitions may carry stages; composing a staged function into a
    # larger expression loses them and fails analysis with the staged
    # column's (self-describing) name.
    stages: tuple = ()

    @staticmethod
    def constant(v) -> "Compiled":
        return Compiled(col=F.lit(v), const=v, is_const=True)


def _match_positive(a: Compiled, b: Compiled) -> tuple[Compiled, Compiled, str | None]:
    """physarray.py:392-406: reconcile positive flags; opposite flags
    flip (negate) the right operand."""
    if a.positive == b.positive:
        return a, b, a.positive
    if a.positive is None:
        return a, b, b.positive
    if b.positive is None:
        return a, b, a.positive
    flipped = Compiled(col=-b.col, unit=b.unit, positive=a.positive, is_agg=b.is_agg)
    return a, flipped, a.positive


def _convert_to(c: Compiled, target: U.Unit | None) -> Compiled:
    """Convert c's column into target units (physarray.py:418-421).
    Untracked operands adopt the target unchanged (module deviation)."""
    if c.unit is None or target is None or c.unit.name == target.name:
        return Compiled(col=c.col, unit=target, positive=c.positive, is_agg=c.is_agg)
    a, b = U.conversion(c.unit, target)  # raises UnitsError if incompatible
    col = c.col if (a == 1.0 and b == 0.0) else c.col * F.lit(a) + F.lit(b)
    return Compiled(col=col, unit=target, positive=c.positive, is_agg=c.is_agg)


def _dimensionless() -> U.Unit:
    return U.parse_unit("")


class Compiler:
    """AST -> Catalyst Column against a name->Compiled context.

    ``window_keys`` partitions the window-shaped functions (e.g.
    ``bounds``): the reference applies them along a named 1-D
    dimension; the long-form analog is a window partitioned by the
    OTHER key columns and ordered by the function's own coordinate
    argument.  An empty tuple (the default) means one global series —
    correct for coordinate/dimension tables, which are broadcast-sized;
    pass the series keys for per-series data."""

    def __init__(
        self,
        ctx: dict[str, Compiled],
        schema: T.StructType | None = None,
        window_keys: tuple[str, ...] = (),
    ):
        self.ctx = ctx
        self.schema = schema
        self.window_keys = tuple(window_keys)

    def compile(self, ast) -> Compiled:
        if isinstance(ast, (int, float, bool)):
            return Compiled.constant(ast)
        if isinstance(ast, str):
            return Compiled.constant(ast)
        if isinstance(ast, VarType):
            return self._var(ast)
        if isinstance(ast, OpType):
            return self._op(ast)
        if isinstance(ast, FuncType):
            return self._func(ast)
        raise DefinitionError(f"cannot compile AST node {ast!r}")

    # -- variables --
    def _var(self, v: VarType) -> Compiled:
        if v.key not in self.ctx:
            avail = ", ".join(sorted(self.ctx))
            raise DefinitionError(
                f"unknown variable {v.key!r}; available: {avail}"
            )
        base = self.ctx[v.key]
        if not v.ind:
            return base
        return self._index(v, base)

    def _index(self, v: VarType, base: Compiled) -> Compiled:
        """v[i] / v[a:b] over ARRAY columns: the reference's 0-based
        axis indices (indexing.py) become element_at/slice."""
        if len(v.ind) != 1:
            raise DefinitionError(
                f"{v}: only 1-D (array-column) indexing is supported"
            )
        if self.schema is not None and v.key in self.schema.fieldNames():
            if not isinstance(self.schema[v.key].dataType, T.ArrayType):
                raise DefinitionError(
                    f"{v}: column {v.key!r} is not an array column"
                )
        ind = v.ind[0]
        if isinstance(ind, slice):
            start = 0 if ind.start is None else ind.start
            if ind.step not in (None, 1):
                raise DefinitionError(f"{v}: slice step is not supported")
            if not isinstance(start, int) or start < 0:
                raise DefinitionError(f"{v}: slice bounds must be ints >= 0")
            if ind.stop is None:
                length = F.size(base.col) - start
            else:
                if not isinstance(ind.stop, int) or ind.stop < start:
                    raise DefinitionError(
                        f"{v}: slice bounds must be ints with stop >= start"
                    )
                length = F.lit(ind.stop - start)
            col = F.slice(base.col, start + 1, length)
        else:
            if not isinstance(ind, int):
                raise DefinitionError(f"{v}: index must be an integer")
            # try_element_at: ANSI mode raises on out-of-bounds array
            # indices — rows with short arrays yield NULL instead
            col = F.try_element_at(base.col, F.lit(ind + 1))  # 0-based -> 1-based
        return Compiled(col=col, unit=base.unit, positive=base.positive)

    # -- operators --
    def _op(self, op: OpType) -> Compiled:
        if len(op.args) == 1:
            a = self.compile(op.args[0])
            if op.key == "-":
                return Compiled(col=-a.col, unit=a.unit, positive=a.positive,
                                is_agg=a.is_agg)
            return a
        a = self.compile(op.args[0])
        b = self.compile(op.args[1])
        key = op.key
        if key in ("+", "-"):
            a, b, pos = _match_positive(a, b)
            target = a.unit if a.unit is not None else b.unit
            a2, b2 = _convert_to(a, target or a.unit), _convert_to(b, target)
            col = a2.col + b2.col if key == "+" else a2.col - b2.col
            return Compiled(col=col, unit=target, positive=pos,
                            is_agg=a.is_agg or b.is_agg)
        if key in ("*", "/"):
            a, b, pos = _match_positive(a, b)
            au = a.unit if a.unit is not None else (
                _dimensionless() if b.unit is not None else None
            )
            bu = b.unit if b.unit is not None else (
                _dimensionless() if a.unit is not None else None
            )
            unit = None
            if au is not None:
                unit = U.mul_units(au, bu) if key == "*" else U.div_units(au, bu)
            # '/' compiles to try_divide: the session runs ANSI mode,
            # where ANY division by zero raises at runtime — a crash no
            # string-definition author should be able to trigger.  A
            # zero denominator yields NULL (the repo-wide
            # masked_invalid convention; the reference's numpy emits
            # inf + a warning — neither engine-portable nor maskable)
            col = a.col * b.col if key == "*" else F.try_divide(a.col, b.col)
            return Compiled(col=col, unit=unit, positive=pos,
                            is_agg=a.is_agg or b.is_agg)
        if key == "**":
            if not b.is_const or not isinstance(b.const, (int, float)):
                raise DefinitionError(
                    "exponents must be constants (physarray.py:543-550)"
                )
            k = b.const
            if float(k).is_integer() and 1 <= int(k) <= 4:
                col = a.col
                for _ in range(int(k) - 1):
                    col = col * a.col  # IEEE-identical cross-engine
            else:
                col = F.pow(a.col, F.lit(float(k)))
            unit = None if a.unit is None else U.pow_units(a.unit, k)
            pos = None if float(k).is_integer() and int(k) % 2 == 0 else a.positive
            return Compiled(col=col, unit=unit, positive=pos, is_agg=a.is_agg)
        if key in ("<", ">", "<=", ">=", "=="):
            target = a.unit if a.unit is not None else b.unit
            a2, b2 = _convert_to(a, target), _convert_to(b, target)
            col = {
                "<": a2.col < b2.col, ">": a2.col > b2.col,
                "<=": a2.col <= b2.col, ">=": a2.col >= b2.col,
                "==": a2.col == b2.col,
            }[key]
            return Compiled(col=col, is_agg=a.is_agg or b.is_agg)
        raise DefinitionError(f"unknown operator {key!r}")

    # -- functions --
    def _func(self, f: FuncType) -> Compiled:
        if f.key not in FUNCTIONS and f.key not in WINDOW_FUNCTIONS:
            avail = ", ".join(sorted({*FUNCTIONS, *WINDOW_FUNCTIONS}))
            raise DefinitionError(
                f"unknown function {f.key!r}; available: {avail}"
            )
        args = [
            a if isinstance(a, str) else self.compile(a) for a in f.args
        ]
        kwds = {
            k: (v if isinstance(v, str) else self.compile(v))
            for k, v in f.kwds.items()
        }
        if f.key in WINDOW_FUNCTIONS:
            return WINDOW_FUNCTIONS[f.key](args, kwds, self.window_keys)
        return FUNCTIONS[f.key](args, kwds)


# -------------------------------------------------------- function registry
# Key -> callable(args, kwds) -> Compiled.  The reference registers
# Function subclasses by key via a subclass scan (functions.py:238-250)
# and supports user plugins (xconform -m); register_function is the
# same extension point.
FUNCTIONS: dict[str, Callable] = {}


def register_function(key: str):
    def deco(fn):
        FUNCTIONS[key] = fn
        return fn
    return deco


def _one(args, kwds, key) -> Compiled:
    if len(args) != 1 or not isinstance(args[0], Compiled):
        raise DefinitionError(f"{key}(x) takes exactly one expression argument")
    return args[0]


@register_function("sqrt")
def _sqrt(args, kwds):
    """functions.py:284-307: sqrt of data, root of units."""
    a = _one(args, kwds, "sqrt")
    unit = None if a.unit is None else U.root_units(a.unit, 2)
    return Compiled(col=F.sqrt(a.col), unit=unit, positive=a.positive,
                    is_agg=a.is_agg)


@register_function("abs")
def _abs(args, kwds):
    a = _one(args, kwds, "abs")
    return Compiled(col=F.abs(a.col), unit=a.unit, is_agg=a.is_agg)


@register_function("chunits")
def _chunits(args, kwds):
    """functions.py:456-509: reinterpret units, data untouched."""
    a = _one(args, kwds, "chunits")
    label = kwds.get("units")
    if not isinstance(label, str):
        raise DefinitionError("chunits requires units='...' as a string")
    return Compiled(col=a.col, unit=U.parse_unit(label), positive=a.positive,
                    is_agg=a.is_agg)


@register_function("rmunits")
def _rmunits(args, kwds):
    a = _one(args, kwds, "rmunits")
    return Compiled(col=a.col, unit=None, positive=a.positive, is_agg=a.is_agg)


@register_function("convert")
def _convert(args, kwds):
    """Explicit unit conversion (ValidateNode convert,
    flownodes.py:528-541) as a definition function."""
    a = _one(args, kwds, "convert")
    label = kwds.get("units")
    if not isinstance(label, str):
        raise DefinitionError("convert requires units='...' as a string")
    if a.unit is None:
        raise DefinitionError("convert: operand carries no units")
    return _convert_to(a, U.parse_unit(label))


@register_function("limit")
def _limit(args, kwds):
    """functions.py:514-541: clamp below/above; units preserved."""
    a = args[0] if args and isinstance(args[0], Compiled) else None
    if a is None:
        raise DefinitionError("limit(x, below=, above=) needs an expression")
    col = a.col
    below = kwds.get("below")
    above = kwds.get("above")
    if below is not None:
        if not isinstance(below, Compiled) or not below.is_const:
            raise DefinitionError("limit: below= must be a constant")
        col = F.greatest(col, F.lit(float(below.const)))
    if above is not None:
        if not isinstance(above, Compiled) or not above.is_const:
            raise DefinitionError("limit: above= must be a constant")
        col = F.least(col, F.lit(float(above.const)))
    return Compiled(col=col, unit=a.unit, positive=a.positive, is_agg=a.is_agg)


@register_function("up")
def _up(args, kwds):
    """physarray.py:328-339: set positive='up', negating only if it
    was 'down'."""
    a = _one(args, kwds, "up")
    if a.positive == "down":
        return Compiled(col=-a.col, unit=a.unit, positive="up", is_agg=a.is_agg)
    return Compiled(col=a.col, unit=a.unit, positive="up", is_agg=a.is_agg)


@register_function("down")
def _down(args, kwds):
    """physarray.py:341-352."""
    a = _one(args, kwds, "down")
    if a.positive == "up":
        return Compiled(col=-a.col, unit=a.unit, positive="down", is_agg=a.is_agg)
    return Compiled(col=a.col, unit=a.unit, positive="down", is_agg=a.is_agg)


@register_function("chdims")
def _chdims(args, kwds):
    """functions.py:568-580: rename a variable's dimensions.  In the
    relational recast a column has no embedded axes — dimensions are
    the frame's key columns, renamed at frame level
    (withColumnRenamed) — so chdims is an identity on the value and
    its metadata; the dim-name arguments are accepted and ignored."""
    if not args or not isinstance(args[0], Compiled):
        raise DefinitionError("chdims(x, ...) needs an expression first")
    return args[0]


@register_function("masked_invalid")
def _masked_invalid(args, kwds):
    """commonfunctions.py:841-859: NaN/Inf -> NULL."""
    a = _one(args, kwds, "masked_invalid")
    col = F.when(
        F.isnan(a.col) | (F.abs(a.col) == float("inf")), F.lit(None)
    ).otherwise(a.col)
    return Compiled(col=col, unit=a.unit, positive=a.positive, is_agg=a.is_agg)


@register_function("where")
def _where(args, kwds):
    """cice_where analog (commonfunctions.py:903-935):
    where(cond, a, b)."""
    if len(args) != 3 or not all(isinstance(x, Compiled) for x in args):
        raise DefinitionError("where(cond, a, b) takes three expressions")
    cond, a, b = args
    target = a.unit if a.unit is not None else b.unit
    a2, b2 = _convert_to(a, target), _convert_to(b, target)
    return Compiled(
        col=F.when(cond.col, a2.col).otherwise(b2.col),
        unit=target,
        is_agg=a.is_agg or b.is_agg or cond.is_agg,
    )


def _agg(args, kwds, key, make) -> Compiled:
    a = _one(args, kwds, key)
    if a.is_agg:
        raise DefinitionError(f"{key}: nested aggregates are not allowed")
    return Compiled(col=make(a), unit=a.unit, is_agg=True)


# Decimal-exact sums (order-independent) — the repo-wide determinism
# convention (queries.py module docstring), so definition aggregates
# hash-match DuckDB oracles bit for bit.
@register_function("sum")
def _sum(args, kwds):
    return _agg(args, kwds, "sum",
                lambda a: F.sum(a.col.cast("decimal(20,6)")).cast("double"))


@register_function("mean")
def _mean(args, kwds):
    """zonalmean/mean analog (functions.py:310-330): over the groupBy
    keys of evaluate_agg_defs rather than named dimensions.  try_divide
    so an all-NULL group yields NULL instead of an ANSI
    divide-by-zero."""
    return _agg(
        args, kwds, "mean",
        lambda a: F.try_divide(
            F.sum(a.col.cast("decimal(20,6)")).cast("double"), F.count(a.col)
        ),
    )


@register_function("min")
def _min(args, kwds):
    return _agg(args, kwds, "min", lambda a: F.min(a.col))


@register_function("max")
def _max(args, kwds):
    return _agg(args, kwds, "max", lambda a: F.max(a.col))


@register_function("count")
def _count(args, kwds):
    a = _one(args, kwds, "count")
    if a.is_agg:
        raise DefinitionError("count: nested aggregates are not allowed")
    return Compiled(col=F.count(a.col).cast("long"), is_agg=True)


# ------------------------------------------- window-function registry
# Functions whose value depends on NEIGHBORING rows along an ordered
# coordinate (the reference implements them as array-slice arithmetic
# over a named dimension).  Key -> callable(args, kwds, window_keys)
# -> Compiled.  They compile to Catalyst window expressions over
# (partitionBy window_keys, orderBy coordinate) — letting the
# reference's own spec files (e.g. CESM create_bounds) run end to end.
WINDOW_FUNCTIONS: dict[str, Callable] = {}


def register_window_function(key: str):
    def deco(fn):
        WINDOW_FUNCTIONS[key] = fn
        return fn
    return deco


def _const_kwd(kwds, key, default):
    v = kwds.get(key)
    if v is None:
        return default
    if isinstance(v, str):
        return v
    if not v.is_const:
        raise DefinitionError(f"bounds: {key}= must be a constant")
    return v.const


@register_window_function("ewma")
def _ewma_window(args, kwds, window_keys):
    """Dyadic EWMA smoother as a definition-surface window function:
    ``ewma(v, t)`` smooths v along the t order with alpha = 1/2 over
    the last ``span=`` samples (default 16) — the same exact integer
    construction as queries.ewma_smooth (weights 2^(span-1-k), one
    final division), so a spec author gets the engine's bit-stable
    smoother from a definition string."""
    from pyspark.sql import Window

    if len(args) != 2:
        raise DefinitionError("ewma(v, t, span=) takes value and order args")
    v, t = args
    span = int(_const_kwd(kwds, "span", 16))
    # overflow-free bound, NOT 62: the weighted sum peaks at
    # |vq| * (2^span - 1) and Spark's non-ANSI int64 wraps silently.
    # With centi-quantized values (|value| <= ~8.4e4 => |vq| <= 2^23)
    # span = 40 keeps the sum under 2^63 and norm * 100 under 2^63
    # too; beyond that the smoother would return garbage, so refuse.
    if not 1 <= span <= 40:
        raise DefinitionError(
            "ewma: span must be in [1, 40] (int64-overflow-free range "
            "for centi-quantized values up to |8.4e4|)"
        )
    w = Window.partitionBy(*window_keys).orderBy(t.col)
    vq = F.floor(v.col.cast("double") * 100).cast("long")
    terms = []
    for k in range(span):
        weight = 1 << (span - 1 - k)
        lagged = F.lag(vq, k).over(w) if k else vq
        terms.append(F.coalesce(lagged * F.lit(weight), F.lit(0)))
    s_scaled = terms[0]
    for term in terms[1:]:
        s_scaled = s_scaled + term
    m = F.least(F.row_number().over(w), F.lit(span))
    # norm = 2^span - 2^(span-m); pow(2, k) is exact in float64 for
    # k <= 62, so the cast back to long is lossless
    norm = F.lit(1 << span) - F.pow(F.lit(2.0), (F.lit(span) - m)).cast("long")
    return Compiled(col=s_scaled / (norm * F.lit(100)).cast("double"))


@register_window_function("zscore")
def _zscore_window(args, kwds, window_keys):
    """Rolling z-score as a definition-surface window function:
    ``zscore(v, t)`` scores v against the trailing ``window=`` samples
    (default 20) along the t order — the queries.anomaly_zscore
    construction (integer moments, one sqrt, single divisions)."""
    from pyspark.sql import Window

    if len(args) != 2:
        raise DefinitionError("zscore(v, t, window=) takes value and order args")
    v, t = args
    win = int(_const_kwd(kwds, "window", 20))
    if win < 2:
        raise DefinitionError("zscore: window must be >= 2")
    w = (
        Window.partitionBy(*window_keys)
        .orderBy(t.col)
        .rowsBetween(-(win - 1), 0)
    )
    vq = F.floor(v.col.cast("double") * 100).cast("long")
    n = F.count(F.lit(1)).over(w)
    sm = F.sum(vq).over(w)
    q = F.sum(vq * vq).over(w)
    num = n * vq - sm
    varnum = n * (n * q - sm * sm)
    den = F.sqrt(varnum / (n - 1))
    return Compiled(
        col=F.when(((n - 1) > 0) & (varnum > 0), num / den)
    )


@register_window_function("bounds")
def _bounds_window(args, kwds, window_keys):
    """The reference's ``bounds`` (commonfunctions.py:256-341,
    computed-idata branch) as a window expression: cell bounds from the
    coordinate argument's neighbors, emitted as the 2-element array
    the bnds dimension becomes in long form.  ``bdim=`` (the bounds
    dimension NAME) is accepted and ignored — array position encodes
    it.  The interface-data branch needs positional alignment of a
    second table and lives in ``operators/stencil.bounds_from_
    interfaces``, outside the row-wise definition surface."""
    from pyspark.sql import Window

    if len(args) != 1 or not isinstance(args[0], Compiled):
        raise DefinitionError("bounds(x, ...) takes one expression argument")
    if "idata" in kwds:
        raise DefinitionError(
            "bounds: interface data (idata=) is table-shaped; use "
            "operators.stencil.bounds_from_interfaces"
        )
    a = args[0]
    location = int(_const_kwd(kwds, "location", 1))
    endpoints = bool(_const_kwd(kwds, "endpoints", 1))
    _const_kwd(kwds, "bdim", "bnds")  # validated, positionally encoded
    if location not in (0, 1, 2):
        raise DefinitionError("bounds: location must be 0, 1, or 2")
    w = Window.partitionBy(*window_keys).orderBy(a.col)
    c = a.col.cast("double")
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
    else:
        lo_end = c - (nxt - c) if endpoints else c
        lower = F.when(prev.isNull(), lo_end).otherwise(prev)
        upper = c
    return Compiled(
        col=F.array(lower, upper), unit=a.unit, positive=a.positive
    )


# ------------------------------------------------------------ entry points
def _split_def(d: str) -> tuple[str, str]:
    """'name = expr' -> (name, expr); '=' inside '==' is not a split
    point."""
    m = re.match(r"^\s*([a-zA-Z_][a-zA-Z0-9_]*)\s*=(?!=)\s*(.+)$", d)
    if m is None:
        raise DefinitionError(
            f"definition must look like 'name = expression': {d!r}"
        )
    return m.group(1), m.group(2)


def _normalize(defs) -> list[tuple[str, str]]:
    if isinstance(defs, dict):
        return list(defs.items())
    return [_split_def(d) for d in defs]


def _context_from(df: DataFrame) -> dict[str, Compiled]:
    ctx = {}
    for fld in df.schema.fields:
        meta = fld.metadata or {}
        unit = meta.get(U.UNITS_KEY)
        ctx[fld.name] = Compiled(
            col=F.col(fld.name),
            unit=None if unit is None else U.parse_unit(unit),
            positive=meta.get(U.POSITIVE_KEY),
        )
    return ctx


def _attach_meta(df: DataFrame, name: str, c: Compiled) -> DataFrame:
    """Set (or explicitly clear) units/positive metadata: a bare column
    reference propagates its source metadata through withColumn, so
    rmunits must actively remove the key, not just skip writing it."""
    meta = dict(df.schema[name].metadata or {})
    if c.unit is not None:
        meta[U.UNITS_KEY] = c.unit.name
    else:
        meta.pop(U.UNITS_KEY, None)
    if c.positive is not None:
        meta[U.POSITIVE_KEY] = c.positive
    else:
        meta.pop(U.POSITIVE_KEY, None)
    return df.withMetadata(name, meta)


def compile_defs(
    df: DataFrame, defs, window_keys: tuple[str, ...] = ()
) -> list[tuple[str, Compiled]]:
    """Parse + compile definitions against df's schema; later
    definitions see earlier ones (DataFlow dependency order,
    dataflow.py:124-164).  All checking happens here — before any
    action runs.  ``window_keys`` partitions window-shaped functions
    (``bounds``); empty = one global series."""
    ctx = _context_from(df)
    compiler = Compiler(ctx, df.schema, window_keys=window_keys)
    out = []
    for name, text in _normalize(defs):
        ast = parse_definition(text)
        c = compiler.compile(ast)
        ctx[name] = c
        out.append((name, c))
    return out


def evaluate_defs(
    df: DataFrame, defs, keep_inputs: bool = True,
    window_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Evaluate row-wise definitions: one ``withColumn`` chain, all
    JVM expressions.  ``defs`` is a dict {name: expr} or a list of
    'name = expr' strings.

    A definition named exactly like an input column REDEFINES it (the
    reference's output-shadows-input behavior); a name that collides
    only case-insensitively is refused — Spark's default resolver
    would silently replace the input column mid-chain (the bug the
    reference calculator spec exposed in specs.apply_spec)."""
    compiled = compile_defs(df, defs, window_keys=window_keys)
    lower_inputs = {c.lower(): c for c in df.columns}
    for name, _ in compiled:
        existing = lower_inputs.get(name.lower())
        if existing is not None and existing != name:
            raise DefinitionError(
                f"definition {name!r} collides case-insensitively with "
                f"input column {existing!r}: Spark's resolver would "
                "silently replace the input; rename the output"
            )
    out = df
    for name, c in compiled:
        if c.is_agg:
            raise DefinitionError(
                f"{name}: aggregate definitions need evaluate_agg_defs"
            )
        for sname, scol in c.stages:
            out = out.withColumn(sname, scol)
        out = out.withColumn(name, c.col)
        if c.stages:
            out = out.drop(*[sname for sname, _ in c.stages])
        out = _attach_meta(out, name, c)
    if not keep_inputs:
        out = out.select(*[n for n, _ in compiled])
    return out


def evaluate_agg_defs(
    df: DataFrame, keys: list[str], defs
) -> DataFrame:
    """Evaluate aggregate definitions over ``groupBy(keys)`` — the
    reduction half of the reference's function set (mean/sum/min/max,
    functions.py:310-436) where the reference's 'dimensions' argument
    becomes the grouping key set."""
    compiled = compile_defs(df, defs)
    aggs = []
    for name, c in compiled:
        if not c.is_agg:
            raise DefinitionError(
                f"{name}: row-wise definition in aggregate context; "
                "use evaluate_defs"
            )
        aggs.append(c.col.alias(name))
    out = df.groupBy(*keys).agg(*aggs)
    for name, c in compiled:
        out = _attach_meta(out, name, c)
    return out


@register_window_function("delta")
def _delta_window(args, kwds, window_keys):
    """``delta(v, t)``: change of v since the series' previous sample
    along the t order (PromQL delta; the reference's deriv numerator,
    commonfunctions.py deriv wrappers).  Centi-unit quantization keeps
    the difference an exact integer; one final division by 100."""
    from pyspark.sql import Window

    if len(args) != 2:
        raise DefinitionError("delta(v, t) takes value and order args")
    v, t = args
    w = Window.partitionBy(*window_keys).orderBy(t.col)
    vq = F.floor(v.col.cast("double") * 100).cast("long")
    d = vq - F.lag(vq).over(w)
    return Compiled(col=d.cast("double") / F.lit(100.0))


@register_window_function("irate")
def _irate_window(args, kwds, window_keys):
    """``irate(v, t)``: instantaneous per-second rate of change between
    the series' last two samples (PromQL irate).  Exact integer
    centi-delta and micro-delta, composed into ONE division:
    (dv/100)/(dt/1e6) = dv*10000/dt."""
    from pyspark.sql import Window

    if len(args) != 2:
        raise DefinitionError("irate(v, t) takes value and order args")
    v, t = args
    w = Window.partitionBy(*window_keys).orderBy(t.col)
    vq = F.floor(v.col.cast("double") * 100).cast("long")
    us = F.unix_micros(t.col.cast("timestamp"))
    dv = vq - F.lag(vq).over(w)
    dt = us - F.lag(us).over(w)
    return Compiled(
        col=F.try_divide((dv * F.lit(10000)).cast("double"), dt.cast("double"))
    )


_STAGE_IDS = itertools.count()


def _counter_inc(vq, w):
    """Reset-aware per-sample increment (queries.counter_rate's reset
    logic): a drop means the counter reset and the post-reset value IS
    the increase; a series' first sample contributes zero."""
    prev = F.lag(vq).over(w)
    return (
        F.when(prev.isNull(), F.lit(0).cast("long"))
        .when(vq >= prev, vq - prev)
        .otherwise(vq)
    )


def _range_window_args(args, kwds, window_keys, fn):
    from pyspark.sql import Window

    if len(args) != 2:
        raise DefinitionError(f"{fn}(v, t, window=) takes value and order args")
    v, t = args
    win = int(_const_kwd(kwds, "window", 20))
    if win < 1:
        raise DefinitionError(f"{fn}: window must be >= 1")
    w = Window.partitionBy(*window_keys).orderBy(t.col)
    vq = F.floor(v.col.cast("double") * 100).cast("long")
    return v, t, win, w, vq


@register_window_function("increase")
def _increase_window(args, kwds, window_keys):
    """``increase(v, t, window=N)``: counter-reset-aware total increase
    over the trailing N samples (PromQL ``increase`` pinned to a row
    frame; reset logic = queries.counter_rate).  Two-stage compile:
    the per-sample increment (one lag) is STAGED as an internal
    column, then summed over the trailing frame — both windows share
    one (keys, t) sort (plan-gated in tests/test_plans.py)."""
    _, t, win, w, vq = _range_window_args(args, kwds, window_keys, "increase")
    sname = f"__increase_stage{next(_STAGE_IDS)}"
    wf = w.rowsBetween(-(win - 1), 0)
    total = F.sum(F.col(sname)).over(wf)
    return Compiled(
        col=total.cast("double") / F.lit(100.0),
        stages=((sname, _counter_inc(vq, w)),),
    )


@register_window_function("rate")
def _rate_window(args, kwds, window_keys):
    """``rate(v, t, window=N)``: counter-reset-aware per-second rate
    over the trailing N samples (PromQL ``rate`` pinned to a row
    frame): staged increments summed over the frame, divided by the
    frame's ACTUAL time span.  Exact: integer centi-increase and
    micro-span composed into ONE division, (inc/100)/(dt/1e6) =
    inc*10000/dt; NULL when the frame holds a single sample (PromQL
    needs two points for a rate)."""
    _, t, win, w, vq = _range_window_args(args, kwds, window_keys, "rate")
    us = F.unix_micros(t.col.cast("timestamp"))
    sname = f"__rate_stage{next(_STAGE_IDS)}"
    wf = w.rowsBetween(-(win - 1), 0)
    total = F.sum(F.col(sname)).over(wf)
    dt = us - F.min(us).over(wf)
    return Compiled(
        col=F.try_divide((total * F.lit(10000)).cast("double"), dt.cast("double")),
        stages=((sname, _counter_inc(vq, w)),),
    )


@register_window_function("changes")
def _changes_window(args, kwds, window_keys):
    """``changes(v, t, window=N)``: number of times the value CHANGED
    among the trailing N samples (PromQL ``changes``; counts any
    difference, unlike ``resets`` which counts drops).  The staged
    per-sample change flag rides the shared sort, exact on
    centi-quantized integers."""
    _, t, win, w, vq = _range_window_args(args, kwds, window_keys, "changes")
    prev = F.lag(vq).over(w)
    flag = (
        F.when(prev.isNotNull() & (vq != prev), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
    )
    sname = f"__changes_stage{next(_STAGE_IDS)}"
    wf = w.rowsBetween(-(win - 1), 0)
    return Compiled(
        col=F.sum(F.col(sname)).over(wf).cast("long"),
        stages=((sname, flag),),
    )


def _make_over_time(key: str):
    """Factory for the trivial *_over_time frame aggregates — exact by
    construction (min/max are picks, sum is an integer sum, avg is ONE
    division of exactly-agreed integers)."""

    def _fn(args, kwds, window_keys):
        _, t, win, w, vq = _range_window_args(args, kwds, window_keys, key)
        wf = w.rowsBetween(-(win - 1), 0)
        if key == "min_over":
            out = F.min(vq).over(wf).cast("double") / F.lit(100.0)
        elif key == "max_over":
            out = F.max(vq).over(wf).cast("double") / F.lit(100.0)
        elif key == "sum_over":
            out = F.sum(vq).over(wf).cast("double") / F.lit(100.0)
        else:  # avg_over: one division of exact integers
            out = F.try_divide(
                F.sum(vq).over(wf).cast("double"),
                (F.count(F.lit(1)).over(wf) * F.lit(100)).cast("double"),
            )
        _fn_doc = None  # noqa: F841
        return Compiled(col=out)

    _fn.__doc__ = (
        f"``{key}(v, t, window=N)``: PromQL {key}_time over the "
        "trailing N samples on centi-quantized integers."
    )
    return _fn


for _k in ("min_over", "max_over", "sum_over", "avg_over"):
    register_window_function(_k)(_make_over_time(_k))


def _lsq_anchored(args, kwds, window_keys, fn):
    """Shared least-squares staging for slope/predict_linear: frame
    sums over DECIMAL(38,0) (exact 128-bit, matching DuckDB HUGEINT),
    then every derived statistic RE-ANCHORED to the frame's earliest
    timestamp (x′ = x − min x, an exact integer shift: Σx′ = Σx − n·a,
    Σx′² = Σx² − 2aΣx + na², Σx′y = Σxy − aΣy) and cast down to
    BIGINT.  Why: the regression terms D = nΣx′² − (Σx′)² and
    M = nΣx′y − Σx′Σy are shift-invariant, and int64→double is
    correctly rounded (one rounding) in BOTH engines while DuckDB's
    int128→double is not (upper·2⁶⁴ + lower, two roundings) — raw
    epoch-second sums push D past 2⁵³ where that second rounding
    costs 1 ulp.  The BIGINT casts are exact while
    window·time-span ≲ 3·10⁹ sec·rows (ANSI overflow is the canary).
    Returns (n, sy, D, M, x0m) as int64-exact columns, x0m = x − a."""
    _, t, win, w, vq = _range_window_args(args, kwds, window_keys, fn)
    wf = w.rowsBetween(-(win - 1), 0)
    xd = (
        (F.unix_micros(t.col.cast("timestamp")) / F.lit(1_000_000))
        .cast("long")
        .cast("decimal(20,0)")
    )
    vqd = vq.cast("decimal(20,0)")
    n = F.count(F.lit(1)).over(wf).cast("decimal(20,0)")
    a = F.min(xd).over(wf)
    sx = F.sum(xd).over(wf) - n * a
    sy = F.sum(vqd).over(wf)
    sxy = F.sum(xd * vqd).over(wf) - a * F.sum(vqd).over(wf)
    sxx = (
        F.sum(xd * xd).over(wf)
        - F.lit(2).cast("decimal(20,0)") * a * F.sum(xd).over(wf)
        + n * a * a
    )
    dd = (n * sxx - sx * sx).cast("long")
    mm = (n * sxy - sx * sy).cast("long")
    return (
        n.cast("long"),
        sy.cast("long"),
        dd,
        mm,
        (xd - a).cast("long"),
        sx.cast("long"),
    )


@register_window_function("slope")
def _slope_window(args, kwds, window_keys):
    """``slope(v, t, window=N)``: least-squares per-second trend of
    the trailing N samples (PromQL ``deriv``).  EXACT cross-engine via
    the anchored int64 staging in ``_lsq_anchored`` — slope = M/(D·100)
    with M, D int64-exact integers, so the casts and the single
    division are bit-identical in Spark and DuckDB.  NULL on a
    single-sample or zero-time-spread window.  Scale note: five frame
    sums over the shared (keys, t) sort — no second pass, no floats
    until the final division."""
    _, _, dd, mm, _, _ = _lsq_anchored(args, kwds, window_keys, "slope")
    return Compiled(
        col=F.try_divide(
            mm.cast("double"), dd.cast("double") * F.lit(100.0)
        )
    )


@register_window_function("predict_linear")
def _predict_linear_window(args, kwds, window_keys):
    """``predict_linear(v, t, window=N, horizon=S)``: the value the
    trailing-N least-squares line reaches S seconds after the current
    sample (PromQL ``predict_linear`` pinned to a row frame).  With
    the anchored int64 statistics from ``_lsq_anchored`` the closed
    form

        predict = (Σy·D + M·(n·(x′+S) − Σx′)) / (n·D·100)

    is evaluated in doubles with a PINNED operation order on
    correctly-rounded int64 inputs — bit-identical cross-engine even
    where the products exceed 2⁵³ (both engines round the same IEEE
    ops the same way).  NULL on a single-sample or zero-time-spread
    window (0/0 → try_divide).  Scale note: same single window sort
    and frame-sum pass as slope."""
    horizon = int(_const_kwd(kwds, "horizon", 300))
    n, sy, dd, mm, x0m, sx = _lsq_anchored(
        args, kwds, window_keys, "predict_linear"
    )
    nx0sx = (n * (x0m + F.lit(horizon)) - sx).cast("double")
    num = sy.cast("double") * dd.cast("double") + mm.cast("double") * nx0sx
    den = n.cast("double") * dd.cast("double") * F.lit(100.0)
    return Compiled(col=F.try_divide(num, den))


@register_window_function("quantile")
def _quantile_window(args, kwds, window_keys):
    """``quantile(v, t, q=50, window=N)``: discrete (type-1) quantile
    of the trailing N samples (PromQL ``quantile_over_time``; the
    reference exposes no order statistics — this is the monitoring-
    surface extension).  EXACT cross-engine: centi-quantized values
    are collected over the row frame, sorted, and the element at
    integer rank ceil(q·n/100) is picked — no interpolation, one
    final division by 100.  Scale note: the collected frame is at most
    N elements per row; the projection rides the shared (keys, t)
    window sort like every other range function."""
    _, t, win, w, vq = _range_window_args(args, kwds, window_keys, "quantile")
    q = int(_const_kwd(kwds, "q", 50))
    if not 1 <= q <= 100:
        raise DefinitionError("quantile: q must be in [1, 100]")
    wf = w.rowsBetween(-(win - 1), 0)
    arr = F.array_sort(F.collect_list(vq).over(wf))
    n = F.size(arr)
    rank = ((F.lit(q) * n + F.lit(99)) / F.lit(100)).cast("int")
    return Compiled(
        col=F.element_at(arr, rank).cast("double") / F.lit(100.0)
    )


@register_window_function("resets")
def _resets_window(args, kwds, window_keys):
    """``resets(v, t, window=N)``: number of counter resets (value
    drops) among the trailing N samples (PromQL ``resets`` on a row
    frame).  The staged per-sample reset flag rides the same sort as
    the frame sum."""
    _, t, win, w, vq = _range_window_args(args, kwds, window_keys, "resets")
    prev = F.lag(vq).over(w)
    flag = F.when(prev.isNotNull() & (vq < prev), F.lit(1)).otherwise(
        F.lit(0)
    ).cast("long")
    sname = f"__resets_stage{next(_STAGE_IDS)}"
    wf = w.rowsBetween(-(win - 1), 0)
    return Compiled(
        col=F.sum(F.col(sname)).over(wf).cast("long"),
        stages=((sname, flag),),
    )


def _register_over_time(key: str, make):
    """Shared shape for the PromQL ``*_over_time`` aggregates: one
    trailing-N-row frame over the (keys, t) sort; every member rides
    the SAME window sort as rate/increase/changes, and every value is
    computed on centi-quantized integers with at most ONE final
    division back to the value domain."""

    @register_window_function(key)
    def _fn(args, kwds, window_keys, _make=make, _key=key):
        _, t, win, w, vq = _range_window_args(args, kwds, window_keys, _key)
        wf = w.rowsBetween(-(win - 1), 0)
        return Compiled(col=_make(vq, wf))

    _fn.__doc__ = (
        f"``{key}(v, t, window=N)``: PromQL {key} pinned to a "
        "trailing N-row frame on the shared series sort."
    )
    return _fn


_register_over_time(
    "min_over_time", lambda vq, wf: F.min(vq).over(wf).cast("double") / 100.0
)
_register_over_time(
    "max_over_time", lambda vq, wf: F.max(vq).over(wf).cast("double") / 100.0
)
_register_over_time(
    "sum_over_time", lambda vq, wf: F.sum(vq).over(wf).cast("double") / 100.0
)
_register_over_time(
    "count_over_time",
    lambda vq, wf: F.count(vq).over(wf).cast("long"),
)
_register_over_time(
    "avg_over_time",
    # exact: one division of two exact integers (centi-sum, 100*n)
    lambda vq, wf: F.try_divide(
        F.sum(vq).over(wf).cast("double"),
        (F.count(vq).over(wf) * F.lit(100)).cast("double"),
    ),
)
