r"""Compile pandas-eval-dialect boolean expressions into Spark ``Column`` trees.

The reference evaluates ConsistencyRule expressions with ``pd.DataFrame.eval``
per partition (rules/utils/rules_utils.py:120-147); our engine instead parses
the same dialect ONCE on the driver into a Catalyst ``Column`` expression, so
execution stays inside whole-stage codegen with no Python in the hot path.

Supported dialect (superset of everything the reference test corpus uses,
tests/data/consistency.yaml + docs/python-pyspark.md:265):

- backticked column refs  ``\`a\` < \`b\```  (bare names also resolve)
- comparisons  == != < <= > >=, chained comparisons, ``in`` / ``not in``
- boolean algebra  & | ~  and the keywords ``and`` / ``or`` / ``not``
- arithmetic  + - * / // % **  and unary minus
- ``abs(x)``
- pandas accessors, translated to native Spark functions:
  ``.notnull() .isnull() .isna() .notna() .fillna(v) .isin([...])``
  ``.str.match(p)``      -> rlike('^(?:p)')   (re.match anchors at start)
  ``.str.fullmatch(p)``  -> rlike('^(?:p)$')
  ``.str.contains(p)``   -> rlike(p)          (re.search semantics)
  ``.str.startswith(s) .str.endswith(s) .str.len() .str.lower() .str.upper() .str.strip()``
  ``.dt.year .dt.month .dt.day .dt.hour .dt.minute .dt.second .dt.date
  .dt.dayofweek .dt.dayofyear .dt.quarter``

NULL semantics: Spark three-valued logic matches pandas nullable-boolean
masks here — comparisons with NULL yield NULL, which the engine later
coalesces to False exactly like the reference's ``mask.fillna(False)``
(rules/base.py:406-412).
"""

from __future__ import annotations

import ast
import re
from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from gchq_data_quality_spark.errors import DQFunctionError

_BACKTICK_RE = re.compile(r"`([^`]+)`")


def extract_backticked_fields(expression: str) -> list[str]:
    """All substrings wrapped in backticks, in order of appearance."""
    return _BACKTICK_RE.findall(expression)


def extract_columns_from_expression(
    expression: str, df_columns: list[str] | None = None
) -> list[str]:
    """Unique backticked column names in an expression.

    Raises if none are present, or (when ``df_columns`` is given) if any
    extracted column is missing from it
    (parity: rules/utils/rules_utils.py:163-189, corpus
    tests/data/extract_columns_from_expression.yaml).
    """
    columns = set(extract_backticked_fields(expression))
    if not columns:
        raise ValueError(
            f"No columns found in expression: {expression!r} - are you using "
            "backticks (`) around your column names?"
        )
    if df_columns is not None:
        missing = sorted(columns - set(df_columns))
        if missing:
            raise ValueError(
                f"Column(s) {missing} from expression {expression!r} not found "
                f"in DataFrame columns: {df_columns}"
            )
    return sorted(columns)


def spark_safe_expression(expression: str | dict) -> str | dict:
    """Rewrite every backticked nested path to its flat spark-safe name
    (parity: reference get_spark_safe_expression, spark/utils/rules_utils.py,
    golden cases tests/data/consistency_expressions.yaml — ``a[*].b`` ->
    ``a_all_b``, ``a[].b`` -> ``a_first_b``, dots -> underscores).

    The engine itself resolves nested paths through the flatten mapping
    (engine.py resolver closure) and never needs the textual rewrite; this is
    API parity for callers that pre-flatten their own frames.
    """
    from gchq_data_quality_spark.plans.flatten import safe_name

    if isinstance(expression, dict):
        return {key: spark_safe_expression(value) for key, value in expression.items()}
    return _BACKTICK_RE.sub(lambda m: f"`{safe_name(m.group(1))}`", expression)


_DT_ACCESSORS = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "date": lambda c: c.cast("date"),
    # pandas dt.dayofweek: Monday=0..Sunday=6. F.weekday matches exactly;
    # F.dayofweek(c)-2 would map Sunday (Spark 1) to -1, not 6.
    "dayofweek": F.weekday,
    "dayofyear": F.dayofyear,
    "quarter": F.quarter,
}

_CMP_OPS = {
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
}

_BIN_OPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Mod: lambda a, b: a % b,
    ast.Pow: lambda a, b: a**b,
    ast.FloorDiv: lambda a, b: F.floor(a / b),
    ast.BitAnd: lambda a, b: a & b,
    ast.BitOr: lambda a, b: a | b,
    ast.BitXor: lambda a, b: (a | b) & ~(a & b),
}


def _anchor_start(pattern: str) -> str:
    return f"^(?:{pattern})"


class _Translator(ast.NodeVisitor):
    def __init__(self, resolver: Callable[[str], Column], placeholder_map: dict[str, str]):
        self._resolve = resolver
        self._placeholders = placeholder_map

    # -- leaves -----------------------------------------------------------
    def visit_Name(self, node: ast.Name) -> Column:
        name = self._placeholders.get(node.id, node.id)
        return self._resolve(name)

    def visit_Constant(self, node: ast.Constant) -> Column:
        return F.lit(node.value)

    # -- operators --------------------------------------------------------
    def visit_BoolOp(self, node: ast.BoolOp) -> Column:
        parts = [self.visit(v) for v in node.values]
        if isinstance(node.op, ast.And):
            return reduce(lambda a, b: a & b, parts)
        return reduce(lambda a, b: a | b, parts)

    def visit_BinOp(self, node: ast.BinOp) -> Column:
        op = _BIN_OPS.get(type(node.op))
        if op is None:
            raise DQFunctionError(f"Unsupported operator: {ast.dump(node.op)}")
        return op(self.visit(node.left), self.visit(node.right))

    def visit_UnaryOp(self, node: ast.UnaryOp) -> Column:
        operand = self.visit(node.operand)
        if isinstance(node.op, (ast.Invert, ast.Not)):
            return ~operand
        if isinstance(node.op, ast.USub):
            return -operand
        if isinstance(node.op, ast.UAdd):
            return operand
        raise DQFunctionError(f"Unsupported unary op: {ast.dump(node.op)}")

    def visit_Compare(self, node: ast.Compare) -> Column:
        left = self.visit(node.left)
        result = None
        for op, comparator in zip(node.ops, node.comparators, strict=True):
            if isinstance(op, (ast.In, ast.NotIn)):
                values = self._literal_list(comparator)
                part = left.isin(values)
                if isinstance(op, ast.NotIn):
                    part = ~part
            else:
                fn = _CMP_OPS.get(type(op))
                if fn is None:
                    raise DQFunctionError(f"Unsupported comparison: {ast.dump(op)}")
                right = self.visit(comparator)
                part = fn(left, right)
                left = right
            result = part if result is None else (result & part)
        return result

    # -- calls / accessors --------------------------------------------------
    def visit_Call(self, node: ast.Call) -> Column:
        if isinstance(node.func, ast.Name):
            if node.func.id == "abs":
                return F.abs(self.visit(node.args[0]))
            raise DQFunctionError(f"Unsupported function: {node.func.id}")

        if not isinstance(node.func, ast.Attribute):
            raise DQFunctionError(f"Unsupported call target: {ast.dump(node.func)}")

        method = node.func.attr
        target = node.func.value

        # pandas .str.<method>(...)
        if isinstance(target, ast.Attribute) and target.attr == "str":
            col = self.visit(target.value).cast("string")
            return self._str_method(col, method, node.args)

        col = self.visit(target)
        if method in ("notnull", "notna"):
            return col.isNotNull()
        if method in ("isnull", "isna"):
            return col.isNull()
        if method == "fillna":
            return F.coalesce(col, self.visit(node.args[0]))
        if method == "isin":
            return col.isin(self._literal_list(node.args[0]))
        if method == "astype":
            dtype = node.args[0]
            kind = dtype.value if isinstance(dtype, ast.Constant) else None
            mapping = {"str": "string", "int": "long", "float": "double", "bool": "boolean"}
            return col.cast(mapping.get(kind, kind or "string"))
        raise DQFunctionError(f"Unsupported method: .{method}()")

    def _str_method(self, col: Column, method: str, args: list[ast.expr]) -> Column:
        def arg0() -> str:
            if not args or not isinstance(args[0], ast.Constant):
                raise DQFunctionError(f".str.{method}() needs a literal argument")
            return args[0].value

        if method == "match":
            return col.rlike(_anchor_start(arg0()))
        if method == "fullmatch":
            return col.rlike(f"^(?:{arg0()})$")
        if method == "contains":
            return col.rlike(arg0())
        if method == "startswith":
            return col.startswith(F.lit(arg0()))
        if method == "endswith":
            return col.endswith(F.lit(arg0()))
        if method == "len":
            return F.length(col)
        if method == "lower":
            return F.lower(col)
        if method == "upper":
            return F.upper(col)
        if method == "strip":
            return F.trim(col)
        raise DQFunctionError(f"Unsupported string method: .str.{method}()")

    def visit_Attribute(self, node: ast.Attribute) -> Column:
        # .dt.<accessor> (no call)
        target = node.value
        if isinstance(target, ast.Attribute) and target.attr == "dt":
            col = self.visit(target.value)
            fn = _DT_ACCESSORS.get(node.attr)
            if fn is None:
                raise DQFunctionError(f"Unsupported datetime accessor: .dt.{node.attr}")
            return fn(col)
        raise DQFunctionError(f"Unsupported attribute: .{node.attr}")

    def _literal_list(self, node: ast.expr) -> list:
        if isinstance(node, (ast.List, ast.Tuple, ast.Set)):
            out = []
            for el in node.elts:
                if not isinstance(el, ast.Constant):
                    raise DQFunctionError("isin/in requires literal values")
                out.append(el.value)
            return out
        if isinstance(node, ast.Constant):
            return [node.value]
        raise DQFunctionError("isin/in requires a literal list")

    def generic_visit(self, node: ast.AST) -> Column:
        raise DQFunctionError(f"Unsupported expression node: {type(node).__name__}")


def _rebind_bitops(src: str) -> str:
    """pandas-eval precedence fix: the pandas parser gives ``& | ~`` the
    precedence of ``and or not`` (LOWER than comparisons), unlike Python.
    ``a >= 1 & b <= 10`` must mean ``(a >= 1) and (b <= 10)``. Rewrite the
    operator tokens (string literals are untouched — we go through the
    tokenizer, not a regex)."""
    import io
    import tokenize

    out = []
    mapping = {"&": "and", "|": "or", "~": "not"}
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type == tokenize.OP and tok.string in mapping:
                out.append((tokenize.NAME, mapping[tok.string]))
            else:
                out.append((tok.type, tok.string))
        return tokenize.untokenize(out)
    except tokenize.TokenizeError:  # let ast.parse report the syntax error
        return src


def compile_expression(expression: str, resolver: Callable[[str], Column]) -> Column:
    """Compile a pandas-eval dialect expression string to a Spark ``Column``.

    ``resolver`` maps a (possibly nested) column name to the prepared Column
    (na_values already replaced). Backticked names and bare identifiers both
    resolve through it.
    """
    placeholder_map: dict[str, str] = {}

    def _sub(match: re.Match) -> str:
        name = match.group(1)
        key = f"__bt_{len(placeholder_map)}__"
        placeholder_map[key] = name
        return key

    python_src = _rebind_bitops(_BACKTICK_RE.sub(_sub, expression))
    try:
        tree = ast.parse(python_src, mode="eval")
    except SyntaxError as e:
        raise DQFunctionError(f"Cannot parse expression {expression!r}: {e}") from e
    try:
        return _Translator(resolver, placeholder_map).visit(tree.body)
    except DQFunctionError:
        raise
    except Exception as e:  # pragma: no cover - defensive
        raise DQFunctionError(f"Error compiling expression {expression!r}: {e}") from e
