"""GQL scalar/aggregate function registry → pyspark.sql.functions.

Mirrors the reference registry (GraphLite `graphlite/src/functions/
mod.rs:39-259`, case-insensitive per mod.rs:263-265). Everything maps
to JVM-side built-ins — no Python UDFs in this module, so every
function stays inside whole-stage codegen.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Aggregates (functions/aggregate_functions.rs:22-430)

def _count(args, distinct):
    c = args[0]
    return F.count_distinct(c) if distinct else F.count(c)


def _sum(args, distinct):
    return F.sum_distinct(args[0]) if distinct else F.sum(args[0])


def _collect(args, distinct):
    return F.collect_set(args[0]) if distinct else F.collect_list(args[0])


AGGREGATES: dict[str, Callable] = {
    "COUNT": _count,
    "SUM": _sum,
    "AVG": lambda a, d: F.avg(a[0]),
    "AVERAGE": lambda a, d: F.avg(a[0]),
    "MIN": lambda a, d: F.min(a[0]),
    "MAX": lambda a, d: F.max(a[0]),
    "COLLECT": _collect,
    "COLLECT_LIST": _collect,
    "STDDEV": lambda a, d: F.stddev(a[0]),
    "STDDEV_POP": lambda a, d: F.stddev_pop(a[0]),
    "VARIANCE": lambda a, d: F.variance(a[0]),
    "VAR_POP": lambda a, d: F.var_pop(a[0]),
    "PERCENTILE": lambda a, d: F.percentile_approx(a[0], a[1]),
    # exact interpolated percentile / median (beyond-reference statistical
    # aggregates; single-pass partial aggregation, oracle-matched against
    # DuckDB quantile_cont/median)
    "PERCENTILE_CONT": lambda a, d: F.percentile(a[0], a[1]),
    "MEDIAN": lambda a, d: F.median(a[0]),
    "CORR": lambda a, d: F.corr(a[0], a[1]),
    "COVAR": lambda a, d: F.covar_samp(a[0], a[1]),
    "COVAR_POP": lambda a, d: F.covar_pop(a[0], a[1]),
    # HLL sketch count (approximate; rows-only check — not exactly
    # reproducible in the oracle)
    "APPROX_COUNT_DISTINCT": lambda a, d: F.approx_count_distinct(a[0]),
}

# ---------------------------------------------------------------------------
# Scalars


class UnknownFunction(ValueError):
    pass


def compile_function(name: str, args: list[Column], raw_args=None) -> Column:
    """args are compiled Columns; raw_args the AST nodes (for literal-only
    params such as EXTRACT field names)."""
    n = name.upper()
    f = _SCALARS.get(n)
    if f is None:
        raise UnknownFunction(f"unknown function {name}")
    return f(args, raw_args)


def _lit_int(node):
    from ..gql import ast as A

    if isinstance(node, A.Literal) and isinstance(node.value, int):
        return node.value
    raise ValueError("expected integer literal argument")


def _lit_str(node):
    from ..gql import ast as A

    if isinstance(node, A.Literal) and isinstance(node.value, str):
        return node.value
    raise ValueError("expected string literal argument")


def _list_join(a, raw):
    # Beyond-reference convenience (the reference has no list->string
    # builtin): LIST_JOIN(list, sep) casts each element to string and
    # joins. Delimiter must be a string literal (array_join is a JVM
    # builtin that takes a Python-side delimiter). Primary use: project
    # path variables in a canonicalizable scalar form.
    sep = _lit_str(raw[1]) if raw is not None and len(raw) > 1 else ","
    return F.array_join(F.transform(a[0], lambda x: x.cast("string")), sep)


def _extract(a, raw):
    from ..gql import ast as A

    field = raw[0].value if isinstance(raw[0], A.Literal) else None
    src = a[1]
    m = {
        "YEAR": F.year, "MONTH": F.month, "DAY": F.dayofmonth,
        "HOUR": F.hour, "MINUTE": F.minute, "SECOND": F.second,
        "DOW": F.dayofweek, "DOY": F.dayofyear, "WEEK": F.weekofyear,
        "QUARTER": F.quarter,
    }
    if field not in m:
        raise UnknownFunction(f"EXTRACT field {field}")
    return m[field](src).cast("long")


def _round(a, raw):
    if len(a) == 2:
        return F.round(a[0], _lit_int(raw[1]))
    return F.round(a[0])


def _log(a, raw):
    if len(a) == 2:
        return F.log(a[0]) / F.log(a[1])  # LOG(x, base)? reference: LOG(x)=ln
    return F.log(a[0])


_SCALARS: dict[str, Callable] = {
    # string (string_functions.rs)
    "UPPER": lambda a, r: F.upper(a[0]),
    "LOWER": lambda a, r: F.lower(a[0]),
    "TRIM": lambda a, r: F.trim(a[0]),
    "LTRIM": lambda a, r: F.ltrim(a[0]),
    "RTRIM": lambda a, r: F.rtrim(a[0]),
    "SUBSTRING": lambda a, r: F.substr(a[0], a[1], a[2]) if len(a) == 3 else F.substr(a[0], a[1]),
    "REPLACE": lambda a, r: F.replace(a[0], a[1], a[2]),
    "REVERSE": lambda a, r: F.reverse(a[0]),
    "LENGTH": lambda a, r: F.length(a[0]).cast("long"),
    "CHAR_LENGTH": lambda a, r: F.length(a[0]).cast("long"),
    "CONCAT": lambda a, r: F.concat(*[x.cast("string") for x in a]),
    "SPLIT": lambda a, r: F.split(a[0], a[1]),
    "LEFT": lambda a, r: F.substring(a[0], 1, _lit_int(r[1])),
    "RIGHT": lambda a, r: F.substr(a[0], -a[1].cast("int")),
    # numeric (mathematical_functions.rs / numeric_functions.rs)
    "ROUND": _round,
    "ABS": lambda a, r: F.abs(a[0]),
    "CEIL": lambda a, r: F.ceil(a[0]),
    "CEILING": lambda a, r: F.ceil(a[0]),
    "FLOOR": lambda a, r: F.floor(a[0]),
    "SQRT": lambda a, r: F.sqrt(a[0]),
    "POWER": lambda a, r: F.pow(a[0], a[1]),
    "POW": lambda a, r: F.pow(a[0], a[1]),
    "LOG": _log,
    "LOG10": lambda a, r: F.log10(a[0]),
    "LOG2": lambda a, r: F.log2(a[0]),
    "EXP": lambda a, r: F.exp(a[0]),
    "SIN": lambda a, r: F.sin(a[0]),
    "COS": lambda a, r: F.cos(a[0]),
    "TAN": lambda a, r: F.tan(a[0]),
    "ASIN": lambda a, r: F.asin(a[0]),
    "ACOS": lambda a, r: F.acos(a[0]),
    "ATAN": lambda a, r: F.atan(a[0]),
    "PI": lambda a, r: F.lit(3.141592653589793),
    "SIGN": lambda a, r: F.signum(a[0]),
    "MOD": lambda a, r: a[0] % a[1],
    # temporal (temporal_functions.rs)
    "DATETIME": lambda a, r: F.to_timestamp(a[0]),
    "DATE": lambda a, r: F.to_date(a[0]),
    "NOW": lambda a, r: F.current_timestamp(),
    "CURRENT_TIMESTAMP": lambda a, r: F.current_timestamp(),
    "CURRENT_DATE": lambda a, r: F.current_date(),
    # CURRENT_TIME as HH:mm:ss string — Spark has no standalone time type
    # (timezone_functions.rs CURRENT_TIME)
    "CURRENT_TIME": lambda a, r: F.date_format(F.current_timestamp(), "HH:mm:ss"),
    "EXTRACT": _extract,
    "DATE_ADD": lambda a, r: F.date_add(a[0], a[1].cast("int")),
    "DATE_SUB": lambda a, r: F.date_sub(a[0], a[1].cast("int")),
    "DATE_TRUNC": lambda a, r: F.date_trunc(r[0].value, a[1]),
    "YEAR": lambda a, r: F.year(a[0]).cast("long"),
    "MONTH": lambda a, r: F.month(a[0]).cast("long"),
    "DAY": lambda a, r: F.dayofmonth(a[0]).cast("long"),
    "TIME_WINDOW": lambda a, r: F.struct(a[0].alias("start"), a[1].alias("end")),
    # bitemporal Temporal wrapper (value.rs:19-62 TemporalValue): a value
    # plus valid-time bounds and transaction time, mapped to a struct
    # column. TEMPORAL(v, valid_from[, valid_to[, tx_time]]); omitted
    # valid_to = open interval, omitted tx_time = now.
    "TEMPORAL": lambda a, r: F.struct(
        a[0].alias("value"),
        a[1].cast("timestamp").alias("valid_from"),
        (a[2] if len(a) > 2 else F.lit(None)).cast("timestamp").alias("valid_to"),
        (a[3].cast("timestamp") if len(a) > 3 else F.current_timestamp()).alias(
            "transaction_time"
        ),
    ),
    "VALUE_OF": lambda a, r: a[0].getField("value"),
    "VALID_FROM": lambda a, r: a[0].getField("valid_from"),
    "VALID_TO": lambda a, r: a[0].getField("valid_to"),
    "TRANSACTION_TIME": lambda a, r: a[0].getField("transaction_time"),
    # is_valid_at (value.rs:53-55): from <= t < to, open-ended when to IS NULL
    "IS_VALID_AT": lambda a, r: (
        (a[1].cast("timestamp") >= a[0].getField("valid_from"))
        & (
            a[0].getField("valid_to").isNull()
            | (a[1].cast("timestamp") < a[0].getField("valid_to"))
        )
    ),
    # is_current (value.rs:58-60)
    "IS_CURRENT": lambda a, r: (
        a[0].getField("valid_to").isNull()
        | (a[0].getField("valid_to") > F.current_timestamp())
    ),
    "DURATION_NUMERIC": lambda a, r: (a[0].cast("double") - a[1].cast("double")) if len(a) == 2 else a[0].cast("double"),
    # DURATION('PT1H30M') -> seconds (ISO-8601 time durations; JVM regex)
    "DURATION": lambda a, r: (
        F.coalesce(F.regexp_extract(a[0], r"(\d+(?:\.\d+)?)H", 1).try_cast("double"), F.lit(0.0)) * 3600
        + F.coalesce(F.regexp_extract(a[0], r"(\d+(?:\.\d+)?)M", 1).try_cast("double"), F.lit(0.0)) * 60
        + F.coalesce(F.regexp_extract(a[0], r"(\d+(?:\.\d+)?)S", 1).try_cast("double"), F.lit(0.0))
    ),
    # timezone (timezone_functions.rs:752 set) — engine normalizes to UTC
    "AT_TIME_ZONE": lambda a, r: F.from_utc_timestamp(a[0], a[1]),
    "CONVERT_TZ": lambda a, r: F.to_utc_timestamp(F.from_utc_timestamp(a[0], a[2]), a[1]),
    "TIMEZONE": lambda a, r: F.lit("UTC"),
    "EXTRACT_TIMEZONE": lambda a, r: F.lit("UTC"),
    "GET_TIMEZONE_NAME": lambda a, r: a[0].cast("string"),
    "GET_TIMEZONE_ABBREVIATION": lambda a, r: a[0].cast("string"),
    "GET_TIMEZONE_OFFSET": lambda a, r: (
        (F.unix_timestamp(F.from_utc_timestamp(a[1], a[0].cast("string")))
         - F.unix_timestamp(a[1])) / F.lit(3600.0)
    ),
    # null handling (null_functions.rs)
    "COALESCE": lambda a, r: F.coalesce(*a),
    "NULLIF": lambda a, r: F.nullif(a[0], a[1]) if hasattr(F, "nullif") else F.when(a[0] == a[1], F.lit(None)).otherwise(a[0]),
    "IFNULL": lambda a, r: F.coalesce(a[0], a[1]),
    # list (list_functions.rs)
    "LIST_CONTAINS": lambda a, r: F.array_contains(a[0], a[1]),
    "LIST_SLICE": lambda a, r: F.slice(a[0], a[1], a[2]),
    "LIST_APPEND": lambda a, r: F.array_append(a[0], a[1]),
    "LIST_PREPEND": lambda a, r: F.array_prepend(a[0], a[1]),
    "LIST_LENGTH": lambda a, r: F.size(a[0]).cast("long"),
    "LIST_REVERSE": lambda a, r: F.reverse(a[0]),
    "LIST_SORT": lambda a, r: F.array_sort(a[0]),
    "LIST_JOIN": _list_join,
    "RANGE": lambda a, r: F.sequence(a[0].cast("long"), a[1].cast("long"), a[2].cast("long") if len(a) > 2 else F.lit(1).cast("long")),
    "SIZE": lambda a, r: F.when(a[0].isNull(), F.lit(None)).otherwise(
        F.coalesce(F.size(a[0]).cast("long"), F.length(a[0].cast("string")).cast("long"))
    ),
    # JSON (beyond-reference: events.props-style payload columns)
    "JSON_EXTRACT": lambda a, r: F.get_json_object(a[0], r[1].value if hasattr(r[1], "value") else "$"),
    # text search (plan/optimizer.rs:510-751 text-search transform exposes
    # TEXT_SCORE; here it's an explicit function: occurrence-count TF score)
    "TEXT_SCORE": lambda a, r: _text_score(a, r),
    "HIGHLIGHT_SNIPPET": lambda a, r: _highlight(a, r),
    # GQL predicates (special_functions.rs:29-232)
    "ALL_DIFFERENT": lambda a, r: _all_different(a),
    "SAME": lambda a, r: _same(a),
    "PROPERTY_EXISTS": lambda a, r: a[0].isNotNull(),
    # struct field access helper (compiler internal)
    "_FIELD": lambda a, r: a[0].getField(r[1].value),
}


def _text_score(a, raw):
    """TEXT_SCORE(text, 'term1 term2 ...'): sum of per-term occurrence
    counts, normalized by token count. Query must be a string literal so
    the expression stays JVM-side."""
    from ..gql import ast as A

    if len(raw) != 2 or not isinstance(raw[1], A.Literal):
        raise UnknownFunction("TEXT_SCORE(text, 'query literal')")
    text = a[0]
    terms = [t for t in str(raw[1].value).split() if t]
    if not terms:
        return F.lit(0.0)
    occ = None
    for t in terms:
        cnt = (F.length(text) - F.length(F.replace(text, F.lit(t), F.lit("")))) / F.lit(len(t))
        occ = cnt if occ is None else occ + cnt
    ntok = F.greatest(F.size(F.split(F.trim(text), r"\s+")), F.lit(1))
    return F.round(occ / ntok, 6)


def _highlight(a, raw):
    """First match of the first query term with +/-20 chars of context."""
    from ..gql import ast as A

    if len(raw) != 2 or not isinstance(raw[1], A.Literal):
        raise UnknownFunction("HIGHLIGHT_SNIPPET(text, 'query literal')")
    term = str(raw[1].value).split()[0]
    pos = F.instr(a[0], term)
    return F.when(pos > 0, F.substring(a[0], F.greatest(pos - 20, F.lit(1)).cast("int"), 40 + len(term))).otherwise(F.lit(None))


def _all_different(a: list[Column]) -> Column:
    out = F.lit(True)
    for i in range(len(a)):
        for j in range(i + 1, len(a)):
            out = out & (a[i] != a[j])
    return out


def _same(a: list[Column]) -> Column:
    out = F.lit(True)
    for i in range(1, len(a)):
        out = out & (a[0] == a[i])
    return out


# ---------------------------------------------------------------------------
# CAST target types (ast.rs:815-878 TypeSpec surface → Spark types)

_CAST_TYPES = {
    "BOOLEAN": "boolean",
    "BOOL": "boolean",
    "STRING": "string",
    "VARCHAR": "string",
    "INTEGER": "long",
    "INT": "long",
    "BIGINT": "long",
    "SMALLINT": "smallint",
    "FLOAT": "double",
    "FLOAT32": "float",
    "REAL": "float",
    "DOUBLE": "double",
    "DATE": "date",
    "TIME": "timestamp",
    "TIMESTAMP": "timestamp",
    "DATETIME": "timestamp",
}


def compile_cast(col: Column, type_name: str) -> Column:
    tn = type_name.upper().replace(" ", "")
    if tn.startswith("DECIMAL"):
        return col.cast(tn.lower())
    if tn.startswith("STRING(") or tn.startswith("VARCHAR("):
        return col.cast("string")
    if tn.startswith("FLOAT("):
        return col.cast("double")
    if tn in _CAST_TYPES:
        return col.cast(_CAST_TYPES[tn])
    raise UnknownFunction(f"unsupported CAST target {type_name}")
