"""Cross-engine differential tests (SURVEY.md §5.2 layer 3).

Property-based: hypothesis generates adversarial-but-valid inputs (unicode
strings, extreme doubles, boundary timestamps); each batch becomes both a
Spark view and a DuckDB table, and a matrix of paired expressions — the
same dialect bridges the declared queries rely on — must agree cell-for-
cell. This catches drift on inputs the fixtures never exercise (the §2.8
dialect notes — round half-up vs half-even, dow conventions, regex
dialects — all came from exactly this class of bug).
"""

from __future__ import annotations

import datetime
import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from verify_local import canon_cell

# (name, spark SQL expr, duckdb SQL expr) over columns s: string, x: double,
# ts: timestamp. Identical text where the dialects agree; bridged otherwise.
# Case mapping runs on the ASCII column `sa`: unicode case rules diverge
# between Java and DuckDB (e.g. Java upper('\u00df')='SS', DuckDB keeps
# length 1) — the engine's declared queries only case-map ASCII columns.
PAIRS = [
    ("lower", "lower(sa)", "lower(sa)"),
    ("upper_len", "length(upper(sa))", "length(upper(sa))"),
    ("trim", "trim(s)", "trim(s)"),
    ("substr", "substring(s, 2, 3)", "substring(s, 2, 3)"),
    ("concat_ws", "concat_ws('|', s, s)", "concat_ws('|', s, s)"),
    ("lpad", "lpad(s, 12, '_')", "lpad(s, 12, '_')"),
    ("reverse", "reverse(s)", "reverse(s)"),
    ("replace", "replace(s, 'a', 'Z')", "replace(s, 'a', 'Z')"),
    # regexp_replace: Spark replaces all by default; DuckDB needs 'g'.
    # Whitespace via explicit class — Java \s includes \x0B, RE2's doesn't.
    (
        "re_collapse",
        r"regexp_replace(s, '[ \\t\\r\\n\\f\\x0B]+', ' ')",
        r"regexp_replace(s, '[ \t\r\n\f\x0B]+', ' ', 'g')",
    ),
    ("abs", "abs(x)", "abs(x)"),
    ("sqrt_abs", "round(sqrt(abs(x)), 6)", "round(sqrt(abs(x)), 6)"),
    ("sign", "cast(signum(x) as double)", "cast(sign(x) as double)"),
    # ceil/floor: Spark returns BIGINT-ish via cast; DuckDB double → cast.
    ("ceil", "cast(ceil(x) as long)", "cast(ceil(x) as bigint)"),
    ("floor", "cast(floor(x) as long)", "cast(floor(x) as bigint)"),
    ("greatest", "greatest(x, 0.5d)", "greatest(x, 0.5)"),
    ("year", "cast(year(ts) as long)", "cast(year(ts) as bigint)"),
    ("month", "cast(month(ts) as long)", "cast(month(ts) as bigint)"),
    ("day_trunc", "cast(date_trunc('day', ts) as timestamp)", "cast(date_trunc('day', ts) as timestamp)"),
    ("hour_trunc", "cast(date_trunc('hour', ts) as timestamp)", "cast(date_trunc('hour', ts) as timestamp)"),
    # ISO weekday bridge: Spark dayofweek is 1=Sunday, DuckDB dow 0=Sunday.
    ("iso_weekday", "cast(weekday(ts) + 1 as long)", "cast(isodow(ts) as bigint)"),
    # Spark unix_timestamp truncates sub-second; DuckDB epoch() keeps the
    # fraction and a bare BIGINT cast would round — floor first.
    ("epoch", "cast(unix_timestamp(ts) as long)", "cast(floor(epoch(ts)) as bigint)"),
    # -- bridges added with the fn_format/fn_encode/fn_datetime_tz/fn_trig
    #    families (same subset rules as the declared queries) --
    ("printf_s", "format_string('%s|%s', sa, sa)", "printf('%s|%s', sa, sa)"),
    ("printf_d", "format_string('%07d', length(s))", "printf('%07d', length(s))"),
    (
        "b64_roundtrip",
        "decode(unbase64(base64(cast(s as binary))), 'UTF-8')",
        "decode(from_base64(base64(encode(s))))",
    ),
    ("hex_int", "hex(cast(length(s) as bigint))", "to_hex(length(s))"),
    # from_utc only: every UTC instant maps uniquely to a zone wall time;
    # the reverse direction is ambiguous inside DST gaps and engines may
    # legitimately differ there, so the engine declares it only over
    # fixture data (fn_datetime_tz), not as a universal bridge.
    (
        "tz_from_utc",
        "from_utc_timestamp(ts, 'America/New_York')",
        "timezone('America/New_York', CAST(ts AS TIMESTAMPTZ))",
    ),
    # + 0.0 folds DuckDB's -0.0 (Spark normalizes negative zero, DuckDB
    # keeps it — same class as the abs(-0.0) note above)
    ("atan2r", "round(atan2(x, 1.0d + abs(x)), 6) + 0.0d", "round(atan2(x, 1.0 + abs(x)), 6) + 0.0"),
]

# Broad multi-script alphabet, minus the classes where Spark and DuckDB
# *legitimately* disagree and the engine makes no bridge claim:
# combining marks (DuckDB substring/length count grapheme clusters, Spark
# counts codepoints) and non-ASCII whitespace (DuckDB trim strips U+00A0,
# Spark does not).
_WS_OK = set(" \t\r\n\f\x0b")


def _char_ok(ch: str) -> bool:
    import unicodedata

    if ch in _WS_OK:
        return True
    if ch.isspace():
        return False
    return unicodedata.category(ch) not in ("Mn", "Mc", "Me", "Cs")


_strings = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)).filter(_char_ok),
    max_size=24,
)
_ascii_strings = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24
)
# -0.0 excluded: DuckDB abs(-0.0) → -0.0 while Spark normalizes to 0.0;
# no fixture/aggregate path produces negative zero, so not worth a bridge.
_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
).map(lambda v: 0.0 if v == 0 else v)
_timestamps = st.datetimes(
    min_value=datetime.datetime(1990, 1, 5),
    max_value=datetime.datetime(2035, 12, 28),
).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(_strings, _ascii_strings, _doubles, _timestamps),
        min_size=1,
        max_size=40,
    )
)
def test_scalar_dialect_bridges_agree(spark, duck, rows):
    pdf = pd.DataFrame(rows, columns=["s", "sa", "x", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_diff_t")
    duck.register("_diff_t_duck", pdf)

    spark_sel = ", ".join(f"{e} AS {n}" for n, e, _ in PAIRS)
    duck_sel = ", ".join(f"{e} AS {n}" for n, _, e in PAIRS)
    s_rows = spark.sql(f"SELECT {spark_sel} FROM _diff_t").collect()
    d_rows = duck.execute(f"SELECT {duck_sel} FROM _diff_t_duck").fetchall()

    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for (name, _, _), sv, dv in zip(PAIRS, sr, dr):
            assert canon_cell(sv) == canon_cell(dv), (
                f"row {i} expr {name}: spark={sv!r} duck={dv!r} input={rows[i]!r}"
            )
    duck.unregister("_diff_t_duck")


def test_engine_facade(spark):
    from etl_suite_spark.api import Engine
    from conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    assert eng.table("nation").count() == 25
    assert eng.sql("SELECT count(*) AS n FROM region").collect()[0].n == 5
    assert eng.run("agg_group_basic").count() > 0
    ops = Engine.operators()
    assert len(ops) >= 100 and ops["agg_group_basic"] is True
