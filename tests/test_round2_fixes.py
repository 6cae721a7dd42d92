"""Round-2 hardening: strict_formats wiring, enum edge cases, oracle format
parity, runtime-introspectable annotations (VERDICT.md "What's wrong" 2-4,
ADVICE.md items 3-5)."""

from __future__ import annotations

import typing

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_go_spark import CompileOptions, Rule, compile_pred
from jsonschema_go_spark.compile import CompileError, compile_column
from jsonschema_go_spark.functions.formats import FORMAT_PREDICATES
from jsonschema_go_spark.oracle import _FORMAT_SQL, sql_pred


# ------------------------------------------------------------ strict_formats

def test_strict_formats_rejects_unknown(spark):
    with pytest.raises(CompileError, match="unknown format"):
        compile_column(
            "c",
            Rule(type="string", format="no-such-format"),
            T.StringType(),
            options=CompileOptions(strict_formats=True),
        )


def test_lenient_unknown_format_emits_no_check(spark):
    checks = compile_column(
        "c", Rule(format="no-such-format"), T.StringType()
    )
    # annotation-only: nothing to assert at runtime (matches oracle mirror)
    assert [ch.keyword for ch in checks] == []


def test_known_format_still_compiles_under_strict(spark):
    checks = compile_column(
        "c",
        Rule(type="string", format="uuid"),
        T.StringType(),
        options=CompileOptions(strict_formats=True),
    )
    assert [ch.keyword for ch in checks] == ["format"]


# --------------------------------------------------------- enum edge cases

def test_enum_all_null_members(spark):
    df = spark.createDataFrame([("x",), (None,)], "v string")
    pred = compile_pred(Rule(enum=[None]), F.col("v"), T.StringType())
    # NULL input passes at compile_pred level (presence handled by required);
    # the non-null "x" is not in the (empty) scalar set → fail
    assert [r["p"] for r in df.select(pred.alias("p")).collect()] == [False, True]


def test_enum_all_null_members_sql(duck):
    p = sql_pred(Rule(enum=[None]), "v")
    rows = duck.execute(
        f"SELECT {p} FROM (SELECT 'x' AS v UNION ALL SELECT NULL) ORDER BY v"
    ).fetchall()
    assert [r[0] for r in rows] == [False, True]


def test_enum_complex_members_raise(spark):
    with pytest.raises(CompileError, match="complex enum"):
        compile_column("c", Rule(enum=[[1, 2], "a"]), T.StringType())
    with pytest.raises(ValueError, match="complex enum"):
        sql_pred(Rule(enum=[{"k": 1}]), "c")


# ------------------------------------------------------ oracle format parity

def test_every_enforced_format_has_sql_mirror():
    # ADVICE.md: compile.py emitting a check summary_sql can't mirror breaks
    # the rule_id-set parity contract
    assert set(FORMAT_PREDICATES) == set(_FORMAT_SQL)


@pytest.mark.parametrize(
    "fmt,good,bad",
    [
        ("hostname", "a-b.example.com", "-bad.example"),
        ("ipv6", "2001:db8::1", "no-colons-here"),
        ("uri-reference", "/a/b?q=1", "has space"),
        ("json-pointer", "/a/~0b/2", "missing-leading-slash"),
    ],
)
def test_new_format_mirrors_agree(spark, duck, fmt, good, bad):
    df = spark.createDataFrame([(good,), (bad,)], "v string")
    pred = compile_pred(Rule(format=fmt), F.col("v"), T.StringType())
    spark_res = [
        r["p"]
        for r in df.select(F.col("v"), pred.alias("p")).orderBy("v").collect()
    ]
    p = _FORMAT_SQL[fmt]("v")
    duck_res = [
        r[0]
        for r in duck.execute(
            f"SELECT coalesce({p}, TRUE) FROM (SELECT {_sq(good)} AS v "
            f"UNION ALL SELECT {_sq(bad)}) ORDER BY v"
        ).fetchall()
    ]
    assert spark_res == duck_res
    assert sorted(spark_res) == [False, True]


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# --------------------------------------------------- runtime type hints work

def test_drift_report_type_hints_resolve():
    import jsonschema_go_spark.operators.drift as d

    hints = typing.get_type_hints(d.drift_report)
    assert hints  # NameError before the Sequence import fix


# ------------------------------------------- map-keyword oracle parity (unit)

def test_map_sql_pred_mirrors_compile(spark, duck):
    """compile_pred and sql_pred(elem_type='map') must agree cell-for-cell on
    crafted maps incl. NULL map, empty map, and missing/extra keys."""
    rule = Rule(
        min_properties=1,
        max_properties=2,
        required=["a"],
        properties={"a": Rule(pattern="^v$")},
        additional_properties=Rule(max_length=1),
        pattern_properties={"^x": Rule(max_length=1)},
        property_names=Rule(max_length=2),
        dependencies={"b": ["a"], "x9": Rule(min_properties=2)},
    )
    data = [
        (0, {"a": "v"}),
        (1, {"a": "v", "b": "z"}),
        (2, {"a": "bad", "xx": "toolong"}),
        (3, {}),
        (4, None),
        (5, {"x9": "q"}),
        (6, {"a": "v", "b": "z", "c": "w"}),
    ]
    df = spark.createDataFrame(data, "tag int, v map<string,string>")
    pred = compile_pred(rule, F.col("v"), df.schema["v"].dataType)
    spark_res = [
        (r["tag"], r["p"])
        for r in df.select("tag", pred.alias("p")).orderBy("tag").collect()
    ]

    from jsonschema_go_spark.oracle import sql_pred as _sql_pred

    def duck_map(d):
        if d is None:
            return "NULL::MAP(VARCHAR,VARCHAR)"
        entries = ", ".join(
            "{'key': %s, 'value': %s}" % (_sq(k), _sq(val)) for k, val in d.items()
        )
        return f"map_from_entries([{entries}]::STRUCT(\"key\" VARCHAR, \"value\" VARCHAR)[])"

    rows_sql = " UNION ALL ".join(
        f"SELECT {tag} AS tag, {duck_map(d)} AS v" for tag, d in data
    )
    p = _sql_pred(rule, "v", "map")
    duck_res = [
        (r[0], r[1])
        for r in duck.execute(
            f"SELECT tag, coalesce({p}, TRUE) FROM ({rows_sql}) ORDER BY tag"
        ).fetchall()
    ]
    assert spark_res == duck_res
    # the fixture must exercise both verdicts
    assert {v for _, v in spark_res} == {True, False}
