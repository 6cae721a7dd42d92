"""$ref oracle parity (round 6): ``check_preds_sql`` mirrors compile's
registry-resolved ``$ref`` handling — a separate ``col.$ref`` check for a
top-level ref (target fully inlined, cycle stack seeded with the outer ref
to cut at compile's recursion depth), nested refs resolved inline within the
sibling keywords' own preds, compile's cycle-pass semantics preserved, and
the same refusal points (unresolvable refs raise on BOTH sides).

Reference: ``/root/reference/reflect.go:327-381`` (reflectDefer / $ref
registry), ``helper.go:263-288`` (same-ref cycle guard).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from jsonschema_go_spark.compile import CompileError, compile_table
from jsonschema_go_spark.oracle import check_preds_sql
from jsonschema_go_spark.rules import Rule, TableRule

_STRINGS = [None, "", "a", "ab", "abc", "abcdef", "123", "x"]


def _tr(doc: dict) -> TableRule:
    return TableRule(name="t", columns={"s": Rule.from_dict(doc)})


def _parity(spark, doc: dict):
    """compile_table flags == oracle preds row-by-row, ids identical."""
    tr = _tr(doc)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_STRINGS)], "id long, s string"
    )
    plan = compile_table(tr, df.schema)
    preds = check_preds_sql(tr, {"s": "string"})
    assert [c.rule_id for c in preds] == plan.rule_ids
    got = {
        r[0]: tuple(bool(v) if v is not None else None for v in r[1:])
        for r in plan.flags(df, ["id"]).collect()
    }
    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "id": pa.array(range(len(_STRINGS)), pa.int64()),
                "s": pa.array(_STRINGS, pa.string()),
            }
        ),
    )
    sel = ", ".join(f"({c.pred}) AS p{k}" for k, c in enumerate(preds))
    want = {
        r[0]: tuple(bool(v) if v is not None else None for v in r[1:])
        for r in con.sql(f"SELECT id, {sel} FROM t ORDER BY id").fetchall()
    }
    con.close()
    assert got == want
    return plan.rule_ids


def test_pure_ref_column(spark):
    ids = _parity(
        spark,
        {"$ref": "#/definitions/D", "definitions": {"D": {"minLength": 2}}},
    )
    assert ids == ["s.$ref"]


def test_ref_with_sibling_keywords(spark):
    ids = _parity(
        spark,
        {
            "$ref": "#/definitions/D",
            "maxLength": 4,
            "definitions": {"D": {"minLength": 2}},
        },
    )
    assert ids == ["s.$ref", "s.maxLength"]


def test_nested_ref_in_composition(spark):
    ids = _parity(
        spark,
        {
            "allOf": [{"$ref": "#/definitions/D"}],
            "not": {"$ref": "#/definitions/E"},
            "definitions": {"D": {"minLength": 2}, "E": {"pattern": "^a+$"}},
        },
    )
    assert ids == ["s.allOf", "s.not"]


def test_ref_chain(spark):
    ids = _parity(
        spark,
        {
            "$ref": "#/definitions/A",
            "definitions": {
                "A": {"allOf": [{"$ref": "#/definitions/B"}], "maxLength": 5},
                "B": {"minLength": 1},
            },
        },
    )
    assert ids == ["s.$ref"]


def test_ref_to_bool_schema(spark):
    ids = _parity(
        spark,
        {"$ref": "#/definitions/NO", "definitions": {"NO": False}},
    )
    assert ids == ["s.$ref"]


def test_cyclic_self_ref_matches_compile_cycle_pass(spark):
    # compile cuts the recursion at the repeated ref and treats it as pass;
    # the oracle's inline keeps the innermost ref, which sql_pred ignores —
    # the SAME one-unroll semantics
    _parity(
        spark,
        {
            "$ref": "#/definitions/D",
            "definitions": {
                "D": {"minLength": 2, "allOf": [{"$ref": "#/definitions/D"}]}
            },
        },
    )


def test_cyclic_ref_under_not_matches_compile(spark):
    # the adversarial case: an extra unroll would FLIP the verdict under
    # `not` — the seeded cycle stack keeps oracle and compile cutting at
    # the same depth
    _parity(
        spark,
        {
            "$ref": "#/definitions/D",
            "definitions": {"D": {"not": {"$ref": "#/definitions/D"}}},
        },
    )


def test_unresolvable_ref_refused_both_sides(spark):
    tr = _tr({"$ref": "#/definitions/MISSING"})
    df = spark.createDataFrame([(0, "a")], "id long, s string")
    with pytest.raises(CompileError, match="unresolvable"):
        compile_table(tr, df.schema)
    with pytest.raises(ValueError, match="unresolvable"):
        check_preds_sql(tr, {"s": "string"})


def test_ref_violation_rows_match(spark):
    """violations_sql carries the same `$ref <target>` expected annotation
    compile_column builds inline — full row parity through DuckDB."""
    from jsonschema_go_spark.oracle import violations_sql

    doc = {
        "$ref": "#/definitions/D",
        "maxLength": 4,
        "definitions": {"D": {"minLength": 2}},
    }
    tr = _tr(doc)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_STRINGS)], "id long, s string"
    )
    plan = compile_table(tr, df.schema)
    got = sorted(
        tuple(r) for r in plan.violations(df, ["id"], ordered=False).collect()
    )
    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "id": pa.array(range(len(_STRINGS)), pa.int64()),
                "s": pa.array(_STRINGS, pa.string()),
            }
        ),
    )
    want = sorted(
        tuple(r)
        for r in con.sql(violations_sql(tr, "t", ["id"], {"s": "string"})).fetchall()
    )
    con.close()
    assert got == want and len(got) > 0


def test_trivial_ref_target_elided_both_sides(spark):
    tr = _tr({"$ref": "#/definitions/D", "definitions": {"D": {}}})
    df = spark.createDataFrame([(0, "a")], "id long, s string")
    assert compile_table(tr, df.schema).rule_ids == []
    assert check_preds_sql(tr, {"s": "string"}) == []
