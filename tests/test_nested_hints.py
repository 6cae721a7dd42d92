"""Nested-container elem-type hints (round 6): the oracle's hint grammar
composes — ``struct<a:struct<...>,b:array<string>>``, ``array<map<string>>``,
``map<array<string>>`` — with each inner hint recursing in ``sql_pred``
exactly where compile recurses with the real nested DataType. Directed
parity cases (the differential fuzzer keeps its columns single-level to
bound runtime; these pin the nesting-specific paths: bracket-aware struct
hint parsing, map-branch-on-array-element, array-branch-on-map-value)."""

from __future__ import annotations

import duckdb
import pyarrow as pa

from jsonschema_go_spark.compile import compile_table
from jsonschema_go_spark.oracle import check_preds_sql
from jsonschema_go_spark.rules import Rule, TableRule


def _parity(spark, col, doc, spark_type, arrow_type, values, elem_type, arrow_values=None):
    """``values`` feed Spark (dicts for maps); ``arrow_values`` the Arrow
    table (item-lists for maps) — default: same as ``values``."""
    tr = TableRule(name="t", columns={col: Rule.from_dict(doc)})
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], f"id long, {col} {spark_type}"
    )
    plan = compile_table(tr, df.schema)
    preds = check_preds_sql(tr, {col: elem_type})
    assert [c.rule_id for c in preds] == plan.rule_ids and plan.rule_ids
    got = {
        r[0]: tuple(bool(v) if v is not None else None for v in r[1:])
        for r in plan.flags(df, ["id"]).collect()
    }
    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "id": pa.array(range(len(values)), pa.int64()),
                col: pa.array(
                    values if arrow_values is None else arrow_values, arrow_type
                ),
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


def test_struct_in_struct(spark):
    doc = {
        "properties": {
            "a": {
                "properties": {"x": {"minLength": 2}, "y": {"minimum": 0}},
                "required": ["x"],
            },
            "b": {"pattern": "^[a-z]+$"},
        },
        "required": ["a"],
    }
    values = [
        None,
        {"a": None, "b": None},
        {"a": {"x": "ab", "y": 1}, "b": "ok"},
        {"a": {"x": "a", "y": -1}, "b": "NO"},
        {"a": {"x": None, "y": 5}, "b": "z"},
        {"a": {"x": "abc", "y": None}, "b": None},
    ]
    _parity(
        spark,
        "t2",
        doc,
        "struct<a:struct<x:string,y:bigint>,b:string>",
        pa.struct(
            [
                ("a", pa.struct([("x", pa.string()), ("y", pa.int64())])),
                ("b", pa.string()),
            ]
        ),
        values,
        "struct<a:struct<x:string,y:integer>,b:string>",
    )


def test_map_elements_in_array(spark):
    doc = {
        "minItems": 1,
        "items": {"minProperties": 1, "properties": {"k1": {"minLength": 1}}},
        "contains": {"required": ["k2"]},
    }
    values = [
        None,
        [],
        [{"k1": "a"}],
        [{"k1": ""}, {"k2": "b"}],
        [{}, {"k2": "x", "k1": "yy"}],
        [{"k3": "z"}],
    ]
    _parity(
        spark,
        "am",
        doc,
        "array<map<string,string>>",
        pa.list_(pa.map_(pa.string(), pa.string())),
        values,
        "array<map<string>>",
        arrow_values=[
            [sorted(m.items()) for m in v] if v is not None else None
            for v in values
        ],
    )


def test_array_values_in_map(spark):
    doc = {
        "minProperties": 1,
        "properties": {"k1": {"minItems": 1, "items": {"minLength": 2}}},
        "additionalProperties": {"maxItems": 2},
        "patternProperties": {"^[a-z]+$": {"uniqueItems": True}},
    }
    values = [
        None,
        {},
        {"k1": ["ab", "cd"]},
        {"k1": []},
        {"k1": ["a"], "zz": ["x", "y", "z"]},
        {"other": ["q", "q"]},
        {"k1": None},
    ]
    _parity(
        spark,
        "ma",
        doc,
        "map<string,array<string>>",
        pa.map_(pa.string(), pa.list_(pa.string())),
        values,
        "map<array<string>>",
        arrow_values=[
            sorted(v.items()) if v is not None else None for v in values
        ],
    )
