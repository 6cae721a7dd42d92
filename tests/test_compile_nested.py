"""Nested-type keyword compilation: map/struct object keywords, tuple items,
dependencies, propertyNames, patternProperties, $ref registry, composition —
against hand-computed expectations on in-memory data (the keyword families
the flat testdata tables can't host)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_go_spark import (
    CompileOptions,
    Rule,
    RuleRegistry,
    compile_pred,
)
from jsonschema_go_spark.rules import TableRule
from jsonschema_go_spark import compile_table


def _passes(spark, df, rule, col="v", registry=None):
    dtype = df.schema[col].dataType
    pred = compile_pred(rule, F.col(col), dtype, registry)
    return [r["p"] for r in df.select(pred.alias("p")).collect()]


# ------------------------------------------------------------------- maps

def test_map_object_keywords(spark):
    df = spark.createDataFrame(
        [
            ({"a": 1, "b": 2},),
            ({"a": 5},),
            ({"x": 1, "y": 2, "z": 3},),
            ({},),
            (None,),
        ],
        "v map<string,int>",
    )
    # minProperties/maxProperties (entities.go:42-43)
    r = Rule(min_properties=1, max_properties=2)
    assert _passes(spark, df, r) == [True, True, False, False, True]
    # required over map keys (entities.go:44)
    r = Rule(required=["a"])
    assert _passes(spark, df, r) == [True, True, False, False, True]
    # properties subschema on map values (entities.go:47)
    r = Rule(properties={"a": Rule(maximum=3)})
    assert _passes(spark, df, r) == [True, False, True, True, True]
    # additionalProperties: false (reflect.go:1106-1113)
    r = Rule(properties={"a": Rule(), "b": Rule()}, additional_properties=False)
    assert _passes(spark, df, r) == [True, True, False, True, True]
    # additionalProperties: schema over non-declared keys
    r = Rule(properties={"a": Rule()}, additional_properties=Rule(maximum=2))
    assert _passes(spark, df, r) == [True, True, False, True, True]
    # propertyNames (entities.go:50)
    r = Rule(property_names=Rule(pattern="^[ab]$"))
    assert _passes(spark, df, r) == [True, True, False, True, True]
    # patternProperties (entities.go:48)
    r = Rule(pattern_properties={"^[xyz]$": Rule(maximum=2)})
    assert _passes(spark, df, r) == [True, True, False, True, True]
    # dependencies: key ⇒ other keys (entities.go:751-810)
    r = Rule(dependencies={"a": ["b"]})
    assert _passes(spark, df, r) == [True, False, True, True, True]
    # dependencies: key ⇒ schema on the whole object
    r = Rule(dependencies={"a": Rule(min_properties=2)})
    assert _passes(spark, df, r) == [True, False, True, True, True]


# ----------------------------------------------------------------- structs

def test_struct_properties_and_required(spark):
    df = spark.createDataFrame(
        [((1, "x"),), ((5, None),), (None,)],
        "v struct<a:int, b:string>",
    )
    r = Rule(properties={"a": Rule(maximum=3)})
    assert _passes(spark, df, r) == [True, False, True]
    r = Rule(required=["b"])
    assert _passes(spark, df, r) == [True, False, True]
    # property named in rule but absent from physical schema ⇒ required fails
    r = Rule(required=["zzz"])
    assert _passes(spark, df, r) == [False, False, True]
    # ...but a properties subschema for an absent field passes (absent ⇒ pass)
    r = Rule(properties={"zzz": Rule(minimum=1)})
    assert _passes(spark, df, r) == [True, True, True]


# ------------------------------------------------------------ tuple items

def test_tuple_items_and_additional_items(spark):
    df = spark.createDataFrame(
        [([1, 50],), ([1, 50, 2, 2],), ([99],), ([1, 50, 99],), ([],)],
        "v array<int>",
    )
    # positional schemas (entities.go:689-748)
    r = Rule(items=[Rule(maximum=10), Rule(minimum=20)])
    assert _passes(spark, df, r) == [True, True, False, True, True]
    # additionalItems constrains the tail (entities.go:36)
    r = Rule(items=[Rule(maximum=10), Rule(minimum=20)], additional_items=Rule(maximum=5))
    assert _passes(spark, df, r) == [True, True, False, False, True]
    # additionalItems: false ⇒ no tail allowed
    r = Rule(items=[Rule(), Rule()], additional_items=False)
    assert _passes(spark, df, r) == [True, False, True, False, True]


def test_array_contains_and_items_nulls(spark):
    df = spark.createDataFrame(
        [([1, 2, None],), ([5, 6],), ([],)], "v array<int>"
    )
    # null elements pass item subschemas (absent-property analog)
    r = Rule(items=Rule(maximum=4))
    assert _passes(spark, df, r) == [True, False, True]
    # draft-07 keyword applicability: `minimum` applies only to numbers, so a
    # null element VACUOUSLY matches {minimum: 6} and satisfies `contains`
    r = Rule(contains=Rule(minimum=6))
    assert _passes(spark, df, r) == [True, True, False]


# -------------------------------------------------------------------- $ref

def test_ref_registry_and_cycles(spark):
    df = spark.createDataFrame([(1,), (50,), (None,)], "v int")
    reg = RuleRegistry()
    reg.register("small", Rule(maximum=10))
    r = Rule(ref="#/definitions/small")
    assert _passes(spark, df, r, registry=reg) == [True, False, True]
    # self-referential def: cycle guard treats the back-edge as pass
    reg.register("loop", Rule(ref="#/definitions/loop", minimum=5))
    r = Rule(ref="#/definitions/loop")
    assert _passes(spark, df, r, registry=reg) == [False, True, True]


def test_ref_in_table_rule_definitions(spark):
    df = spark.createDataFrame([(1,), (50,)], "v int")
    tr = TableRule(
        columns={
            "v": Rule(
                ref="#/definitions/bounded",
                definitions={"bounded": Rule(minimum=0, maximum=10)},
            )
        }
    )
    plan = compile_table(tr, df.schema)
    assert "v.$ref" in plan.rule_ids
    flags = [r[0] for r in plan.flags(df, []).collect()]
    assert flags == [True, False]


# ------------------------------------------------------------- composition

def test_nested_composition(spark):
    df = spark.createDataFrame([(5,), (15,), (25,), (None,)], "v int")
    r = Rule(
        any_of=[Rule(maximum=10), Rule(minimum=20)],
        not_=Rule(const=15),
    )
    assert _passes(spark, df, r) == [True, False, True, True]
    r = Rule(one_of=[Rule(maximum=20), Rule(minimum=10)])  # overlap 10..20
    assert _passes(spark, df, r) == [True, False, True, True]
    r = Rule(if_=Rule(minimum=10), then=Rule(multiple_of=5), else_=Rule(maximum=6))
    assert _passes(spark, df, r) == [True, True, True, True]
    df2 = spark.createDataFrame([(12,), (7,)], "v int")
    assert _passes(spark, df2, r) == [False, False]


def test_boolean_schemas(spark):
    df = spark.createDataFrame([(1,), (None,)], "v int")
    assert _passes(spark, df, True) == [True, True]
    assert _passes(spark, df, False) == [False, False]


def test_stringly_type_checks(spark):
    df = spark.createDataFrame(
        [("12",), ("1.50",), ("abc",), ("true",), (None,)], "v string"
    )
    r = Rule(type="integer")
    assert _passes(spark, df, r) == [True, False, False, False, True]
    r = Rule(type="number")
    assert _passes(spark, df, r) == [True, True, False, False, True]
    r = Rule(type="boolean")
    assert _passes(spark, df, r) == [False, False, False, True, True]


def test_integer_over_double(spark):
    df = spark.createDataFrame([(1.0,), (1.5,), (None,)], "v double")
    r = Rule(type="integer")
    assert _passes(spark, df, r) == [True, False, True]  # draft-07: 1.0 is integer


def test_format_predicates_on_garbage(spark):
    """Exercises the ANSI-safe try_* parsing paths on malformed strings."""
    df = spark.createDataFrame(
        [
            ("2026-01-01T10:00:00Z",), ("2026-13-40T99:00:00",), ("nonsense",),
            ("2026-01-01",), ("550e8400-e29b-41d4-a716-446655440000",),
            ("aGVsbG8=",), (None,),
        ],
        "v string",
    )
    fmt = lambda name: [  # noqa: E731
        r["p"] for r in df.select(
            compile_pred(Rule(format=name), F.col("v"), df.schema["v"].dataType).alias("p")
        ).collect()
    ]
    assert fmt("date-time") == [True, False, False, False, False, False, True]
    assert fmt("date") == [False, False, False, True, False, False, True]
    assert fmt("uuid") == [False, False, False, False, True, False, True]
    # "nonsense" is 8 base64-alphabet chars with length % 4 == 0 → valid
    assert fmt("base64") == [False, False, True, False, False, True, True]
    # unknown format is an annotation → always pass
    assert fmt("custom-thing") == [True] * 7
