"""Interceptor-chain parity + EnvelopNullability (VERDICT.md item 5).

Mirrors the reference's hook semantics:
- ``InterceptSchema`` stacking with drop short-circuit (context.go:124-140)
- ``InterceptProp`` stacking, incl. the customTags pattern of appending to
  the parent's required list (reflect_test.go:1860-1880)
- ``InterceptNullability`` all-hooks-run stacking (context.go:100-115)
- ``InterceptDefName`` name-transform composition (context.go:174-188)
- ``EnvelopNullability`` anyOf(null, $ref) emission (reflect.go:1361-1393)
- the nullable matrix of ``TestReflector_Reflect_nullable``
  (reflect_test.go:1807-1840) re-expressed on Spark types
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_go_spark import CompileOptions, Rule, RuleRegistry, compile_pred
from jsonschema_go_spark.compile import (
    compile_column,
    compose_def_names,
    compose_intercept_checks,
)
from jsonschema_go_spark.infer import (
    NullabilityParams,
    PropParams,
    compose_nullability_hooks,
    compose_prop_hooks,
    infer_table_rule,
)

SCHEMA = T.StructType(
    [
        T.StructField("l1", T.ArrayType(T.StringType()), True),
        T.StructField("l3", T.ArrayType(T.StringType()), True),
        T.StructField("s1", T.StringType(), False),
        T.StructField("s2", T.StringType(), True),
        T.StructField("m1", T.MapType(T.StringType(), T.IntegerType()), True),
        T.StructField("m2", T.MapType(T.StringType(), T.IntegerType()), True),
    ]
)


def _types(rule: Rule):
    t = rule.type
    return t if isinstance(t, list) else [t]


def test_nullable_matrix_mirrors_reference():
    """reflect_test.go:1807: arrays/maps/pointers default to type [x, null];
    nullable:"false" strips it; nullable:"true" forces it on a value type."""
    tr = infer_table_rule(
        SCHEMA,
        overlay={
            "l3": {"nullable": False},
            "s1": {"nullable": True},
            "s2": {"nullable": False},
            "m2": {"nullable": False},
        },
    )
    assert sorted(_types(tr.columns["l1"])) == ["array", "null"]
    assert _types(tr.columns["l3"]) == ["array"]
    assert sorted(_types(tr.columns["s1"])) == ["null", "string"]
    assert _types(tr.columns["s2"]) == ["string"]
    assert sorted(_types(tr.columns["m1"])) == ["null", "object"]
    assert _types(tr.columns["m2"]) == ["object"]


def test_nullability_hooks_all_run_in_order():
    calls = []

    def h1(p: NullabilityParams):
        calls.append(("h1", p.name, p.null_added))
        if isinstance(p.dtype, T.StringType) and p.rule.has_type("null"):
            p.rule.remove_type("null")

    def h2(p: NullabilityParams):
        calls.append(("h2", p.name, p.null_added))

    tr = infer_table_rule(
        SCHEMA, intercept_nullability=compose_nullability_hooks(h1, h2)
    )
    # both hooks ran for every column, h1 before h2 (no short-circuit)
    assert [c[0] for c in calls] == ["h1", "h2"] * len(SCHEMA.fields)
    # h1's mutation took effect: strings lost the null member
    assert _types(tr.columns["s2"]) == ["string"]
    # arrays/maps untouched by h1
    assert sorted(_types(tr.columns["l1"])) == ["array", "null"]


def test_prop_hooks_stack_and_mutate_parent():
    """customTags mirror: hook 1 appends to the table's required list; hook 2
    sees hook 1's rule output (prev-first chaining)."""

    def require_strings(p: PropParams):
        if isinstance(p.dtype, T.StringType):
            p.table_rule.metadata.setdefault("extra_required", []).append(p.name)
        return None

    def add_min_length(p: PropParams):
        if isinstance(p.dtype, T.StringType):
            r = Rule.from_dict(p.rule.to_dict())
            r.min_length = 1
            return r
        return None

    seen = []

    def record(p: PropParams):
        seen.append((p.name, p.rule.min_length))
        return None

    tr = infer_table_rule(
        SCHEMA,
        intercept_prop=compose_prop_hooks(require_strings, add_min_length, record),
    )
    assert tr.metadata["extra_required"] == ["s1", "s2"]
    assert tr.columns["s1"].min_length == 1
    # the recorder (3rd hook) saw the 2nd hook's replacement rule
    assert ("s1", 1) in seen and ("s2", 1) in seen


def test_intercept_checks_compose_with_drop_short_circuit(spark):
    applied = []

    def drop_b(ch):
        if ch.column == "b":
            return None
        return ch

    def tag(ch):
        applied.append(ch.rule_id)
        return ch

    opts = CompileOptions(intercept_check=compose_intercept_checks(drop_b, tag))
    checks_a = compile_column("a", Rule(minimum=1), T.IntegerType(), options=opts)
    checks_b = compile_column("b", Rule(minimum=1), T.IntegerType(), options=opts)
    assert [ch.rule_id for ch in checks_a] == ["a.minimum"]
    assert checks_b == []
    assert applied == ["a.minimum"]  # tag never ran on the dropped check


def test_def_name_hooks_compose_prev_first(spark):
    h1 = lambda col, kw, d: d.replace(".", "::")
    h2 = lambda col, kw, d: f"chk_{d}"
    opts = CompileOptions(intercept_def_name=compose_def_names(h1, h2))
    checks = compile_column("a", Rule(minimum=1), T.IntegerType(), True, options=opts)
    assert [ch.rule_id for ch in checks] == ["chk_a::required", "chk_a::minimum"]


def test_envelop_nullability_emits_anyof(spark):
    schema = T.StructType([T.StructField("v", T.IntegerType(), True)])
    # ref rules enter inference via type_mapping (AddTypeMapping analog)
    tr2 = infer_table_rule(
        schema,
        type_mapping={"int": {"$ref": "#/definitions/Pos"}},
        envelop_nullability=True,
    )
    v = tr2.columns["v"]
    assert v.ref is None
    assert v.any_of is not None and len(v.any_of) == 2
    assert v.any_of[0].type == "null" or "null" in _types(v.any_of[0])
    assert v.any_of[1].ref == "#/definitions/Pos"

    # and the envelope still VALIDATES correctly through the registry
    registry = RuleRegistry()
    registry.register("Pos", Rule(minimum=5))
    df = spark.createDataFrame([(7,), (3,), (None,)], "v int")
    pred = compile_pred(v, F.col("v"), T.IntegerType(), registry)
    assert [r["p"] for r in df.select(pred.alias("p")).collect()] == [
        True,
        False,
        True,
    ]


def test_envelop_nullability_off_keeps_ref(spark):
    schema = T.StructType([T.StructField("v", T.IntegerType(), True)])
    tr = infer_table_rule(
        schema, type_mapping={"int": {"$ref": "#/definitions/Pos"}}
    )
    assert tr.columns["v"].ref == "#/definitions/Pos"
    assert tr.columns["v"].any_of is None


# ------------------------------------------- defName machinery (reflect.go:780)

def test_to_camel_matches_reference_rules():
    from jsonschema_go_spark.compile import to_camel

    # camelcase.go:14-50 semantics: separators capitalize, digit runs split
    assert to_camel("turn_idx") == "TurnIdx"
    assert to_camel("conv-id") == "ConvId"
    assert to_camel("a.b c") == "ABC"
    assert to_camel("user2name") == "User2Name"
    assert to_camel("already Camel") == "AlreadyCamel"


def test_def_name_registry_conflict_suffixing():
    from jsonschema_go_spark.compile import DefNameRegistry

    reg = DefNameRegistry()
    assert reg.name_for("owner1", "turn_idx") == "TurnIdx"
    # same owner: stable name
    assert reg.name_for("owner1", "turn_idx") == "TurnIdx"
    # different owner colliding on the camel name: Type2 suffix
    assert reg.name_for("owner2", "turn.idx") == "TurnIdxType2"
    assert reg.name_for("owner3", "turn idx") == "TurnIdxType3"


def test_camel_def_names_option(spark):
    opts = CompileOptions(camel_def_names=True)
    checks = compile_column(
        "turn_idx", Rule(minimum=0), T.IntegerType(), True, options=opts
    )
    assert [ch.rule_id for ch in checks] == ["TurnIdxRequired", "TurnIdxMinimum"]


def test_collect_definitions_streams_registrations(spark):
    from jsonschema_go_spark import TableRule, compile_table

    seen = []
    opts = CompileOptions(collect_definitions=lambda n, r: seen.append(n))
    tr = TableRule(
        name="t",
        columns={
            "v": Rule(
                ref="#/definitions/Pos",
                definitions={"Pos": Rule(minimum=0), "Neg": Rule(maximum=0)},
            )
        },
    )
    schema = T.StructType([T.StructField("v", T.IntegerType(), True)])
    plan = compile_table(tr, schema, opts)
    assert sorted(seen) == ["Neg", "Pos"]
    assert [c.rule_id for c in plan.checks] == ["v.$ref"]


# ------------------------------------ remaining option-setter analogs (§2.2)

def test_inline_refs_replaces_definitions(spark):
    from jsonschema_go_spark.rules import inline_refs

    registry = RuleRegistry()
    registry.register("Pos", Rule(minimum=5))
    # pure-ref node replaced wholesale; ref+siblings becomes allOf conjunct
    pure = Rule(ref="#/definitions/Pos")
    out = inline_refs(pure, registry.resolver())
    assert out.ref is None and out.minimum == 5

    mixed = Rule(ref="#/definitions/Pos", maximum=10)
    out = inline_refs(mixed, registry.resolver())
    assert out.ref is None and out.maximum == 10
    assert out.all_of and out.all_of[0].minimum == 5

    # inlined rule validates identically to the ref'd one, WITHOUT a registry
    df = spark.createDataFrame([(7,), (3,), (12,)], "v int")
    pred = compile_pred(out, F.col("v"), T.IntegerType())
    assert [r["p"] for r in df.select(pred.alias("p")).collect()] == [True, False, False]


def test_inline_refs_keeps_cycles():
    from jsonschema_go_spark.rules import inline_refs

    registry = RuleRegistry()
    registry.register("Node", Rule(ref="#/definitions/Node", min_length=1))
    out = inline_refs(Rule(ref="#/definitions/Node"), registry.resolver())
    # one level inlined; the recursive inner ref survives as a ref
    assert out.min_length == 1
    assert out.ref == "#/definitions/Node" or (
        out.all_of and out.all_of[0].ref == "#/definitions/Node"
    )


def test_skip_embedded_maps_slices():
    tr = infer_table_rule(SCHEMA, skip_embedded_maps_slices=True)
    # arrays/maps without overlays dropped; scalars kept
    assert set(tr.columns) == {"s1", "s2"}
    # an explicit overlay keeps the column (it is no longer "embedded noise")
    tr2 = infer_table_rule(
        SCHEMA, overlay={"l1": {"minItems": 1}}, skip_embedded_maps_slices=True
    )
    assert set(tr2.columns) == {"s1", "s2", "l1"}
    assert tr2.columns["l1"].min_items == 1


def test_skip_unsupported_drops_unknown_types():
    schema = T.StructType(
        [
            T.StructField("a", T.StringType(), True),
            T.StructField("weird", T.CalendarIntervalType(), True),
        ]
    )
    tr = infer_table_rule(schema, skip_unsupported=True)
    assert set(tr.columns) == {"a"}
    tr2 = infer_table_rule(schema)
    assert set(tr2.columns) == {"a", "weird"}  # default: kept, unconstrained


def test_strip_def_name_prefix(spark):
    from jsonschema_go_spark.compile import strip_def_name_prefix

    opts = CompileOptions(intercept_def_name=strip_def_name_prefix("turn_", "conv_"))
    checks = compile_column("turn_idx", Rule(minimum=0), T.IntegerType(), options=opts)
    assert [ch.rule_id for ch in checks] == ["idx.minimum"]


def test_def_name_hook_runs_before_conflict_suffixing(spark):
    """Review finding: the rewrite hook ran after conflict detection, so two
    post-rewrite-identical names could silently collide. The hook now feeds
    DefNameRegistry's rewrite, and the second owner gets Type2."""
    from jsonschema_go_spark import TableRule, compile_table
    from jsonschema_go_spark.compile import strip_def_name_prefix

    opts = CompileOptions(
        camel_def_names=True,
        intercept_def_name=strip_def_name_prefix("User"),
    )
    schema = T.StructType(
        [
            T.StructField("user_a", T.IntegerType(), True),
            T.StructField("a", T.IntegerType(), True),
        ]
    )
    tr = TableRule(
        name="t",
        columns={"user_a": Rule(minimum=0), "a": Rule(minimum=0)},
        metadata={},
    )
    plan = compile_table(tr, schema, opts)
    ids = [c.rule_id for c in plan.checks]
    assert len(set(ids)) == len(ids), ids  # no silent collision
    assert ids == ["AMinimum", "AMinimumType2"]
