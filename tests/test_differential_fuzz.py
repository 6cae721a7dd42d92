"""Differential fuzz: randomly generated VALID rule documents + adversarial
data rows, asserting ``compile_table``'s Spark flags == the DuckDB oracle's
``check_preds_sql`` row-by-row — the reference's generated round-trip
strategy (``/root/reference/entities_test.go:13-107``) lifted from
(de)serialization identity to PREDICATE SEMANTICS. The fixed transcript rule
set pins 13 checks; this closes the long tail (nested composition × null ×
stringly casts × array keywords × object-over-map keywords ×
object-over-struct keywords × typed map values × $ref/definitions forms)
with ≥420 generated column schemas per run.

Deterministic (``derandomize=True``): CI failures reproduce exactly.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from jsonschema_go_spark.compile import compile_table
from jsonschema_go_spark.oracle import check_preds_sql
from jsonschema_go_spark.rules import Rule, TableRule

# ---------------------------------------------------------------- strategies
#
# Only rule documents a user could legitimately write against this table's
# PHYSICAL schema (type keywords restricted to statically-plausible sets —
# a statically-impossible `type` is a compile-time contract question, not a
# row-predicate one) and only keywords the oracle mirrors in SQL.

_PATTERNS = ["^a+$", "[0-9]{3}", "x|y", "^[a-z]+$"]  # Java∩RE2-safe subset
_FORMATS = ["uuid", "date-time", "ipv4", "email"]


def _with_composition(base, depth: int):
    """Wrap a scalar-keyword strategy with optional composition keywords
    (allOf/anyOf/oneOf/not/if-then-else) of the SAME kind, nested."""
    if depth == 0:
        return base

    sub = _with_composition(base, depth - 1)

    def merge(doc, comp):
        out = dict(doc)
        out.update(comp)
        return out

    comp = st.fixed_dictionaries(
        {},
        optional={
            "allOf": st.lists(sub, min_size=1, max_size=2),
            "anyOf": st.lists(sub, min_size=1, max_size=2),
            "oneOf": st.lists(sub, min_size=1, max_size=2),
            "not": sub,
            "if": sub,
            "then": sub,
            "else": sub,
        },
    )
    return st.builds(merge, base, comp)


_int_scalars = st.fixed_dictionaries(
    {},
    optional={
        "type": st.sampled_from(
            ["integer", "number", ["integer", "null"], ["number", "null"]]
        ),
        "minimum": st.integers(-10, 10),
        "maximum": st.integers(-10, 110),
        "exclusiveMinimum": st.integers(-10, 10),
        "exclusiveMaximum": st.integers(-10, 110),
        "multipleOf": st.sampled_from([1, 2, 3, 7]),
        "enum": st.lists(
            st.one_of(st.integers(-5, 8), st.none()), min_size=1, max_size=4
        ),
        "const": st.one_of(st.integers(-5, 8), st.none()),
    },
)

_double_scalars = st.fixed_dictionaries(
    {},
    optional={
        "type": st.sampled_from(
            ["number", "integer", ["number", "null"], ["integer", "null"]]
        ),
        "minimum": st.sampled_from([-3, 0, 0.5, 1, 2.5]),
        "maximum": st.sampled_from([0, 1.0, 2.5, 100]),
        "exclusiveMinimum": st.sampled_from([-3, 0, 0.5]),
        "exclusiveMaximum": st.sampled_from([1.0, 2.5, 100]),
        "multipleOf": st.sampled_from([1, 2, 0.5, 0.25]),
        "enum": st.lists(
            st.sampled_from([0.0, 1.0, 2.5, -3.0, None]), min_size=1, max_size=3
        ),
        "const": st.sampled_from([0.0, 1.0, 2.5, None]),
    },
)

_string_scalars = st.fixed_dictionaries(
    {},
    optional={
        # stringly ingest: integer/number/boolean types compile to casts
        "type": st.sampled_from(
            ["string", "integer", "number", "boolean", ["string", "null"]]
        ),
        "minLength": st.integers(1, 6),
        "maxLength": st.integers(0, 8),
        "pattern": st.sampled_from(_PATTERNS),
        "format": st.sampled_from(_FORMATS),
        "enum": st.lists(
            st.one_of(st.sampled_from(["a", "abc", "123", "x", ""]), st.none()),
            min_size=1,
            max_size=4,
        ),
        "const": st.sampled_from(["a", "x", "", None]),
    },
)

_string_sub = _with_composition(_string_scalars, 1)

_array_scalars = st.fixed_dictionaries(
    {},
    optional={
        "minItems": st.integers(1, 3),
        "maxItems": st.integers(0, 4),
        "uniqueItems": st.booleans(),
        "contains": _string_sub,
        "items": st.one_of(
            _string_sub, st.lists(_string_sub, min_size=1, max_size=3)
        ),
        "additionalItems": _string_sub,
    },
)

_MAP_KEYS = ["k1", "k2", "kx", "num"]

_dep_schema = st.fixed_dictionaries(
    {},
    optional={
        "minProperties": st.integers(1, 3),
        "required": st.lists(st.sampled_from(_MAP_KEYS), min_size=1, max_size=2, unique=True),
        # r7 (ADVICE r6): typed value sub-rules, so a corrupted elem-type
        # hint reaching a schema dependency is OBSERVABLE (the r6 fuzzer
        # could not see the patternProperties `inner`-shadowing bug)
        # a typed residue (`type: integer` → stringly-shape regex under a
        # string hint, static elision under an integer hint) is exactly the
        # observable a corrupted elem-type hint erases — numeric COMPARES on
        # string values stay out (engine-divergent binding, by design)
        "properties": st.dictionaries(
            st.sampled_from(_MAP_KEYS),
            st.fixed_dictionaries({"type": st.just("integer")}),
            min_size=1,
            max_size=2,
        ),
    },
)

_map_scalars = st.fixed_dictionaries(
    {},
    optional={
        # statically satisfied on a map/struct column — both sides must
        # elide it (compile: None pred; oracle: "TRUE" skip)
        "type": st.sampled_from(["object", ["object", "null"]]),
        "minProperties": st.integers(1, 3),
        "maxProperties": st.integers(0, 4),
        "required": st.lists(st.sampled_from(_MAP_KEYS), min_size=1, max_size=2, unique=True),
        # values are strings: stringly `type` casts apply inside value subs
        "properties": st.dictionaries(
            st.sampled_from(_MAP_KEYS), _string_sub, min_size=1, max_size=2
        ),
        "additionalProperties": st.one_of(st.booleans(), _string_sub),
        "patternProperties": st.dictionaries(
            st.sampled_from(_PATTERNS), _string_sub, min_size=1, max_size=2
        ),
        # keys are strings too — compile checks propertyNames subs against
        # StringType, so stringly casts apply there as well
        "propertyNames": _string_sub,
        "dependencies": st.dictionaries(
            st.sampled_from(["k1", "k2"]),
            st.one_of(
                st.lists(st.sampled_from(_MAP_KEYS), max_size=2, unique=True),
                _dep_schema,
            ),
            min_size=1,
            max_size=2,
        ),
    },
)

# typed (integer) map values: same object keywords, value sub-rules are
# numeric — exercises the map<integer> hint where `type` residues are
# statically satisfied instead of stringly-cast
_int_map_scalars = st.fixed_dictionaries(
    {},
    optional={
        "type": st.sampled_from(["object", ["object", "null"]]),
        "minProperties": st.integers(1, 3),
        "maxProperties": st.integers(0, 4),
        "required": st.lists(st.sampled_from(_MAP_KEYS), min_size=1, max_size=2, unique=True),
        "properties": st.dictionaries(
            st.sampled_from(_MAP_KEYS), _int_scalars, min_size=1, max_size=2
        ),
        "additionalProperties": st.one_of(st.booleans(), _int_scalars),
        "patternProperties": st.dictionaries(
            st.sampled_from(_PATTERNS), _int_scalars, min_size=1, max_size=2
        ),
        "propertyNames": _string_sub,
        "dependencies": st.dictionaries(
            st.sampled_from(["k1", "k2"]),
            st.one_of(
                st.lists(st.sampled_from(_MAP_KEYS), max_size=2, unique=True),
                _dep_schema,
            ),
            min_size=1,
            max_size=2,
        ),
    },
)

# struct fields have STATIC types, so property sub-rules are generated
# per-field (a string-keyword rule on the long field would be a
# statically-implausible doc, out of this fuzzer's contract); "zz" is
# deliberately absent from the physical schema — compile skips unknown
# properties (statically absent ⇒ pass) and fails unknown required fields
_struct_scalars = st.fixed_dictionaries(
    {},
    optional={
        "type": st.sampled_from(["object", ["object", "null"]]),
        "properties": st.fixed_dictionaries(
            {},
            optional={
                "kind": _string_sub,
                "num": _int_scalars,
                "zz": _string_sub,
            },
        ),
        "required": st.lists(
            st.sampled_from(["kind", "num", "zz"]), min_size=1, max_size=2, unique=True
        ),
    },
)

# $ref wrappers (round 6): move the doc into definitions and reference it —
# pure-ref, ref-with-sibling-keywords, and nested-ref-in-composition forms,
# exercising the registry + inline path on both sides (compile resolves via
# RuleRegistry; the oracle inlines via rules.inline_refs)


def _reffed(doc):
    return {"definitions": {"SDef": dict(doc)}, "$ref": "#/definitions/SDef"}


def _reffed_mixed(doc, sib):
    out = {"definitions": {"SDef": dict(doc)}, "$ref": "#/definitions/SDef"}
    out.update(sib)
    return out


def _reffed_nested(doc):
    return {"definitions": {"SDef": dict(doc)}, "allOf": [{"$ref": "#/definitions/SDef"}]}


_string_doc = st.one_of(
    _with_composition(_string_scalars, 2),
    st.builds(_reffed, _with_composition(_string_scalars, 1)),
    st.builds(_reffed_mixed, _string_scalars, _string_scalars),
    st.builds(_reffed_nested, _string_scalars),
)

_table_docs = st.fixed_dictionaries(
    {
        "i": _with_composition(_int_scalars, 2),
        "d": _with_composition(_double_scalars, 2),
        "s": _string_doc,
        "a": _with_composition(_array_scalars, 1),
        "m": _with_composition(_map_scalars, 1),
        "mi": _with_composition(_int_map_scalars, 1),
        "t": _with_composition(_struct_scalars, 1),
        "required": st.sets(st.sampled_from(["i", "d", "s", "a", "m", "mi", "t"])),
    }
)

# ------------------------------------------------------------- data battery

_INTS = [None, 0, 1, -1, 2, 3, 6, 7, 14, 100, -100, 10**12]
_DOUBLES = [None, 0.0, 1.0, 2.5, -3.0, 0.5, 0.25, 7.0, 3.3333333, 1e10, -0.75]
_STRINGS = [
    None, "", "a", "aaa", "aaaaaaa", "abc", "123", "12.0", "-42", "true",
    "False", "x", "y", "xy", "z9",
    "3f0a8c1e-2b4d-4e6f-8a9b-0c1d2e3f4a5b", "2021-01-01T00:00:00Z",
    "not-a-date", "1.2.3.4", "999.0.0.1", "a@b.co", "héllo",
]
_ARRAYS = [
    None, [], ["a"], ["a", "a"], ["a", "b", "c"], ["123"], ["x", "y", "x"],
    ["", "a"], ["abc", "ab", "a", "x", "y"], ["aaa"],
]
_MAPS = [
    None, {}, {"k1": "a"}, {"k1": "123", "k2": "b"}, {"kx": "x"},
    {"k1": "a", "k2": "a", "k3": "aaa"}, {"num": "12.0"}, {"UPPER": "x"},
    {"k1": ""}, {"k2": "true", "zz": "y"}, {"aaa": "aaa"},
    {"k1": "not-a-num", "num": "7"}, {"k1": "a", "k2": "b", "kx": "c", "num": "0"},
]
_STRUCTS = [
    None, (None, None), ("a", 1), ("123", -1), ("x", None), (None, 7),
    ("abc", 100), ("", 0), ("y", 14), ("not-a-num", 3), ("12.0", -100),
]
_INT_MAPS = [
    None, {}, {"k1": 0}, {"k1": 7, "k2": -1}, {"kx": 3}, {"num": 14},
    {"k1": 2, "k2": 2, "k3": 6}, {"UPPER": 1}, {"k2": 100, "zz": -5},
    {"k1": 1, "k2": 2, "kx": 3, "num": 4}, {"aaa": 0},
]

_N_ROWS = max(
    len(_INTS), len(_DOUBLES), len(_STRINGS), len(_ARRAYS), len(_MAPS),
    len(_STRUCTS), len(_INT_MAPS)
)

_SPARK_SCHEMA = (
    "id long, i long, d double, s string, a array<string>, m map<string,string>, "
    "t struct<kind:string,num:bigint>, mi map<string,bigint>"
)
#: "array<string>" / "map<string>" (not bare "array"/"map") so the oracle
#: mirrors element/value-level type residues — the first divergence this
#: suite found was the oracle skipping a `type: integer` stringly cast
#: inside `contains` on a string-element array while compile.py checked it;
#: the map<inner> hint closes the same class for map value sub-rules and
#: propertyNames key sub-rules (round 6)
_ELEM_TYPES = {
    "i": "integer", "d": "double", "s": "string", "a": "array<string>",
    "m": "map<string>", "t": "struct<kind:string,num:integer>",
    "mi": "map<integer>",
}


def _rows(extra_ints, extra_strings):
    rows = [
        (
            k,
            _INTS[k % len(_INTS)],
            _DOUBLES[k % len(_DOUBLES)],
            _STRINGS[k % len(_STRINGS)],
            _ARRAYS[k % len(_ARRAYS)],
            _MAPS[k % len(_MAPS)],
            _STRUCTS[k % len(_STRUCTS)],
            _INT_MAPS[k % len(_INT_MAPS)],
        )
        for k in range(_N_ROWS)
    ]
    base = _N_ROWS
    for j, (iv, sv) in enumerate(zip(extra_ints, extra_strings)):
        rows.append(
            (
                base + j,
                iv,
                float(iv) if iv is not None else None,
                sv,
                [sv] if sv is not None else None,
                {"k1": sv} if sv is not None else None,
                (sv, iv),
                {"k1": iv} if iv is not None else None,
            )
        )
    return rows


@pytest.fixture(scope="module")
def _duck():
    con = duckdb.connect()
    yield con
    con.close()


@settings(
    max_examples=60,  # x7 column rules per example = 420 generated schemas
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=_table_docs,
    extra_ints=st.lists(st.one_of(st.integers(-20, 20), st.none()), min_size=2, max_size=2),
    extra_strings=st.lists(st.one_of(st.text(max_size=6), st.none()), min_size=2, max_size=2),
)
def test_compiled_flags_match_oracle(spark, _duck, docs, extra_ints, extra_strings):
    tr = TableRule(
        name="fuzz",
        columns={
            "i": Rule.from_dict(docs["i"]),
            "d": Rule.from_dict(docs["d"]),
            "s": Rule.from_dict(docs["s"]),
            "a": Rule.from_dict(docs["a"]),
            "m": Rule.from_dict(docs["m"]),
            "mi": Rule.from_dict(docs["mi"]),
            "t": Rule.from_dict(docs["t"]),
        },
        metadata={"required": sorted(docs["required"])},
    )
    rows = _rows(extra_ints, extra_strings)
    df = spark.createDataFrame(rows, _SPARK_SCHEMA)
    plan = compile_table(tr, df.schema)
    preds = check_preds_sql(tr, _ELEM_TYPES)
    # identical check lists by construction — same ids, same order
    assert [c.rule_id for c in preds] == plan.rule_ids

    # positional access: rule_ids can legitimately repeat (table-level
    # required + the map keyword `required` both emit `m.required`; one
    # entry per dependencies key) — name lookup on a duplicate column
    # resolves to the first occurrence and manufactures false mismatches
    got = {
        r[0]: tuple(bool(v) if v is not None else None for v in r[1:])
        for r in plan.flags(df, ["id"]).collect()
    }

    tbl = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "i": pa.array([r[1] for r in rows], pa.int64()),
            "d": pa.array([r[2] for r in rows], pa.float64()),
            "s": pa.array([r[3] for r in rows], pa.string()),
            "a": pa.array([r[4] for r in rows], pa.list_(pa.string())),
            "m": pa.array(
                [sorted(r[5].items()) if r[5] is not None else None for r in rows],
                pa.map_(pa.string(), pa.string()),
            ),
            "t": pa.array(
                [
                    {"kind": r[6][0], "num": r[6][1]} if r[6] is not None else None
                    for r in rows
                ],
                pa.struct([("kind", pa.string()), ("num", pa.int64())]),
            ),
            "mi": pa.array(
                [sorted(r[7].items()) if r[7] is not None else None for r in rows],
                pa.map_(pa.string(), pa.int64()),
            ),
        }
    )
    _duck.register("fuzz_t", tbl)
    sel = ", ".join(f"({c.pred}) AS p{k}" for k, c in enumerate(preds))
    want_rows = _duck.sql(
        f"SELECT id{', ' + sel if sel else ''} FROM fuzz_t ORDER BY id"
    ).fetchall()
    _duck.unregister("fuzz_t")

    for wr in want_rows:
        rid = wr[0]
        want = tuple(bool(v) if v is not None else None for v in wr[1:])
        assert got[rid] == want, (
            f"row {rid}: spark {dict(zip(plan.rule_ids, got[rid]))} != "
            f"oracle {dict(zip(plan.rule_ids, want))}\n"
            f"rules: {tr.to_json()}\nrow: {rows[rid] if rid < len(rows) else rows[-2:]}"
        )
