"""Rule-model unit tests — mirrors the reference's test strategy:

- IsTrivial truth table ported verbatim from
  ``/root/reference/helper_test.go:50-103`` (22 cases) plus the
  recursive-ref cases (``helper_test.go:105-178``);
- marshal∘unmarshal identity with unknown keywords at every level
  (``/root/reference/entities_test.go:13-107``);
- type-set algebra (``/root/reference/helper.go:114-175``);
- ToSimpleMap boolean forms (``/root/reference/helper.go:323-347``).

No Spark needed — pure Python, fast.
"""

from __future__ import annotations

import json

import pytest

from jsonschema_go_spark.rules import (
    ABSENT,
    Rule,
    TableRule,
    from_simple_map,
    to_simple_map,
)

# (expected_trivial, name, schema_json) — helper_test.go:50-103 verbatim
TRIVIAL_TABLE = [
    (True, "true schema", "true"),
    (False, "false schema", "false"),
    (True, "empty schema", "{}"),
    (True, "type object", '{"type":"object", "additionalProperties":{"type":"integer"}}'),
    (False, "type object with non-trivial members",
     '{"type":"object", "additionalProperties":{"type":"integer","minimum":3}}'),
    (True, "type object with properties",
     '{"type":"object", "properties":{"foo":{"type":"integer"}}}'),
    (False, "type object with non-trivial property members",
     '{"type":"object", "properties":{"foo":{"type":"integer","minimum":3}}}'),
    (False, "type fixed array", '{"type":"array", "items":[{"type":"string"}]}'),
    (True, "type array", '{"type":"array", "items":{"type":"string"}}'),
    (False, "type array with non-trivial members",
     '{"type":"array", "items":{"type":"string", "format":"email"}}'),
    (True, "type array additionalItems",
     '{"type":"array", "additionalItems":{"type":"string"}}'),
    (False, "type array additionalItems with non-trivial members",
     '{"type":"array", "additionalItems":{"type":"string", "format":"email"}}'),
    (True, "scalar type", '{"type":"integer"}'),
    (True, "scalar nullable type", '{"type":["integer", "null"]}'),
    (False, "scalar types", '{"type":["integer", "string"]}'),
    (False, "with format", '{"format":"email"}'),
    (False, "with not", '{"not":true}'),
    (False, "with allOf", '{"allOf":[true]}'),
    (False, "with enum", '{"enum":[1,2,3]}'),
    (False, "with minItems", '{"minItems":5}'),
    (False, "with minProperties", '{"minProperties":5}'),
    # $ref without a resolver is NOT trivial (helper.go:263-288)
    (False, "with $ref", '{"$ref":"#/definitions/foo","definitions":{"foo":true}}'),
]


@pytest.mark.parametrize("expected,name,schema_json", TRIVIAL_TABLE, ids=[t[1] for t in TRIVIAL_TABLE])
def test_is_trivial_table(expected, name, schema_json):
    v = json.loads(schema_json)
    if isinstance(v, bool):
        # SchemaOrBool boolean form (helper.go:178-191)
        assert (v is True) == expected
        return
    assert Rule.from_dict(v).is_trivial() == expected


def test_is_trivial_with_resolver():
    # mirrors helper_test.go:105-124: trivial target resolved through $ref
    root = Rule.from_dict({"$ref": "#/definitions/foo", "definitions": {"foo": True}})
    resolver = lambda ref: root.definitions.get(ref.rsplit("/", 1)[-1])
    assert root.is_trivial([resolver]) is True


def test_is_trivial_recursive():
    # mirrors helper_test.go:126-178: self-recursive defs; one variant with a
    # minimum:100 deep inside is non-trivial, without it trivial
    defs = {
        "Lvl1": Rule.from_dict({
            "type": "object",
            "properties": {
                "scalar": {"type": "string"},
                "l1s": {"type": "array", "items": {"$ref": "#/definitions/Lvl1"}},
                "bs": {"type": "array", "items": {"$ref": "#/definitions/Lvl2"}},
            },
        }),
        "Lvl2": Rule.from_dict({
            "type": "object",
            "properties": {"scalar": {"type": "integer", "minimum": 100}},
        }),
        "Lvl2Trivial": Rule.from_dict({
            "type": "object", "properties": {"scalar": {"type": "integer"}},
        }),
    }
    resolver = lambda ref: defs.get(ref.rsplit("/", 1)[-1])
    root = Rule.from_dict({"$ref": "#/definitions/Lvl1"})
    assert root.is_trivial([resolver]) is False
    defs["Lvl2"] = defs["Lvl2Trivial"]
    assert root.is_trivial([resolver]) is True


def test_unsigned_minimum_zero_trivial():
    # helper.go:200-215: minimum:0 backed by uint source stays trivial
    r = Rule(type="integer", minimum=0)
    assert r.is_trivial() is False
    r.reflect_unsigned = True
    assert r.is_trivial() is True
    r.minimum = 1
    assert r.is_trivial() is False


ADVERSARIAL_DOC = {
    "$id": "http://x/y",
    "type": ["object", "null"],
    "minLength": 3,
    "properties": {
        "a": {"type": "string", "x-unknown": [1, {"deep": True}]},
        "b": False,
    },
    "items": [{"type": "integer"}, True],
    "additionalItems": {"multipleOf": 2},
    "dependencies": {"a": ["b"], "c": {"required": ["d"]}},
    "enum": [1, "two", None],
    "const": None,
    "default": None,
    "if": {"const": 1},
    "then": True,
    "else": {"not": {"enum": [5]}},
    "x-top-unknown": {"nested": {"keys": [1, 2, 3]}},
    "definitions": {"foo": {"$ref": "#/definitions/foo"}},
}


def test_round_trip_unknown_keywords():
    # entities_test.go:13-107 analog: decode→encode == identity incl. extras
    r = Rule.from_dict(ADVERSARIAL_DOC)
    assert r.extra_properties["x-top-unknown"] == {"nested": {"keys": [1, 2, 3]}}
    assert r.properties["a"].extra_properties["x-unknown"] == [1, {"deep": True}]
    assert r.properties["b"] is False
    # present-as-null vs absent (entities.go:570-582)
    assert r.const is None and r.const is not ABSENT
    assert r.default is None and r.default is not ABSENT
    assert Rule().const is ABSENT
    back = r.to_dict()
    assert back == ADVERSARIAL_DOC
    # second round-trip is stable
    assert Rule.from_dict(back).to_dict() == ADVERSARIAL_DOC


def test_round_trip_json_string():
    r = Rule.from_json(json.dumps(ADVERSARIAL_DOC))
    assert json.loads(r.to_json()) == ADVERSARIAL_DOC


def test_extra_collision_rejected():
    r = Rule(type="string")
    r.extra_properties["type"] = "integer"
    with pytest.raises(ValueError):
        r.to_dict()


def test_type_set_algebra():
    # helper.go:114-175
    r = Rule()
    r.add_type("integer")
    assert r.type == "integer"
    r.add_type("null")
    assert r.type == ["integer", "null"]
    r.add_type("null")
    assert r.type == ["integer", "null"]
    assert r.has_type("integer") and r.has_type("null") and not r.has_type("string")
    r.remove_type("integer")
    assert r.type == "null"
    r.remove_type("null")
    assert r.type is None


def test_invalid_simple_type_rejected():
    # entities.go:880-924 closed-enum enforcement
    with pytest.raises(ValueError):
        Rule(type="text")
    with pytest.raises(ValueError):
        Rule.from_dict({"type": ["string", "nope"]})


def test_to_simple_map_boolean_forms():
    # helper.go:323-347: false → {"not":{}}, true → {}
    assert to_simple_map(False) == {"not": {}}
    assert to_simple_map(True) == {}
    assert to_simple_map(Rule(type="string")) == {"type": "string"}
    assert from_simple_map({"type": "string"}).type == "string"


def test_copy_is_deep():
    r = Rule.from_dict(ADVERSARIAL_DOC)
    c = r.copy()
    c.properties["a"].pattern = "^x$"
    assert r.properties["a"].pattern is None


def test_table_rule_round_trip():
    tr = TableRule(
        name="transcripts",
        columns={"role": Rule(type="string", enum=["user"]), "free": True},
        unique=[("conv_id", "turn_idx")],
        contiguous=[{"partition_by": "conv_id", "order_by": "turn_idx", "start": 0}],
        metadata={"required": ["role"]},
    )
    back = TableRule.from_json(tr.to_json())
    assert back.columns["role"].enum == ["user"]
    assert back.columns["free"] is True
    assert back.unique == [("conv_id", "turn_idx")]
    assert back.metadata["required"] == ["role"]
