"""Property-based round-trip tests (hypothesis) — the generated-adversarial
analog of the reference's json-cli-generated round-trip suite
(``/root/reference/entities_test.go:13-107``): arbitrary rule documents with
unknown keywords at every level must satisfy ``from_dict ∘ to_dict ==
identity`` and stable double round-trips. No Spark needed.
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from jsonschema_go_spark.rules import Rule, SIMPLE_TYPES

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=20),
)

_json_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=10), children, max_size=4),
    ),
    max_leaves=10,
)


def _rule_dicts(depth: int = 2):
    simple = st.fixed_dictionaries(
        {},
        optional={
            "type": st.one_of(
                st.sampled_from(sorted(SIMPLE_TYPES)),
                st.lists(st.sampled_from(sorted(SIMPLE_TYPES)), min_size=1, max_size=3, unique=True),
            ),
            "minimum": st.integers(-100, 100),
            "maximum": st.integers(-100, 100),
            "exclusiveMinimum": st.integers(-100, 100),
            "multipleOf": st.integers(1, 50),
            # min 1: an explicit zero is dropped on marshal exactly like the
            # reference's `minLength,omitempty` (entities.go:33) — see
            # test_omitempty_zero_normalizes
            "minLength": st.integers(1, 50),
            "maxLength": st.integers(0, 50),
            "pattern": st.sampled_from(["^a+$", "[0-9]{3}", "x|y"]),
            "format": st.sampled_from(["date-time", "uuid", "custom"]),
            "enum": st.lists(_scalar, min_size=1, max_size=4),
            "const": _scalar,
            "default": _scalar,
            "required": st.lists(st.text(min_size=1, max_size=8), max_size=3),
            "minItems": st.integers(1, 5),
            "uniqueItems": st.booleans(),
            "title": st.text(max_size=15),
            "x-unknown-keyword": _json_value,
            "x-another/weird~key": _json_value,
        },
    )
    if depth == 0:
        return simple
    sub = st.one_of(st.booleans(), _rule_dicts(depth - 1))
    return st.fixed_dictionaries(
        {},
        optional={
            "type": st.sampled_from(sorted(SIMPLE_TYPES)),
            "items": st.one_of(sub, st.lists(sub, max_size=3)),
            "additionalItems": sub,
            "contains": sub,
            "properties": st.dictionaries(st.text(min_size=1, max_size=8), sub, max_size=3),
            "patternProperties": st.dictionaries(st.sampled_from(["^a", "b$"]), sub, max_size=2),
            "additionalProperties": sub,
            "propertyNames": sub,
            "dependencies": st.dictionaries(
                st.text(min_size=1, max_size=6),
                st.one_of(st.lists(st.text(min_size=1, max_size=6), max_size=3), sub),
                max_size=2,
            ),
            "definitions": st.dictionaries(st.text(min_size=1, max_size=8), sub, max_size=2),
            "allOf": st.lists(sub, min_size=1, max_size=3),
            "anyOf": st.lists(sub, min_size=1, max_size=2),
            "oneOf": st.lists(sub, min_size=1, max_size=2),
            "not": sub,
            "if": sub,
            "then": sub,
            "else": sub,
            "x-unknown": _json_value,
        },
    )


@settings(max_examples=200, deadline=None)
@given(_rule_dicts())
def test_round_trip_identity(doc):
    r = Rule.from_dict(doc)
    assert r.to_dict() == doc
    # second round-trip stable
    assert Rule.from_dict(r.to_dict()).to_dict() == doc


@settings(max_examples=100, deadline=None)
@given(_rule_dicts())
def test_json_string_round_trip(doc):
    s = Rule.from_dict(doc).to_json()
    assert json.loads(Rule.from_json(s).to_json()) == json.loads(s)


@settings(max_examples=100, deadline=None)
@given(_rule_dicts())
def test_is_trivial_total(doc):
    # is_trivial must be total (no exceptions) on any valid document
    r = Rule.from_dict(doc)
    assert r.is_trivial() in (True, False)


@settings(max_examples=100, deadline=None)
@given(_rule_dicts())
def test_copy_equals_original(doc):
    r = Rule.from_dict(doc)
    assert r.copy().to_dict() == r.to_dict()


def test_omitempty_zero_normalizes():
    """Explicit zero minLength/minItems/minProperties vanish on marshal —
    byte-identical behavior to the reference's `,omitempty` tags
    (entities.go:33,39,43); semantics are unchanged (0 is the default)."""
    r = Rule.from_dict({"minLength": 0, "minItems": 0, "minProperties": 0})
    assert r.to_dict() == {}
    assert r.is_trivial() is True


@given(_rule_dicts(1), _rule_dicts(1))
@settings(max_examples=100, deadline=None)
def test_inline_refs_eliminates_resolvable_refs(host, definition):
    """For arbitrary host rules + definitions: inlining leaves no resolvable
    $ref behind, and the result still (de)serializes stably."""
    from jsonschema_go_spark.compile import RuleRegistry
    from jsonschema_go_spark.rules import inline_refs

    registry = RuleRegistry()
    registry.register("D", Rule.from_dict(definition))
    host = dict(host)
    host["$ref"] = "#/definitions/D"
    rule = Rule.from_dict(host)

    out = inline_refs(rule, registry.resolver())
    txt = json.dumps(out if isinstance(out, bool) else out.to_dict())
    assert '"#/definitions/D"' not in txt

    if not isinstance(out, bool):
        assert Rule.from_dict(out.to_dict()).to_dict() == out.to_dict()
