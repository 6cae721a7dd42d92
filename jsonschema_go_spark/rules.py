"""Rule model — a PySpark-native re-expression of the reference's JSON Schema
draft-07 document model (``/root/reference/entities.go:16-67``).

A :class:`Rule` carries every draft-07 validation keyword as a typed attribute,
round-trips to/from JSON with unknown-keyword retention (mirroring
``Schema.UnmarshalJSON`` two-pass decode, ``/root/reference/entities.go:553-606``),
and supports triviality analysis (``Schema.IsTrivial``,
``/root/reference/helper.go:194-289``) used by the compiler for predicate
elision.

Union forms of the spec are modeled natively:

- ``SchemaOrBool`` (``entities.go:620-686``) → ``Rule | bool`` — ``True`` is the
  always-pass schema, ``False`` the always-fail schema.
- ``Items`` (``entities.go:689-748``) → ``Rule | bool | list[Rule|bool]``.
- ``Type`` (``entities.go:813-863``) → ``str | list[str]`` validated against the
  closed ``SimpleType`` enum (``entities.go:866-877``).
- ``DependenciesAdditionalProperties`` (``entities.go:751-810``) →
  ``list[str] | Rule | bool`` per dependency key.

``default``/``const`` distinguish *absent* from *present-as-null* via the
module-level :data:`ABSENT` sentinel (mirrors the raw-map probe at
``entities.go:570-582``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, fields
from typing import Any, Callable, Optional, Union


class _Absent:
    """Sentinel distinguishing 'keyword absent' from 'keyword present as null'."""

    _instance: Optional["_Absent"] = None

    def __new__(cls) -> "_Absent":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover
        return "ABSENT"

    def __bool__(self) -> bool:
        return False


ABSENT = _Absent()

#: Closed enum of simple types (``/root/reference/entities.go:866-877``).
SIMPLE_TYPES = frozenset(
    {"array", "boolean", "integer", "null", "number", "object", "string"}
)

RuleOrBool = Union["Rule", bool]


def _check_type(t: Union[str, list]) -> Union[str, list]:
    """Validate a type spec against the closed enum.

    Mirrors ``SimpleType.UnmarshalJSON`` enforcement
    (``/root/reference/entities.go:880-924``).
    """
    vals = [t] if isinstance(t, str) else list(t)
    for v in vals:
        if v not in SIMPLE_TYPES:
            raise ValueError(f"invalid simple type: {v!r} (allowed: {sorted(SIMPLE_TYPES)})")
    return t


# JSON keyword -> dataclass attribute. Order matches entities.go:16-67; the
# key set mirrors the 45 known keys deleted during two-pass decode
# (entities.go:504-550).
_KEYWORD_TO_ATTR = {
    "$id": "id",
    "$schema": "schema",
    "$ref": "ref",
    "$comment": "comment",
    "title": "title",
    "description": "description",
    "default": "default",
    "readOnly": "read_only",
    "writeOnly": "write_only",
    "deprecated": "deprecated",
    "examples": "examples",
    "multipleOf": "multiple_of",
    "maximum": "maximum",
    "exclusiveMaximum": "exclusive_maximum",
    "minimum": "minimum",
    "exclusiveMinimum": "exclusive_minimum",
    "maxLength": "max_length",
    "minLength": "min_length",
    "pattern": "pattern",
    "additionalItems": "additional_items",
    "items": "items",
    "maxItems": "max_items",
    "minItems": "min_items",
    "uniqueItems": "unique_items",
    "contains": "contains",
    "maxProperties": "max_properties",
    "minProperties": "min_properties",
    "required": "required",
    "additionalProperties": "additional_properties",
    "definitions": "definitions",
    "properties": "properties",
    "patternProperties": "pattern_properties",
    "dependencies": "dependencies",
    "propertyNames": "property_names",
    "const": "const",
    "enum": "enum",
    "type": "type",
    "format": "format",
    "contentMediaType": "content_media_type",
    "contentEncoding": "content_encoding",
    "if": "if_",
    "then": "then",
    "else": "else_",
    "allOf": "all_of",
    "anyOf": "any_of",
    "oneOf": "one_of",
    "not": "not_",
}
_ATTR_TO_KEYWORD = {v: k for k, v in _KEYWORD_TO_ATTR.items()}

# keywords whose values are themselves (schema | bool)
_SUBSCHEMA_KEYS = {
    "additionalItems",
    "contains",
    "additionalProperties",
    "propertyNames",
    "if",
    "then",
    "else",
    "not",
}
_SUBSCHEMA_MAP_KEYS = {"definitions", "properties", "patternProperties"}
_SUBSCHEMA_LIST_KEYS = {"allOf", "anyOf", "oneOf"}


@dataclass
class Rule:
    """One validation rule document — every draft-07 keyword.

    Field groups mirror ``/root/reference/entities.go:17-63``; unknown keywords
    land in :attr:`extra_properties` (``entities.go:64``).
    """

    # identity / meta (entities.go:17-27)
    id: Optional[str] = None
    schema: Optional[str] = None
    ref: Optional[str] = None
    comment: Optional[str] = None
    title: Optional[str] = None
    description: Optional[str] = None
    default: Any = ABSENT
    read_only: Optional[bool] = None
    write_only: Optional[bool] = None
    deprecated: Optional[bool] = None
    examples: Optional[list] = None
    # numeric (entities.go:28-32)
    multiple_of: Optional[float] = None
    maximum: Optional[float] = None
    exclusive_maximum: Optional[float] = None
    minimum: Optional[float] = None
    exclusive_minimum: Optional[float] = None
    # string (entities.go:33-35,54-56)
    max_length: Optional[int] = None
    min_length: int = 0
    pattern: Optional[str] = None
    format: Optional[str] = None
    content_media_type: Optional[str] = None
    content_encoding: Optional[str] = None
    # array (entities.go:36-41)
    additional_items: Optional[RuleOrBool] = None
    items: Optional[Union[RuleOrBool, list]] = None
    max_items: Optional[int] = None
    min_items: int = 0
    unique_items: Optional[bool] = None
    contains: Optional[RuleOrBool] = None
    # object (entities.go:42-50)
    max_properties: Optional[int] = None
    min_properties: int = 0
    required: Optional[list] = None
    additional_properties: Optional[RuleOrBool] = None
    definitions: Optional[dict] = None
    properties: Optional[dict] = None
    pattern_properties: Optional[dict] = None
    dependencies: Optional[dict] = None
    property_names: Optional[RuleOrBool] = None
    # value (entities.go:51-53)
    const: Any = ABSENT
    enum: Optional[list] = None
    type: Optional[Union[str, list]] = None
    # composition (entities.go:57-63)
    if_: Optional[RuleOrBool] = None
    then: Optional[RuleOrBool] = None
    else_: Optional[RuleOrBool] = None
    all_of: Optional[list] = None
    any_of: Optional[list] = None
    one_of: Optional[list] = None
    not_: Optional[RuleOrBool] = None
    # escape hatch (entities.go:64): unmatched keywords, round-tripped
    extra_properties: dict = field(default_factory=dict)
    # engine metadata (non-serialized back-pointers analog, entities.go:65-66):
    # marks an integer column reflected from an unsigned source so that
    # `minimum: 0` stays trivial (reflect.go:955-957, helper.go:200-212)
    reflect_unsigned: bool = False

    def __post_init__(self) -> None:
        if self.type is not None:
            _check_type(self.type)

    # ------------------------------------------------------------------ types
    def has_type(self, t: str) -> bool:
        """Mirror of ``Schema.HasType`` (``/root/reference/helper.go:292-310``)."""
        if self.type is None:
            return False
        if isinstance(self.type, str):
            return self.type == t
        return t in self.type

    def add_type(self, t: str) -> "Rule":
        """Mirror of ``Schema.AddType`` (``/root/reference/helper.go:145-175``)."""
        _check_type(t)
        if self.type is None:
            self.type = t
        elif isinstance(self.type, str):
            if self.type != t:
                self.type = [self.type, t]
        elif t not in self.type:
            self.type = [*self.type, t]
        return self

    def remove_type(self, t: str) -> "Rule":
        """Mirror of ``Schema.RemoveType`` (``/root/reference/helper.go:114-143``)."""
        if self.type is None:
            return self
        if isinstance(self.type, str):
            if self.type == t:
                self.type = None
            return self
        tt = [x for x in self.type if x != t]
        self.type = tt[0] if len(tt) == 1 else (tt or None)
        return self

    # ------------------------------------------------------------- triviality
    def is_trivial(
        self,
        ref_resolvers: Optional[list] = None,
        _seen_refs: Optional[frozenset] = None,
    ) -> bool:
        """True iff this rule imposes no constraint beyond type.

        Faithful port of ``Schema.IsTrivial``
        (``/root/reference/helper.go:194-289``) including:

        - composition keywords ⇒ non-trivial (helper.go:196-199)
        - ``minimum: 0`` stays trivial only when backed by an unsigned source
          type (helper.go:202-215 — we carry :attr:`reflect_unsigned`)
        - multi-type sets without ``null`` ⇒ non-trivial (helper.go:235)
        - recursive descent into items/additionalItems/additionalProperties/
          properties (helper.go:239-261)
        - ``$ref`` resolution with same-ref recursion guard (helper.go:263-288);
          an unresolvable ref is non-trivial.
        """
        resolvers: list[Callable[[str], Optional[RuleOrBool]]] = ref_resolvers or []
        seen = _seen_refs or frozenset()

        if self.all_of or self.any_of or self.one_of or self.not_ is not None:
            return False
        if self.if_ is not None or self.then is not None or self.else_ is not None:
            return False
        if self.minimum is not None and not (self.minimum == 0 and self.reflect_unsigned):
            return False
        if (
            self.multiple_of is not None
            or self.maximum is not None
            or self.exclusive_minimum is not None
            or self.exclusive_maximum is not None
        ):
            return False
        if self.min_length != 0 or self.max_length is not None or self.pattern is not None or self.format is not None:
            return False
        if self.min_items != 0 or self.max_items is not None or self.unique_items is not None or self.contains is not None:
            return False
        if self.min_properties != 0 or self.max_properties is not None or self.required or self.pattern_properties:
            return False
        if self.dependencies or self.property_names is not None:
            return False
        if self.const is not ABSENT or self.enum:
            return False
        if isinstance(self.type, list) and len(self.type) > 1 and not self.has_type("null"):
            return False
        if self.items is not None:
            if isinstance(self.items, list):
                if len(self.items) > 0:
                    return False
            elif not _sub_trivial(self.items, resolvers, seen):
                return False
        if self.additional_items is not None and not _sub_trivial(self.additional_items, resolvers, seen):
            return False
        if self.additional_properties is not None and not _sub_trivial(self.additional_properties, resolvers, seen):
            return False
        if self.properties:
            for ps in self.properties.values():
                if not _sub_trivial(ps, resolvers, seen):
                    return False

        if self.ref is None:
            return True

        # $ref: trivial only if resolvable AND the target is trivial; a
        # same-ref cycle counts as trivial to halt recursion (helper.go:263-270)
        if self.ref in seen:
            return True
        for resolve in resolvers:
            rs = resolve(self.ref)
            if rs is not None:
                return _sub_trivial(rs, resolvers, seen | {self.ref})
        return False

    # ---------------------------------------------------------- serialization
    def to_dict(self) -> dict:
        """Serialize to a JSON-compatible dict, union-merging extras.

        Mirrors ``Schema.MarshalJSON`` + ``marshalUnion``
        (``/root/reference/entities.go:609-615,926-972``). Keys emit in the
        keyword order of ``entities.go`` then sorted extras — deterministic.
        """
        out: dict = {}
        for kw, attr in _KEYWORD_TO_ATTR.items():
            v = getattr(self, attr)
            if kw in ("default", "const"):
                if v is not ABSENT:
                    out[kw] = v
                continue
            if kw in ("minLength", "minItems", "minProperties"):
                if v != 0:
                    out[kw] = v
                continue
            if v is None:
                continue
            if kw in _SUBSCHEMA_KEYS:
                out[kw] = _sub_to_json(v)
            elif kw in _SUBSCHEMA_MAP_KEYS:
                out[kw] = {k: _sub_to_json(s) for k, s in sorted(v.items())}
            elif kw in _SUBSCHEMA_LIST_KEYS:
                out[kw] = [_sub_to_json(s) for s in v]
            elif kw == "items":
                if isinstance(v, list):
                    out[kw] = [_sub_to_json(s) for s in v]
                else:
                    out[kw] = _sub_to_json(v)
            elif kw == "dependencies":
                out[kw] = {
                    k: (list(d) if isinstance(d, list) else _sub_to_json(d))
                    for k, d in sorted(v.items())
                }
            else:
                out[kw] = v
        for k in sorted(self.extra_properties):
            if k in out:
                raise ValueError(f"extra property collides with known keyword: {k}")
            out[k] = self.extra_properties[k]
        return out

    def to_json(self, **kw: Any) -> str:
        kw.setdefault("sort_keys", False)
        kw.setdefault("separators", (",", ":"))
        return json.dumps(self.to_dict(), **kw)

    @classmethod
    def from_dict(cls, d: dict) -> "Rule":
        """Two-pass decode mirroring ``Schema.UnmarshalJSON``
        (``/root/reference/entities.go:553-606``): known keys populate typed
        attributes, the rest is retained in ``extra_properties``.
        """
        r = cls()
        extras: dict = {}
        for k, v in d.items():
            attr = _KEYWORD_TO_ATTR.get(k)
            if attr is None:
                extras[k] = v
                continue
            if k in _SUBSCHEMA_KEYS:
                v = _sub_from_json(v)
            elif k in _SUBSCHEMA_MAP_KEYS:
                v = {pk: _sub_from_json(pv) for pk, pv in v.items()}
            elif k in _SUBSCHEMA_LIST_KEYS:
                v = [_sub_from_json(s) for s in v]
            elif k == "items":
                # Items union: single (schema|bool) vs positional array
                # (entities.go:689-748)
                v = [_sub_from_json(s) for s in v] if isinstance(v, list) else _sub_from_json(v)
            elif k == "dependencies":
                v = {
                    dk: (list(dv) if isinstance(dv, list) else _sub_from_json(dv))
                    for dk, dv in v.items()
                }
            elif k == "type":
                _check_type(v)
            setattr(r, attr, v)
        r.extra_properties = extras
        return r

    @classmethod
    def from_json(cls, s: str) -> "Rule":
        return cls.from_dict(json.loads(s))

    def copy(self) -> "Rule":
        """Deep copy via JSON round-trip — mirrors ``Schema.JSONSchema``
        (``/root/reference/helper.go:76-90``). ``reflect_unsigned`` is engine
        metadata and is carried over explicitly.
        """
        c = Rule.from_dict(self.to_dict())
        c.reflect_unsigned = self.reflect_unsigned
        return c


def _sub_trivial(s: RuleOrBool, resolvers: list, seen: frozenset) -> bool:
    """``SchemaOrBool.IsTrivial`` (``/root/reference/helper.go:178-191``):
    ``False`` schema is non-trivial; ``True``/absent is trivial."""
    if isinstance(s, bool):
        return s
    return s.is_trivial(resolvers, seen)


def _sub_to_json(s: RuleOrBool) -> Union[dict, bool]:
    if isinstance(s, bool):
        return s
    return s.to_dict()


def _sub_from_json(v: Union[dict, bool]) -> RuleOrBool:
    if isinstance(v, bool):
        return v
    return Rule.from_dict(v)


def to_simple_map(s: RuleOrBool) -> dict:
    """``SchemaOrBool.ToSimpleMap`` (``/root/reference/helper.go:323-347``):
    ``True`` → ``{}``, ``False`` → ``{"not": {}}``."""
    if s is True:
        return {}
    if s is False:
        return {"not": {}}
    return s.to_dict()


def from_simple_map(m: dict) -> Rule:
    """``SchemaOrBool.FromSimpleMap`` (``/root/reference/helper.go:349-359``)."""
    return Rule.from_dict(m)


@dataclass
class TableRule:
    """Validation plan document for one table: per-column rules + table-scope
    invariants. The per-column part mirrors ``properties``
    (``/root/reference/entities.go:47``); the table scope lifts ``uniqueItems``
    / ``dependencies`` to inter-row constraints (SURVEY.md §2.3).
    """

    name: str = "table"
    columns: dict = field(default_factory=dict)  # col -> Rule|bool
    #: column tuples that must be unique table-wide (uniqueItems lifted,
    #: entities.go:40)
    unique: list = field(default_factory=list)
    #: {"partition_by": col, "order_by": col, "start": 0} contiguity chains
    #: (dependencies lifted, entities.go:49)
    contiguous: list = field(default_factory=list)
    #: columns that must be non-decreasing within a partition key
    monotonic: list = field(default_factory=list)
    metadata: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "columns": {k: _sub_to_json(v) for k, v in sorted(self.columns.items())},
            "unique": [list(u) for u in self.unique],
            "contiguous": list(self.contiguous),
            "monotonic": list(self.monotonic),
            "metadata": dict(sorted(self.metadata.items())),
        }

    def to_json(self, **kw: Any) -> str:
        kw.setdefault("separators", (",", ":"))
        return json.dumps(self.to_dict(), **kw)

    @classmethod
    def from_dict(cls, d: dict) -> "TableRule":
        return cls(
            name=d.get("name", "table"),
            columns={k: _sub_from_json(v) for k, v in d.get("columns", {}).items()},
            unique=[tuple(u) for u in d.get("unique", [])],
            contiguous=list(d.get("contiguous", [])),
            monotonic=list(d.get("monotonic", [])),
            metadata=dict(d.get("metadata", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "TableRule":
        return cls.from_dict(json.loads(s))


def inline_refs(
    rule: "RuleOrBool", resolver, strict: bool = False, _stack: tuple = ()
) -> "RuleOrBool":
    """``InlineRefs`` analog (``/root/reference/context.go:216-221``): rewrite
    a rule document with every resolvable ``$ref`` replaced by its definition
    inline, recursively.

    Semantics preserved exactly: a node carrying BOTH ``$ref`` and other
    keywords validates as their conjunction in this engine, so the inlined
    definition lands in ``allOf`` next to the sibling keywords; a pure-ref
    node is replaced wholesale. Cyclic refs (self-recursive definitions) stay
    as refs — inlining them would not terminate, matching the reference's
    behavior of keeping recursive definitions ref'd.

    ``resolver``: ``ref string -> RuleOrBool | None`` (e.g.
    ``RuleRegistry.resolver()``); unresolvable refs are kept verbatim, or
    raise ``ValueError`` under ``strict=True`` (cyclic refs are still kept —
    only a ref the resolver cannot produce at all is an error). ``_stack``
    seeds the cycle-detection path — callers that already resolved an outer
    ref pass it so the cycle cut matches the caller's own recursion depth
    (``oracle.check_preds_sql`` mirrors ``compile_column``'s ref stack this
    way).

    The traversal is KEYWORD-AWARE: only the values of schema-bearing
    keywords are walked as schemas. Data-carrying keyword values
    (``const``/``enum``/``default``/``examples``...) pass through verbatim —
    a dict enum member or a property literally named ``"$ref"`` inside a
    ``properties`` map is data, not a reference (reflect.go resolves refs
    only at schema-node positions).
    """
    # keyword -> shape of its schema payload
    _MAP_OF_SCHEMAS = {"properties", "patternProperties", "definitions"}
    _SINGLE_SCHEMA = {
        "additionalItems", "additionalProperties", "contains",
        "propertyNames", "not", "if", "then", "else",
    }
    _LIST_OF_SCHEMAS = {"allOf", "anyOf", "oneOf"}

    def walk(node, stack):
        # `node` is always at a SCHEMA position here
        if isinstance(node, bool) or not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "$ref":
                out[k] = v
            elif k in _MAP_OF_SCHEMAS and isinstance(v, dict):
                out[k] = {name: walk(s, stack) for name, s in v.items()}
            elif k == "items":
                out[k] = (
                    [walk(x, stack) for x in v] if isinstance(v, list) else walk(v, stack)
                )
            elif k in _SINGLE_SCHEMA:
                out[k] = walk(v, stack)
            elif k in _LIST_OF_SCHEMAS and isinstance(v, list):
                out[k] = [walk(x, stack) for x in v]
            elif k == "dependencies" and isinstance(v, dict):
                # value per key: list of property names (data) OR a schema
                out[k] = {
                    dk: (list(dv) if isinstance(dv, list) else walk(dv, stack))
                    for dk, dv in v.items()
                }
            else:
                out[k] = v  # data-carrying keyword: verbatim
        ref = out.pop("$ref", None)
        if ref is not None:
            target = None if ref in stack else resolver(ref)
            if target is None:
                if strict and ref not in stack:
                    raise ValueError(f"unresolvable $ref: {ref}")
                out["$ref"] = ref  # cycle or unresolvable: keep the ref
            else:
                t = (
                    target
                    if isinstance(target, bool)
                    else walk(target.to_dict(), stack + (ref,))
                )
                if not out:
                    return t  # pure-ref node: replace wholesale
                if t is not True:  # `true` schema adds nothing to a conjunction
                    out.setdefault("allOf", []).append(t)
        return out

    if isinstance(rule, bool):
        return rule
    result = walk(rule.to_dict(), _stack)
    return result if isinstance(result, bool) else Rule.from_dict(result)
