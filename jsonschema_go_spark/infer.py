"""Schema inference — Spark ``StructType`` → :class:`TableRule` skeleton.

The Spark analog of the reference's reflection core: ``kindSwitch``
(``/root/reference/reflect.go:839-973``) dispatching physical types to JSON
types, ``walkProperties`` (``reflect.go:1065-1254``) walking fields, well-known
formats (``reflect.go:742-776``), nullability from field metadata
(``reflect.go:1320-1393``), and unsigned→``minimum: 0``
(``reflect.go:955-957`` — Spark has no unsigned types, so this arrives only
via the ``unsigned`` overlay flag, and keeps ``reflect_unsigned`` so the rule
stays trivial per ``helper.go:200-212``).

A rule *overlay* (dict of column → keyword dict) plays the role of Go field
tags (``README.md:73-113``): constraints merged onto the inferred skeleton.
Runtime-defined overlays mirror the virtual ``Struct``
(``/root/reference/struct.go:13-59``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import types as T

from .rules import Rule, TableRule


@dataclass
class PropParams:
    """``InterceptPropParams`` analog (``/root/reference/context.go:32-47``):
    per-column context handed to property interceptors. ``table_rule`` is
    live — a hook may e.g. append to ``metadata["required"]`` the way the
    reference's customTags test appends to ``ParentSchema.Required``
    (``reflect_test.go:1860-1880``)."""

    name: str
    dtype: T.DataType
    rule: Rule
    table_rule: TableRule


@dataclass
class NullabilityParams:
    """``InterceptNullabilityParams`` analog (``context.go:79-95``), invoked
    AFTER default nullability rules are applied; ``null_added`` mirrors
    ``NullAdded``. Hooks mutate ``rule`` in place (``AddType``/``RemoveType``)."""

    name: str
    dtype: T.DataType
    rule: Rule
    null_added: bool


def compose_prop_hooks(*hooks: Callable) -> Callable:
    """Stack property interceptors like ``InterceptProp``
    (``context.go:158-172``): earlier hooks run first; a hook may return a
    replacement Rule (None keeps the current one); exceptions short-circuit
    (the reference's error return)."""

    def composed(params: PropParams) -> Optional[Rule]:
        rule = params.rule
        for h in hooks:
            r = h(PropParams(params.name, params.dtype, rule, params.table_rule))
            if r is not None:
                rule = r
        return rule

    return composed


def compose_nullability_hooks(*hooks: Callable) -> Callable:
    """Stack nullability interceptors like ``InterceptNullability``
    (``context.go:100-115``): ALL hooks run, earlier first (no
    short-circuit)."""

    def composed(params: NullabilityParams) -> None:
        for h in hooks:
            h(params)

    return composed


def infer_column_rule(dtype: T.DataType, nullable: bool = True) -> Rule:
    """Map one Spark type to a rule skeleton (kindSwitch analog)."""
    r = Rule()
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        r.type = "integer"
    elif isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        r.type = "number"
    elif isinstance(dtype, T.BooleanType):
        r.type = "boolean"
    elif isinstance(dtype, T.StringType):
        r.type = "string"
    elif isinstance(dtype, T.BinaryType):
        # []byte → string+base64 (reflect.go:754-759)
        r.type = "string"
        r.format = "base64"
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # time.Time → date-time (reflect.go:761-766)
        r.type = "string"
        r.format = "date-time"
    elif isinstance(dtype, T.DateType):
        # jsonschema.Date → date (date.go:10-13)
        r.type = "string"
        r.format = "date"
    elif isinstance(dtype, T.ArrayType):
        r.type = "array"
        r.items = infer_column_rule(dtype.elementType, dtype.containsNull)
    elif isinstance(dtype, T.MapType):
        # map → object + additionalProperties (reflect.go:856-900)
        r.type = "object"
        r.additional_properties = infer_column_rule(
            dtype.valueType, dtype.valueContainsNull
        )
    elif isinstance(dtype, T.StructType):
        # struct → object + properties (walkProperties analog)
        r.type = "object"
        r.properties = {
            f.name: infer_column_rule(f.dataType, f.nullable) for f in dtype.fields
        }
        r.required = [f.name for f in dtype.fields if not f.nullable] or None
    else:
        # interface{} analog: unconstrained (reflect.go:432-434)
        pass
    if nullable and r.type is not None:
        r.add_type("null")  # pointer → nullable (reflect.go:439-441)
    return r


_SUPPORTED_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
    T.DoubleType, T.DecimalType, T.BooleanType, T.StringType, T.BinaryType,
    T.TimestampType, T.TimestampNTZType, T.DateType, T.ArrayType, T.MapType,
    T.StructType,
)


def _is_supported(dtype: T.DataType) -> bool:
    """Whether kindSwitch maps this Spark type to a JSON type (False = the
    `default` branch — ``reflect.go:966-971``)."""
    return isinstance(dtype, _SUPPORTED_TYPES)


_OVERLAY_KEYS = {
    # field-tag vocabulary (README.md:73-113) → Rule attributes
    "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf",
    "minLength", "maxLength", "pattern", "format", "enum", "const", "default",
    "minItems", "maxItems", "uniqueItems", "title", "description", "required",
    "nullable", "unsigned", "items", "contains", "minProperties", "maxProperties",
}


def apply_property_name_mapping(df, mapping: dict):
    """Rename DataFrame columns per a property-name map before inference —
    ``MakePropertyNameMapping`` analog (``/root/reference/reflect.go:976-984``,
    ``PropertyNameMapping`` option ``context.go:201-207``)."""
    out = df
    for src, dst in mapping.items():
        out = out.withColumnRenamed(src, dst)
    return out


def infer_table_rule(
    schema: T.StructType,
    overlay: Optional[dict] = None,
    name: str = "table",
    type_mapping: Optional[dict] = None,
    intercept_prop: Optional[Callable[[PropParams], Optional[Rule]]] = None,
    intercept_nullability: Optional[Callable[[NullabilityParams], None]] = None,
    envelop_nullability: bool = False,
    skip_embedded_maps_slices: bool = False,
    skip_unsupported: bool = False,
) -> TableRule:
    """StructType + constraint overlay → TableRule.

    ``overlay`` maps column → dict of draft-07 keywords (plus engine keys
    ``required``/``nullable``/``unsigned`` mirroring the reference's
    ``required:"true"``/``nullable:"true"`` tags, ``reflect.go:1144-1154``).
    Table-scope keys in ``overlay``: ``"$unique"`` (list of column tuples),
    ``"$contiguous"``, ``"$monotonic"``.

    ``type_mapping`` maps a Spark type's ``simpleString()`` (e.g.
    ``"decimal(10,2)"``, ``"string"``) to a rule-JSON dict used INSTEAD of
    the kindSwitch skeleton for columns of that type — ``AddTypeMapping``
    analog (``/root/reference/reflect.go:103-114``).

    ``intercept_prop`` / ``intercept_nullability`` are the ``InterceptProp``
    and ``InterceptNullability`` analogs (``/root/reference/context.go:
    100-115,158-172``) — per-column hooks called after the overlay merge and
    after default nullability, respectively; stack several with
    :func:`compose_prop_hooks` / :func:`compose_nullability_hooks`.

    ``skip_embedded_maps_slices=True`` mirrors ``SkipEmbeddedMapsSlices``
    (``/root/reference/context.go:231-236``): map/array columns with NO
    explicit overlay are left out of the rule document entirely (no inferred
    skeleton). ``skip_unsupported=True`` mirrors ``SkipUnsupportedProperties``
    (``context.go:238-243``): columns whose Spark type maps to no JSON type
    are dropped instead of carried as unconstrained rules.

    ``envelop_nullability=True`` mirrors ``EnvelopNullability``
    (``/root/reference/reflect.go:1361-1393``): a nullable ``$ref``'d column
    rule is rewritten to the standards-conformant
    ``anyOf: [{type: "null"}, {$ref: ...}]`` envelope instead of relying on
    the engine's nullable bit ($ref siblings are ignored by strict draft-07
    validators, so the null alternative must be lifted into anyOf).
    """
    type_mapping = {k: v for k, v in (type_mapping or {}).items()}
    overlay = dict(overlay or {})
    unique = [tuple(u) for u in overlay.pop("$unique", [])]
    contiguous = list(overlay.pop("$contiguous", []))
    monotonic = list(overlay.pop("$monotonic", []))

    tr = TableRule(name=name, unique=unique, contiguous=contiguous, monotonic=monotonic)
    required_cols = []
    for f in schema.fields:
        has_overlay = f.name in overlay
        cfg = dict(overlay.pop(f.name, {}))
        if (
            skip_embedded_maps_slices
            and isinstance(f.dataType, (T.MapType, T.ArrayType))
            and not has_overlay
        ):
            continue
        if skip_unsupported and not _is_supported(f.dataType):
            continue
        required = bool(cfg.pop("required", not f.nullable))
        nullable = bool(cfg.pop("nullable", f.nullable and not required))
        unsigned = bool(cfg.pop("unsigned", False))
        mapped = type_mapping.get(f.dataType.simpleString())
        if mapped is not None:
            rule = Rule.from_dict(dict(mapped))
            if nullable:
                rule.add_type("null")
        else:
            rule = infer_column_rule(f.dataType, nullable)
        for k, v in cfg.items():
            if k not in _OVERLAY_KEYS:
                rule.extra_properties[k] = v  # unknown keyword retention
                continue
            sub = Rule.from_dict({k: v}) if k in ("items", "contains") else None
            if sub is not None:
                setattr(rule, "items" if k == "items" else "contains",
                        getattr(sub, "items" if k == "items" else "contains"))
            else:
                Rule.from_dict({k: v})  # validate the keyword value parses
                merged = rule.to_dict()
                merged[k] = v
                keep_unsigned = rule.reflect_unsigned
                rule = Rule.from_dict(merged)
                rule.reflect_unsigned = keep_unsigned
        if unsigned:
            rule.minimum = 0 if rule.minimum is None else rule.minimum
            rule.reflect_unsigned = True
        if required:
            required_cols.append(f.name)
        if intercept_prop is not None:
            replacement = intercept_prop(PropParams(f.name, f.dataType, rule, tr))
            if replacement is not None:
                rule = replacement
        # NullAdded must reflect the pre-envelope state: the envelope moves
        # the null alternative into anyOf, but null WAS added for the column
        null_added = rule.has_type("null")
        if envelop_nullability and rule.ref is not None and nullable:
            # EnvelopNullability (reflect.go:1375-1388): inner keeps the full
            # schema (the reference copies *propertySchema), outer drops the
            # ref and gains the anyOf envelope. The null member lives ONLY in
            # the envelope (the reference never adds the null type to a ref'd
            # schema — reflect.go:1371: AddType(Null) requires Ref == nil)
            inner = Rule.from_dict(rule.to_dict())
            inner.remove_type("null")
            rule.ref = None
            rule.remove_type("null")
            rule.any_of = [Rule(type="null"), inner]
            null_added = True
        if intercept_nullability is not None:
            intercept_nullability(
                NullabilityParams(f.name, f.dataType, rule, null_added)
            )
        tr.columns[f.name] = rule
    if overlay:
        raise ValueError(f"overlay references unknown columns: {sorted(overlay)}")
    tr.metadata["required"] = required_cols
    return tr
