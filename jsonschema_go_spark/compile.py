"""Predicate compiler — rule documents → native Spark ``Column`` predicates.

This is the engine's heart: every draft-07 validation keyword
(``/root/reference/entities.go:16-67``) compiles to a JVM-side boolean
expression (whole-stage codegen; no Python in the hot path). The compiler is
the Spark re-expression of the reference's reflection pipeline:

- ``Reflector.Reflect`` (``/root/reference/reflect.go:269-306``) →
  :func:`compile_table` building a :class:`ValidationPlan`;
- definition registry / ``$ref`` reuse (``reflect.go:327-381,498-500``) →
  :class:`RuleRegistry` resolution with cycle guard;
- ``IsTrivial`` elision (``/root/reference/helper.go:194-289``) → trivial rules
  compile to *nothing* (the column is never scanned — parquet column pruning
  then applies);
- interceptors (``/root/reference/context.go:124-172``) →
  :attr:`CompileOptions.intercept_check` rewrite hooks.

Null semantics for flat columns: a NULL cell models an *absent* property, so
only ``required`` (``entities.go:44``) fails it; every other keyword applies
to present values only (mirrors pointer→nullable mapping,
``/root/reference/reflect.go:439-441,1332-1393``).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from functools import reduce
from typing import Callable, Dict, List, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.formats import format_predicate
from .rules import ABSENT, Rule, RuleOrBool, TableRule

#: relative tolerance for float `multipleOf` (SURVEY.md §7 hard parts)
MULTIPLE_OF_EPS = 1e-9

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def to_camel(s: str) -> str:
    """CamelCase conversion with the reference's rules
    (``/root/reference/camelcase.go:14-50``): digit runs are split from
    letters and kept, separators (``_ - . space``) capitalize the next
    letter, everything else is dropped."""
    s = re.sub(r"([a-zA-Z])(\d+)([a-zA-Z]?)", r"\1 \2 \3", s).strip()
    out, cap_next = [], True
    for ch in s:
        if ch.isupper() or ch.isdigit() or ch in "[]":
            out.append(ch)
        elif ch.islower():
            out.append(ch.upper() if cap_next else ch)
        cap_next = ch in "_ -.[]"
    return "".join(out)


class DefNameRegistry:
    """Definition-name generator with camelCase + conflict suffixing —
    ``Reflector.defName`` analog (``/root/reference/reflect.go:780-837``):
    the same owner always gets the same name; a different owner colliding on
    a taken name gets ``Type2``, ``Type3``, … appended."""

    def __init__(self, rewrite: Optional[Callable[[str, str], str]] = None) -> None:
        #: optional (owner, default_name) -> name hook (DefName analog)
        self.rewrite = rewrite
        self._names: Dict[str, str] = {}  # name -> owner key

    def name_for(self, owner: str, raw: str, camel: bool = True) -> str:
        attempt = 1
        while True:
            name = to_camel(raw) if camel else raw
            if self.rewrite is not None:
                name = self.rewrite(owner, name)
            if attempt > 1:
                name = f"{name}Type{attempt}"
            taken_by = self._names.get(name)
            if taken_by is None or taken_by == owner:
                self._names[name] = owner
                return name
            attempt += 1


class RuleRegistry:
    """Shared-definition registry — the compiled-predicate analog of
    ``rc.definitions`` + ``reflectDefer`` (``/root/reference/reflect.go:327-381``).

    Keys are ``$ref`` strings (``#/definitions/Name``); JSON-pointer escaping
    ``~0``/``~1``/``%25`` mirrors ``Ref`` (``/root/reference/reflect.go:72-90``).

    ``on_register`` streams every (name, rule) registration to a callback —
    the ``CollectDefinitions`` analog (``/root/reference/context.go:12-16``):
    at cluster scale rule documents for thousands of tables are collected
    into an external catalog instead of accumulating in one document.
    """

    def __init__(
        self,
        prefix: str = "#/definitions/",
        on_register: Optional[Callable[[str, RuleOrBool], None]] = None,
    ) -> None:
        self.prefix = prefix
        self.on_register = on_register
        self._defs: Dict[str, RuleOrBool] = {}

    @staticmethod
    def escape(name: str) -> str:
        return name.replace("~", "~0").replace("/", "~1").replace("%", "%25")

    def register(self, name: str, rule: RuleOrBool) -> str:
        ref = self.prefix + self.escape(name)
        self._defs[ref] = rule
        if self.on_register is not None:
            self.on_register(name, rule)
        return ref

    def resolve(self, ref: str) -> Optional[RuleOrBool]:
        return self._defs.get(ref)

    def refs(self) -> List[str]:
        """Registered ``$ref`` keys (empty ⇒ no definitions anywhere)."""
        return list(self._defs)

    def resolver(self) -> Callable[[str], Optional[RuleOrBool]]:
        return self.resolve

    def load_definitions(self, rule: Rule) -> None:
        """Pull ``definitions`` (``entities.go:46``) into the registry."""
        for name, sub in (rule.definitions or {}).items():
            self.register(name, sub)


@dataclass
class CompiledCheck:
    """One compiled keyword check: pass/fail per row."""

    rule_id: str  # e.g. "role.enum" — defName analog (reflect.go:780-837)
    column: str
    keyword: str
    predicate: Column  # True/None→pass handling applied by caller
    expected: str  # human-readable expectation for violation rows


@dataclass
class CompileOptions:
    """Per-run config — option-pattern analog of ``ReflectContext`` setters
    (``/root/reference/context.go:191-244``)."""

    definitions_prefix: str = "#/definitions/"
    #: skip checks that IsTrivial proves cannot fail (helper.go:194)
    elide_trivial: bool = True
    #: hook: (CompiledCheck) -> CompiledCheck|None (drop) — InterceptSchema
    #: analog (context.go:124-140); compose several with
    #: :func:`compose_intercept_checks`
    intercept_check: Optional[Callable[[CompiledCheck], Optional[CompiledCheck]]] = None
    #: hook: (column, keyword, default_id) -> rule_id — InterceptDefName
    #: analog (``/root/reference/context.go:174-188``); compose several with
    #: :func:`compose_def_names`
    intercept_def_name: Optional[Callable[[str, str, str], str]] = None
    #: CamelCase rule ids with conflict suffixing via DefNameRegistry
    #: (``reflect.go:780-837`` naming; default keeps `col.keyword` ids)
    camel_def_names: bool = False
    #: stream (name, rule) definition registrations — CollectDefinitions
    #: analog (``/root/reference/context.go:12-16``)
    collect_definitions: Optional[Callable[[str, "RuleOrBool"], None]] = None
    #: False (default): unknown `format` names are annotations (always-pass);
    #: True: unknown formats raise CompileError at compile time
    strict_formats: bool = False
    multiple_of_eps: float = MULTIPLE_OF_EPS
    #: post-compile plan-rewrite hook — Preparer analog
    #: (``/root/reference/reflect.go:533-541``, ``helper.go:26-28``);
    #: (ValidationPlan) -> ValidationPlan
    prepare_plan: Optional[Callable] = None


class CompileError(ValueError):
    pass


def compose_intercept_checks(*hooks: Callable) -> Callable:
    """Compose check interceptors the way the reference stacks
    ``InterceptSchema`` hooks (``/root/reference/context.go:124-140``):
    earlier-registered hooks run first, and a hook dropping the check
    (returning None — the reference's ``stop``) short-circuits the rest."""

    def composed(check: CompiledCheck) -> Optional[CompiledCheck]:
        out = check
        for h in hooks:
            out = h(out)
            if out is None:
                return None
        return out

    return composed


def strip_def_name_prefix(*prefixes: str) -> Callable[[str, str, str], str]:
    """``StripDefinitionNamePrefix`` analog
    (``/root/reference/context.go:223-229``, ``strings.TrimPrefix`` over the
    configured prefixes): returns an ``intercept_def_name`` hook removing the
    first matching prefix from generated rule ids."""

    def hook(column: str, keyword: str, default_id: str) -> str:
        for p in prefixes:
            if default_id.startswith(p):
                return default_id[len(p):]
        return default_id

    return hook


def compose_def_names(*hooks: Callable) -> Callable:
    """Compose rule-id interceptors the way ``InterceptDefName`` stacks
    (``/root/reference/context.go:174-188``): each hook receives the previous
    hook's output as the default name."""

    def composed(column: str, keyword: str, default_id: str) -> str:
        out = default_id
        for h in hooks:
            out = h(column, keyword, out)
        return out

    return composed


# --------------------------------------------------------------------------
# helpers


def _is_integral(v: float) -> bool:
    return float(v).is_integer()


def _null_pass(pred: Column, null_ok: bool = True) -> Column:
    """Three-valued-logic guard: a NULL input (or NULL sub-result) resolves to
    ``null_ok`` instead of propagating SQL NULL into the verdict."""
    return F.coalesce(pred, F.lit(null_ok))


def _validate_java_regex(pattern: str) -> None:
    # Spark rlike is Java regex; Python `re` accepts a common subset — compile
    # here to fail fast on garbage. Dialect deltas documented in SURVEY.md §7.
    try:
        re.compile(pattern)
    except re.error as e:  # pragma: no cover
        raise CompileError(f"invalid pattern {pattern!r}: {e}") from e


def _type_check(types: List[str], c: Column, dtype: T.DataType) -> Optional[Column]:
    """Data-level ``type`` check (``entities.go:53,813-877``).

    For natively-typed columns most of the check is static (the Spark schema
    already guarantees it) — returns None when nothing can fail at runtime.
    ``integer`` accepts integral-valued floats (draft-07: 1.0 is an integer).
    """
    non_null = [t for t in types if t != "null"]
    if not non_null:
        # ONLY null allowed: any present (non-null) value fails — the caller's
        # isNull guard turns this into "pass iff null" (draft-07 {type:null})
        return F.lit(False)

    if isinstance(dtype, T.StringType):
        preds = []
        for t in non_null:
            if t == "string":
                return None  # statically satisfied
            if t == "integer":
                preds.append(c.rlike(r"^-?\d+(\.0+)?$"))
            elif t == "number":
                # try_cast: Spark 4 ANSI mode makes plain cast THROW on
                # malformed strings instead of yielding NULL
                preds.append(c.try_cast("double").isNotNull())
            elif t == "boolean":
                preds.append(F.lower(c).isin("true", "false"))
            else:  # array/object cannot inhabit a string column
                preds.append(F.lit(False))
        return reduce(lambda a, b: a | b, preds)

    static_ok = {
        "string": (T.StringType, T.VarcharType, T.CharType, T.TimestampType, T.TimestampNTZType, T.DateType, T.BinaryType),
        "integer": _INTEGRAL_TYPES,
        "number": _NUMERIC_TYPES,
        "boolean": (T.BooleanType,),
        "array": (T.ArrayType,),
        "object": (T.StructType, T.MapType),
    }
    for t in non_null:
        if isinstance(dtype, static_ok.get(t, ())):
            return None
    # dynamic residue: `integer` over fractional numeric ⇒ integral-value check
    if "integer" in non_null and isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        d = c.cast("double")
        return d == F.floor(d)
    # no allowed type matches this column's physical type: always fail
    return F.lit(False)


def _lit(v) -> Column:
    return F.lit(v)


# --------------------------------------------------------------------------
# core recursive predicate (single combined Column) — used in nested contexts
# (array items, map values, composition) where per-keyword granularity would
# explode; mirrors the recursive descent of `reflect` (reflect.go:405-544).


def compile_pred(
    rule: RuleOrBool,
    c: Column,
    dtype: T.DataType,
    registry: Optional[RuleRegistry] = None,
    options: Optional[CompileOptions] = None,
    _ref_stack: tuple = (),
) -> Column:
    """Compile a (sub)rule to ONE boolean Column: True ⇔ value passes.

    A NULL value passes (presence is governed by ``required`` at the caller).
    Boolean schemas: ``True`` → ``lit(True)``, ``False`` → ``lit(False)``
    (``/root/reference/entities.go:620-686``, ``helper.go:323-347``).
    """
    opts = options or CompileOptions()
    if rule is True:
        return F.lit(True)
    if rule is False:
        return F.lit(False)

    preds: List[Column] = []

    def add(p: Optional[Column]) -> None:
        if p is not None:
            preds.append(_null_pass(p))

    # --- $ref resolution with same-ref cycle guard (helper.go:263-288)
    if rule.ref is not None:
        if rule.ref in _ref_stack:
            pass  # cycle: treat as pass to halt recursion
        elif registry is not None:
            target = registry.resolve(rule.ref)
            if target is None:
                raise CompileError(f"unresolvable $ref: {rule.ref}")
            add(compile_pred(target, c, dtype, registry, opts, _ref_stack + (rule.ref,)))
        else:
            raise CompileError(f"$ref without registry: {rule.ref}")

    for kw, pred in _keyword_preds(rule, c, dtype, registry, opts, _ref_stack):
        add(pred)

    if not preds:
        return F.lit(True)
    combined = reduce(lambda a, b: a & b, preds)
    # NULL input ⇒ pass (absent property; required handled by caller)
    return F.when(c.isNull(), F.lit(True)).otherwise(combined)


def _keyword_preds(
    rule: Rule,
    c: Column,
    dtype: T.DataType,
    registry: Optional[RuleRegistry],
    opts: CompileOptions,
    ref_stack: tuple,
):
    """Yield (keyword, Column|None) for every assertion keyword present.

    Annotation keywords (`title`, `description`, `default`, `examples`,
    `readOnly`, `writeOnly`, `deprecated`, `$comment`, `contentMediaType`,
    `contentEncoding`) yield nothing — mirrors `SkipNonConstraints`
    (``/root/reference/context.go:313-314``).
    """

    def sub(r: RuleOrBool, ce: Column, dt: T.DataType) -> Column:
        return compile_pred(r, ce, dt, registry, opts, ref_stack)

    # ---- value keywords (entities.go:51-53)
    if rule.type is not None:
        types = [rule.type] if isinstance(rule.type, str) else list(rule.type)
        yield "type", _type_check(types, c, dtype)
    if rule.const is not ABSENT:
        v = rule.const
        yield "const", (c.isNull() if v is None else (c == _lit(v)))
    if rule.enum:
        complex_members = [v for v in rule.enum if isinstance(v, (list, dict))]
        if complex_members:
            # silently dropping them would wrongly FAIL cells equal to a
            # complex member — refuse instead (rule docs are user data)
            raise CompileError(
                f"unsupported complex enum members: {complex_members!r}"
            )
        non_null = [v for v in rule.enum if v is not None]
        has_null = any(v is None for v in rule.enum)
        # empty scalar set (e.g. enum=[null]): isin(*[]) would throw — only
        # the null alternative (if any) can pass
        p = c.isin(*non_null) if non_null else F.lit(False)
        if has_null:
            p = p | c.isNull()
        yield "enum", p

    # ---- numeric (entities.go:28-32)
    if rule.minimum is not None:
        yield "minimum", c >= _lit(rule.minimum)
    if rule.maximum is not None:
        yield "maximum", c <= _lit(rule.maximum)
    if rule.exclusive_minimum is not None:
        yield "exclusiveMinimum", c > _lit(rule.exclusive_minimum)
    if rule.exclusive_maximum is not None:
        yield "exclusiveMaximum", c < _lit(rule.exclusive_maximum)
    if rule.multiple_of is not None:
        m = float(rule.multiple_of)
        if m <= 0:
            raise CompileError("multipleOf must be > 0")
        if _is_integral(m) and isinstance(dtype, _INTEGRAL_TYPES):
            yield "multipleOf", (c % _lit(int(m))) == 0
        else:
            # float-tolerant: |x/m - round(x/m)| <= eps (SURVEY.md §7)
            q = c.cast("double") / _lit(m)
            yield "multipleOf", F.abs(q - F.round(q, 0)) <= _lit(opts.multiple_of_eps)

    # ---- string (entities.go:33-35,54)
    str_c = c if isinstance(dtype, T.StringType) else c.cast("string")
    if rule.min_length:
        # char (rune) semantics: Spark length() on string counts characters ✓
        yield "minLength", F.length(str_c) >= _lit(int(rule.min_length))
    if rule.max_length is not None:
        yield "maxLength", F.length(str_c) <= _lit(int(rule.max_length))
    if rule.pattern is not None:
        _validate_java_regex(rule.pattern)
        # unanchored substring-match ✓ (JSON Schema pattern semantics)
        yield "pattern", str_c.rlike(rule.pattern)
    if rule.format is not None:
        if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            pass  # natively typed: statically valid
        else:
            from .functions.formats import FORMAT_PREDICATES

            # single strictness source: format_predicate raises KeyError for
            # unknown+strict; translated to the compiler's error type here
            try:
                pred = format_predicate(rule.format, str_c, strict=opts.strict_formats)
            except KeyError as e:
                # e.args[0], not str(e): KeyError str() wraps in extra quotes
                raise CompileError(e.args[0]) from e
            if rule.format in FORMAT_PREDICATES:
                yield "format", pred
            # else annotation-only: no check row (oracle.summary_sql parity)

    # ---- array (entities.go:36-41)
    if isinstance(dtype, T.ArrayType):
        elem_t = dtype.elementType
        if rule.min_items:
            yield "minItems", F.size(c) >= _lit(int(rule.min_items))
        if rule.max_items is not None:
            yield "maxItems", F.size(c) <= _lit(int(rule.max_items))
        if rule.unique_items:
            yield "uniqueItems", F.size(c) == F.size(F.array_distinct(c))
        if rule.contains is not None:
            yield "contains", F.exists(c, lambda x: sub(rule.contains, x, elem_t))
        if rule.items is not None:
            if isinstance(rule.items, list):
                # positional tuple (entities.go:689-748): element i must match
                # schema i when present; additionalItems governs the tail
                # (entities.go:36)
                tuple_preds = []
                for i, s in enumerate(rule.items):
                    tuple_preds.append(
                        (F.size(c) <= i) | _null_pass(sub(s, F.element_at(c, i + 1), elem_t))
                    )
                yield "items", reduce(lambda a, b: a & b, tuple_preds)
                if rule.additional_items is not None and rule.additional_items is not True:
                    n = len(rule.items)
                    tail_ok = F.forall(
                        F.slice(c, n + 1, F.greatest(F.size(c) - n, F.lit(0))),
                        lambda x: _null_pass(sub(rule.additional_items, x, elem_t)),
                    )
                    yield "additionalItems", F.when(F.size(c) > n, tail_ok).otherwise(F.lit(True))
            else:
                yield "items", F.forall(c, lambda x: _null_pass(sub(rule.items, x, elem_t)))

    # ---- object over MapType (entities.go:42-50); StructType handled
    # statically by infer/compile_table (fields are known at plan time)
    if isinstance(dtype, T.MapType):
        vt = dtype.valueType
        keys = F.map_keys(c)
        if rule.min_properties:
            yield "minProperties", F.size(keys) >= _lit(int(rule.min_properties))
        if rule.max_properties is not None:
            yield "maxProperties", F.size(keys) <= _lit(int(rule.max_properties))
        if rule.required:
            req = reduce(
                lambda a, b: a & b,
                [F.array_contains(keys, k) for k in rule.required],
            )
            yield "required", req
        known = sorted((rule.properties or {}).keys())
        if rule.properties:
            prop_preds = [
                _null_pass(sub(s, F.element_at(c, k), vt))
                for k, s in sorted(rule.properties.items())
            ]
            yield "properties", reduce(lambda a, b: a & b, prop_preds)
        if rule.additional_properties is not None:
            extra_keys = (
                F.filter(keys, lambda k: ~k.isin(*known)) if known else keys
            )
            if rule.additional_properties is False:
                # bool form (reflect.go:1106-1113): no unknown keys allowed
                yield "additionalProperties", F.size(extra_keys) == 0
            elif rule.additional_properties is not True:
                yield "additionalProperties", F.forall(
                    extra_keys,
                    lambda k: _null_pass(sub(rule.additional_properties, F.element_at(c, k), vt)),
                )
        if rule.pattern_properties:
            # factory closure: the forall lambda must take exactly one arg
            # (extra default args would receive the array index)
            def _pp_pred(pat: str, s: RuleOrBool):
                return lambda e: _null_pass(
                    ~e.getField("key").rlike(pat)
                    | _null_pass(sub(s, e.getField("value"), vt))
                )

            for pat, s in sorted(rule.pattern_properties.items()):
                _validate_java_regex(pat)
                yield "patternProperties", F.forall(F.map_entries(c), _pp_pred(pat, s))
        if rule.property_names is not None:
            yield "propertyNames", F.forall(
                keys, lambda k: _null_pass(sub(rule.property_names, k, T.StringType()))
            )
        if rule.dependencies:
            # key present ⇒ (required keys present | schema holds on object)
            # (entities.go:49,751-810)
            for k, dep in sorted(rule.dependencies.items()):
                present = F.array_contains(keys, k)
                if isinstance(dep, list):
                    dep_ok = reduce(
                        lambda a, b: a & b,
                        [F.array_contains(keys, d) for d in dep],
                    ) if dep else F.lit(True)
                else:
                    dep_ok = _null_pass(sub(dep, c, dtype))
                yield "dependencies", ~present | dep_ok

    if isinstance(dtype, T.StructType) and rule.properties:
        prop_preds = []
        for k, s in sorted(rule.properties.items()):
            if k not in dtype.names:
                # static schema: missing field ⇒ property absent ⇒ pass
                continue
            prop_preds.append(_null_pass(sub(s, c.getField(k), dtype[k].dataType)))
        if prop_preds:
            yield "properties", reduce(lambda a, b: a & b, prop_preds)
    if isinstance(dtype, T.StructType) and rule.required:
        req_preds = [
            (c.getField(k).isNotNull() if k in dtype.names else F.lit(False))
            for k in rule.required
        ]
        yield "required", reduce(lambda a, b: a & b, req_preds)

    # ---- composition (entities.go:57-63)
    if rule.all_of:
        yield "allOf", reduce(lambda a, b: a & b, [_null_pass(sub(s, c, dtype)) for s in rule.all_of])
    if rule.any_of:
        yield "anyOf", reduce(lambda a, b: a | b, [_null_pass(sub(s, c, dtype), False) for s in rule.any_of])
    if rule.one_of:
        n = reduce(
            lambda a, b: a + b,
            [F.when(_null_pass(sub(s, c, dtype), False), 1).otherwise(0) for s in rule.one_of],
        )
        yield "oneOf", n == 1
    if rule.not_ is not None:
        yield "not", ~_null_pass(sub(rule.not_, c, dtype), False)
    if rule.if_ is not None:
        if_p = _null_pass(sub(rule.if_, c, dtype), False)
        then_p = _null_pass(sub(rule.then, c, dtype)) if rule.then is not None else F.lit(True)
        else_p = _null_pass(sub(rule.else_, c, dtype)) if rule.else_ is not None else F.lit(True)
        yield "if", F.when(if_p, then_p).otherwise(else_p)


# --------------------------------------------------------------------------
# per-keyword granular compilation for top-level columns (violation reporting)

_EXPECTED_FMT = {
    "type": lambda r: f"type {r.type}",
    "const": lambda r: f"const {r.const!r}",
    "enum": lambda r: f"in {r.enum}",
    "minimum": lambda r: f">= {r.minimum}",
    "maximum": lambda r: f"<= {r.maximum}",
    "exclusiveMinimum": lambda r: f"> {r.exclusive_minimum}",
    "exclusiveMaximum": lambda r: f"< {r.exclusive_maximum}",
    "multipleOf": lambda r: f"multipleOf {r.multiple_of}",
    "minLength": lambda r: f"length >= {r.min_length}",
    "maxLength": lambda r: f"length <= {r.max_length}",
    "pattern": lambda r: f"matches /{r.pattern}/",
    "format": lambda r: f"format {r.format}",
    "minItems": lambda r: f"size >= {r.min_items}",
    "maxItems": lambda r: f"size <= {r.max_items}",
    "uniqueItems": lambda r: "unique items",
    "contains": lambda r: "contains matching item",
    "items": lambda r: "all items match",
    "additionalItems": lambda r: "tail items match",
    "minProperties": lambda r: f"props >= {r.min_properties}",
    "maxProperties": lambda r: f"props <= {r.max_properties}",
    "required": lambda r: f"required {r.required}",
    "properties": lambda r: "properties match",
    "additionalProperties": lambda r: "no/valid additional properties",
    "patternProperties": lambda r: "pattern properties match",
    "propertyNames": lambda r: "property names match",
    "dependencies": lambda r: "dependencies hold",
    "allOf": lambda r: "all subschemas",
    "anyOf": lambda r: "any subschema",
    "oneOf": lambda r: "exactly one subschema",
    "not": lambda r: "negated subschema",
    "if": lambda r: "conditional subschema",
    "$ref": lambda r: f"$ref {r.ref}",
}


def expected_annotation(rule: RuleOrBool, keyword: str) -> str:
    """The ``expected`` string a :class:`CompiledCheck` carries for this
    keyword — pure Python (no Column construction, no SparkContext), so
    :func:`oracle.violations_sql` can mirror violation rows byte-for-byte at
    import time. COLUMN-level presence checks (``keyword="required"`` on a
    table-required column) carry ``"non-null"``; the object-keyword
    ``required`` of a map/struct rule carries the list form."""
    if keyword == "column-required":
        return "non-null"
    if rule is False:
        return "always-fail schema"
    if keyword == "$ref":
        # same string compile_column builds inline for its $ref check
        return f"$ref {rule.ref}"
    return _EXPECTED_FMT[keyword](rule)


def compile_column(
    name: str,
    rule: RuleOrBool,
    dtype: T.DataType,
    required: bool = False,
    registry: Optional[RuleRegistry] = None,
    options: Optional[CompileOptions] = None,
    def_names: Optional[DefNameRegistry] = None,
) -> List[CompiledCheck]:
    """Compile one column's rule to per-keyword checks (granular rule_ids for
    violation rows). Trivial rules compile to nothing when
    ``options.elide_trivial`` (IsTrivial elision, ``helper.go:194``); a
    ``required`` column always keeps its presence check.
    """
    opts = options or CompileOptions()
    out: List[CompiledCheck] = []
    c = F.col(name)

    names = def_names if def_names is not None else _def_name_registry(opts)

    def rid(keyword: str) -> str:
        # defName generation with InterceptDefName rewrite hook
        # (``/root/reference/context.go:174-188``, ``reflect.go:780-837``).
        # Under camel_def_names the hook runs INSIDE the registry (via its
        # rewrite parameter) so conflict suffixing sees post-rewrite names —
        # the reference's order: DefName hook, THEN TypeN de-duplication.
        if opts.camel_def_names:
            return names.name_for(f"{name}.{keyword}", f"{name} {keyword}")
        if opts.intercept_def_name is not None:
            # a rewrite hook can map distinct defaults to one name (e.g. a
            # prefix-strip of 'user_a.x' onto 'a.x') — route through the
            # registry so collisions get TypeN suffixes instead of silently
            # merging two checks' violation attribution
            return names.name_for(
                f"{name}.{keyword}", f"{name}.{keyword}", camel=False
            )
        return f"{name}.{keyword}"

    if required:
        out.append(
            CompiledCheck(rid("required"), name, "required", c.isNotNull(), "non-null")
        )

    if rule is True:
        checks = []
    elif rule is False:
        checks = [CompiledCheck(rid("false"), name, "false", F.lit(False), "always-fail schema")]
    else:
        resolvers = [registry.resolver()] if registry is not None else []
        if opts.elide_trivial and rule.is_trivial(resolvers):
            checks = []
        else:
            checks = []
            if rule.ref is not None:
                target = registry.resolve(rule.ref) if registry else None
                if target is None:
                    raise CompileError(f"unresolvable $ref: {rule.ref}")
                p = compile_pred(target, c, dtype, registry, opts, (rule.ref,))
                checks.append(
                    CompiledCheck(rid("$ref"), name, "$ref", p, f"$ref {rule.ref}")
                )
            for kw, pred in _keyword_preds(rule, c, dtype, registry, opts, ()):
                if pred is None:
                    continue
                guarded = F.when(c.isNull(), F.lit(True)).otherwise(_null_pass(pred))
                checks.append(
                    CompiledCheck(
                        rid(kw), name, kw, guarded, _EXPECTED_FMT[kw](rule)
                    )
                )

    out.extend(checks)
    if opts.intercept_check is not None:
        out = [ic for ch in out if (ic := opts.intercept_check(ch)) is not None]
    return out


def _def_name_registry(opts: CompileOptions) -> DefNameRegistry:
    """DefNameRegistry honoring ``opts.intercept_def_name`` BEFORE conflict
    suffixing (owner keys are ``column.keyword``)."""
    if opts.intercept_def_name is None:
        return DefNameRegistry()

    def rewrite(owner: str, default: str) -> str:
        column, keyword = owner.rsplit(".", 1)
        return opts.intercept_def_name(column, keyword, default)

    return DefNameRegistry(rewrite=rewrite)


def compile_table(
    table_rule: TableRule,
    schema: T.StructType,
    options: Optional[CompileOptions] = None,
) -> "ValidationPlan":
    """Compile a TableRule against a DataFrame schema → ValidationPlan.

    The per-table entry point (``Reflector.Reflect`` analog,
    ``/root/reference/reflect.go:269-306``).
    """
    from .plans.plan import ValidationPlan  # local import to avoid cycle

    opts = options or CompileOptions()
    registry = RuleRegistry(opts.definitions_prefix, on_register=opts.collect_definitions)
    required_cols = set(table_rule.metadata.get("required", []))
    for col, r in table_rule.columns.items():
        if isinstance(r, Rule):
            registry.load_definitions(r)

    # a shared registry is needed whenever names can collide across columns:
    # camel casing or a user rewrite hook
    def_names = (
        _def_name_registry(opts)
        if (opts.camel_def_names or opts.intercept_def_name is not None)
        else None
    )
    checks: List[CompiledCheck] = []
    for col, r in table_rule.columns.items():
        if col not in schema.names:
            raise CompileError(f"rule references unknown column: {col}")
        checks.extend(
            compile_column(
                col, r, schema[col].dataType, col in required_cols, registry, opts, def_names
            )
        )
    plan = ValidationPlan(table_rule=table_rule, checks=checks, options=opts)
    if opts.prepare_plan is not None:
        plan = opts.prepare_plan(plan)
    return plan
