"""Oracle SQL compiler — the DuckDB mirror of :mod:`compile`.

Compiles the same :class:`~jsonschema_go_spark.rules.Rule` documents to ANSI
SQL boolean predicates so the driver's DuckDB oracle evaluates *identical
semantics* to the Spark plan. This mirrors the reference's golden-output test
strategy (SURVEY.md §5: `assertjson.EqualMarshal` equality on serialized
artifacts → our value-hash equality on result tables).

Semantics parity contract with :mod:`compile`:

- NULL input passes every keyword except ``required``;
- ``pattern`` is unanchored substring search (DuckDB ``regexp_matches`` ==
  Spark ``rlike``; patterns restricted to the RE2∩Java common subset,
  SURVEY.md §7);
- ``multipleOf`` uses the identical float-tolerance formula;
- string length is character-based on both sides;
- array keywords use DuckDB list functions with fail-count==0 encoding of
  ``forall``.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Union

from .rules import ABSENT, Rule, RuleOrBool, TableRule, inline_refs
from .compile import MULTIPLE_OF_EPS

from .functions.formats import (
    BASE64_RE,
    DATETIME_RE,
    DATE_RE,
    EMAIL_RE,
    HOSTNAME_RE,
    IPV4_RE,
    IPV6_RE,
    JSON_POINTER_RE,
    TIME_RE,
    URI_RE,
    URI_REFERENCE_RE,
    UUID_RE,
    FORMAT_PREDICATES,
)


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return _q(str(v))


_FORMAT_SQL = {
    "date-time": lambda c: (
        f"(regexp_matches({c}, {_q(DATETIME_RE)}) AND "
        f"try_cast(regexp_replace({c}, '[Tt]', ' ') AS TIMESTAMP) IS NOT NULL)"
    ),
    "date": lambda c: (
        f"(regexp_matches({c}, {_q(DATE_RE)}) AND try_cast({c} AS DATE) IS NOT NULL)"
    ),
    "time": lambda c: f"regexp_matches({c}, {_q(TIME_RE)})",
    "uuid": lambda c: f"regexp_matches({c}, {_q(UUID_RE)})",
    "base64": lambda c: (
        f"(regexp_matches({c}, {_q(BASE64_RE)}) AND length({c}) % 4 = 0)"
    ),
    "email": lambda c: f"regexp_matches({c}, {_q(EMAIL_RE)})",
    "hostname": lambda c: f"regexp_matches({c}, {_q(HOSTNAME_RE)})",
    "ipv4": lambda c: f"regexp_matches({c}, {_q(IPV4_RE)})",
    "ipv6": lambda c: (
        f"(regexp_matches({c}, {_q(IPV6_RE)}) AND contains({c}, ':'))"
    ),
    "uri": lambda c: f"regexp_matches({c}, {_q(URI_RE)})",
    "uri-reference": lambda c: f"regexp_matches({c}, {_q(URI_REFERENCE_RE)})",
    "json-pointer": lambda c: f"regexp_matches({c}, {_q(JSON_POINTER_RE)})",
}


def sql_pred(
    rule: RuleOrBool,
    c: str,
    elem_type: str = "scalar",
) -> str:
    """Compile a rule to ONE SQL boolean expression over expression ``c``.

    ``elem_type`` hints the physical type for `type`-keyword residues and
    selects the container keyword branches. The grammar COMPOSES (round 6):

    - ``scalar`` — typed column, type statically satisfied
    - ``double`` — fractional numeric: ``integer`` ⇒ integral-value check
    - ``string`` — stringly ingest: cast checks for integer/number/boolean
    - ``integer`` / ``timestamp`` / ``date`` — static numerics / temporal
      rendering quirks (see format/minimum handling below)
    - ``array`` / ``array<inner>`` — list keywords; ``inner`` (any hint in
      this grammar, containers included) carries into contains/items/
      additionalItems sub-predicates
    - ``map`` / ``map<inner>`` — object-over-map keywords; ``inner`` is the
      VALUE hint for properties/additionalProperties/patternProperties
      (propertyNames keys are always ``string``)
    - ``struct<f1:h1,f2:h2,...>`` — object-over-struct keywords; per-field
      hints, comma-split at bracket depth 0 so nested container hints
      (``struct<a:struct<x:string>,b:array<string>>``) pass through whole

    Each hint recurses exactly where ``compile.compile_pred`` recurses with
    the real nested DataType (parity: tests/test_nested_hints.py,
    tests/test_differential_fuzz.py). ``$ref`` on a rule reaching this
    function directly is ignored — :func:`check_preds_sql` resolves refs
    via the shared registry BEFORE predicates are rendered, and a ref
    surviving that inline pass is a cycle cut, which compile also treats
    as pass.
    """
    if rule is True:
        return "TRUE"
    if rule is False:
        return "FALSE"

    preds: List[str] = []

    def add(p: Optional[str]) -> None:
        if p:
            preds.append(f"coalesce({p}, TRUE)")

    # ---- type (data-level residue only; mirrors compile._type_check)
    if rule.type is not None:
        types = [rule.type] if isinstance(rule.type, str) else list(rule.type)
        non_null = [t for t in types if t != "null"]
        if not non_null:
            # {type: null}: pass iff NULL (outer null-guard supplies the pass)
            add("FALSE")
        elif "integer" in non_null and elem_type == "double":
            add(f"({c} = floor({c}))")
        elif elem_type == "string" and non_null and "string" not in non_null:
            alts = []
            for t in non_null:
                if t == "integer":
                    alts.append(f"regexp_matches({c}, '^-?\\d+(\\.0+)?$')")
                elif t == "number":
                    alts.append(f"try_cast({c} AS DOUBLE) IS NOT NULL")
                elif t == "boolean":
                    alts.append(f"lower({c}) IN ('true','false')")
                else:
                    alts.append("FALSE")
            add("(" + " OR ".join(alts) + ")")

    if rule.const is not ABSENT:
        v = rule.const
        add(f"({c} IS NULL)" if v is None else f"({c} = {_lit(v)})")
    if rule.enum:
        complex_members = [v for v in rule.enum if isinstance(v, (list, dict))]
        if complex_members:
            # parity with compile.py: refuse rather than mis-evaluate
            raise ValueError(f"unsupported complex enum members: {complex_members!r}")
        non_null = [v for v in rule.enum if v is not None]
        # empty scalar set: `IN ()` is a syntax error — emit FALSE instead
        p = (
            f"({c} IN (" + ", ".join(_lit(v) for v in non_null) + "))"
            if non_null
            else "FALSE"
        )
        if any(v is None for v in rule.enum):
            p = f"({p} OR {c} IS NULL)"
        add(p)

    # ---- numeric
    if rule.minimum is not None:
        add(f"({c} >= {_lit(rule.minimum)})")
    if rule.maximum is not None:
        add(f"({c} <= {_lit(rule.maximum)})")
    if rule.exclusive_minimum is not None:
        add(f"({c} > {_lit(rule.exclusive_minimum)})")
    if rule.exclusive_maximum is not None:
        add(f"({c} < {_lit(rule.exclusive_maximum)})")
    if rule.multiple_of is not None:
        m = float(rule.multiple_of)
        if m.is_integer() and elem_type == "integer":
            add(f"(({c} % {int(m)}) = 0)")
        else:
            # identical tolerance formula as compile.py
            q = f"(CAST({c} AS DOUBLE) / {m!r})"
            add(f"(abs({q} - round({q}, 0)) <= {MULTIPLE_OF_EPS!r})")

    # ---- string
    sc = c if elem_type != "timestamp" else f"CAST({c} AS VARCHAR)"
    if rule.min_length:
        add(f"(length({sc}) >= {int(rule.min_length)})")
    if rule.max_length is not None:
        add(f"(length({sc}) <= {int(rule.max_length)})")
    if rule.pattern is not None:
        add(f"regexp_matches({sc}, {_q(rule.pattern)})")
    if rule.format is not None and elem_type not in ("timestamp", "date"):
        fmt = _FORMAT_SQL.get(rule.format)
        if fmt is not None:
            add(fmt(sc))
        elif rule.format in FORMAT_PREDICATES:
            # compile.py would emit a real check here; a silent no-op would
            # break the identical-semantics oracle parity contract
            raise ValueError(
                f"format {rule.format!r} enforced by compile.py has no SQL mirror"
            )

    # ---- array (DuckDB list functions). ``array<inner>`` hints carry the
    # ELEMENT type into sub-predicates (contains/items/additionalItems) —
    # compile.py passes the real element DataType there, so e.g.
    # ``type: integer`` inside ``contains`` on an array<string> column
    # compiles to a stringly cast check; a bare "array" hint (scalar
    # elements, the legacy form) would silently skip that residue
    # (divergence found by tests/test_differential_fuzz.py, round 6).
    if elem_type == "array" or elem_type.startswith("array<"):
        inner = elem_type[6:-1] if elem_type.startswith("array<") else "scalar"
        if rule.min_items:
            add(f"(len({c}) >= {int(rule.min_items)})")
        if rule.max_items is not None:
            add(f"(len({c}) <= {int(rule.max_items)})")
        if rule.unique_items:
            add(f"(len(list_distinct({c})) = len({c}))")
        if rule.contains is not None:
            sub = sql_pred(rule.contains, "x", inner)
            add(f"(len(list_filter({c}, x -> coalesce({sub}, TRUE))) > 0)")
        if rule.items is not None:
            if isinstance(rule.items, list):
                parts = []
                for i, s in enumerate(rule.items):
                    sub = sql_pred(s, f"{c}[{i + 1}]", inner)
                    parts.append(f"(len({c}) <= {i} OR coalesce({sub}, TRUE))")
                add("(" + " AND ".join(parts) + ")")
                if rule.additional_items not in (None, True):
                    n = len(rule.items)
                    sub = sql_pred(rule.additional_items, "x", inner)
                    add(
                        f"(len({c}) <= {n} OR len(list_filter({c}[{n + 1}:], "
                        f"x -> NOT coalesce({sub}, TRUE))) = 0)"
                    )
            else:
                sub = sql_pred(rule.items, "x", inner)
                add(f"(len(list_filter({c}, x -> NOT coalesce({sub}, TRUE))) = 0)")

    # ---- object over MAP (DuckDB map functions; mirrors compile.py's
    # MapType branch incl. per-keyword null-pass placement). ``map<inner>``
    # hints carry the VALUE type into sub-predicates — compile.py passes the
    # real valueType there, so e.g. ``type: integer`` inside ``properties``
    # on a map<string,string> column compiles to a stringly cast check; the
    # bare "map" hint (scalar values, the legacy form) skips that residue.
    if elem_type == "map" or elem_type.startswith("map<"):
        inner = elem_type[4:-1] if elem_type.startswith("map<") else "scalar"
        for _, p in _map_keyword_preds(rule, c, inner):
            add(p)

    # ---- object over STRUCT (static fields; mirrors compile.py's
    # StructType branch: unknown properties are statically absent ⇒ skipped,
    # unknown required fields ⇒ FALSE). Hint: ``struct<f1:string,f2:integer>``
    # — per-field hints carry into field sub-predicates.
    if elem_type.startswith("struct<"):
        for _, p in _struct_keyword_preds(rule, c, _parse_struct_hint(elem_type)):
            add(p)

    # ---- composition
    if rule.all_of:
        add("(" + " AND ".join(f"coalesce({sql_pred(s, c, elem_type)}, TRUE)" for s in rule.all_of) + ")")
    if rule.any_of:
        add("(" + " OR ".join(f"coalesce({sql_pred(s, c, elem_type)}, FALSE)" for s in rule.any_of) + ")")
    if rule.one_of:
        terms = " + ".join(
            f"(CASE WHEN coalesce({sql_pred(s, c, elem_type)}, FALSE) THEN 1 ELSE 0 END)"
            for s in rule.one_of
        )
        add(f"(({terms}) = 1)")
    if rule.not_ is not None:
        add(f"(NOT coalesce({sql_pred(rule.not_, c, elem_type)}, FALSE))")
    if rule.if_ is not None:
        if_p = f"coalesce({sql_pred(rule.if_, c, elem_type)}, FALSE)"
        then_p = f"coalesce({sql_pred(rule.then, c, elem_type)}, TRUE)" if rule.then is not None else "TRUE"
        else_p = f"coalesce({sql_pred(rule.else_, c, elem_type)}, TRUE)" if rule.else_ is not None else "TRUE"
        add(f"(CASE WHEN {if_p} THEN {then_p} ELSE {else_p} END)")

    if not preds:
        return "TRUE"
    body = " AND ".join(preds)
    return f"({c} IS NULL OR ({body}))"


def _parse_struct_hint(elem_type: str) -> dict:
    """``struct<f1:string,f2:integer>`` → {"f1": "string", "f2": "integer"}.

    Field hints are full elem-type hints, including nested containers
    (``struct<a:struct<x:string,y:integer>,b:array<string>>``): commas are
    split at bracket depth 0 only, and the field separator is the FIRST
    colon, so the nested hint passes through whole and recurses in
    :func:`sql_pred` like the array/map inner hints do."""
    fields: dict = {}
    body = elem_type[7:-1]
    depth, cur, parts = 0, [], []
    for ch in body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    for part in parts:
        k, _, t = part.partition(":")
        fields[k.strip()] = t.strip() or "scalar"
    return fields


def _qid(k: str) -> str:
    """Double-quoted SQL identifier (struct field access)."""
    return '"' + k.replace('"', '""') + '"'


def _struct_keyword_preds(rule: Rule, c: str, fields: dict) -> List[tuple]:
    """(keyword, sql) pairs for object-over-struct keywords, mirroring
    compile.py's StructType branch: ``properties`` checks known fields only
    (a property missing from the static schema is absent ⇒ passes, so it is
    skipped entirely; no pred is emitted when every property is unknown),
    ``required`` is per-field non-nullness with FALSE for unknown fields,
    in as-listed order (compile iterates rule.required, not sorted)."""
    out: List[tuple] = []
    if rule.properties:
        parts = [
            f"coalesce({sql_pred(s, f'{c}.{_qid(k)}', fields[k])}, TRUE)"
            for k, s in sorted(rule.properties.items())
            if k in fields
        ]
        if parts:
            out.append(("properties", "(" + " AND ".join(parts) + ")"))
    if rule.required:
        parts = [
            f"({c}.{_qid(k)} IS NOT NULL)" if k in fields else "FALSE"
            for k in rule.required
        ]
        out.append(("required", "(" + " AND ".join(parts) + ")"))
    return out


def _map_keyword_preds(rule: Rule, c: str, inner: str = "scalar") -> List[tuple]:
    """(keyword, sql) pairs for object-over-map keywords, in the same yield
    order and granularity as ``compile._keyword_preds`` (one entry per
    patternProperties pattern / dependencies key). ``element_at(map, k)`` in
    DuckDB returns a LIST — ``[1]`` extracts the value (NULL when absent),
    matching Spark's NULL-for-missing-key ``element_at``.

    ``inner`` is the VALUE-type hint for sub-predicates (properties /
    additionalProperties / patternProperties); ``propertyNames`` sub-rules
    always get the "string" hint because map KEYS are strings —
    compile.py's MapType branch passes ``T.StringType()`` there, so a
    ``type: integer`` propertyNames sub-rule is a stringly cast check on
    both sides (divergence class found by tests/test_differential_fuzz.py)."""
    keys = f"map_keys({c})"
    out: List[tuple] = []
    if rule.min_properties:
        out.append(("minProperties", f"(len({keys}) >= {int(rule.min_properties)})"))
    if rule.max_properties is not None:
        out.append(("maxProperties", f"(len({keys}) <= {int(rule.max_properties)})"))
    if rule.required:
        lst = ", ".join(_q(k) for k in rule.required)
        out.append(("required", f"list_has_all({keys}, [{lst}])"))
    known = sorted((rule.properties or {}).keys())
    if rule.properties:
        parts = [
            f"coalesce({sql_pred(s, f'element_at({c}, {_q(k)})[1]', inner)}, TRUE)"
            for k, s in sorted(rule.properties.items())
        ]
        out.append(("properties", "(" + " AND ".join(parts) + ")"))
    if rule.additional_properties is not None:
        if known:
            known_lst = ", ".join(_q(k) for k in known)
            extra = f"list_filter({keys}, k -> k NOT IN ({known_lst}))"
        else:
            extra = keys
        if rule.additional_properties is False:
            out.append(("additionalProperties", f"(len({extra}) = 0)"))
        elif rule.additional_properties is not True:
            sub = sql_pred(rule.additional_properties, f"element_at({c}, k)[1]", inner)
            out.append((
                "additionalProperties",
                f"(len(list_filter({extra}, k -> NOT coalesce({sub}, TRUE))) = 0)",
            ))
    for pat, s in sorted((rule.pattern_properties or {}).items()):
        # r7 (ADVICE r6, high): the loop previously REASSIGNED `inner` (the
        # elem-type hint parameter) to this SQL fragment, so a second
        # patternProperties pattern — and any schema `dependencies`
        # rendered below — received a garbage hint and silently dropped
        # typed value sub-predicates. Local name; regression-tested with
        # two patterns + a typed schema dependency.
        sub = sql_pred(s, "e.value", inner)
        entry_pred = f"((NOT regexp_matches(e.key, {_q(pat)})) OR coalesce({sub}, TRUE))"
        out.append((
            "patternProperties",
            f"(len(list_filter(map_entries({c}), e -> NOT coalesce({entry_pred}, TRUE))) = 0)",
        ))
    if rule.property_names is not None:
        # keys are strings: compile.py passes T.StringType() here
        sub = sql_pred(rule.property_names, "k", "string")
        out.append((
            "propertyNames",
            f"(len(list_filter({keys}, k -> NOT coalesce({sub}, TRUE))) = 0)",
        ))
    for k, dep in sorted((rule.dependencies or {}).items()):
        present = f"list_contains({keys}, {_q(k)})"
        if isinstance(dep, list):
            dep_ok = (
                f"list_has_all({keys}, [{', '.join(_q(d) for d in dep)}])"
                if dep
                else "TRUE"
            )
        else:
            et = f"map<{inner}>" if inner != "scalar" else "map"
            dep_ok = f"coalesce({sql_pred(dep, c, et)}, TRUE)"
        out.append(("dependencies", f"((NOT {present}) OR {dep_ok})"))
    return out


_KEYWORD_ORDER = [
    "type", "const", "enum", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "multipleOf", "minLength", "maxLength", "pattern",
    "format", "minItems", "maxItems", "uniqueItems", "contains", "items",
    "additionalItems", "allOf", "anyOf", "oneOf", "not", "if",
]


def keyword_preds_sql(rule: Rule, c: str, elem_type: str = "scalar") -> List[tuple]:
    """Per-keyword (keyword, sql_pred) mirroring ``compile._keyword_preds``
    granularity for summary parity. Each predicate NULL-guards on its own."""
    out = []
    for kw in _KEYWORD_ORDER:
        if kw == "allOf" and (elem_type == "map" or elem_type.startswith("map<")):
            # object-over-map keywords sit between array and composition in
            # compile._keyword_preds yield order
            inner = elem_type[4:-1] if elem_type.startswith("map<") else "scalar"
            out.extend(_map_keyword_preds(rule, c, inner))
        if kw == "allOf" and elem_type.startswith("struct<"):
            # object-over-struct keywords sit between map and composition
            out.extend(_struct_keyword_preds(rule, c, _parse_struct_hint(elem_type)))
        single = Rule()
        present = False
        if kw == "type" and rule.type is not None:
            single.type, present = rule.type, True
        elif kw == "const" and rule.const is not ABSENT:
            single.const, present = rule.const, True
        elif kw == "enum" and rule.enum:
            single.enum, present = rule.enum, True
        elif kw == "minimum" and rule.minimum is not None:
            single.minimum, present = rule.minimum, True
        elif kw == "maximum" and rule.maximum is not None:
            single.maximum, present = rule.maximum, True
        elif kw == "exclusiveMinimum" and rule.exclusive_minimum is not None:
            single.exclusive_minimum, present = rule.exclusive_minimum, True
        elif kw == "exclusiveMaximum" and rule.exclusive_maximum is not None:
            single.exclusive_maximum, present = rule.exclusive_maximum, True
        elif kw == "multipleOf" and rule.multiple_of is not None:
            single.multiple_of, present = rule.multiple_of, True
        elif kw == "minLength" and rule.min_length:
            single.min_length, present = rule.min_length, True
        elif kw == "maxLength" and rule.max_length is not None:
            single.max_length, present = rule.max_length, True
        elif kw == "pattern" and rule.pattern is not None:
            single.pattern, present = rule.pattern, True
        elif kw == "format" and rule.format is not None:
            single.format, present = rule.format, True
        elif kw == "minItems" and rule.min_items:
            single.min_items, present = rule.min_items, True
        elif kw == "maxItems" and rule.max_items is not None:
            single.max_items, present = rule.max_items, True
        elif kw == "uniqueItems" and rule.unique_items:
            single.unique_items, present = rule.unique_items, True
        elif kw == "contains" and rule.contains is not None:
            single.contains, present = rule.contains, True
        elif kw == "items" and rule.items is not None:
            single.items, present = rule.items, True
        elif (
            kw == "additionalItems"
            and isinstance(rule.items, list)
            and rule.additional_items not in (None, True)
        ):
            single.items = [True] * len(rule.items)
            single.additional_items = rule.additional_items
            present = True
        elif kw == "allOf" and rule.all_of:
            single.all_of, present = rule.all_of, True
        elif kw == "anyOf" and rule.any_of:
            single.any_of, present = rule.any_of, True
        elif kw == "oneOf" and rule.one_of:
            single.one_of, present = rule.one_of, True
        elif kw == "not" and rule.not_ is not None:
            single.not_, present = rule.not_, True
        elif kw == "if" and rule.if_ is not None:
            single.if_, single.then, single.else_ = rule.if_, rule.then, rule.else_
            present = True
        if present:
            p = sql_pred(single, c, elem_type)
            if p == "TRUE":
                # statically-satisfied residue (e.g. `type` on a typed
                # column) — compile.py emits no check either
                continue
            out.append((kw, p))
    return out


class CheckPred(NamedTuple):
    """One compiled check mirrored to SQL: ``rule_id`` is ``column.keyword``
    (the same id :func:`compile.compile_table` emits); ``column`` and
    ``keyword`` are carried SEPARATELY so consumers never re-split the id —
    ``rsplit('.')`` would mis-attribute a column name containing a dot."""

    rule_id: str
    column: str
    keyword: str
    pred: str


def check_preds_sql(
    table_rule: TableRule,
    elem_types: Optional[dict] = None,
    elide_trivial: bool = True,
) -> List[CheckPred]:
    """:class:`CheckPred` rows for every check :func:`compile.compile_table`
    would compile — same rule_ids, same ``required`` handling, same IsTrivial
    elision. Shared by :func:`summary_sql` and :func:`verdict_sql` so every
    oracle shape mirrors the identical check list."""
    from .compile import RuleRegistry  # shares prefix/escape with compile_table

    elem_types = elem_types or {}
    required = set(table_rule.metadata.get("required", []))

    # shared-definition registry — same construction as compile_table
    # (definitions from EVERY column rule are visible to every other column)
    registry = RuleRegistry()
    for _, r in table_rule.columns.items():
        if isinstance(r, Rule):
            registry.load_definitions(r)
    resolver = registry.resolver()

    selects: List[CheckPred] = []
    for col, rule in table_rule.columns.items():
        et = elem_types.get(col, "scalar")
        if col in required:
            selects.append(
                CheckPred(f"{col}.required", col, "required", f"({col} IS NOT NULL)")
            )
        if rule is True:
            continue
        if rule is False:
            selects.append(CheckPred(f"{col}.false", col, "false", "FALSE"))
            continue
        if elide_trivial and rule.is_trivial([resolver]):
            continue
        if rule.ref is not None:
            # mirror compile_column's separate `col.$ref` check: the target
            # fully inlined, with the outer ref seeding the cycle stack so
            # the cut happens at the same recursion depth as compile's
            # _ref_stack=(rule.ref,); a ref left behind by the cycle cut is
            # ignored by sql_pred, matching compile's cycle-pass semantics
            target = resolver(rule.ref)
            if target is None:
                raise ValueError(f"unresolvable $ref: {rule.ref}")
            if not isinstance(target, bool):
                target = inline_refs(target, resolver, strict=True, _stack=(rule.ref,))
            # no extra null-guard: sql_pred mirrors compile_pred exactly,
            # including that a ref to the `false` schema fails NULL rows
            # (compile_pred returns lit(False) unguarded there, while Rule
            # targets carry their own NULL-passes wrap)
            selects.append(
                CheckPred(f"{col}.$ref", col, "$ref", sql_pred(target, col, et))
            )
        krule = rule
        if registry.refs():
            # sibling keywords see nested $refs resolved inline (compile's
            # sub() resolves them with a fresh ref stack — so does this)
            krule = rule.copy()
            krule.ref = None
            krule = inline_refs(krule, resolver, strict=True)
        for kw, p in keyword_preds_sql(krule, col, et):
            # NULL input passes (required handled above)
            selects.append(
                CheckPred(
                    f"{col}.{kw}", col, kw,
                    f"({col} IS NULL OR coalesce({p}, TRUE))",
                )
            )
    return selects


def summary_sql(
    table_rule: TableRule,
    table: str,
    elem_types: Optional[dict] = None,
    elide_trivial: bool = True,
) -> str:
    """Oracle for ``ValidationPlan.summary``: one row per compiled check
    ``(rule_id, fail_count, row_count)``.

    ``elem_types`` maps column → type hint (see :func:`sql_pred`). The check
    list must match :func:`compile.compile_table` exactly (same rule_ids),
    including ``required`` checks and IsTrivial elision.
    """
    selects = check_preds_sql(table_rule, elem_types, elide_trivial)
    if not selects:
        return f"SELECT CAST(NULL AS VARCHAR) rule_id, CAST(NULL AS BIGINT) fail_count, CAST(NULL AS BIGINT) row_count WHERE FALSE"
    parts = [
        f"SELECT {_q(c.rule_id)} AS rule_id, "
        f"SUM(CASE WHEN NOT ({c.pred}) THEN 1 ELSE 0 END)::BIGINT AS fail_count, "
        f"COUNT(*)::BIGINT AS row_count FROM {table}"
        for c in selects
    ]
    return " UNION ALL ".join(parts)


def violations_sql(
    table_rule: TableRule,
    table: str,
    keys: List[str],
    elem_types: Optional[dict] = None,
) -> str:
    """Oracle for ``ValidationPlan.violations``: one row per failed
    (row, check) — ``(keys..., rule_id, column, keyword, observed,
    expected)``. The north-rule's literal "materialized violation rows
    byte-match under stable ordering" gate.

    ``elem_types`` is required in practice: it must cover EVERY checked
    column with one of the byte-stable renderable types (``string`` /
    ``integer`` / ``timestamp``) — the default ``'scalar'`` hint is rejected
    below because its ``CAST(col AS VARCHAR)`` rendering is not guaranteed
    byte-identical across engines (doubles, arrays, structs).

    Predicates come from :func:`check_preds_sql` (same list, same rule_ids as
    the compiled plan — summary-parity-tested); ``expected`` annotations come
    from :func:`compile.expected_annotation` (the same pure-Python table the
    CompiledChecks read), so both engines materialize identical rows by
    construction — for the SUPPORTED observed types: the
    ``CAST(col AS VARCHAR)`` rendering of ``observed`` is byte-identical to
    Spark's string cast only for string/integer/timestamp columns (doubles,
    arrays, and structs render differently across engines), so any other
    elem-type hint is rejected explicitly rather than silently mis-hashing.
    A column that is BOTH table-required and an object rule with its own
    ``required`` keyword would collide on one rule_id — refused here (no
    driver table has that shape; compile.py keeps them as separate checks).
    """
    from .compile import expected_annotation

    required = set(table_rule.metadata.get("required", []))
    selects = check_preds_sql(table_rule, elem_types)
    if len({c.rule_id for c in selects}) != len(selects):
        raise ValueError("rule_id collision: required column with object-required rule")
    renderable = {"string", "integer", "timestamp"}
    for c in selects:
        et = (elem_types or {}).get(c.column, "scalar")
        if et not in renderable:
            raise ValueError(
                f"violations_sql: CAST AS VARCHAR rendering of column "
                f"{c.column!r} (elem type {et!r}) is not byte-stable across "
                f"engines; supported observed types: {sorted(renderable)}"
            )
    keys_sql = ", ".join(keys)
    parts = []
    for c in selects:
        rule = table_rule.columns.get(c.column, True)
        if c.keyword == "required" and c.column in required:
            expected = expected_annotation(rule, "column-required")
        else:
            expected = expected_annotation(rule, c.keyword)
        parts.append(
            f"SELECT {keys_sql}, {_q(c.rule_id)} AS rule_id, "
            f"{_q(c.column)} AS \"column\", "
            f"{_q(c.keyword)} AS keyword, CAST({c.column} AS VARCHAR) AS observed, "
            f"{_q(expected)} AS expected FROM {table} WHERE NOT ({c.pred})"
        )
    return " UNION ALL ".join(parts)


def verdict_sql(
    table_rule: TableRule,
    table: str,
    partition_col: str,
    elem_types: Optional[dict] = None,
    alias: str = "partition_key",
) -> str:
    """Oracle for ``ValidationPlan.verdicts``: per-partition
    ``(partition_key, rows, fail_rows, violation_count, passed)`` from the
    SAME check list as the Spark plan (per-row violation count = number of
    failed checks; a row fails when any check fails)."""
    selects = check_preds_sql(table_rule, elem_types)
    if not selects:
        return (
            f"SELECT {partition_col} AS {alias}, COUNT(*)::BIGINT AS \"rows\", "
            f"0::BIGINT AS fail_rows, 0::BIGINT AS violation_count, TRUE AS passed "
            f"FROM {table} GROUP BY 1"
        )
    nviol = " + ".join(
        f"(CASE WHEN NOT ({c.pred}) THEN 1 ELSE 0 END)" for c in selects
    )
    return f"""
    SELECT {alias},
           COUNT(*)::BIGINT AS "rows",
           SUM(CASE WHEN _nviol > 0 THEN 1 ELSE 0 END)::BIGINT AS fail_rows,
           SUM(_nviol)::BIGINT AS violation_count,
           (SUM(CASE WHEN _nviol > 0 THEN 1 ELSE 0 END) = 0) AS passed
    FROM (SELECT {partition_col} AS {alias}, ({nviol}) AS _nviol FROM {table})
    GROUP BY {alias}
    """
