"""Format predicate library — ``format`` keyword semantics as native Spark
expressions (JVM-side, whole-stage-codegen friendly; no Python UDFs).

Mirrors the reference's well-known-type mapping ``isWellKnownType``
(``/root/reference/reflect.go:742-776``) and the ``Date`` codec
(``/root/reference/date.go:10-37``): ``date-time``, ``date`` (layout
``2006-01-02`` i.e. ``yyyy-MM-dd``), ``uuid``, ``base64``, plus the common
draft-07 formats the sibling swaggest validators accept.

Each entry maps format name → ``Callable[[Column], Column]`` returning a
boolean pass/fail column for a *string* input. For natively-typed columns
(TimestampType/DateType) the compiler elides the check entirely.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import Column
from pyspark.sql import functions as F

UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
BASE64_RE = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
# RFC3339 subset: date'T'time with optional fraction and Z/offset
DATETIME_RE = (
    r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:?\d{2})?$"
)
TIME_RE = r"^\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:?\d{2})?$"
EMAIL_RE = r"^[^@\s]+@[^@\s]+\.[^@\s]+$"
HOSTNAME_RE = r"^[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?(\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$"
IPV4_RE = r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
IPV6_RE = r"^[0-9A-Fa-f:.]+$"  # syntactic approximation
URI_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s]*$"
URI_REFERENCE_RE = r"^[^\s]*$"
JSON_POINTER_RE = r"^(/([^/~]|~0|~1)*)*$"
REGEX_SAFE = None  # checked by compilation, not per-row


def _date_time(c: Column) -> Column:
    # regex guards shape; try_to_timestamp guards semantic validity (month 13
    # etc.) — try_* because Spark 4 ANSI mode makes to_timestamp THROW on
    # malformed input instead of returning NULL
    return c.rlike(DATETIME_RE) & F.try_to_timestamp(
        F.regexp_replace(c, r"[Tt]", " ")
    ).isNotNull()


def _date(c: Column) -> Column:
    """layout `2006-01-02` per /root/reference/date.go:10; strict shape +
    calendar validity. r7: the calendar check is ARITHMETIC (proleptic
    Gregorian month/day ranges + leap rule) instead of a per-row
    ``try_to_timestamp(c, 'yyyy-MM-dd')`` parse — Spark's java.time parser
    is proleptic Gregorian too (probed: year 0000 accepted, 0100-02-29
    rejected, 0400/2000-02-29 accepted), so the predicates agree on every
    shape-valid string (exhaustive month/day sweep × leap-edge years +
    fuzz in tests); measured ~0.9 s/1M rows saved."""
    y = F.substring(c, 1, 4).try_cast("int")
    m = F.substring(c, 6, 2).try_cast("int")
    d = F.substring(c, 9, 2).try_cast("int")
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    dim = (
        F.when(m.isin(1, 3, 5, 7, 8, 10, 12), F.lit(31))
        .when(m.isin(4, 6, 9, 11), F.lit(30))
        .when(m == 2, F.when(leap, F.lit(29)).otherwise(F.lit(28)))
        .otherwise(F.lit(0))
    )
    # coalesce replicates the parse form's NULL-input result exactly: the
    # old `… & try_to_timestamp(NULL).isNotNull()` gave FALSE, not NULL
    return F.coalesce(
        c.rlike(DATE_RE) & (m >= 1) & (m <= 12) & (d >= 1) & (d <= dim),
        F.lit(False),
    )


FORMAT_PREDICATES: Dict[str, Callable[[Column], Column]] = {
    "date-time": _date_time,
    "date": _date,
    "time": lambda c: c.rlike(TIME_RE),
    "uuid": lambda c: c.rlike(UUID_RE),
    "base64": lambda c: c.rlike(BASE64_RE) & (F.length(c) % 4 == 0),
    "email": lambda c: c.rlike(EMAIL_RE),
    "hostname": lambda c: c.rlike(HOSTNAME_RE),
    "ipv4": lambda c: c.rlike(IPV4_RE),
    "ipv6": lambda c: c.rlike(IPV6_RE) & c.contains(":"),
    "uri": lambda c: c.rlike(URI_RE),
    "uri-reference": lambda c: c.rlike(URI_REFERENCE_RE),
    "json-pointer": lambda c: c.rlike(JSON_POINTER_RE),
}


def register_format(name: str, pred: Callable[[Column], Column]) -> None:
    """Extension hook for user formats (interceptor analog,
    ``/root/reference/context.go:124-140``)."""
    FORMAT_PREDICATES[name] = pred


def format_predicate(name: str, c: Column, strict: bool = False) -> Column:
    """Predicate for a named format; unknown formats are annotations only
    (draft-07: format is not an assertion unless opted in) → always-pass.

    ``strict=True`` (``CompileOptions.strict_formats``) turns an unknown
    format into a compile-time error instead of a silent pass — mirrors the
    opt-in strictness of format assertion vocabularies."""
    fn = FORMAT_PREDICATES.get(name)
    if fn is None:
        if strict:
            raise KeyError(f"unknown format {name!r} (strict_formats)")
        return F.lit(True)
    return fn(c)
