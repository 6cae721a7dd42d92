"""ADVICE r3 (medium): the vendored --py-files deployment zip drifted from
HEAD, shipping a driver contract missing newly-gated queries. This is the CI
check: every .py in the zip must byte-match the source tree (and vice versa);
any source change without re-running scripts/package.sh fails here."""

from __future__ import annotations

import hashlib
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_dist_zip_matches_source_tree():
    zp = ROOT / "dist" / "jsonschema_go_spark.zip"
    assert zp.exists(), "deployment zip missing — run scripts/package.sh"
    with zipfile.ZipFile(zp) as z:
        zip_map = {
            n: hashlib.sha256(z.read(n)).hexdigest()
            for n in z.namelist()
            if n.endswith(".py")
        }
    src_map = {
        str(p.relative_to(ROOT)): hashlib.sha256(p.read_bytes()).hexdigest()
        for p in (ROOT / "jsonschema_go_spark").rglob("*.py")
        if "__pycache__" not in p.parts
    }
    stale = sorted(
        set(zip_map) ^ set(src_map)
        | {n for n in set(zip_map) & set(src_map) if zip_map[n] != src_map[n]}
    )
    assert not stale, (
        f"dist/jsonschema_go_spark.zip is stale vs the source tree for "
        f"{stale} — re-run scripts/package.sh and commit the refreshed zip"
    )


def test_no_row_at_a_time_python_udfs():
    """The engine's UDF contract: Python surfaces are Arrow-batched only
    (pandas_udf / mapInPandas / applyInPandasWithState). A row-at-a-time
    `F.udf(...)` anywhere in the package is a hot-path regression."""
    hits = []
    for p in (ROOT / "jsonschema_go_spark").rglob("*.py"):
        if "__pycache__" in p.parts:
            continue
        src = p.read_text()
        for needle in ("F.udf(", "functions.udf(", "@udf("):
            if needle in src:
                hits.append((str(p.relative_to(ROOT)), needle))
    assert not hits, f"row-at-a-time Python UDFs found: {hits}"
