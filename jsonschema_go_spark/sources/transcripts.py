"""Deterministic synthetic transcript generator (FIXTURES.md F1).

Produces the north-rule input table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` entirely with Spark expressions over ``spark.range`` — no
driver-side data, no Python row loop — so the same generator scales from the
6k-row smoke fixture to 10^12 turns on a cluster (rows are derived from the
range index via ``xxhash64``; generation is embarrassingly parallel and
deterministic for a given seed).

Violations are injected at hash-selected positions (≈``violation_rate`` of
rows) across the classes FIXTURES.md F1 lists: bad role enum, null text,
negative / duplicated / skipped ``turn_idx``, malformed ``conv_id``,
out-of-range text length, unknown tool. A skewed conversation (``c00000000``)
holds ≈1% of all rows to force salted aggregation paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["system", "user", "assistant", "tool"]
TOOLS = ["search", "exec", "browse", "none"]
CONV_ID_PATTERN = "^c[0-9]{8}$"
BASE_TS = "2026-01-01 00:00:00"

_WORDS = [
    "plan", "verify", "schema", "turn", "agent", "tool", "spark", "batch",
    "shuffle", "column", "predicate", "window", "hash", "range", "stream",
    "check",
]


def _h(*cols) -> F.Column:
    """Deterministic 64-bit hash of the given expressions."""
    return F.xxhash64(*cols)


def generate_transcripts(
    spark: SparkSession,
    num_convs: int = 1000,
    avg_turns: int = 6,
    seed: int = 42,
    violation_rate: float = 0.005,
    skew: bool = True,
) -> DataFrame:
    """Build the transcript DataFrame. Deterministic for (num_convs, seed).

    Regular conversations have ``2 + h % (2*avg_turns - 3)`` turns
    (mean ≈ avg_turns); conversation 0 is the skew hot-spot with ~1% of rows.
    """
    s = F.lit(seed)
    n_regular = num_convs - 1 if skew else num_convs
    total_regular = n_regular * avg_turns
    skew_turns = max(total_regular // 99, 2) if skew else 0

    # regular conversations: one range row per conversation, explode turns.
    convs = spark.range(1 if skew else 0, num_convs).withColumnRenamed("id", "conv")
    convs = convs.withColumn(
        "n_turns", (F.lit(2) + F.pmod(_h("conv", s), F.lit(2 * avg_turns - 3))).cast("int")
    )
    regular = convs.select(
        "conv", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn")
    )

    parts = [regular]
    if skew:
        hot = spark.range(0, skew_turns).select(
            F.lit(0).cast("long").alias("conv"), F.col("id").cast("int").alias("turn")
        )
        parts.append(hot)
    base = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])

    h_row = _h("conv", "turn", s)

    # role: turn 0 is system; then user/assistant alternate; ~15% tool turns
    role = (
        F.when(F.col("turn") == 0, F.lit("system"))
        .when(F.pmod(h_row, F.lit(100)) < 15, F.lit("tool"))
        .when(F.col("turn") % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    tool = F.when(
        role == "tool",
        F.element_at(F.array(*[F.lit(t) for t in TOOLS[:3]]), (F.pmod(h_row, F.lit(3)) + 1).cast("int")),
    ).otherwise(F.lit(None).cast("string"))

    word = F.element_at(
        F.array(*[F.lit(w) for w in _WORDS]),
        (F.pmod(_h("conv", "turn", F.lit("w"), s), F.lit(len(_WORDS))) + 1).cast("int"),
    )
    n_rep = (F.pmod(_h("conv", "turn", F.lit("n"), s), F.lit(40)) + 1).cast("int")
    text = F.concat(
        F.lit("t"), F.col("turn").cast("string"), F.lit(" "),
        F.array_join(F.array_repeat(word, n_rep), " "),
    )

    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_TS), "yyyy-MM-dd HH:mm:ss")
        + F.col("conv") * 3600
        + F.col("turn") * 7
    )

    df = base.select(
        F.format_string("c%08d", F.col("conv")).alias("conv_id"),
        F.col("turn").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )

    if violation_rate > 0:
        df = _inject_violations(df, seed, violation_rate)
    return df


def _inject_violations(df: DataFrame, seed: int, rate: float) -> DataFrame:
    """Hash-select ~rate of rows; rotate through 7 violation classes."""
    denom = max(int(round(1.0 / rate)), 1)
    hv = _h("conv_id", "turn_idx", F.lit("viol"), F.lit(seed))
    is_v = F.pmod(hv, F.lit(denom)) == 0
    kind = F.pmod(_h("conv_id", "turn_idx", F.lit("kind"), F.lit(seed)), F.lit(7))

    conv_id = F.when(is_v & (kind == 0), F.concat(F.lit("X"), F.col("conv_id"))).otherwise(
        F.col("conv_id")
    )
    role = F.when(is_v & (kind == 1), F.lit("robot")).otherwise(F.col("role"))
    text = (
        F.when(is_v & (kind == 2), F.lit(None).cast("string"))
        .when(is_v & (kind == 3), F.lit(""))  # minLength violation
        .otherwise(F.col("text"))
    )
    tool = F.when(is_v & (kind == 4), F.lit("hammer")).otherwise(F.col("tool"))
    turn_idx = (
        F.when(is_v & (kind == 5), F.lit(-1))  # negative → minimum + contiguity
        .when(is_v & (kind == 6) & (F.col("turn_idx") > 0), F.col("turn_idx") + 10000)
        .otherwise(F.col("turn_idx"))
    )  # +10000 → skipped-chain violation without colliding with real turns

    return df.select(
        conv_id.alias("conv_id"),
        turn_idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.col("ts"),
    )


#: bump when generate_transcripts' output changes — versions the staged dirs
GEN_VERSION = 1

#: scale factor → conversation count for the driver/bench scales
SF_CONVS = {"0.001": 1_000, "0.01": 10_000, "0.1": 100_000}

def _default_stage_dir(package_parent: str = None) -> str:
    """Repo-root ``.stage`` derived from the PACKAGE location (env-overridable
    via ``SPARK_GRAFT_STAGE_DIR``) — the round-3 hard-coded absolute path
    broke the static oracle SQL whenever the repo was relocated.
    ``package_parent`` overrides the ``__file__``-derived location (tests)."""
    import os

    env = os.environ.get("SPARK_GRAFT_STAGE_DIR")
    if env:
        return env
    if package_parent is not None:
        root = package_parent
    else:
        here = os.path.dirname(os.path.abspath(__file__))  # .../sources
        root = os.path.dirname(os.path.dirname(here))
    # Under --py-files the package is imported from INSIDE a zip archive —
    # `root` then has a regular-file ancestor (the .zip) and a .stage dir
    # cannot be created there. Fall back to a stable tmp path; deployments
    # that need a shared location set SPARK_GRAFT_STAGE_DIR explicitly.
    p = root
    while p and p != os.path.dirname(p):
        if os.path.isfile(p):
            import getpass
            import tempfile

            # per-user (r6): a world-shared fixed /tmp path collides across
            # concurrent users (PermissionError on a dir owned by someone
            # else) and is a symlink/pre-creation hazard; deployments that
            # need a shared location set SPARK_GRAFT_STAGE_DIR explicitly.
            try:
                user = getpass.getuser()
            except Exception:
                user = str(os.getuid()) if hasattr(os, "getuid") else "anon"
            return os.path.join(
                tempfile.gettempdir(), f"jsonschema_go_spark_stage_{user}"
            )
        p = os.path.dirname(p)
    return os.path.join(root, ".stage")


#: staged transcript parquet root. Inside the repo (gitignored) so the
#: DuckDB-oracle SQL can reference a stable absolute path.
STAGE_DIR = _default_stage_dir()


def stage_transcripts(spark: SparkSession, sf: str, seed: int = 42) -> str:
    """Materialize the deterministic transcript table for scale ``sf`` to
    parquet and return the directory path.

    This is the real pipeline shape — validation runs over a *stored* table,
    not an in-memory generator — and it is what lets the driver's DuckDB
    oracle see the identical rows (``read_parquet`` on the same files). The
    write is idempotent: data is deterministic for (GEN_VERSION, sf, seed),
    so an existing ``_SUCCESS`` marker skips the write; the write itself goes
    to a temp directory and is atomically ``rename``d into place, so a
    concurrent session (driver gate vs pytest vs verify_driver) either sees
    the complete table or none of it — never a mid-overwrite read. Losing a
    creation race is harmless: both writers produce identical deterministic
    bytes, the loser just discards its copy.
    """
    import os
    import shutil

    n_convs = SF_CONVS.get(sf, 1_000)
    path = f"{STAGE_DIR}/transcripts_v{GEN_VERSION}_sf{sf}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        tmp = f"{path}.tmp-{os.getpid()}"
        generate_transcripts(spark, num_convs=n_convs, seed=seed).write.mode(
            "overwrite"
        ).parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            if os.path.exists(f"{path}/_SUCCESS"):
                # a concurrent writer won with a complete (identical) table
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                # stale partial leftover (e.g. a crashed non-atomic writer):
                # replace it; if yet another racer slips in, keep theirs
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.rename(tmp, path)
                except OSError:
                    shutil.rmtree(tmp, ignore_errors=True)
    return path


def transcript_table_rule():
    """The F1 rule document: every constraint from FIXTURES.md F1 expressed in
    the reference's keyword vocabulary (SURVEY.md §2.1)."""
    from ..rules import Rule, TableRule

    return TableRule(
        name="transcripts",
        columns={
            "conv_id": Rule(type="string", pattern=CONV_ID_PATTERN),
            "turn_idx": Rule(type="integer", minimum=0),
            "role": Rule(type="string", enum=list(ROLES)),
            "text": Rule(type="string", min_length=1, max_length=32768),
            "tool": Rule(type=["string", "null"], enum=TOOLS + [None]),
            "ts": Rule(type="string", format="date-time"),
        },
        unique=[("conv_id", "turn_idx")],
        contiguous=[{"partition_by": "conv_id", "order_by": "turn_idx", "start": 0}],
        monotonic=[{"partition_by": "conv_id", "order_by": "turn_idx", "column": "ts"}],
        metadata={"required": ["conv_id", "turn_idx", "role", "text", "ts"]},
    )
