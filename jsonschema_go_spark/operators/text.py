"""Text-analysis operators for training-data pipelines (driver mandate):
language-ID (stopword n-gram heuristic), quality scoring, token counting,
document fingerprinting.

All pure native-expression implementations (JVM-side, codegen) — no Python
UDFs. Every function has an exact DuckDB mirror built from the same regexes
(see queries.py) so results are oracle-gated.

Portability contract with DuckDB:
- normalization = lower(trim(regexp_replace(text, '\\s+', ' ')))  (DuckDB
  needs the 'g' flag on regexp_replace);
- tokenization = split on single space after normalization;
- regex token counts via regexp_extract_all → size/len;
- fingerprints via md5 hex strings (identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish token regex: letter runs, digit runs, single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"
UPPER_RE = r"[A-Z]"
DIGIT_RE = r"[0-9]"

#: tiny per-language stopword inventories for the n-gram heuristic
#: ASCII-only on purpose: `\b` is an ASCII word boundary in both RE2 (DuckDB)
#: and Java (Spark rlike) default modes, so accented entries would split at
#: the accent and break cross-engine parity. Overlaps across languages (fr/es
#: `la`, `un`) are fine — lang_guess is an argmax over total hits.
STOPWORDS = {
    "en": [
        "the", "and", "is", "of", "to", "in", "that", "it", "was", "for",
        "on", "are", "with", "as", "they", "at", "be", "this", "have",
        "from", "or", "had", "by", "but", "not", "what", "all", "were",
    ],
    "de": [
        "der", "die", "und", "das", "ist", "nicht", "ein", "zu", "den",
        "dem", "mit", "sich", "auf", "im", "als", "auch", "es", "werden",
        "aus", "er", "hat", "dass", "sie", "nach", "wird", "bei", "um",
        "sind",
    ],
    "fr": [
        "le", "la", "et", "les", "des", "est", "un", "une", "dans", "que",
        "qui", "pour", "sur", "pas", "plus", "par", "avec", "au", "il",
        "ne", "se", "ce", "son", "mais", "comme", "ou", "si", "leur",
    ],
    "es": [
        "el", "la", "los", "que", "es", "un", "una", "para", "de", "no",
        "se", "con", "por", "las", "su", "al", "lo", "como", "mas", "pero",
        "sus", "le", "ya", "este", "si", "porque", "muy", "sin",
    ],
}


def normalize(c: Column) -> Column:
    """Whitespace-collapse + trim + lowercase — the shared normal form."""
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def word_count(c: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    n = normalize(c)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(
        F.size(F.split(n, " "))
    )


def token_count(c: Column) -> Column:
    """BPE-ish regex token count (letters / digits / single symbols)."""
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))


#: explicit character inventories of the single-char class regexes above —
#: counting those via length(x) − length(translate(x, chars, '')) is exactly
#: the regexp_extract_all match count (each match is one char of the class)
#: at a fraction of the cost (one table-lookup pass vs a regex scan; r7,
#: guide §4.1 "prefer built-ins")
_CLASS_CHARS = {
    PUNCT_RE: ".,;:!?'\"()[]{}-",
    UPPER_RE: "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    DIGIT_RE: "0123456789",
}


def char_class_ratio(c: Column, pattern: str) -> Column:
    """Fraction of characters matching a single-char class regex."""
    chars = _CLASS_CHARS.get(pattern)
    if chars is not None:
        cnt = F.length(c) - F.length(F.translate(c, chars, ""))
    else:
        cnt = F.size(F.regexp_extract_all(c, F.lit(pattern), 0))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(cnt / F.length(c))


def stopword_hits(c: Column, lang: str) -> Column:
    """Count of language-stopword word occurrences in normalized text."""
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(normalize(c), F.lit(pat), 0))


def lang_guess(c: Column, langs=("en", "de", "fr", "es")) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when all zero.

    Deterministic tie-break: first language in `langs` wins (mirrors the SQL
    CASE chain with >= comparisons in the oracle).

    r7 shape: ONE combined `\\b(all langs' words)\\b` scan + a single
    ``aggregate`` expression that counts per-language membership over the
    (few) matched words and computes the argmax in the aggregate's finish
    lambda. The round-6 when-chain referenced each per-language
    ``regexp_extract_all`` several times, and higher-order functions fall
    out of whole-stage codegen, so no common-subexpression elimination
    applied — the text was regex-scanned ~8× per row (measured 3.9–5 s at
    sf1.0 vs ~1.5 s for this form). Equivalence: every ``\\b``-match is a
    full boundary-delimited token, so two matches can never overlap and the
    union scan finds exactly the tokens the per-language scans found
    (membership then attributes each to its language(s)); the finish lambda
    replays the identical >=-tie-break CASE chain on identical counts
    (pytest-pinned on random unicode incl. combining marks).
    """
    pat = r"\b(" + "|".join(w for l in langs for w in STOPWORDS[l]) + r")\b"
    matched = F.regexp_extract_all(normalize(c), F.lit(pat), 0)
    zero = F.struct(*[F.lit(0).alias(f"h{i}") for i in range(len(langs))])

    def merge(acc, w):
        return F.struct(
            *[
                (acc[f"h{i}"] + w.isin(*STOPWORDS[l]).cast("int")).alias(f"h{i}")
                for i, l in enumerate(langs)
            ]
        )

    def finish(acc):
        best = F.lit("und")
        best_n = F.lit(0)
        # build reversed so earlier langs win ties — the round-6 chain
        for i, l in reversed(list(enumerate(langs))):
            cond = acc[f"h{i}"] > F.lit(0)
            better = acc[f"h{i}"] >= best_n
            best = F.when(cond & better, F.lit(l)).otherwise(best)
            best_n = F.when(cond & better, acc[f"h{i}"]).otherwise(best_n)
        return best

    # NULL text → NULL matched array → NULL aggregate; the round-6 chain
    # yielded 'und' there (NULL hit counts fail every guard) — coalesce
    # reproduces it without re-evaluating the scan on non-null rows
    return F.coalesce(F.aggregate(matched, zero, merge, finish), F.lit("und"))


def quality_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-row quality features: word/token counts, char-class ratios, and a
    composite score in [0,1] (simple monotone combination, documented here so
    the oracle reproduces it exactly).

    r7 shape: the base features are computed once into a struct behind an
    ``explode(array(struct(...)))`` Generate barrier; the derived columns
    (stopword_ratio, quality_score) then reference Generate OUTPUT
    attributes. The round-6 single-projection form let CollapseProject
    inline the full normalize+split trees into every reference (word_count
    appeared 3×, and the regex/HOF subtrees are codegen-fallback, so no CSE
    rescued it) — measured 6.2 s → ~4 s at sf1.0 for identical values
    (same expressions, evaluated once)."""
    c = F.col(col)
    # two Generate levels: the first stages the normal form ONCE (word_count
    # and stopword_hits both consume it — inlined, normalize ran twice),
    # the second stages the feature struct
    norm_staged = df.select("*", F.explode(F.array(normalize(c))).alias("_norm"))
    n = F.col("_norm")
    wc = F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(F.split(n, " ")))
    sw_pat = r"\b(" + "|".join(STOPWORDS["en"]) + r")\b"
    base = F.struct(
        wc.alias("wc"),
        token_count(c).alias("tc"),
        char_class_ratio(c, PUNCT_RE).alias("pr"),
        char_class_ratio(c, UPPER_RE).alias("ur"),
        char_class_ratio(c, DIGIT_RE).alias("dr"),
        F.size(F.regexp_extract_all(n, F.lit(sw_pat), 0)).alias("sw"),
    )
    # explode of a 1-element array = a Generate node: exactly one output row
    # per input row, and a projection-collapse barrier (each feature
    # expression evaluates once, however many downstream columns read it)
    staged = norm_staged.select(*df.columns, F.explode(F.array(base)).alias("_q"))
    sr = F.when(F.col("_q.wc") == 0, F.lit(0.0)).otherwise(
        F.col("_q.sw") / F.col("_q.wc")
    )
    out = staged.select(
        *df.columns,
        F.col("_q.wc").alias("word_count"),
        F.col("_q.tc").alias("token_count"),
        F.col("_q.pr").alias("punct_ratio"),
        F.col("_q.ur").alias("upper_ratio"),
        F.col("_q.dr").alias("digit_ratio"),
        sr.alias("stopword_ratio"),
    )
    # these references inline to plain _q field extracts — cheap, no re-eval
    score = (
        F.least(F.col("word_count") / F.lit(20.0), F.lit(1.0)) * 0.5
        + (1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))) * 0.25
        + (1.0 - F.least(F.col("digit_ratio") * 4.0, F.lit(1.0))) * 0.25
    )
    return out.withColumn("quality_score", F.round(score, 6))


def fingerprint(c: Column) -> Column:
    """Deterministic content fingerprint: md5 of the normal form (identical
    hex string in Spark and DuckDB — the cross-engine dedup key)."""
    return F.md5(normalize(c))
