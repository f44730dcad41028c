"""Content scrubbing for training-data curation: PII detection /
redaction and bad-word (blocklist) filtering, as pure native regex
Column expressions.

Beyond-reference extension (the reference has no content filtering;
its closest analogue is the validity CASE in `validations.py` — see
SURVEY §2.2). These are the gates every pretraining corpus passes
through before tokenization: C4 drops documents containing blocklist
words, and production pipelines redact emails / phone numbers / IP
addresses / SSNs before the text ever reaches a trainer.

Scale design:
- Every detector is a single `regexp_count` / `regexp_replace` over
  the text column — a narrow per-row projection inside whole-stage
  codegen. Scrubbing 100 TB costs one scan, no shuffle, no UDF.
- Patterns are restricted to the regex intersection of Java
  (Spark) and RE2 (DuckDB): character classes, bounded repetition,
  alternation, word boundaries — no lookaround, no backrefs. That
  keeps the oracle SQL (`len(regexp_extract_all(...))` /
  `regexp_replace(..., 'g')`) bit-identical to the Spark plan.
- The blocklist compiles to ONE alternation regex, not one pass per
  word: `\\b(w1|w2|...)\\b` scans the text once however long the
  list grows.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Detector patterns — Java/RE2 common subset ONLY (no lookaround).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}

REDACTION_TOKEN = "[PII]"


def pattern_counts(col: Column, patterns: Mapping[str, str] | None = None) -> dict[str, Column]:
    """Per-pattern match counts (``{name: Column}``), one
    ``regexp_count`` each — all JVM-side."""
    pats = PII_PATTERNS if patterns is None else patterns
    return {name: F.regexp_count(col, F.lit(pat)) for name, pat in pats.items()}


def scrub(
    col: Column,
    patterns: Mapping[str, str] | None = None,
    token: str = REDACTION_TOKEN,
) -> Column:
    """Redact every match of every pattern with ``token``. Patterns are
    applied in dict order (stable), each as one global
    ``regexp_replace`` pass."""
    pats = PII_PATTERNS if patterns is None else patterns
    out = col
    for pat in pats.values():
        out = F.regexp_replace(out, pat, token)
    return out


def blocklist_pattern(words: Sequence[str]) -> str:
    """One word-boundary alternation over the blocklist."""
    return r"\b(" + "|".join(words) + r")\b"


def blocklist_hits(col: Column, words: Sequence[str]) -> Column:
    """Total blocklist occurrences in ``col`` (single regex pass)."""
    return F.regexp_count(col, F.lit(blocklist_pattern(words)))


def scrub_audit(
    df: DataFrame,
    text_col: str,
    blockwords: Sequence[str],
    patterns: Mapping[str, str] | None = None,
    max_hits: int = 0,
) -> DataFrame:
    """Curation-gate audit: per-row PII counts, blocklist hits, the
    C4-style keep/drop action (drop when blocklist hits exceed
    ``max_hits``), and the post-redaction length. Adds columns
    ``<name>_count`` per pattern, ``blocklist_hits``, ``action``,
    ``scrubbed_chars``."""
    c = F.col(text_col)
    out = df
    for name, cnt in pattern_counts(c, patterns).items():
        out = out.withColumn(f"{name}_count", cnt)
    hits = blocklist_hits(c, blockwords)
    return (
        out.withColumn("blocklist_hits", hits)
        .withColumn(
            "action",
            F.when(hits > max_hits, F.lit("drop")).otherwise(F.lit("keep")),
        )
        .withColumn("scrubbed_chars", F.length(scrub(c, patterns)))
    )


# --- DuckDB oracle twins -------------------------------------------------


def _sql_quote(pat: str) -> str:
    # DuckDB string literals are escape-free (standard SQL): a backslash
    # is a literal backslash, so regex patterns pass through verbatim —
    # only embedded quotes need doubling.
    return "'" + pat.replace("'", "''") + "'"


def pattern_count_sql(text_expr: str, pattern: str) -> str:
    return f"len(regexp_extract_all({text_expr}, {_sql_quote(pattern)}))"


def scrub_sql(
    text_expr: str,
    patterns: Mapping[str, str] | None = None,
    token: str = REDACTION_TOKEN,
) -> str:
    pats = PII_PATTERNS if patterns is None else patterns
    out = text_expr
    for pat in pats.values():
        out = f"regexp_replace({out}, {_sql_quote(pat)}, '{token}', 'g')"
    return out


def blocklist_hits_sql(text_expr: str, words: Sequence[str]) -> str:
    return pattern_count_sql(text_expr, blocklist_pattern(words))
