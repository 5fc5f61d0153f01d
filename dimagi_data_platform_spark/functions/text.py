"""Text-analysis functions for the LLM-data-pipeline surface.

All JVM-side (`pyspark.sql.functions` regex/array ops) — no Python UDFs
— so they stay inside whole-stage codegen and scale linearly with the
scan. Every function has an exact DuckDB twin in plans/oracle.py; regex
patterns are kept to the RE2 ∩ Java-regex common subset.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS = r"\s+"
# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation.
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^\w\s]"

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# language → marker-word alternation for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ("the", "of", "and", "to", "is"),
    "es": ("el", "la", "de", "los", "y"),
    "de": ("der", "die", "das", "und", "ein"),
    "fr": ("le", "les", "et", "un", "une"),
}
# deterministic preference order on ties
LANG_ORDER = ("en", "es", "de", "fr")


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col) -> Column:
    """Whitespace tokens of lower-cased trimmed text."""
    return F.split(F.trim(F.lower(_c(col))), WS)


def ws_token_count(col) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_token_count(col) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_RE), 0)).cast("long")


def punct_count(col) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(PUNCT_RE), 0)).cast("long")


def marker_count(col, words: tuple[str, ...]) -> Column:
    """Count whole-word occurrences of any marker word (on lower text)."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit(pat), 0)).cast("long")


def stopword_count(col) -> Column:
    return marker_count(col, EN_STOPWORDS)


def lang_scores(col) -> dict[str, Column]:
    return {lang: marker_count(col, words) for lang, words in LANG_MARKERS.items()}


def lang_predict(scores: dict[str, Column]) -> Column:
    """Argmax over language scores; ties go to the earliest language in
    LANG_ORDER; 'und' (undetermined) when every score is zero."""
    result = F.lit("und")
    for lang in reversed(LANG_ORDER):
        others = [scores[o] for o in LANG_ORDER if o != lang]
        cond = (scores[lang] > 0) & (scores[lang] >= F.greatest(*others))
        result = F.when(cond, F.lit(lang)).otherwise(result)
    return result


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUM_RE = r"[0-9][0-9 ()+.-]{5,}[0-9]"


def redact_pii(col) -> Column:
    """Mask emails then long digit runs (phone/id-shaped). Pattern order
    matters: emails first so their digits aren't half-masked."""
    no_email = F.regexp_replace(_c(col), EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(no_email, LONG_NUM_RE, "[NUM]")


def clean_text(col) -> Column:
    """Normalization pipeline: lowercase → strip non-word/space chars →
    collapse whitespace → trim. The canonical pre-dedup form."""
    lowered = F.lower(_c(col))
    stripped = F.regexp_replace(lowered, r"[^\w\s]", " ")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def shingles_from_tokens(tok_col, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED token-array
    column. Callers must `.withColumn("toks", tokens(text))` first:
    higher-order-function lambdas re-evaluate their inputs per element
    (no CSE), so passing `tokens(text)` inline here re-runs the regex
    split ~3n times per shingle (~10x slowdown measured at sf0.1)."""
    t = _c(tok_col)
    idx = F.sequence(F.lit(0), F.size(t) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(F.when(F.size(t) >= n, grams).otherwise(F.array()))


def shingles(col, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined), [] for short docs.
    Convenience form; hot paths should materialize tokens first and use
    ``shingles_from_tokens`` (see its docstring)."""
    return shingles_from_tokens(tokens(col), n)
