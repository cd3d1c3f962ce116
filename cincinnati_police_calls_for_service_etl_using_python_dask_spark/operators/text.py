"""Text-analysis operators for LLM-data pipelines (BASELINE.json north
star; SURVEY.md §7.2 M5): tokenization, quality scoring, language ID,
fingerprinting, shingling.

All pure Catalyst expressions — no Python UDFs — so they stay inside
whole-stage codegen and scale to 100 TB document corpora. Regex
patterns are restricted to syntax shared by Java regex (Spark) and RE2
(DuckDB) so every operator is oracle-checkable.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace tokenizer — identical semantics in Java regex and RE2.
TOKEN_SPLIT = r"\s+"

# Characters that count as "punctuation" for quality scoring: anything
# that's not alphanumeric or whitespace. Explicit class, dialect-safe.
PUNCT_CLASS = r"[^a-zA-Z0-9\s]"

# Small English stopword list for the language-ID heuristic. Order and
# content pinned — the oracle SQL embeds the same list.
EN_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be", "are",
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokens of trimmed (optionally lowercased) text."""
    c = F.trim(_c(col))
    if lowercase:
        c = F.lower(c)
    return F.split(c, TOKEN_SPLIT)


def token_count(col: Column | str) -> Column:
    """Token count; 0 for empty/whitespace-only text (split of an empty
    string yields [''], which must not count)."""
    t = F.trim(_c(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, TOKEN_SPLIT)))


# BPE-style pre-tokenizer classes: a run of letters, a run of digits,
# or ONE other non-space character — the GPT-2 pre-tokenization shape
# restricted to syntax Java regex and RE2 agree on.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_like_token_count(col: Column | str) -> Column:
    """Subword-style token count: letter runs + digit runs + individual
    punctuation marks (each its own token). Approximates a BPE
    pre-tokenizer's sequence length — the standard budget unit for
    sequence packing — without needing a vocab. 'don't stop' → 4
    tokens (don, ', t, stop); whitespace never counts."""
    return F.regexp_count(_c(col), F.lit(BPE_TOKEN_PATTERN))


def punct_count(col: Column | str) -> Column:
    """Number of punctuation characters (PUNCT_CLASS matches)."""
    c = _c(col)
    return F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))


def stopword_count(col: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Occurrences (with repeats) of stopwords among the tokens.

    Spelled as a single ``regexp_count`` over the lowercased text, not
    ``size(filter(tokens(..), ..))``: higher-order array functions run
    INTERPRETED in Spark (outside whole-stage codegen AND outside
    common-subexpression elimination), so a query computing quality +
    lang-id would pay the token-filter twice. The anchored alternation
    ``(?:^|\\s)(?:the|a|…)(?=\\s|$)`` counts exactly the
    whitespace-delimited tokens equal to a stopword: consumed leading
    whitespace plus a lookahead trailing boundary means adjacent
    stopwords ("the a the") all match. Token-set parity with the
    list_filter oracle is pinned by the duckdb hash gate.

    Custom stopwords are regex-escaped, so literals like ``c++`` or
    ``a.b`` count exactly (the default EN_STOPWORDS are plain letters
    — escaping them is a no-op, the codegen plan is unchanged).
    """
    pat = r"(?:^|\s)(?:" + "|".join(re.escape(s) for s in stopwords) + r")(?=\s|$)"
    return F.regexp_count(F.lower(F.trim(_c(col))), F.lit(pat))


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1] from length / punctuation /
    stopword signals — the standard cheap pre-filter for LLM training
    corpora.

    score = [ floor(4000·min(tokens,64)/64) + floor(3000·(chars−punct)/chars)
            + min(3000, floor(15000·stopwords/tokens)) ] / 10000

    i.e. 0.4·length + 0.3·(1−punct_ratio) + 0.3·min(1, 5·stopword_ratio),
    with each component floored at the 4th decimal in INTEGER
    arithmetic. Float formulas produce rationals that can land exactly
    on rounding ties where engines diverge; integer floor-division is
    bit-identical everywhere (the final /10000.0 of an int ≤ 10000 is
    an exact IEEE op).
    """
    n_tok = token_count(col).cast("long")
    n_char = F.length(_c(col)).cast("long")
    n_punct = punct_count(col).cast("long")
    n_sw = stopword_count(col).cast("long")
    comp_len = F.floor(F.least(n_tok, F.lit(64)) * 4000 / 64).cast("long")
    comp_punct = F.when(
        n_char > 0, F.floor((n_char - n_punct) * 3000 / n_char).cast("long")
    ).otherwise(F.lit(3000))
    comp_sw = F.when(
        n_tok > 0, F.least(F.lit(3000), F.floor(n_sw * 15000 / n_tok).cast("long"))
    ).otherwise(F.lit(0))
    return ((comp_len + comp_punct + comp_sw) / F.lit(10000.0)).cast("double")


def lang_id(col: Column | str, threshold: float = 0.05) -> Column:
    """Stopword-ratio language ID: 'en' when ≥ threshold of tokens are
    English stopwords, else 'und'. (N-gram models plug in the same way;
    this pins the operator shape with a dependency-free heuristic.)"""
    n_tok = token_count(col).cast("double")
    ratio = F.when(n_tok > 0, stopword_count(col) / n_tok).otherwise(F.lit(0.0))
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("und"))


def fingerprint(col: Column | str) -> Column:
    """Canonical content fingerprint: md5 of whitespace-collapsed,
    lowercased, trimmed text. Computed map-side; downstream dedup
    shuffles only the 32-char digest, never the document."""
    normalized = F.regexp_replace(F.lower(F.trim(_c(col))), TOKEN_SPLIT, " ")
    return F.md5(normalized)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the MinHash input). For texts
    shorter than n tokens, the whole text is the single shingle."""
    toks = tokens(col)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    whole = F.array(F.concat_ws(" ", toks))
    return F.array_distinct(F.when(k >= n, grams).otherwise(whole))


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard per-document stat columns in one projection
    (single scan; all codegen)."""
    return df.withColumns(
        {
            "n_tokens": token_count(text_col),
            "n_punct": punct_count(text_col),
            "n_stopwords": stopword_count(text_col),
            "quality": quality_score(text_col),
            "lang_guess": lang_id(text_col),
            "fingerprint": fingerprint(text_col),
        }
    )
