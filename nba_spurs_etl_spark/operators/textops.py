"""Text analysis operators over document corpora.

Language-ID, quality scoring, token counting and fingerprinting — the
per-document metrics a training-data pipeline computes before
filtering. All pure column expressions (whole-stage-codegen'd, no
Python), all with exact DuckDB oracles.

Scale: every operator here is embarrassingly parallel per-row (no
shuffle at all) — the ideal 100 TB shape. The only care needed is
keeping the expressions in codegen (they are: split/filter/aggregate
array ops), never per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import md5_long

# tiny per-language stopword lists for the n-gram/stopword heuristic.
# Order matters: ties resolve to the first language listed.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"],
}

# BPE-ish token pattern: letter runs, digit runs, or single punctuation
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def words(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def whitespace_token_count(col: str | Column) -> Column:
    return F.size(words(col)).cast("bigint")


def regex_token_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_REGEX)).cast("bigint")


def stopword_hits(col: str | Column, stopwords: list[str]) -> Column:
    """Number of tokens (with multiplicity) that are stopwords."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words(col), lambda t: F.array_contains(sw, t))).cast(
        "bigint"
    )


def lang_id(col: str | Column) -> Column:
    """Stopword-vote language guess; 'und' when no list scores > 0."""
    hits = {lang: stopword_hits(col, sw) for lang, sw in LANG_STOPWORDS.items()}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):  # first lang wins ties
        out = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            out
        )
    return out


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality metrics + a composite score in [0, 1].

    Features follow the usual corpus-filtering recipe: length, mean
    word length, stopword ratio, alpha ratio, repetition (distinct
    token ratio). The score is a fixed linear blend — deterministic,
    no model. Exact-arithmetic note: ratios are double divisions of
    exact integers, bit-identical across engines.
    """
    w = words(text_col)
    n_tok = F.size(w).cast("bigint")
    n_chars = F.length(text_col).cast("bigint")
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n_tok
    mean_word_len = (n_chars - (n_tok - 1)).cast("double") / n_tok
    stop_ratio = stopword_hits(text_col, LANG_STOPWORDS["en"]).cast("double") / n_tok
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(text_col) if isinstance(text_col, str) else text_col, "[^A-Za-z]", ""))
        .cast("double")
        / n_chars
    )
    # clamp helpers keep the blend in [0,1]
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.25) * len_score
        + F.lit(0.25) * distinct_ratio
        + F.lit(0.25) * F.least(stop_ratio * 2, F.lit(1.0))
        + F.lit(0.25) * alpha_ratio
    )
    return df.select(
        F.col(id_col).alias("doc"),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        distinct_ratio.alias("distinct_ratio"),
        mean_word_len.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        score.alias("quality_score"),
    )


def fingerprint(col: str | Column) -> Column:
    """Order-insensitive content fingerprint: 60-bit hash of the sorted
    distinct token list (catches shuffled/reordered duplicates that
    exact hashing misses)."""
    return md5_long(F.concat_ws(" ", F.array_sort(F.array_distinct(words(col)))))


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass per-doc profile: token counts, lang guess, fingerprint."""
    return df.select(
        F.col(id_col).alias("doc"),
        whitespace_token_count(text_col).alias("ws_tokens"),
        regex_token_count(text_col).alias("re_tokens"),
        lang_id(text_col).alias("lang_guess"),
        fingerprint(text_col).alias("fingerprint"),
    )
