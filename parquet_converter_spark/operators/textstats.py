"""Text analysis for training-data pipelines: token counts, quality
scores, language-ID heuristic, document fingerprints.

All pure Catalyst expressions (split/filter/aggregate higher-order
functions) — JVM-side, codegen'd, shuffle-free per row; the only
shuffles are the final grouped summaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]

# tiny per-language stopword profiles for the language-ID heuristic
_LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.trim(F.col(text_col)), " "), lambda t: t != "")


def _maybe_ordered(df: DataFrame, id_col: str, ordered: bool) -> DataFrame:
    """Per-doc ops default to UNORDERED for pipeline use — a global sort
    on a 10^12-row corpus is a full range shuffle a downstream stage
    almost never needs. Driver/oracle queries pass ordered=True (or sort
    themselves) where deterministic row order matters."""
    return df.orderBy(id_col) if ordered else df


def token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", ordered: bool = False
) -> DataFrame:
    """Whitespace token count per document."""
    out = df.select(F.col(id_col), F.size(_tokens(text_col)).alias("n_tokens"))
    return _maybe_ordered(out, id_col, ordered)


def token_count_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level token statistics (one fused aggregate)."""
    nt = F.size(_tokens(text_col))
    return df.agg(
        F.sum(nt).alias("total_tokens"),
        F.round(F.avg(nt), 4).alias("avg_tokens"),
        F.max(nt).alias("max_tokens"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", ordered: bool = False
) -> DataFrame:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean word length. Engine-portable regexes (literal classes)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(STOPWORDS_EN)))
    out = df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(
            (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1)), 4
        ).alias("mean_word_len"),
    )
    return _maybe_ordered(out, id_col, ordered)


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", ordered: bool = False
) -> DataFrame:
    """Stopword-profile language ID: argmax of per-language hit counts
    (n-gram-free heuristic; 'und' = undetermined on zero hits)."""
    toks = F.transform(_tokens(text_col), lambda x: F.lower(x))
    scores = [
        F.size(F.filter(toks, lambda x: x.isin(words))).alias(lang)
        for lang, words in _LANG_PROFILES.items()
    ]
    scored = df.select(F.col(id_col), *scores)
    best = F.greatest(*[F.col(l) for l in _LANG_PROFILES])
    pred = F.lit("und")
    # first language reaching the max wins (deterministic order)
    for lang in reversed(list(_LANG_PROFILES)):
        pred = F.when((F.col(lang) == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return _maybe_ordered(scored.select(id_col, pred.alias("pred_lang")), id_col, ordered)


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", ordered: bool = False
) -> DataFrame:
    """Content fingerprint: xxhash64 of the normalized text (lowercased,
    whitespace-collapsed) — the exact-dedup key at scale."""
    norm = F.lower(F.concat_ws(" ", _tokens(text_col)))
    out = df.select(F.col(id_col), F.xxhash64(norm).alias("fp"))
    return _maybe_ordered(out, id_col, ordered)


def lang_distribution(df: DataFrame, lang_col: str = "lang") -> DataFrame:
    return (
        df.groupBy(F.col(lang_col).alias("lang"))
        .agg(F.count("*").alias("n"))
        .orderBy("lang")
    )
