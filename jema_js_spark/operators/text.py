"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, fingerprinting.

Everything here is pure ``pyspark.sql.functions`` expression algebra —
JVM-side, whole-stage-codegen, no Python in the hot path — because
these run over every document of a 100 TB corpus and a pandas UDF
would put an Arrow round-trip on the hottest loop in the system.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["token_count", "word_tokens", "quality_features",
           "quality_score", "lang_id_expr", "fingerprint64",
           "char_ngrams", "with_text_features"]

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space
# symbols (the common GPT-2-style pretokenization regex family,
# simplified to the Java-regex-safe subset)
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword seeds for the n-gram/stopword-ratio
# heuristic language classifier
_LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "es", "una", "para", "por", "con", "del"],
    "it": ["il", "di", "che", "della", "per", "con", "del", "sono", "una"],
    "pt": ["o", "os", "das", "dos", "não", "uma", "para", "com", "em"],
    "nl": ["de", "het", "een", "van", "en", "niet", "met", "voor", "zijn"],
}


def word_tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """Token count: ``whitespace`` or ``bpe`` (regex pre-tokenizer —
    the BPE-proxy count used for corpus budgeting)."""
    if mode == "whitespace":
        return F.size(word_tokens(text))
    if mode == "bpe":
        return F.size(F.regexp_extract_all(text, F.lit(_BPE_RE), 0))
    raise ValueError(mode)


def quality_features(text: Column) -> Column:
    """Struct of quality signals: length, token counts, mean word
    length, punctuation/digit/uppercase ratios, stopword hit ratio."""
    toks = word_tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    en_stop = F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]])
    return F.struct(
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars / safe_tokens).alias("mean_word_len"),
        (F.length(F.regexp_replace(text, r"[^\p{Punct}]", "")) / safe_chars)
        .alias("punct_ratio"),
        (F.length(F.regexp_replace(text, r"[^0-9]", "")) / safe_chars)
        .alias("digit_ratio"),
        (F.length(F.regexp_replace(text, r"[^A-Z]", "")) / safe_chars)
        .alias("upper_ratio"),
        (F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
         / safe_tokens).alias("stopword_ratio"),
    )


def quality_score(text: Column) -> Column:
    """Scalar quality score in [0, 1] from the feature struct — a
    Gopher/C4-style heuristic filter: penalize too-short/too-long docs,
    symbol soup, and stopword-free token streams."""
    f = quality_features(text)
    score = (
        F.lit(1.0)
        * F.when(f["n_tokens"] < 5, 0.1).when(f["n_tokens"] > 100000, 0.5).otherwise(1.0)
        * F.when((f["mean_word_len"] < 2) | (f["mean_word_len"] > 15), 0.3).otherwise(1.0)
        * F.when(f["punct_ratio"] > 0.3, 0.3).otherwise(1.0)
        * F.when(f["digit_ratio"] > 0.3, 0.4).otherwise(1.0)
        * F.when(f["stopword_ratio"] < 0.01, 0.5).otherwise(1.0)
    )
    return F.least(F.greatest(score, F.lit(0.0)), F.lit(1.0))


def lang_id_expr(text: Column, langs: Optional[List[str]] = None) -> Column:
    """Heuristic language ID: stopword-marker hit counts per language →
    argmax, 'unknown' when nothing scores.  Pure expression algebra
    (arrays of per-language scores + array_position), no UDF."""
    langs = langs or list(_LANG_MARKERS.keys())
    toks = word_tokens(text)

    def _hits(markers: List[str]) -> Column:
        arr = F.array(*[F.lit(w) for w in markers])
        # NB: the lambda must be unary — PySpark treats a second lambda
        # parameter as the element index
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = [_hits(_LANG_MARKERS[lg]) for lg in langs]
    arr = F.array(*scores)
    best = F.array_max(arr)
    idx = F.array_position(arr, best)  # 1-based, first max wins
    lang_arr = F.array(*[F.lit(lg) for lg in langs])
    return F.when(best <= 0, F.lit("unknown")).otherwise(
        F.element_at(lang_arr, idx.cast("int")))


def char_ngrams(text: Column, n: int = 5, max_ngrams: int = 512) -> Column:
    """Array of character n-grams (shingles) of the normalized text —
    generated JVM-side via sequence+transform+substring."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    length = F.length(norm)
    count = F.least(F.greatest(length - (n - 1), F.lit(0)), F.lit(max_ngrams))
    # sequence(1, 0) is DESCENDING [1, 0] in Spark — guard the
    # too-short-text case to an empty shingle set explicitly
    return F.when(count > 0,
                  F.transform(F.sequence(F.lit(1), count),
                              lambda i: norm.substr(i, F.lit(n)))
                  ).otherwise(F.array().cast("array<string>"))


def fingerprint64(text: Column, normalize: bool = True) -> Column:
    """64-bit document fingerprint: hash of the
    whitespace/case-normalized text — the exact-dup key."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ") if normalize else text
    return F.xxhash64(norm)


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience projection: adds token counts, quality score,
    detected language, and fingerprint in one pass.

    The feature Columns are constant expression trees over
    ``text_col`` — memoized per session (round 9): rebuilding them
    (stopword-marker array banks + a dozen higher-order lambdas)
    measured ~290 ms of driver time per call."""
    from jema_js_spark.runtime.colcache import cached_column

    def build():
        t = F.col(text_col)
        return {
            "n_tokens": token_count(t),
            "n_bpe_tokens": token_count(t, "bpe"),
            "quality": quality_score(t),
            "lang_pred": lang_id_expr(t),
            "fingerprint": fingerprint64(t),
        }

    return df.withColumns(
        cached_column(("text_features", text_col), build))
