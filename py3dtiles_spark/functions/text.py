"""Text-analysis column functions for training-data pipelines.

Everything here is a pure built-in Spark expression (JVM-side, whole-stage
codegen, zero Python in the hot path): language-ID heuristic, quality
scoring, token counting, document fingerprinting. Each has an exact ANSI-SQL
twin in __spark_entry__.oracle_sql() so DuckDB can verify values.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "nicht"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es"],
}


def tokens(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """BPE-ish subword estimate: split on word boundaries AND digit/punct
    transitions (regex), i.e. what a byte-pair tokenizer roughly yields."""
    return F.size(F.filter(
        F.split(F.regexp_replace(F.col(text_col),
                                 r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+)", r"$1"),
                ""),
        lambda t: F.trim(t) != ""))


def stopword_ratio(text_col: str = "text", lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = tokens(text_col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text_col: str = "text") -> Column:
    stripped = F.regexp_replace(F.col(text_col), r"[^.,;:!?'\"()-]", "")
    return F.length(stripped) / F.greatest(F.length(text_col), F.lit(1))


def mean_token_len(text_col: str = "text") -> Column:
    toks = tokens(text_col)
    return (F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / F.greatest(F.size(toks), F.lit(1)))


def quality_score(text_col: str = "text") -> Column:
    """Composite quality heuristic in [0, 1]: favors 50-1000 tokens,
    low punctuation density, some stopwords (English prior)."""
    ntok = token_count(text_col)
    len_ok = F.when((ntok >= 50) & (ntok <= 1000), 1.0) \
              .when(ntok < 50, ntok / 50.0) \
              .otherwise(F.lit(1000.0) / ntok)
    return F.round(
        0.5 * len_ok
        + 0.3 * F.least(stopword_ratio(text_col) * 5.0, F.lit(1.0))
        + 0.2 * (1.0 - F.least(punct_ratio(text_col) * 10.0, F.lit(1.0))),
        6)


def lang_id(text_col: str = "text") -> Column:
    """Stopword-vote language guess over {en,fr,de,es}; 'und' if no votes."""
    toks = tokens(text_col)

    def _count_in(arr):
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = [(lang, _count_in(F.array(*[F.lit(w) for w in words])))
              for lang, words in STOPWORDS.items()]
    best = scores[0]
    expr = F.lit(best[0])
    best_score = best[1]
    for lang, score in scores[1:]:
        expr = F.when(score > best_score, F.lit(lang)).otherwise(expr)
        best_score = F.greatest(score, best_score)
    return F.when(best_score > 0, expr).otherwise(F.lit("und"))


def fingerprint(text_col: str = "text", shingle_tokens: int = 8) -> Column:
    """Document fingerprint: minimum md5 over all `shingle_tokens`-token
    rolling windows (a winnowing-style rolling-hash fingerprint, fully
    native: sequence + slice + md5 + array_min)."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(1),
                     F.greatest(F.size(toks) - (shingle_tokens - 1), F.lit(1)))
    hashes = F.transform(
        idx, lambda i: F.md5(F.array_join(F.slice(toks, i, shingle_tokens), " ")))
    return F.array_min(hashes)
