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


def tfidf_top_terms(docs, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Top-k TF-IDF terms per document — the canonical corpus-statistics
    operator, fully native (SURVEY §2.7-adjacent; the webtext pipeline's
    keyword/fingerprint step):

        tf(t, d)  = count of t in d
        idf(t)    = ln((N + 1) / (df(t) + 1))   (smoothed)
        score     = tf * idf

    Physical shape at 100 TB: one explode -> two map-side-combined aggs
    ((doc, term) tf and term df) -> broadcast-sized df table only if the
    vocab is small, otherwise a shuffle equi-join on term -> window top-k
    per doc. All built-in expressions; ties break lexicographically so
    the result is deterministic and SQL-oracle-checkable.

    Returns (doc_id, term, tf, score, rk<=k).
    """
    from pyspark.sql import Window

    toks = docs.select(
        id_col,
        F.explode(F.filter(tokens(text_col), lambda t: t != F.lit("")))
        .alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n"))
    df_t = (tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
            .crossJoin(F.broadcast(n_docs)))
    idf = df_t.select(
        "term",
        F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)).alias("idf"))
    # round BEFORE ranking so the tie-break (score, term) is identical in
    # any engine computing the same 6-dp values (raw ln() can differ in
    # the last ulp between runtimes)
    scored = (tf.join(idf, "term")
              .withColumn("score", F.round(F.col("tf") * F.col("idf"), 6)))
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("term").asc())
    return (scored.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= k)
            .select(id_col, "term", "tf", "score", "rk"))


def dup_ngram_fraction(text_col: str = "text", n: int = 3) -> Column:
    """Gopher-style repetition signal: fraction of word n-grams that are
    duplicates of an earlier n-gram in the same document
    (1 - distinct/total). High values flag boilerplate/spam/looping
    generations — a standard pre-training quality filter. Pure native
    exprs: the n-gram array is built with transform+slice (no explode,
    no shuffle — per-row compute only)."""
    toks = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.transform(F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
                        lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(cnt <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(grams)) / cnt.cast("double"))
