"""Property-based validation of the text-curation DuckDB oracle twins
(no SparkSession — fast): random small corpora -> an independent
plain-Python reference implementation vs the EXACT committed oracle SQL
run on an in-memory documents table. Together with the driver gate
(Spark == DuckDB at sf0.01) and the hand-computed Spark goldens in
test_text.py this closes the Spark == DuckDB == reference triangle.
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

import duckdb
from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

token = st.sampled_from(["a", "b", "c", "ab", "z"])
doc = st.lists(token, min_size=0, max_size=20).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)

W = 8  # the committed oracles use 8-token windows


def _con(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    return con


def _windows(text):
    toks = [t for t in text.split(" ") if t]
    return [" ".join(toks[i:i + W])
            for i in range(max(len(toks) - (W - 1), 1))]


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus)
def test_substring_dup_oracle_matches_python_reference(texts):
    counts = Counter(w for t in texts for w in _windows(t))
    expected = {}
    for i, t in enumerate(texts):
        ws = _windows(t)
        dup = sum(1 for w in ws if counts[w] >= 2)
        expected[i] = (len(ws), dup, round(dup / len(ws), 6))
    con = _con(texts)
    got = {r[0]: (r[1], r[2], r[3])
           for r in con.sql(entrymod.oracle_sql()["substring_dup"])
                       .fetchall()}
    assert got == expected


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus)
def test_unigram_logprob_oracle_matches_python_reference(texts):
    tf = Counter()
    for i, t in enumerate(texts):
        for tok in t.split(" "):
            if tok:
                tf[(i, tok)] += 1
    vocab = Counter()
    for (_, tok), c in tf.items():
        vocab[tok] += c
    T, V = sum(vocab.values()), len(vocab)
    expected = {}
    for i in range(len(texts)):
        n = sum(c for (d, _), c in tf.items() if d == i)
        if n == 0:
            continue  # token-less docs drop out of the inner join
        s = sum(c * math.log((vocab[tok] + 1.0) / (T + V))
                for (d, tok), c in tf.items() if d == i)
        expected[i] = (n, s / n)
    con = _con(texts)
    rows = con.sql(entrymod.oracle_sql()["unigram_logprob"]).fetchall()
    got = {r[0]: (r[1], r[2]) for r in rows}
    assert set(got) == set(expected)
    for i, (n, lp) in expected.items():
        assert got[i][0] == n
        # the oracle rounds ln-sums to 6 dp; allow one ulp of the rounding
        assert abs(got[i][1] - round(lp, 6)) <= 1e-6


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus)
def test_decontaminate_oracle_matches_python_reference(texts):
    eval_ws = {w for i, t in enumerate(texts) if i % 41 == 0
               for w in _windows(t)}
    expected = {}
    for i, t in enumerate(texts):
        ws = _windows(t)
        hit = sum(1 for w in ws if w in eval_ws)
        expected[i] = (len(ws), hit, 1 if hit else 0)
    con = _con(texts)
    got = {r[0]: (r[1], r[2], r[3])
           for r in con.sql(entrymod.legacy_oracle_sql()["decontaminate"])
                       .fetchall()}
    assert got == expected


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus)
def test_top_ngrams_oracle_matches_python_reference(texts):
    grams = Counter()
    for t in texts:
        toks = [x for x in t.split(" ") if x]
        grams.update(" ".join(toks[i:i + 2]) for i in range(len(toks) - 1))
    expected = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expected = [(g, c, r + 1) for r, (g, c) in enumerate(expected)]
    con = _con(texts)
    got = [tuple(r) for r in
           con.sql(entrymod.legacy_oracle_sql()["top_ngrams"]).fetchall()]
    assert got == expected
