from pyspark.sql import functions as F

from py3dtiles_spark.functions import text as T


def _df(spark):
    return spark.createDataFrame(
        [(0, "the cat and the dog went to the house of cards"),
         (1, "le chat et le chien est dans la maison de une ville"),
         (2, "der hund und die katze ist ein tier und das haus"),
         (3, "xyzzy plugh qwerty"),
         (4, "a, b; c! d? e.")],
        "doc_id long, text string")


def test_token_counts(spark):
    got = {r.doc_id: r.n for r in
           _df(spark).select("doc_id", T.token_count().alias("n")).collect()}
    assert got[0] == 11 and got[3] == 3


def test_lang_id(spark):
    got = {r.doc_id: r.lang for r in
           _df(spark).select("doc_id", T.lang_id().alias("lang")).collect()}
    assert got[0] == "en" and got[1] == "fr" and got[2] == "de"
    assert got[3] == "und"


def test_quality_and_ratios(spark):
    rows = _df(spark).select(
        "doc_id", T.quality_score().alias("q"),
        T.punct_ratio().alias("p"), T.stopword_ratio().alias("s")).collect()
    by = {r.doc_id: r for r in rows}
    assert 0 <= by[0].q <= 1
    assert by[4].p > by[0].p          # punctuation-heavy doc
    assert by[0].s > by[3].s          # English stopwords present


def test_fingerprint_deterministic_and_shift_sensitive(spark):
    df = _df(spark)
    a = df.select("doc_id", T.fingerprint(shingle_tokens=3).alias("fp"))
    b = df.select("doc_id", T.fingerprint(shingle_tokens=3).alias("fp"))
    assert a.collect() == b.collect()
    # identical text -> identical fingerprint
    dup = spark.createDataFrame(
        [(0, "one two three four five"), (1, "one two three four five")],
        "doc_id long, text string")
    fps = [r.fp for r in dup.select(T.fingerprint(shingle_tokens=3).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(0, "hello world42 foo-bar")],
                               "doc_id long, text string")
    n = df.select(T.bpe_ish_token_count().alias("n")).collect()[0].n
    assert n >= 4  # hello, world, 42, foo, -, bar split
