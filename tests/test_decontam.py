"""Test-set decontamination: ratios, key modes, corpus filtering."""

from pyspark.sql import functions as F  # noqa: F401


BENCH_WORDS = ("apple banana cherry date elder fig grape honey iris "
               "jasmine kiwi lemon mango nectar olive peach quince "
               "raisin squash tomato").split()


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_ratios_and_drop(spark):
    from crawler_seo_spark.operators.decontam import (
        contamination_ratios, drop_contaminated)

    bench = _df(spark, [(0, " ".join(BENCH_WORDS))])
    own1 = "zero one two three four five six seven eight nine".split()
    own2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    slice12 = BENCH_WORDS[3:15]          # 12 contiguous benchmark words
    corpus = _df(spark, [
        (10, " ".join(BENCH_WORDS)),                       # exact copy
        (11, " ".join(own1 + slice12 + own2)),             # embedded run
        (12, " ".join(own1 + own2)),                       # clean
        (13, "too short for any gram"),                    # <8 tokens
    ])

    got = {r["doc_id"]: r for r in contamination_ratios(
        corpus, bench, n=8, key="text").collect()}
    assert set(got) == {10, 11, 12}       # doc 13: no 8-grams, no row
    assert got[10]["contamination_ratio"] == 1.0
    assert got[12]["n_contaminated"] == 0

    # doc 11: 32 tokens -> 25 grams; grams fully inside the 12-word
    # benchmark run: 12 - 7 = 5
    assert got[11]["n_ngrams"] == 25
    assert got[11]["n_contaminated"] == 5
    assert got[11]["contamination_ratio"] == round(5 / 25, 6)

    # hash-key production mode agrees with the string-key oracle mode
    got_h = {r["doc_id"]: (r["n_ngrams"], r["n_contaminated"])
             for r in contamination_ratios(
                 corpus, bench, n=8, key="hash").collect()}
    assert got_h == {k: (v["n_ngrams"], v["n_contaminated"])
                     for k, v in got.items()}

    # threshold 0.5 drops only the exact copy; the short doc is KEPT
    kept = {r["doc_id"] for r in drop_contaminated(
        corpus, bench, threshold=0.5).select("doc_id").collect()}
    assert kept == {11, 12, 13}


def test_word_ngrams_empty_and_exact_boundary(spark):
    from crawler_seo_spark.operators.decontam import word_ngrams_col
    df = _df(spark, [(0, "a b c d e f g h"),     # exactly 8 tokens
                     (1, "a b c d e f g"),       # 7 tokens -> none
                     (2, "")])
    out = {r["doc_id"]: r["g"] for r in df.select(
        "doc_id", word_ngrams_col(F.col("text"), 8).alias("g")).collect()}
    assert out[0] == ["a b c d e f g h"]
    assert out[1] == []
    assert out[2] == []
