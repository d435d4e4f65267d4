

def test_repetition_scores_golden(spark):
    """Hand-computed Gopher repetition metrics on a crafted doc:
    'x y x y x y z' -> top2 ('x y' 3 of 6 bigrams) mass 6/7;
    5-grams: (x y x y x),(y x y x y),(x y x y z) -> no duplicates."""
    from pyogrio_spark.functions.text import repetition_scores

    docs = spark.createDataFrame(
        [(1, "x y x y x y z")], "doc_id bigint, text string"
    )
    r = repetition_scores(docs).collect()[0]
    assert r.n_words == 7
    assert r.top2_frac == round(3 * 2 / 7, 6)
    assert r.top3_frac == round(2 * 3 / 7, 6)   # 'x y x' twice
    assert r.top4_frac == round(2 * 4 / 7, 6)   # 'x y x y' twice
    assert r.dup5_frac == 0.0


def test_repetition_scores_duplicate_lines(spark):
    """line_sep mode: 'aa\\nbb\\naa\\ncc' has 2 of 4 line occurrences
    duplicated (both 'aa'), char mass 4 of 8."""
    from pyogrio_spark.functions.text import repetition_scores

    docs = spark.createDataFrame(
        [(1, "aa\nbb\naa\ncc")], "doc_id bigint, text string"
    )
    r = repetition_scores(docs, line_sep="\n").collect()[0]
    assert r.dup_line_frac == 0.5
    assert r.dup_line_char_frac == 0.5


def test_repetition_scores_duplicated_5grams(spark):
    """A doc that repeats an 8-word phrase: every 5-gram inside the
    repeated span is duplicated; dup5_frac > 0 and line_words=4
    segments show duplicate lines."""
    from pyogrio_spark.functions.text import repetition_scores

    phrase = "a b c d a b c d"          # 4-word phrase twice
    docs = spark.createDataFrame(
        [(1, phrase + " " + phrase)], "doc_id bigint, text string"
    )
    r = repetition_scores(docs, line_words=4).collect()[0]
    assert r.dup5_frac > 0.0
    assert r.dup_line_frac == 1.0       # all four 4-word segments are 'a b c d'
    assert r.top2_frac == round(4 * 2 / 16, 6)


def test_linear_quality_score_golden_and_plan(spark):
    """Hand-computed golden: score is the exact integer sum of the
    md5-bucket milli-weights of each word (+ bias), and the plan is one
    codegen projection — no Python stage, no Exchange (zero shuffle)."""
    import hashlib

    from pyogrio_spark.functions.text import (
        linear_quality_score,
        linear_quality_weights,
    )

    w = linear_quality_weights()
    docs = spark.createDataFrame(
        [(0, "alpha beta beta"), (1, ""), (2, "x")], "doc_id bigint, text string"
    )

    def bucket(word):
        return int(hashlib.md5(("qw" + word).encode()).hexdigest()[:15], 16) % len(w)

    out = {r.doc_id: r for r in linear_quality_score(docs, bias_milli=7).collect()}
    assert out[0].n_words == 3
    assert out[0].score_milli == 7 + w[bucket("alpha")] + 2 * w[bucket("beta")]
    assert out[1].n_words == 0 and out[1].score_milli == 7
    assert out[2].score_milli == 7 + w[bucket("x")]
    assert out[0].keep == (out[0].score_milli >= 0)
    plan = (
        linear_quality_score(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "Exchange" not in plan
