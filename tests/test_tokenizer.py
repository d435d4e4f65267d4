"""Subword tokenization operators (operators/tokenizer.py): greedy
longest-match segmentation, the distributed BPE trainer, codegen BPE
apply, and the metering compose. Hand-computed goldens + invariants
(reconstruction, count consistency) + plan checks."""

import pytest
from pyspark.sql import functions as F

from pyogrio_spark.operators.tokenizer import (
    apply_bpe_merges,
    subword_token_counts,
    tokenize_greedy,
    train_bpe_merges,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_greedy_longest_match_golden(spark):
    """Maximal munch: at each position the LONGEST vocab prefix wins,
    even when a shorter prefix would allow a better overall split
    ("mer" beats "me" in "merge" -> mer+g+e, the classic greedy-vs-
    optimal divergence WordPiece accepts)."""
    vocab = list("abcdefglmnrstuv") + ["me", "mer", "rge", "tab", "le", "ta"]
    out = tokenize_greedy(_docs(spark, ["table merge"]), vocab)
    rows = sorted((r.word_idx, r.tok_pos, r.token) for r in out.collect())
    assert rows == [
        (0, 1, "tab"), (0, 4, "le"),
        (1, 1, "mer"), (1, 4, "g"), (1, 5, "e"),
    ]


def test_greedy_byte_fallback_single_char(spark):
    """A character absent from the vocab is emitted as a single-char
    token (byte-fallback), keeping segmentation total."""
    out = tokenize_greedy(_docs(spark, ["axa"]), ["a"])  # no 'x' in vocab
    rows = sorted((r.tok_pos, r.token) for r in out.collect())
    assert rows == [(1, "a"), (2, "x"), (3, "a")]


def test_greedy_reconstruction_exact(spark):
    """Concatenating each word's tokens in tok_pos order reproduces the
    word exactly, for every word in the corpus — segmentation loses
    nothing."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyogrio_spark.queries import TOKENIZER_VOCAB

    tok = tokenize_greedy(docs, TOKENIZER_VOCAB)
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("word_idx", "word")
    )
    # collect_list has no order guarantee -> rebuild via sort_array of structs
    rebuilt = (
        tok.groupBy("doc_id", "word_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tok_pos", "token"))),
                    lambda s: s.token,
                ),
                "",
            ).alias("re")
        )
    )
    bad = words.join(rebuilt, ["doc_id", "word_idx"]).filter(F.col("re") != F.col("word"))
    assert bad.count() == 0


def test_bpe_train_golden_and_run_semantics(spark):
    """Tiny corpus with hand-computed pair counts. 'aaaa' contributes
    3 adjacent (a,a) occurrences. Under the documented string-replace
    semantics (adjacent occurrences share their delimiting space) one
    round turns 'a a a a' into 'aa a a' — the leftover (a,a) pair
    ties with (aa,a) at freq 2 and wins the ascending tie-break."""
    docs = _docs(spark, ["aaaa aaaa b"])
    merges = train_bpe_merges(docs, num_merges=2)
    assert merges[0][1:3] == ("a", "a")
    assert merges[0][3] == 6  # 3 per word x 2 words
    assert merges[1] == (2, "a", "a", 2)


def test_bpe_train_tie_break_deterministic(spark):
    """Equal-frequency pairs break on (lhs, rhs) ascending."""
    docs = _docs(spark, ["ab cd"])
    merges = train_bpe_merges(docs, num_merges=1)
    assert merges[0][1:3] == ("a", "b")  # (a,b) < (c,d), both freq 1


def test_bpe_apply_matches_iterative_train_state(spark):
    """apply_bpe_merges (one codegen projection) reproduces the
    trainer's final symbol state: re-tokenizing with the trained merges
    and re-counting pairs gives no pair with frequency above the last
    accepted merge (monotone BPE invariant), and reconstruction is
    exact."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe_merges(docs, num_merges=6)
    freqs = [m[3] for m in merges]
    assert freqs == sorted(freqs, reverse=True)  # merge freqs monotone non-increasing
    out = apply_bpe_merges(docs, [(l, r) for _, l, r, _ in merges])
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("word_idx", "word")
    )
    rebuilt = out.groupBy("doc_id", "word_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tok_idx", "token"))),
                lambda s: s.token,
            ),
            "",
        ).alias("re")
    )
    bad = words.join(rebuilt, ["doc_id", "word_idx"]).filter(F.col("re") != F.col("word"))
    assert bad.count() == 0


def test_subword_counts_match_tokenize(spark):
    """subword_token_counts(doc) == number of tokenize_greedy rows for
    that doc — the cheap metering path agrees with the full one."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    from pyogrio_spark.queries import TOKENIZER_VOCAB

    cnt = {r.doc_id: r.n_subword_tokens for r in subword_token_counts(docs, TOKENIZER_VOCAB).collect()}
    full = {
        r.doc_id: r.n
        for r in tokenize_greedy(docs, TOKENIZER_VOCAB)
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert cnt == full


def test_apply_bpe_plan_is_single_projection_no_python(spark):
    """The merge chain compiles to codegen string replaces: no
    BatchEvalPython / ArrowEvalPython stages anywhere in the plan, and
    the distinct-word side is the only aggregation."""
    docs = _docs(spark, ["ab ab cd"])
    out = apply_bpe_merges(docs, [("a", "b")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "replace" in out._jdf.queryExecution().analyzed().toString()


def _jobs_for(spark, group, fn):
    """Run fn under a job group, return how many Spark jobs it launched."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_greedy_pathological_long_word(spark):
    """A 5000-char 'word' (URL/DNA-style pathology) segments correctly
    in the single mapInPandas pass: 1666 'xxx' + trailing 'xx'."""
    word = "x" * 5000
    out = tokenize_greedy(_docs(spark, [word]), ["x", "xx", "xxx"])
    rows = sorted((r.tok_pos, r.token) for r in out.collect())
    assert len(rows) == 1667
    assert rows[0] == (1, "xxx") and rows[-1] == (4999, "xx")
    assert all(t == "xxx" for _, t in rows[:-1])
    assert "".join(t for _, t in rows) == word


def test_greedy_job_count_independent_of_word_length(spark):
    """The segmentation is ONE mapInPandas stage over distinct words:
    the number of Spark jobs must not grow with the longest word (the
    per-token-position join-loop formulation launched one-plus jobs per
    position, i.e. thousands for a pathological word)."""
    vocab = list("abcdefgh")
    short = _docs(spark, ["abc def", "gh ab"])
    longw = _docs(spark, ["abc def", "a" * 2000])
    n_short = _jobs_for(
        spark, "tok-short", lambda: tokenize_greedy(short, vocab).count()
    )
    n_long = _jobs_for(
        spark, "tok-long", lambda: tokenize_greedy(longw, vocab).count()
    )
    assert n_short == n_long, (n_short, n_long)


def test_bpe_train_checkpoint_invariant(spark, monkeypatch):
    """Lineage truncation must not change training: merges with
    checkpoint_every=3 match an uncheckpointed train, and
    localCheckpoint actually fires on the expected rounds."""
    # patch the concrete class the session instantiates (Spark 4 splits
    # the abstract pyspark.sql.DataFrame from classic/connect impls)
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    docs = _docs(spark, ["low lower lowest", "new newer newest", "wide wider"])
    baseline = train_bpe_merges(docs, num_merges=10, checkpoint_every=0)

    calls = {"n": 0}
    orig = _DF.localCheckpoint

    def counting(self, eager=True):
        calls["n"] += 1
        return orig(self, eager=eager)

    monkeypatch.setattr(_DF, "localCheckpoint", counting)
    chk = train_bpe_merges(docs, num_merges=10, checkpoint_every=3)
    assert chk == baseline
    # rounds 3, 6, 9 truncate
    assert calls["n"] == 3


def test_greedy_corpus_side_joins_via_broadcast(spark):
    """Scaling property of the Zipf head/tail routing: the head branch
    (which under Zipf carries ~all occurrences) joins the corpus word
    stream with a BROADCAST join — the corpus never shuffles for it.
    The only hash-partition exchanges in the plan are dimension-sized
    (word counts / segment table / the rare-word tail remainder)."""
    docs = _docs(spark, ["ab ba ab cc", "ba cc ab"])
    out = tokenize_greedy(docs, ["a", "b", "c", "ab"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # routing equivalence: forcing head_words=1 routes almost everything
    # through the tail shuffle join but must not change results
    tiny = tokenize_greedy(docs, ["a", "b", "c", "ab"], head_words=1)
    full = {(r.doc_id, r.word_idx, r.tok_pos, r.token) for r in out.collect()}
    assert {(r.doc_id, r.word_idx, r.tok_pos, r.token) for r in tiny.collect()} == full
