import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyogrio_spark.functions.text import with_text_features
from pyogrio_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_column,
    simhash_near_pairs,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = [
        ("d0", "the quick brown fox jumps over the lazy dog", "en"),
        ("d1", "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of d0
        ("d2", "the quick brown fox jumps over the lazy cat", "en"),  # near dup of d0
        ("d3", "completely different content about spark engines", "en"),
        ("d4", "el rapido zorro marron salta sobre el perro perezoso", "es"),
        ("d5", "the quick brown fox jumps over the lazy dog today", "en"),  # near dup
        ("d6", "unrelated text mentioning tables rows and columns", "en"),
    ]
    return spark.createDataFrame(pd.DataFrame(base, columns=["doc_id", "text", "lang"]))


def test_exact_dedup(spark, corpus):
    out = exact_dedup(corpus).toPandas()
    assert len(out) == 6  # d0/d1 collapse
    dup = out[out.dup_count == 2]
    assert len(dup) == 1 and dup.iloc[0].doc_id == "d0"  # keeps min doc_id


def test_minhash_signature_is_deterministic_and_md5_based(spark, corpus):
    sig = minhash_signature(corpus, n_hashes=8).select("doc_id", "sig").toPandas()
    row = sig[sig.doc_id == "d0"].iloc[0]
    # reproduce by hand: one md5 per shingle, h_i = a + i*b over its hex
    text = "the quick brown fox jumps over the lazy dog"
    toks = text.split(" ")
    shingles = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]

    def h(s, i):
        m = hashlib.md5(s.encode()).hexdigest()
        return int(m[:15], 16) + i * int(m[16:30], 16)

    for i in (0, 3, 7):
        assert row.sig[i] == min(h(s, i) for s in shingles)
    # identical docs -> identical signatures
    assert list(sig[sig.doc_id == "d1"].iloc[0].sig) == list(row.sig)


def test_minhash_lsh_finds_near_dups(spark, corpus):
    pairs = minhash_lsh_pairs(corpus, n_hashes=16, bands=4, threshold=0.4).toPandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].itertuples(index=False, name=None)))
    assert ("d0", "d1") in got  # exact dup always caught
    assert any(p in got for p in [("d0", "d2"), ("d0", "d5"), ("d1", "d2"), ("d1", "d5")])
    assert ("d3", "d6") not in got


def test_simhash_hamming(spark, corpus):
    sh = simhash_column(corpus).toPandas().set_index("doc_id")["simhash"]
    assert sh["d0"] == sh["d1"]  # identical text -> identical simhash
    ham = bin(int(sh["d0"]) ^ int(sh["d2"]) & 0xFFFFFFFFFFFFFFFF).count("1")
    pairs = simhash_near_pairs(corpus, max_hamming=16).toPandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].itertuples(index=False, name=None)))
    assert ("d0", "d1") in got


def test_ngram_jaccard(spark, corpus):
    pairs = ngram_jaccard_pairs(corpus, threshold=0.5).toPandas()
    got = {(a, b): j for a, b, j in pairs.itertuples(index=False, name=None)}
    assert got[("d0", "d1")] == 1.0
    # brute-force check of one near-dup pair
    def shingle_set(t):
        tk = t.split(" ")
        return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}

    s0, s2 = shingle_set("the quick brown fox jumps over the lazy dog"), shingle_set(
        "the quick brown fox jumps over the lazy cat"
    )
    want = len(s0 & s2) / len(s0 | s2)
    if ("d0", "d2") in got:
        assert abs(got[("d0", "d2")] - want) < 1e-9
    else:
        assert want < 0.5


def test_text_features(spark, corpus):
    feats = with_text_features(corpus).toPandas().set_index("doc_id")
    assert feats.loc["d0", "token_count"] == 9
    assert feats.loc["d0", "lang_pred"] == "en"
    assert feats.loc["d4", "lang_pred"] == "es"
    assert 0.0 <= feats["quality_score"].min() and feats["quality_score"].max() <= 1.0
    assert feats.loc["d0", "fingerprint"] == feats.loc["d1", "fingerprint"]
    assert feats.loc["d0", "fingerprint"] != feats.loc["d2", "fingerprint"]
    # word_piece_count counts words + punctuation
    assert feats.loc["d0", "word_piece_count"] == 9


def test_ngram_candidates_are_lsh_not_blocked_cross_join(spark):
    # scale shape: candidate volume follows LSH bucket collisions, not
    # |docs per lang|^2. 120 same-language docs with distinct content ->
    # the old per-lang blocking produced ~120*119/2 = 7140 candidates;
    # LSH buckets keep it near zero (only the planted near-dup collides).
    rows = [(f"u{i:03d}", f"totally unique document number {i} speaks about topic {i * 37} and {i * 101}", "en")
            for i in range(120)]
    rows.append(("dup0", rows[0][1] + " extra", "en"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
    cands = minhash_lsh_pairs(df, n_hashes=16, bands=4, threshold=0.0, max_bucket=64).select("doc_a", "doc_b")
    n_cand = cands.count()
    assert n_cand < 120, f"candidate count {n_cand} should be ~|near dups|, not ~n^2=7140"
    out = ngram_jaccard_pairs(df, threshold=0.5).toPandas()
    assert set(map(tuple, out[["doc_a", "doc_b"]].itertuples(index=False, name=None))) == {("dup0", "u000")} or \
           set(map(tuple, out[["doc_a", "doc_b"]].itertuples(index=False, name=None))) == {("u000", "dup0")}


def test_ngram_external_candidates(spark, corpus):
    # verifying an explicit candidate list computes exact jaccard only there
    cand = spark.createDataFrame(pd.DataFrame({"doc_a": ["d0"], "doc_b": ["d2"]}))
    out = ngram_jaccard_pairs(corpus, threshold=0.0, candidates=cand).toPandas()
    assert len(out) == 1 and 0 < out.jaccard[0] < 1


def test_winnow_guarantee_shared_substring(spark):
    # winnowing guarantee: any shared substring of length >= window+k-1
    # (16+8-1 = 23 chars) produces at least one shared fingerprint
    from pyogrio_spark.operators.dedup import fingerprint_overlap_pairs, winnow_fingerprints

    common = "the exact same twenty-three-plus character passage appears here"
    rows = [
        ("a", "prefix text one " + common + " suffix alpha"),
        ("b", "совершенно other start " + common + " different end material"),
        ("c", "no overlap with anything else at all in this document body"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    fps = winnow_fingerprints(df, k=8, window=16).toPandas()
    fa = set(fps[fps.doc_id == "a"].fp)
    fb = set(fps[fps.doc_id == "b"].fp)
    fc = set(fps[fps.doc_id == "c"].fp)
    assert fa & fb, "shared >=23-char substring must share a fingerprint"
    assert not (fa & fc) and not (fb & fc)
    pairs = fingerprint_overlap_pairs(df, k=8, window=16, min_shared=1).toPandas()
    assert set(map(tuple, pairs[["doc_a", "doc_b"]].itertuples(index=False, name=None))) == {("a", "b")}
    # density: winnowing stores ~2/window of the k-gram hashes
    n_grams = len(rows[0][1]) - 7
    assert len(fps[fps.doc_id == "a"]) < n_grams / 2


def test_connected_components_and_canonical(spark):
    from pyogrio_spark.operators.dedup import connected_components, dedup_keep_canonical

    # two chains + a singleton pair: {1-2-3-4}, {10-11}, and 20 alone
    edges = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2, 3, 10], "doc_b": [2, 3, 4, 11]}),
        schema="doc_a long, doc_b long",
    )
    comps = {r.node: r.comp for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 10, 11, 20], "text": ["x"] * 7}),
        schema="doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in dedup_keep_canonical(docs, edges).collect())
    assert kept == [1, 10, 20]  # one per cluster + the untouched singleton


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 120-node path has diameter 119: plain hash-min needs 119 rounds,
    pointer-jumping converges in O(log) — must be exact within 15."""
    from pyogrio_spark.operators.dedup import connected_components

    n = 120
    edges = spark.createDataFrame(
        pd.DataFrame({"doc_a": range(n - 1), "doc_b": range(1, n)}),
        schema="doc_a long, doc_b long",
    )
    comps = {r.node: r.comp for r in connected_components(edges, max_iters=15).collect()}
    assert comps == {i: 0 for i in range(n)}


def test_connected_components_warns_when_unconverged(spark):
    import warnings

    from pyogrio_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        pd.DataFrame({"doc_a": range(59), "doc_b": range(1, 60)}),
        schema="doc_a long, doc_b long",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(edges, max_iters=1).collect()
    assert any("did not converge" in str(x.message) for x in w)


def test_winnow_token_unit(spark):
    from pyogrio_spark.operators.dedup import winnow_fingerprints

    common = " ".join(f"w{i}" for i in range(30))  # 30 shared tokens >= window+k-1 = 23
    rows = [
        ("a", "alpha start tokens " + common + " tail a"),
        ("b", "totally different opening here " + common + " end b"),
        ("c", "nothing shared in this one at all believe me truly"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    fps = winnow_fingerprints(df, k=8, window=16, unit="token").toPandas()
    fa, fb, fc = (set(fps[fps.doc_id == d].fp) for d in ("a", "b", "c"))
    assert fa & fb and not (fa & fc) and not (fb & fc)
    # token grams produce far fewer rows than char grams on the same text
    fps_char = winnow_fingerprints(df, k=8, window=16, unit="char").toPandas()
    assert len(fps) < len(fps_char)


def test_tfidf_top_terms_ranking(spark):
    """Tie-safe integer ranking: tf desc, then rarer token (df asc),
    then token asc; score = tf * ln((N+1)/(df+1)) rounded."""
    import math

    from pyogrio_spark.functions.text import tfidf_top_terms

    rows = [
        (0, "a a a b b c shared"),
        (1, "b b b a c c shared"),
        (2, "x x y shared"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id bigint, text string")
    out = tfidf_top_terms(df, k=3).toPandas().sort_values(["doc_id", "rnk"])
    d0 = out[out.doc_id == 0]
    assert list(d0.token) == ["a", "b", "c"]  # tf 3,2,1; c beats shared on df
    d2 = out[out.doc_id == 2]
    assert list(d2.token) == ["x", "y", "shared"]  # y (df=1) before shared (df=3)
    row = d0[d0.token == "a"].iloc[0]
    assert row.tf == 3 and row.df == 2
    assert abs(row.tfidf - round(3 * math.log(4 / 3), 6)) < 1e-9
    assert (out.groupby("doc_id").size() == 3).all()


def test_bigram_lm_scores_hand_computed(spark):
    """Add-one-smoothed bigram LM on a 2-doc corpus, hand-checked;
    single-token docs have no bigrams and are absent."""
    import math

    from pyogrio_spark.functions.text import bigram_lm_scores

    rows = [(0, "a b a b"), (1, "a b c"), (2, "solo")]
    df = spark.createDataFrame(rows, schema="doc_id bigint, text string")
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert set(out) == {0, 1}
    # model: c(a,b)=3 c(b,a)=1 c(b,c)=1; c(a)=3 c(b)=2; V=3
    lp_ab = math.log(4 / 6)
    lp_ba = math.log(2 / 5)
    lp_bc = math.log(2 / 5)
    assert out[0]["n_bigrams"] == 3
    assert abs(out[0]["lm_score"] - round((2 * lp_ab + lp_ba) / 3, 6)) < 1e-9
    assert out[1]["n_bigrams"] == 2
    assert abs(out[1]["lm_score"] - round((lp_ab + lp_bc) / 2, 6)) < 1e-9


def test_line_dedup_global_semantics(spark):
    """Corpus-global first-occurrence-wins on 4-word lines: the later
    twin doc empties out, a partial overlap keeps only its novel line,
    order within survivors is preserved, and no line text survives
    twice anywhere."""
    import pandas as pd

    from pyogrio_spark.operators.dedup import line_dedup_global

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c d e f g h",          # lines: "a b c d", "e f g h"
                "a b c d e f g h",          # exact twin -> fully removed
                "x y z w e f g h",          # keeps only "x y z w"
            ],
        }
    )
    out = (
        line_dedup_global(spark.createDataFrame(pdf), line_words=4)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "text"] == "a b c d e f g h"
    assert out.loc[1, "n_lines"] == 2 and out.loc[1, "n_kept"] == 2
    assert out.loc[2, "text"] == "" and out.loc[2, "n_kept"] == 0
    assert out.loc[2, "n_lines"] == 2  # the row survives for length filters
    assert out.loc[3, "text"] == "x y z w"
    # global invariant: every 4-word line appears at most once anywhere
    lines = [ln for t in out.text for ln in [t[i:] for i in [0]] if t]
    all_lines = []
    for t in out.text:
        toks = t.split(" ") if t else []
        all_lines += [" ".join(toks[i : i + 4]) for i in range(0, len(toks), 4)]
    assert len(all_lines) == len(set(all_lines))


def test_line_dedup_global_short_tail_and_plan(spark):
    """A short tail line dedups like any other; the plan keeps Python
    out entirely (built-ins only) and resolves the keeper with hash
    aggregates, not a corpus sort."""
    import pandas as pd

    from pyogrio_spark.operators.dedup import line_dedup_global

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b c d e", "p q r s e"]}
    )
    df = spark.createDataFrame(pdf)
    out = line_dedup_global(df, line_words=4)
    got = out.toPandas().set_index("doc_id")
    assert got.loc[1, "text"] == "a b c d e"
    assert got.loc[2, "text"] == "p q r s"  # tail "e" deduped against doc 1's
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_span_dedup_global_token_granularity(spark):
    """Sliding-window substring dedup cuts duplicated REGIONS at token
    granularity: a doc that re-embeds another doc's 6-token run loses
    exactly the covered tokens while keeping its novel prefix/suffix;
    the first occurrence (lowest doc_id, pos) keeps its text."""
    import pandas as pd

    from pyogrio_spark.operators.dedup import span_dedup_global

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c d e f",            # the original 6-token run
                "x y a b c d e f z w",    # re-embeds it mid-document
                "p q r s",                # shorter than the window: untouched
            ],
        }
    )
    out = (
        span_dedup_global(spark.createDataFrame(pdf), window_tokens=6)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "text"] == "a b c d e f"
    assert out.loc[1, "n_tokens"] == 6 and out.loc[1, "n_kept"] == 6
    # only the 6 duplicated tokens go; "x y" and "z w" survive in order
    assert out.loc[2, "text"] == "x y z w"
    assert out.loc[2, "n_tokens"] == 10 and out.loc[2, "n_kept"] == 4
    assert out.loc[3, "text"] == "p q r s"  # no 6-gram fits: never cut


def test_span_dedup_global_overlap_union_and_plan(spark):
    """Overlapping duplicated windows remove the UNION of their covered
    offsets (doc 2 duplicates two overlapping 4-gram occurrences of
    doc 1's text — every covered token goes once, not twice); an exact
    twin empties out but keeps its row; the plan is pure built-ins with
    hash aggregates, no corpus sort, no cartesian product."""
    import pandas as pd

    from pyogrio_spark.operators.dedup import span_dedup_global

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c d e",      # grams: "a b c d", "b c d e"
                "a b c d e",      # exact twin: both grams duplicate -> empty
                "q a b c d e r",  # duplicated interior region a..e
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = span_dedup_global(df, window_tokens=4)
    got = out.toPandas().set_index("doc_id").sort_index()
    assert got.loc[1, "text"] == "a b c d e"
    assert got.loc[2, "text"] == "" and got.loc[2, "n_kept"] == 0
    assert got.loc[2, "n_tokens"] == 5  # row survives for length filters
    assert got.loc[3, "text"] == "q r" and got.loc[3, "n_kept"] == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
