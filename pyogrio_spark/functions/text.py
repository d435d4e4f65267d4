"""Text-analysis column functions for document pipelines.

All JVM-side built-ins (split / array set algebra / regexp) — no Python
in the per-row path, per the input_hint's "no per-row Python" mandate.
Heuristics are deterministic so oracle SQL can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic; deliberately small + deterministic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "den"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "人", "这", "中"],
}


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token_count")


def word_piece_count(text_col: str = "text") -> Column:
    """BPE-ish subword estimate: word tokens + punctuation marks counted
    separately (regex classes), the standard pre-tokenizer shape."""
    return (
        F.regexp_count(F.col(text_col), F.lit(r"\w+")) + F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]"))
    ).alias("word_piece_count")


def lang_id(text_col: str = "text") -> Column:
    """Stopword-profile language ID: argmax over per-language stopword
    hit counts in the first 200 tokens; 'und' (undetermined) when no
    profile matches."""
    toks = F.slice(F.split(F.lower(F.col(text_col)), r"\s+"), 1, 200)
    scores = [
        F.struct(
            F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words]))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in LANG_PROFILES.items()
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred")


def quality_score(text_col: str = "text") -> Column:
    """Composite quality heuristic in [0, 1]: length band, alpha ratio,
    punctuation density, mean word length sanity, stopword presence —
    the usual cheap pre-filters of a training-data pipeline."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = F.split(F.trim(text), r"\s+")
    n_tok = F.size(toks)
    alpha_ratio = F.regexp_count(text, F.lit(r"[A-Za-z]")) / F.greatest(n_chars, F.lit(1))
    punct_ratio = F.regexp_count(text, F.lit(r"[^\w\s]")) / F.greatest(n_chars, F.lit(1))
    mean_wlen = n_chars / F.greatest(n_tok, F.lit(1))
    en_stop = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(F.transform(toks, F.lower)), en_stop))
    len_band = F.when((n_tok >= 10) & (n_tok <= 10000), F.lit(1.0)).otherwise(F.lit(0.3))
    wlen_band = F.when((mean_wlen >= 2.5) & (mean_wlen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.4))
    stop_band = F.when(stop_hits >= 2, F.lit(1.0)).otherwise(F.lit(0.5))
    score = (
        len_band * 0.3
        + wlen_band * 0.2
        + stop_band * 0.2
        + F.least(alpha_ratio * F.lit(1.25), F.lit(1.0)) * 0.2
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.1
    )
    return score.alias("quality_score")


def fingerprint(text_col: str = "text") -> Column:
    """Deterministic 64-bit content fingerprint of the normalized text
    (lower-cased, whitespace collapsed) — the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return F.xxhash64(norm).alias("fingerprint")


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        "*",
        token_count(text_col),
        word_piece_count(text_col),
        lang_id(text_col),
        quality_score(text_col),
        fingerprint(text_col),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` terms per document by (tf DESC, df ASC, token ASC)
    with the tf-idf score attached — the corpus-statistics op behind
    keyword extraction / quality filtering in training pipelines.

    Plan (r8): explode -> tf per (doc, token) -> df as a window count
    over the token partitioning -> per-doc window top-k. The window
    count replaces the old groupBy(token) + equi-join shape: both need
    the tf table exchanged by token, but the join additionally sorted
    and merged the tf stream against the aggregate (measured 3.1 s ->
    1.7 s at sf1.0, exact parity — guide §2.4: two operations keyed
    the same way share one exchange). Ranking is integer-only (tf, df,
    token), so the result is deterministic and engine-portable; the
    attached ``tfidf = tf * ln((N+1)/(df+1))`` is rounded to 6
    decimals for cross-engine comparison.
    """
    from pyspark.sql import Window

    n_docs = docs.count()  # one scalar aggregate, any scale
    toks = docs.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    wdf = Window.partitionBy("token")
    scored = tf.withColumn("df", F.count("*").over(wdf)).withColumn(
        "tfidf",
        F.round(F.col("tf") * F.log((F.lit(n_docs) + 1) / (F.col("df") + 1)), 6),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "token", "tf", "df", "tfidf", "rnk")
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity-style quality scoring (the CCNet-shape filter): train
    an add-one-smoothed bigram model ON the corpus itself, then score
    each document by its mean bigram log-probability
    ``avg ln((c(w1,w2) + 1) / (c(w1) + V))``. Low scores = improbable
    token sequences (gibberish, boilerplate soup) — the standard
    pretraining quality cut when no external LM is available.

    Plan (reworked r8): the bigram stream comes straight from the token
    array — zip the array with itself shifted by one (two slices +
    arrays_zip + one explode), a pure zero-shuffle map, where the old
    posexplode + window-``lead`` shape paid an Exchange + Sort of the
    whole token stream before the first bigram existed (guide §2.4).
    Then two count aggregations (the model), one broadcast-eligible
    join of the doc bigram stream against the model (kept a hash join —
    a web-scale bigram table exceeds broadcast), one final per-doc
    aggregate. V (vocabulary size), the only driver scalar, is the
    distinct-token count of the >=2-token docs — the same set as
    distinct(w1 UNION ALL w2) at half the explode volume.

    -> (id_col, n_bigrams, lm_score) with lm_score rounded to 6
    decimals for cross-engine comparison. Single-token docs have no
    bigrams and are absent (score undefined), matching the SQL oracle.
    """
    toks = docs.select(id_col, F.split(F.col(text_col), " ").alias("_t")).withColumn(
        "_n", F.size("_t")
    )
    multi = toks.filter(F.col("_n") >= 2)
    zipped = F.arrays_zip(
        F.slice(F.col("_t"), 1, F.col("_n") - 1).alias("_w1"),
        F.slice(F.col("_t"), 2, F.col("_n") - 1).alias("_w2"),
    )
    big = multi.select(id_col, F.explode(zipped).alias("_z")).select(
        id_col, F.col("_z._w1").alias("_w1"), F.col("_z._w2").alias("_w2")
    )
    c2 = big.groupBy("_w1", "_w2").agg(F.count("*").alias("_c2"))
    c1 = big.groupBy("_w1").agg(F.count("*").alias("_c1"))
    vocab = multi.select(F.explode("_t").alias("_w")).distinct().count()
    # join the MODEL sides first (both vocabulary-sized aggregates), so
    # the doc bigram stream passes through exactly one join instead of
    # chaining through two Exchange+Sort rounds (guide §2.3/§3); the
    # shuffle-hash hint skips sorting the stream side (the model side
    # is the per-partition build). Per-occurrence _lp values — and thus
    # the rounded per-doc averages — are unchanged (measured 6.0 s ->
    # 3.0 s at sf1.0, bit-equal scores).
    lp_tab = c2.join(c1, "_w1").withColumn(
        "_lp", F.log((F.col("_c2") + 1) / (F.col("_c1") + F.lit(vocab)))
    )
    scored = big.join(lp_tab.hint("shuffle_hash"), ["_w1", "_w2"])
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("_lp"), 6).alias("lm_score"),
    )


def repetition_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_n: int = 5,
    line_sep: str | None = None,
    line_words: int | None = None,
) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021, table
    A1), per document:

    * ``top{n}_frac`` for n in ``top_ns`` — word-mass of the most
      frequent word n-gram: ``max_count * n / n_words`` (Gopher uses
      the character fraction; with whitespace-delimited words the word
      mass is the same signal and stays integer-exact pre-division).
    * ``dup{dup_n}_frac`` — fraction of n-gram occurrences whose
      n-gram appears more than once in the document (Gopher's
      "duplicate n-gram" family; this counts occurrences rather than
      union-of-covered-characters, which keeps the statistic exact in
      ANSI SQL — documented divergence).
    * ``dup_line_frac`` / ``dup_line_char_frac`` — fraction of line
      occurrences (resp. their character mass) whose line appears more
      than once. Lines come from ``line_sep`` (e.g. ``"\\n"``) or,
      for unstructured single-line corpora, fixed ``line_words``-word
      segments. Omit both to skip the line metrics.

    All ratios round to 6 decimals (cross-engine float rule). Every
    stage is codegen.

    Plan shape (reworked r8, guide §2.4): the old form unioned one
    filtered branch per n — Catalyst pushes the filters below the union,
    so the Exchange+Sort+Window token subtree executed once per n (4x),
    the per-n stats came back through four broadcast joins, and the line
    metrics re-exploded the scan into a collect_list aggregate (26
    Exchanges at 4 Windows total). Now ONE lead window feeds ONE
    unified (doc, n, gram) stream — every n-gram, and (for the
    ``line_words`` mode) each line as the null-skipping concat_ws of
    ``line_words`` leads at line-start positions, tagged _n=0 — and
    because the stream stays clustered by the window's doc partitioning,
    the whole (doc,n,gram) -> (doc,n) -> (doc) aggregation chain runs
    exchange-free. ``n_words`` is recomputed per doc from the token
    array (zero shuffle) instead of a count over the exploded stream.
    Net: 1 Exchange + 1 Window + 1 broadcast join.

    Line-segmentation contract of the ``line_words`` mode: the lead
    stream carries only non-empty tokens, so its lines match the old
    block grouping exactly when the text has no repeated/leading
    separators (the corpus invariant — the SQL oracles assume it too:
    their ``i // line_words`` runs over the unfiltered split). With
    repeated separators the lead-based lines differ from block
    grouping; line fracs coalesce to 0.0 when no line-start position
    survives the empty filter.
    """
    import re as _re

    from pyspark.sql import Window

    toks = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias("i", "w")
    ).filter(F.length("w") > 0)

    ns = sorted(set(top_ns) | {dup_n})
    max_n = max(ns)
    line_mode = line_sep is None and line_words is not None
    lead_n = max(max_n - 1, (line_words - 1) if line_mode else 0)
    w = Window.partitionBy(id_col).orderBy("i")
    led = toks.select(
        id_col, "i", "w", *[F.lead("w", k).over(w).alias(f"_w{k}") for k in range(1, lead_n + 1)]
    )

    entries = []
    for n in ns:
        parts = [F.col("w")] + [F.col(f"_w{k}") for k in range(1, n)]
        entries.append(
            F.when(
                F.col(f"_w{n-1}").isNotNull(),
                F.struct(F.lit(n).alias("_n"), F.concat_ws(" ", *parts).alias("_g")),
            )
        )
    if line_mode:
        # a line of the line_words-segmentation starts at every position
        # i % line_words == 0; concat_ws skips the NULL leads past the
        # document end, producing the (possibly short) tail line exactly
        lparts = [F.col("w")] + [F.col(f"_w{k}") for k in range(1, line_words)]
        entries.append(
            F.when(
                F.col("i") % line_words == 0,
                F.struct(F.lit(0).alias("_n"), F.concat_ws(" ", *lparts).alias("_g")),
            )
        )
    gram_rows = (
        led.select(id_col, F.explode(F.array(*entries)).alias("_e"))
        .filter(F.col("_e").isNotNull())
        .select(id_col, F.col("_e._n").alias("_n"), F.col("_e._g").alias("_g"))
    )

    per = (
        gram_rows.groupBy(id_col, "_n", "_g")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col, "_n")
        .agg(
            F.max("_c").alias("_mx"),
            F.sum("_c").alias("_tot"),
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0))).alias("_dup"),
            # character-mass sums feed only the _n=0 line metrics; skip
            # them entirely when no line mode is active
            *(
                [
                    F.sum(F.col("_c") * F.length("_g")).alias("_cl"),
                    F.sum(
                        F.when(F.col("_c") > 1, F.col("_c") * F.length("_g")).otherwise(F.lit(0))
                    ).alias("_dupl"),
                ]
                if line_mode
                else []
            ),
        )
    )
    stats = per.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("_n") == n, F.col("_mx"))).alias(f"_mx{n}")
            for n in top_ns
        ],
        F.max(F.when(F.col("_n") == dup_n, F.col("_dup"))).alias("_dupn"),
        F.max(F.when(F.col("_n") == dup_n, F.col("_tot"))).alias("_totn"),
        *(
            [
                F.max(F.when(F.col("_n") == 0, F.col("_dup"))).alias("_ldup"),
                F.max(F.when(F.col("_n") == 0, F.col("_tot"))).alias("_ltot"),
                F.max(F.when(F.col("_n") == 0, F.col("_dupl"))).alias("_ldupl"),
                F.max(F.when(F.col("_n") == 0, F.col("_cl"))).alias("_lcl"),
            ]
            if line_mode
            else []
        ),
    )

    nw = docs.select(
        id_col,
        F.size(
            F.filter(F.split(F.col(text_col), _re.escape(sep)), lambda t: F.length(t) > 0)
        ).cast("bigint").alias("_nw"),
    ).filter(F.col("_nw") > 0)

    out = nw.join(stats, id_col, "left").select(
        id_col,
        F.col("_nw"),
        *[
            F.coalesce(
                F.round(F.col(f"_mx{n}") * F.lit(n) / F.col("_nw").cast("double"), 6),
                F.lit(0.0),
            ).alias(f"top{n}_frac")
            for n in top_ns
        ],
        F.coalesce(
            F.round(F.col("_dupn") / F.col("_totn").cast("double"), 6), F.lit(0.0)
        ).alias(f"dup{dup_n}_frac"),
        *(
            [
                F.coalesce(
                    F.round(F.col("_ldup") / F.col("_ltot").cast("double"), 6), F.lit(0.0)
                ).alias("dup_line_frac"),
                F.coalesce(
                    F.round(F.col("_ldupl") / F.col("_lcl").cast("double"), 6), F.lit(0.0)
                ).alias("dup_line_char_frac"),
            ]
            if line_mode
            else []
        ),
    )

    if line_sep is not None:
        # explicit line separator: lines are not derivable from the token
        # lead stream; keep the separate explode + per-line aggregate
        lines = docs.select(
            id_col, F.explode(F.split(F.col(text_col), _re.escape(line_sep))).alias("_line")
        ).filter(F.length(F.trim("_line")) > 0)
        lstats = (
            lines.groupBy(id_col, "_line")
            .agg(F.count("*").alias("_c"), F.length("_line").alias("_len"))
            .groupBy(id_col)
            .agg(
                F.round(
                    F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0)))
                    / F.sum("_c").cast("double"),
                    6,
                ).alias("dup_line_frac"),
                F.round(
                    F.sum(F.when(F.col("_c") > 1, F.col("_c") * F.col("_len")).otherwise(F.lit(0)))
                    / F.sum(F.col("_c") * F.col("_len")).cast("double"),
                    6,
                ).alias("dup_line_char_frac"),
            )
        )
        out = out.join(lstats, id_col, "left")
    return out.withColumnRenamed("_nw", "n_words")


def linear_quality_weights(n_buckets: int = 512, seed: int = 2654435761) -> list[int]:
    """Deterministic integer milli-weights for the hashed-linear quality
    model: weight[i] in [-500, 500) milli-units, a pure function of the
    bucket index so both engines (and any retraining harness) can
    reproduce the vector without shipping a model file."""
    return [((i * seed) % 1000) - 500 for i in range(n_buckets)]


def linear_quality_score(
    docs: DataFrame,
    weights: list[int] | None = None,
    bias_milli: int = 0,
    text_col: str = "text",
    salt: str = "qw",
    threshold_milli_per_word: int = 0,
) -> DataFrame:
    """fastText-style hashed bag-of-words linear quality classifier —
    the DCLM / FineWeb-edu quality-filter shape: hash each word into a
    fixed bucket space, sum the bucket weights, gate on the per-word
    mean. No reference analogue (pyogrio has no text surface); the
    model family is the published fastText linear classifier with
    feature hashing.

    Scale design: the weight vector rides along as ONE parsed array
    literal (the decontaminate_bloom trick — codebook-sized, parsed
    once, broadcast with the plan), the word loop is a single
    ``F.aggregate`` higher-order function over ``split()`` — pure
    whole-stage codegen, zero shuffle, zero explode, no Python. Scores
    are exact integer milli-units (bigint), so the oracle is
    float-free and hash-exact regardless of aggregation order.

    Returns (original columns) + ``n_words``, ``score_milli``,
    ``keep`` (score_milli >= threshold_milli_per_word * n_words).
    """
    w = weights if weights is not None else linear_quality_weights()
    n = len(w)
    warr = F.expr("array(" + ",".join(f"{v}L" for v in w) + ")")
    words = F.filter(F.split(F.col(text_col), " "), lambda t: F.length(t) > 0)
    bucket = lambda t: (  # noqa: E731 — md5-bucket recipe of sampling.hash_bucket
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), t)), 1, 15), 16, 10).cast("bigint") % n
    )
    score = F.aggregate(
        words,
        F.lit(int(bias_milli)).cast("bigint"),
        lambda acc, t: acc + F.element_at(warr, (bucket(t) + 1).cast("int")),
    )
    out = docs.withColumn("n_words", F.size(words)).withColumn("score_milli", score)
    return out.withColumn(
        "keep",
        F.col("score_milli") >= F.lit(int(threshold_milli_per_word)) * F.col("n_words"),
    )
