"""Corpus scrubbing: text normalization, PII redaction, URL/domain
hygiene, and Bloom-filter decontamination.

The standard pretraining-pipeline cleaning stages (C4/Dolma/FineWeb
shape) the reference has no counterpart for (pyogrio is I/O-only);
they extend the engine's LLM-data layer. Everything here is JVM
codegen — ``regexp_replace`` / ``regexp_count`` / ``translate`` /
bit arithmetic built-ins, no Python in the per-row path — and every
regex is written in the RE2 ∩ java.util.regex portable subset
(character classes, bounded repeats, ``\\b``, non-capturing groups;
no backreferences or lookaround) so DuckDB oracle SQL reproduces the
behaviour byte-for-byte.

Scale notes:
- Redaction/normalization are pure map stages — zero shuffle, they
  ride whatever partitioning the scan produced.
- The domain blocklist join broadcasts the blocklist (tiny dim); the
  doc-level anti-join shuffles on doc_id only.
- Bloom decontamination broadcasts the *bitset* (m bits packed into
  m/64 longs inside a single parsed array literal), not the benchmark
  set: membership is ``(word >> bit) & 1`` codegen per hash — at
  100 TB the corpus side never shuffles and the benchmark side is a
  one-time aggregate. This is the architecture CCNet/Dolma use for
  benchmark decontamination at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------- regexes
# Portable subset: identical semantics under java.util.regex (Spark) and
# RE2 (DuckDB). [0-9] over \d, explicit classes, non-capturing groups.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
URL_RE = r"https?://[A-Za-z0-9._/-]+"
# C0 controls except \t \n, plus DEL. (\t and \n are collapsed by the
# whitespace pass instead so line structure survives until then.)
CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"

# typographic folds: curly quotes -> ASCII, en/em dash -> hyphen,
# ellipsis -> period, NBSP -> space. translate() is codepoint-wise in
# both engines.
_FOLD_FROM = "‘’“”–—… "
_FOLD_TO = "''\"\"--. "

REDACT_TOKENS = {"email": "<EMAIL>", "phone": "<PHONE>", "ip": "<IP>"}


def strip_controls(col: Column) -> Column:
    """Remove C0 control characters (keeping \\t and \\n for the
    whitespace pass) and DEL."""
    return F.regexp_replace(col, CONTROL_RE, "")


def fold_typography(col: Column) -> Column:
    """Fold curly quotes / dashes / ellipsis / NBSP to ASCII."""
    return F.translate(col, _FOLD_FROM, _FOLD_TO)


def normalize_text(col: Column, lowercase: bool = False) -> Column:
    """Canonical text normalization: control-strip, typographic fold,
    whitespace-run collapse, trim, optional lowercase. Idempotent."""
    out = F.trim(F.regexp_replace(fold_typography(strip_controls(col)), r"\s+", " "))
    return F.lower(out) if lowercase else out


def normalize_sql(expr: str, lowercase: bool = False) -> str:
    """The DuckDB-SQL mirror of ``normalize_text`` over ``expr``.
    Kept next to the Column version so the two cannot drift."""
    to_quoted = _FOLD_TO.replace("'", "''")  # SQL-literal quote escaping
    out = (
        f"trim(regexp_replace(translate(regexp_replace({expr}, '{CONTROL_RE}', '', 'g'),"
        f" '{_FOLD_FROM}', '{to_quoted}'), '\\s+', ' ', 'g'))"
    )
    return f"lower({out})" if lowercase else out


# ---------------------------------------------------------- PII redaction

def pii_counts(col: Column) -> dict[str, Column]:
    """Pre-redaction match counts per PII class (for audit columns)."""
    return {
        "n_emails": F.regexp_count(col, F.lit(EMAIL_RE)),
        "n_phones": F.regexp_count(col, F.lit(PHONE_RE)),
        "n_ips": F.regexp_count(col, F.lit(IPV4_RE)),
    }


def redact_pii(col: Column) -> Column:
    """Replace emails, then phones, then IPv4 addresses with typed
    placeholder tokens. Order matters and is fixed: email first (an
    address may embed digits), phone before IP is irrelevant for the
    disjoint patterns but pinned for determinism."""
    out = F.regexp_replace(col, EMAIL_RE, REDACT_TOKENS["email"])
    out = F.regexp_replace(out, PHONE_RE, REDACT_TOKENS["phone"])
    out = F.regexp_replace(out, IPV4_RE, REDACT_TOKENS["ip"])
    return out


def redact_sql(expr: str) -> str:
    """DuckDB mirror of ``redact_pii`` (global-flag regexp_replace,
    same fixed order)."""
    out = f"regexp_replace({expr}, '{EMAIL_RE}', '{REDACT_TOKENS['email']}', 'g')"
    out = f"regexp_replace({out}, '{PHONE_RE}', '{REDACT_TOKENS['phone']}', 'g')"
    out = f"regexp_replace({out}, '{IPV4_RE}', '{REDACT_TOKENS['ip']}', 'g')"
    return out


def with_pii_redacted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> documents with ``text`` redacted plus per-class
    audit counts. Pure map stage, zero shuffle."""
    col = F.col(text_col)
    counts = pii_counts(col)
    return df.select(
        *[c for c in df.columns if c != text_col],
        redact_pii(col).alias(text_col),
        *[v.alias(k) for k, v in counts.items()],
    )


# ----------------------------------------------------------- URL / domain

def extract_urls(col: Column) -> Column:
    """All http(s) URLs in the text, in order (array<string>)."""
    return F.regexp_extract_all(col, F.lit(URL_RE), 0)


def url_domain(col: Column) -> Column:
    """Host part of a URL ('' if malformed)."""
    return F.regexp_extract(col, r"^https?://([^/]+)", 1)


def doc_url_table(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Explode documents into (key, url, domain) rows — the shape both
    the blocklist filter and per-domain stats consume. One shuffle-free
    explode over the scan partitioning."""
    return df.select(key_col, F.explode(extract_urls(F.col(text_col))).alias("url")).withColumn(
        "domain", url_domain(F.col("url"))
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Drop every document that references ANY blocked domain.

    blocklist: DataFrame with a ``domain`` column. It is broadcast —
    domain blocklists (even the multi-million-entry public ones) are
    tiny next to the corpus; if a deployment's list outgrows the
    broadcast threshold Spark falls back to a hash join on the same
    plan. The doc-level anti-join shuffles only (key) pairs of docs
    that contain at least one URL."""
    urls = doc_url_table(df, text_col, key_col)
    bad_docs = (
        urls.join(F.broadcast(blocklist.select("domain")), "domain").select(key_col).distinct()
    )
    return df.join(bad_docs, key_col, "left_anti")


# ------------------------------------------- Bloom-filter decontamination

def bloom_positions(gram: Column, n_hashes: int, m_bits: int) -> list[Column]:
    """The k bit positions of ``gram`` — engine-portable md5-based
    hashes (same ('0x'||substr(md5,1,15))::BIGINT idiom as the winnow
    fingerprints, salted per hash index)."""
    return [
        F.conv(F.substring(F.md5(F.concat(gram, F.lit(f"#{j}"))), 1, 15), 16, 10).cast("bigint")
        % F.lit(m_bits)
        for j in range(n_hashes)
    ]


def build_bloom_words(
    grams: DataFrame, gram_col: str = "gram", n_hashes: int = 3, m_bits: int = 65536
) -> list[int]:
    """Aggregate the benchmark gram set into a packed bitset:
    m_bits/64 longs. The ONLY driver-side materialization is the
    (word_index, mask) aggregate — m/64 rows regardless of benchmark
    size, so a 10^9-gram benchmark still collects just the fixed-size
    bitset."""
    g = F.col(gram_col)
    pos = F.explode(F.array(*bloom_positions(g, n_hashes, m_bits))).alias("pos")
    words = (
        grams.select(pos)
        .select((F.col("pos") / 64).cast("int").alias("w"), (F.col("pos") % 64).cast("int").alias("b"))
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(cast(1 as bigint), b))").alias("mask"))
        .collect()
    )
    packed = [0] * (m_bits // 64)
    for row in words:
        packed[row["w"]] = row["mask"]
    return packed


def bloom_words_literal(packed: list[int]) -> Column:
    """The packed bitset as ONE parsed array literal (the IVF-codebook
    trick: a single spark.sql-parsed expression, not m/64 py4j lit
    calls)."""
    body = ",".join(f"{w}L" for w in packed)
    return F.expr(f"array({body})")


def _pow2() -> Column:
    # built lazily: F.expr needs an active SparkContext, so a module
    # constant would break plain imports (pytest collection, docs)
    return F.expr(
        "array(" + ",".join(str(1 << i) + "L" for i in range(63)) + ",-9223372036854775808L)"
    )


def bloom_contains(gram: Column, words: Column, n_hashes: int, m_bits: int) -> Column:
    """True iff every one of the gram's k bits is set — pure codegen
    (element_at + mask), no join, no Python. Bit tests go through a
    64-entry power-of-two literal because SQL shifts by a *column*
    amount aren't exposed in the Python wrapper; bit 63 is the sign
    mask, hence the != 0 test instead of == 1."""
    tests = []
    pow2 = _pow2()
    for pos in bloom_positions(gram, n_hashes, m_bits):
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        mask = F.element_at(pow2, (pos % 64).cast("int") + 1)
        tests.append(word.bitwiseAND(mask) != 0)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def char_grams(df: DataFrame, text_col: str = "text", key_col: str = "doc_id",
               width: int = 16, stride: int = 4) -> DataFrame:
    """Sliding character grams (fixed width, strided) as (key, gram)
    rows — the decontamination unit. Codegen sequence+transform, one
    explode; distinct per doc so repeated passages count once.

    The per-doc dedup is ``array_distinct`` BEFORE the explode: the
    distinctness is within one document (the key rides every row), so
    a corpus-wide ``.distinct()`` — a full shuffle of the gram stream,
    the old shape — buys nothing the row-local dedup doesn't (guide
    §2.4: remove shuffles outright). At 100 TB the gram stream never
    leaves its scan partition."""
    text = F.col(text_col)
    n = F.greatest(F.length(text) - F.lit(width - 1), F.lit(1))
    starts = F.filter(F.sequence(F.lit(1), n), lambda p: (p - 1) % stride == 0)
    grams = F.explode(
        F.array_distinct(F.transform(starts, lambda p: text.substr(p, F.lit(width))))
    ).alias("gram")
    return df.select(key_col, grams)


def decontaminate_bloom(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    width: int = 16,
    stride: int = 4,
    n_hashes: int = 3,
    m_bits: int = 65536,
) -> DataFrame:
    """Benchmark decontamination via a broadcast Bloom bitset: flag
    every corpus document one of whose strided char-grams tests
    positive against the benchmark's filter. Returns
    (key, n_hits) for flagged docs.

    vs the winnow-join ``decontaminate``: no join at all on the corpus
    side — the benchmark collapses to a fixed-size bitset evaluated as
    codegen per gram. False positives are possible (that is the Bloom
    trade; m/k sized for the benchmark), false negatives are not."""
    bench_grams = char_grams(bench, text_col, key_col, width, stride).select(
        F.col("gram")
    ).distinct()
    packed = build_bloom_words(bench_grams, "gram", n_hashes, m_bits)
    words = bloom_words_literal(packed)
    corpus_grams = char_grams(corpus, text_col, key_col, width, stride)
    hits = corpus_grams.filter(bloom_contains(F.col("gram"), words, n_hashes, m_bits))
    return hits.groupBy(key_col).agg(F.count("*").alias("n_hits"))
