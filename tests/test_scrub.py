"""Corpus-scrubbing stage tests (functions/scrub.py): normalization,
PII redaction, URL/domain hygiene, Bloom-filter decontamination.

The engine-vs-DuckDB value parity of the registry entries is covered
by test_entry_oracle.py; these tests pin the SEMANTICS on adversarial
hand-built rows (the synthetic corpus contains no PII/URLs) plus the
invariants an oracle can't express (idempotence, no false negatives,
plan shape)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyogrio_spark.functions import scrub


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Hello’s “world” — test…  multi   space\tand\x01ctrl"),
        (2, "mail me at a.b+c@foo-bar.example.com or 415-555-1234 now"),
        (3, "ip 10.0.0.1 and 255.255.255.255 url https://x.example.org/p/1 http://ads.net/z"),
        (4, "phone 415.555.9999 +1 also 123-456-7890"),
        (5, "no pii here at all just words"),
        (6, "two mails a@b.co and c.d@e-f.org plus 10.1.2.3"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _col(df, col):
    return {r["doc_id"]: r[col] for r in df.collect()}


class TestNormalize:
    def test_folds_and_collapse(self, docs):
        out = _col(docs.select("doc_id", scrub.normalize_text(F.col("text")).alias("n")), "n")
        assert out[1] == 'Hello\'s "world" - test. multi space andctrl'

    def test_idempotent(self, docs):
        once = docs.select("doc_id", scrub.normalize_text(F.col("text")).alias("text"))
        twice = _col(once.select("doc_id", scrub.normalize_text(F.col("text")).alias("n")), "n")
        assert twice == _col(once, "text")

    def test_lowercase_variant(self, spark):
        df = spark.createDataFrame([(1, "  MiXeD Case ")], "doc_id int, text string")
        out = _col(df.select("doc_id", scrub.normalize_text(F.col("text"), lowercase=True).alias("n")), "n")
        assert out[1] == "mixed case"

    def test_sql_mirror_shares_constants(self):
        # the SQL build embeds the same fold tables; quote-escaping must
        # keep the positional pairing intact (the '' -> ' SQL rule)
        s = scrub.normalize_sql("text")
        assert scrub._FOLD_FROM in s and "''\"\"" in s


class TestRedact:
    def test_all_classes(self, docs):
        out = _col(docs.select("doc_id", scrub.redact_pii(F.col("text")).alias("r")), "r")
        assert out[2] == "mail me at <EMAIL> or <PHONE> now"
        assert out[3] == "ip <IP> and <IP> url https://x.example.org/p/1 http://ads.net/z"
        assert out[4] == "phone <PHONE> +1 also <PHONE>"
        assert out[5] == "no pii here at all just words"
        assert out[6] == "two mails <EMAIL> and <EMAIL> plus <IP>"

    def test_counts(self, docs):
        c = scrub.pii_counts(F.col("text"))
        got = {
            r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ips"])
            for r in docs.select("doc_id", *[v.alias(k) for k, v in c.items()]).collect()
        }
        assert got[2] == (1, 1, 0) and got[3] == (0, 0, 2)
        assert got[4] == (0, 2, 0) and got[6] == (2, 0, 1)

    def test_with_pii_redacted_shape(self, docs):
        out = scrub.with_pii_redacted(docs)
        assert set(out.columns) == {"doc_id", "text", "n_emails", "n_phones", "n_ips"}
        assert "<EMAIL>" in _col(out, "text")[2]

    def test_zero_shuffle_plan(self, docs):
        plan = scrub.with_pii_redacted(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestUrls:
    def test_extract_and_domain(self, docs):
        t = scrub.doc_url_table(docs)
        got = sorted((r["doc_id"], r["domain"]) for r in t.collect())
        assert got == [(3, "ads.net"), (3, "x.example.org")]

    def test_blocklist_drops_whole_doc(self, spark, docs):
        block = spark.createDataFrame([("ads.net",)], "domain string")
        kept = scrub.filter_blocked_domains(docs, block)
        ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        assert 3 not in ids and {1, 2, 4, 5, 6} <= ids

    def test_blocklist_is_broadcast(self, spark, docs):
        block = spark.createDataFrame([("ads.net",)], "domain string")
        plan = scrub.filter_blocked_domains(docs, block)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan and "Broadcast" in plan


class TestBloom:
    def test_no_false_negatives(self, docs):
        # every bench doc's full gram set must self-hit, whatever m
        bench = docs.filter("doc_id = 2")
        out = scrub.decontaminate_bloom(docs, bench, width=12, stride=2, m_bits=1 << 12)
        hits = {r["doc_id"]: r["n_hits"] for r in out.collect()}
        n_grams = scrub.char_grams(bench, width=12, stride=2).count()
        assert hits[2] == n_grams

    def test_bitset_is_fixed_size(self, docs):
        grams = scrub.char_grams(docs, width=12, stride=2).select("gram")
        packed = scrub.build_bloom_words(grams, m_bits=1 << 12)
        assert len(packed) == (1 << 12) // 64
        assert any(w != 0 for w in packed)

    def test_low_fp_rate_when_sized(self, spark, docs):
        # disjoint corpus vs bench with a well-sized filter: hits ~ 0
        bench = docs.filter("doc_id = 2")
        corpus = spark.createDataFrame(
            [(100 + i, f"zz{i}qq completely different gram stream {i} xyzzy") for i in range(20)],
            "doc_id int, text string",
        )
        out = scrub.decontaminate_bloom(corpus, bench, width=12, stride=2, m_bits=1 << 16)
        assert out.count() == 0

    def test_corpus_side_has_no_join(self, docs):
        # the point of the bloom path: corpus grams filter via codegen,
        # not a join against the benchmark set
        bench = docs.filter("doc_id = 2")
        grams = scrub.char_grams(docs, width=12, stride=2)
        packed = scrub.build_bloom_words(
            scrub.char_grams(bench, width=12, stride=2).select("gram"), m_bits=1 << 12
        )
        words = scrub.bloom_words_literal(packed)
        flt = grams.filter(scrub.bloom_contains(F.col("gram"), words, 3, 1 << 12))
        plan = flt._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
