"""Curation operator semantics: PII redaction, decontamination,
repetition stats (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.curation import (
    contamination_flags,
    decontaminate,
    redact_pii,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_pii_replaces_and_counts(spark):
    docs = _docs(
        spark,
        [
            (1, "mail a.b+c@foo-bar.co.uk and 192.168.0.1 twice 10.0.0.255"),
            (2, "no pii here, just 1.2 floats and a@b (not an email)"),
            (3, "ip-like 999.999.999.999 still redacts; 1.2.3.4.5 greedy"),
        ],
    )
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[1]["clean_text"] == "mail [EMAIL] and [IP] twice [IP]"
    assert (got[1]["n_emails"], got[1]["n_ipv4"]) == (1, 2)
    assert got[2]["clean_text"] == docs.filter(
        F.col("doc_id") == 2
    ).collect()[0]["text"]
    assert (got[2]["n_emails"], got[2]["n_ipv4"]) == (0, 0)
    # the conservative pattern redacts ip-shaped strings without range
    # validation (redaction errs toward removal), and the 5-octet case
    # matches its first 4 octets
    assert got[3]["n_ipv4"] == 2
    assert "[IP]" in got[3]["clean_text"]


def test_decontaminate_drops_ngram_overlap(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated content about spark plans"),
            (3, "padding words then the quick brown fox appears here"),
        ],
    )
    eval_docs = _docs(spark, [(100, "the quick brown fox ran away")])
    flags = {
        r["doc_id"]: r["n_overlapping"]
        for r in contamination_flags(
            corpus, eval_docs, shingle_n=4
        ).collect()
    }
    # docs 1 and 3 share the 4-gram "the quick brown fox"
    assert set(flags) == {1, 3}
    assert flags[1] >= 1 and flags[3] >= 1
    kept = {r["doc_id"] for r in decontaminate(
        corpus, eval_docs, shingle_n=4
    ).collect()}
    assert kept == {2}


def test_repetition_stats_ratio(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c a b c a b c"),      # heavy 3-gram looping
            (2, "one two three four five"),  # no repeats
        ],
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs, 3).collect()}
    # doc 1: 7 trigrams, 3 distinct ("a b c", "b c a", "c a b")
    assert (got[1]["n_ngrams"], got[1]["n_distinct"]) == (7, 3)
    assert abs(got[1]["repetition_ratio"] - round(1 - 3 / 7, 6)) < 1e-9
    assert (got[2]["n_ngrams"], got[2]["n_distinct"]) == (3, 3)
    assert got[2]["repetition_ratio"] == 0.0


def test_gopher_quality_flags_rules(spark):
    from eventhub_to_timescale_spark.operators.curation import (
        gopher_quality_flags,
    )

    docs = _docs(
        spark,
        [
            # passes every gate: 12 words, mean len in [3,10], all
            # alphabetic, two stop words, max word freq 2/12 < 20%
            (1, "the quick brown fox jumps over that lazy dog near "
                "the river"),
            (2, "too few words"),                       # word count
            (3, "aa " * 6 + "the that"),                # mean len < 3
            (4, "12 34 56 78 90 11 22 33 44 55 the that"),  # alpha
            (5, "quick brown foxes jumping over lazy dogs every "
                "single morning run"),                  # 0 stop words
            (6, "the the the the the the the the that also more "
                "words here"),                          # repetition
        ],
    )
    got = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert got[1]["keep"] is True
    assert got[2]["ok_word_count"] is False
    assert got[3]["ok_mean_len"] is False
    assert got[4]["ok_alpha"] is False
    assert got[5]["ok_stopwords"] is False
    assert got[6]["ok_repetition"] is False
    for d in (2, 3, 4, 5, 6):
        assert got[d]["keep"] is False


def test_gopher_quality_integer_thresholds_exact(spark):
    """Boundary docs sit EXACTLY on each threshold — the integer
    cross-multiplication must keep them (>= / <= semantics)."""
    from eventhub_to_timescale_spark.operators.curation import (
        gopher_quality_flags,
    )

    docs = _docs(
        spark,
        [
            # exactly 10 words, mean len exactly 3 (30 chars / 10),
            # exactly 80% alpha (8/10), 2 stop words, max freq 2/10=20%
            (1, "the and cat cat dog fox hen 123 456 owl"),
        ],
    )
    r = gopher_quality_flags(docs, min_words=10).collect()[0]
    assert r["n_words"] == 10
    assert r["ok_word_count"] is True
    assert r["ok_mean_len"] is True
    assert r["ok_alpha"] is True
    assert r["ok_stopwords"] is True
    assert r["ok_repetition"] is True
    assert r["keep"] is True


class TestNormalizeText:
    CASES = [
        (0, "Hello’s “world”"),       # curly quotes
        (1, "a b　c"),                      # NBSP + ideographic
        (2, "line1\r\nline2\n\nline3"),              # CRLF, blank line
        (3, "ctl\x00\x07chars\x0Bhere\x7F"),         # C0 + VT + DEL
        (4, "  MIXED Case\tText  "),                 # trim + lower + tab
        (5, "en–dash em—dash minus−"),
        (6, "already clean text"),
        (7, None),                                   # NULL passthrough
        (8, ""),                                     # empty
        (9, "ellipsis… prime′ dbl″"),
        # cased non-ASCII: engine lower() DIVERGES here (JVM full
        # Unicode mapping: İ → i+U+0307; DuckDB/utf8proc simple
        # mapping: İ → i), which is why the lowercase step is an
        # explicit A-Z translate — these code points must pass
        # through case-UNCHANGED on both engines
        (10, "İstanbul Émile STRASSE ß Ärger"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.CASES, "doc_id long, text string"
        )

    def test_known_transformations(self, spark):
        from eventhub_to_timescale_spark.operators.curation import (
            normalize_text,
        )

        got = {
            r["doc_id"]: (r["norm_text"], r["changed"])
            for r in normalize_text(self._df(spark)).collect()
        }
        assert got[0] == ("hello's \"world\"", True)
        assert got[1] == ("a b c", True)
        assert got[2] == ("line1 line2 line3", True)
        assert got[3] == ("ctlcharshere", True)
        assert got[4] == ("mixed case text", True)
        assert got[5] == ("en-dash em-dash minus-", True)
        assert got[6] == ("already clean text", False)
        assert got[7] == (None, None)
        assert got[8] == ("", False)
        assert got[9] == ("ellipsis. prime' dbl\"", True)
        # ASCII letters lowercase; non-ASCII cased letters untouched
        assert got[10] == ("İstanbul Émile strasse ß Ärger", True)

    def test_matches_duckdb_oracle_on_adversarial_input(self, spark):
        """Byte-for-byte cross-engine agreement on exactly the
        characters where regex dialects usually diverge."""
        import duckdb

        from eventhub_to_timescale_spark.operators.curation import (
            normalize_oracle_sql,
            normalize_text,
        )

        got = sorted(
            (r["doc_id"], r["norm_text"], r["changed"])
            for r in normalize_text(self._df(spark)).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
        )
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", self.CASES
        )
        want = sorted(map(tuple, con.execute(normalize_oracle_sql()).fetchall()))
        assert got == want

    def test_idempotent(self, spark):
        """normalize(normalize(x)) == normalize(x) — canonical forms
        are fixed points."""
        from pyspark.sql import functions as F

        from eventhub_to_timescale_spark.operators.curation import (
            normalize_text,
        )

        once = normalize_text(self._df(spark)).select(
            "doc_id", F.col("norm_text").alias("text")
        )
        twice = normalize_text(once)
        assert [
            (r["doc_id"], r["norm_text"], r["changed"])
            for r in twice.collect()
        ] == [
            (r["doc_id"], r["text"], False if r["text"] is not None else None)
            for r in once.orderBy("doc_id").collect()
        ]

    def test_scan_speed_plan(self, spark):
        """Projection-only: no shuffle (beyond the output sort), no
        Python eval."""
        from eventhub_to_timescale_spark.operators.curation import (
            normalize_text,
        )

        df = normalize_text(self._df(spark))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
