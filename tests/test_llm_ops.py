"""Dedup / similarity / text / multimodal operator unit tests."""

from __future__ import annotations

import math

import pytest

from eventhub_to_timescale_spark.operators.dedup import (
    exact_dedup,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from eventhub_to_timescale_spark.operators.multimodal import (
    documents_as_blobs,
    extract_blob_features,
)
from eventhub_to_timescale_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from eventhub_to_timescale_spark.operators.text import (
    language_id,
    quality_score,
    token_stats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )


def test_exact_dedup(spark):
    docs = _docs(spark, ["a b c", "x y z", "a b c", "a b c"])
    groups = {r.keep_id: r.n_docs for r in exact_duplicates(docs).collect()}
    assert groups == {0: 3, 1: 1}
    kept = sorted(r.doc_id for r in exact_dedup(docs).collect())
    assert kept == [0, 1]


def test_minhash_identical_docs_jaccard_one(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words appear within this other unrelated document here"
    docs = _docs(spark, [base, base, near, far])
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p for p in pairs)


def test_minhash_autoband_solves_the_s_curve(spark):
    """choose_minhash_bands (r14): among the divisor bandings of the
    hash budget, the chosen one's characteristic threshold
    (1/b)^(1/r) is the closest to the target (MMDS §3.4.3), ties to
    more bands; the repo's standard 0.5 target reproduces the manual
    6×2 pairs exactly; invalid targets raise."""
    import pytest

    from eventhub_to_timescale_spark.operators.dedup import (
        choose_minhash_bands,
        minhash_autoband_pairs,
    )

    # closest-divisor property, exhaustively for the 12-hash budget
    for t in (0.1, 0.3, 0.5, 0.8, 0.95):
        b, r = choose_minhash_bands(12, t)
        assert b * r == 12
        dist = abs((1.0 / b) ** (1.0 / r) - t)
        for b2 in (1, 2, 3, 4, 6, 12):
            d2 = abs((1.0 / b2) ** (1.0 / (12 // b2)) - t)
            assert dist <= d2 + 1e-12, (t, b, b2)
    assert choose_minhash_bands(12, 0.5) == (6, 2)   # the manual gate
    assert choose_minhash_bands(12, 0.8) == (3, 4)   # the r14 gate
    with pytest.raises(ValueError):
        choose_minhash_bands(12, 0.0)
    with pytest.raises(ValueError):
        choose_minhash_bands(0, 0.5)

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words appear within this other unrelated document here"
    docs = _docs(spark, [base, base, near, far])
    auto = sorted(
        tuple(r)
        for r in minhash_autoband_pairs(docs, jaccard_threshold=0.3).collect()
    )
    manual = sorted(
        tuple(r)
        for r in minhash_lsh_pairs(
            docs, bands=choose_minhash_bands(12, 0.3)[0],
            jaccard_threshold=0.3,
        ).collect()
    )
    assert auto == manual and auto


def test_simhash_identical_docs_distance_zero(spark):
    base = "one two three four five six seven eight nine ten"
    docs = _docs(spark, [base, base, "alpha beta gamma delta epsilon zeta eta theta"])
    pairs = {
        (r.doc_a, r.doc_b): r.hamming for r in simhash_pairs(docs).collect()
    }
    assert pairs.get((0, 1)) == 0


def test_ngram_jaccard_bruteforce(spark):
    docs = _docs(spark, ["abcdefghij", "abcdefghij", "zzzzzzzzzz"])
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs == {(0, 1): 1.0}


def _embeddings(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(20, 8)).astype(float)
    vecs[1] = vecs[0] * 2.0  # same direction as 0 → cosine 1
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(20)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_cosine_topk_finds_colinear_vector(spark):
    out = cosine_topk_bruteforce(_embeddings(spark), query_max_id=1, k=3).collect()
    assert out[0].neighbor_id == 1
    assert out[0].cosine == pytest.approx(1.0)
    assert [r.rank for r in out] == [1, 2, 3]


def test_ivf_topk_recall_vs_bruteforce(spark):
    from eventhub_to_timescale_spark.operators.similarity import ivf_topk

    emb = _embeddings(spark)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(emb, query_max_id=2, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, query_max_id=2, k=3, n_centroids=4, nprobe=4).collect()
    }
    # nprobe == n_centroids probes every cell → recall must be 1
    assert approx == exact


def test_lsh_topk_subset_of_bruteforce_universe(spark):
    emb = _embeddings(spark)
    lsh = cosine_topk_lsh(emb, query_max_id=1, k=3, num_planes=4, dim=8).collect()
    # colinear vector shares every hyperplane sign → always in bucket
    assert lsh and lsh[0].neighbor_id == 1


def test_language_id_markers(spark):
    docs = _docs(
        spark,
        [
            "the cat sat of the mat and a dog",
            "der hund und die katze das haus",
            "xyzzy plugh",
        ],
    )
    out = {r.doc_id: (r.lang_pred, r.lang_hits) for r in language_id(docs).collect()}
    assert out[0][0] == "en"
    assert out[1][0] == "de"
    assert out[2] == ("und", 0)


def test_quality_score_bounds_and_monotonicity(spark):
    docs = _docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog and runs on in it for",
            "!!! ??? ;;; ::: ,,,",
        ],
    )
    out = {r.doc_id: r for r in quality_score(docs).collect()}
    assert 0.0 <= out[1].quality < out[0].quality <= 1.0
    assert out[0].n_words == 15
    assert out[1].punct_ratio > 0.5


def test_token_stats(spark):
    docs = _docs(spark, ["Hello world hello 42"])
    r = token_stats(docs).collect()[0]
    assert r.n_ws_tokens == 4
    assert r.n_re_tokens == 4  # hello, world, hello, 42
    assert r.n_distinct_tokens == 3  # hello, world, 42 (case-folded)


def test_blob_features_fake_and_stub(spark):
    docs = _docs(spark, ["hello", "hello", "worldlier"])
    blobs = documents_as_blobs(docs)
    rows = {r.doc_id: r for r in extract_blob_features(blobs, fake=True).collect()}
    assert rows[0].n_bytes == 5
    assert rows[0].sha256 == rows[1].sha256
    assert rows[0].entropy == pytest.approx(
        -sum(
            (c / 5) * math.log2(c / 5)
            for c in (1, 1, 2, 1)  # h,e,l(×2),o
        )
    )
    # real decode path is stubbed (no codecs in this environment)
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        extract_blob_features(blobs, fake=False).collect()


def test_near_dedup_filter_keep_first_chain(spark):
    """Chain a–b–c: b drops via (a,b), c drops via (b,c) even though b
    itself was removed — keep-first is a superset-of-clusters dedup
    (conservative direction)."""
    from eventhub_to_timescale_spark.operators.dedup import near_dedup_filter

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 5)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    kept = sorted(r.doc_id for r in near_dedup_filter(docs, pairs).collect())
    assert kept == [1, 4]


def test_near_dedup_components_chain_and_star(spark):
    """Chain 1-2-3 collapses to one cluster labeled 1 even though
    (1,3) was never a pair — the transitive semantics keep-first
    approximates; disjoint star 10-(11,12) labels 10."""
    from eventhub_to_timescale_spark.operators.dedup import (
        dedup_components_keep,
        near_dedup_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12)], "doc_a long, doc_b long"
    )
    comps = {
        r.doc_id: r.cluster_id for r in near_dedup_components(pairs).collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}

    docs = spark.createDataFrame(
        [(i, "t") for i in (1, 2, 3, 7, 10, 11, 12)], "doc_id long, text string"
    )
    kept = sorted(
        r.doc_id for r in dedup_components_keep(docs, pairs).collect()
    )
    # one canonical doc per cluster + the unpaired doc 7
    assert kept == [1, 7, 10]


def test_near_dedup_components_long_chain_converges(spark):
    """A 30-node chain needs >20 neighbor-only rounds; path compression
    (pointer jumping) must converge it within the default max_iters."""
    from eventhub_to_timescale_spark.operators.dedup import (
        near_dedup_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    comps = near_dedup_components(pairs, max_iters=8).collect()
    assert {r.cluster_id for r in comps} == {0}
    assert len(comps) == 31


def test_similarity_excludes_zero_norm_and_null_embeddings(spark):
    """A NULL or all-zero embedding has no cosine (0/0): it must be
    routed out, not ranked (Spark NULL sorts last; SQL NaN sorts FIRST
    — the silent parity break), and must not crash the IVF assignment
    batch (ragged numpy array)."""
    from eventhub_to_timescale_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 0.0]),  # zero norm
        (3, None),  # null embedding
        (4, [0.5, 0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk_bruteforce(emb, query_max_id=1, k=10).collect()
    assert all(r.cosine is not None for r in out)
    assert {r.neighbor_id for r in out} == {1, 4}

    ivf = ivf_topk(emb, query_max_id=1, k=10, n_centroids=2, nprobe=2).collect()
    assert all(r.cosine is not None for r in ivf)
    assert 2 not in {r.neighbor_id for r in ivf}
    assert 3 not in {r.neighbor_id for r in ivf}


def test_ivf_trains_on_corpora_smaller_than_n_centroids(spark):
    from eventhub_to_timescale_spark.operators.similarity import (
        train_ivf_centroids,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    cents = train_ivf_centroids(emb, n_centroids=16)
    assert len(cents) == 3  # trains what exists instead of crashing


def test_empty_and_null_text_edge_paths(spark):
    """Empty text: quality must be a NUMBER (0/0 punct would be NULL in
    Spark vs NaN in SQL). NULL text: must not shingle as [''] and
    near-dup-pair with genuinely empty docs."""
    from eventhub_to_timescale_spark.operators.dedup import minhash_lsh_pairs
    from eventhub_to_timescale_spark.operators.text import quality_score

    docs = spark.createDataFrame(
        [(0, ""), (1, None), (2, ""), (3, "real text here")],
        "doc_id long, text string",
    )
    q = {r.doc_id: r for r in quality_score(docs).collect()}
    assert q[0].quality is not None and q[0].punct_ratio == 0.0

    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.0).collect()
    ids = {x for r in pairs for x in (r.doc_a, r.doc_b)}
    assert 1 not in ids  # NULL text generates no candidates


class TestDeterministicSampling:
    def test_fraction_is_deterministic_and_growth_stable(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import (
            sample_fraction,
        )

        df = spark.createDataFrame(
            [(i,) for i in range(4000)], "id long"
        )
        kept1 = {r.id for r in sample_fraction(df, "id", 0.3, "s").collect()}
        kept2 = {r.id for r in sample_fraction(df, "id", 0.3, "s").collect()}
        assert kept1 == kept2  # rerun-stable
        # ~30% within sampling tolerance
        assert 0.25 < len(kept1) / 4000 < 0.35
        # growth-stable: restricting the corpus never flips membership
        half = df.filter("id < 2000")
        kept_half = {
            r.id for r in sample_fraction(half, "id", 0.3, "s").collect()
        }
        assert kept_half == {i for i in kept1 if i < 2000}
        # different salt = independent draw
        kept_salt = {r.id for r in sample_fraction(df, "id", 0.3, "t").collect()}
        assert kept_salt != kept1

    def test_fraction_edges(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import (
            sample_fraction,
        )

        df = spark.createDataFrame([(i,) for i in range(50)], "id long")
        assert sample_fraction(df, "id", 1.0).count() == 50
        assert sample_fraction(df, "id", 0.0).count() == 0
        import pytest as _pytest

        with _pytest.raises(ValueError):
            sample_fraction(df, "id", 1.5)

    def test_stratified_respects_per_class_rates(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import (
            sample_stratified,
        )

        rows = [(i, ["keep", "down", "drop"][i % 3]) for i in range(3000)]
        df = spark.createDataFrame(rows, "id long, cls string")
        out = sample_stratified(
            df, "id", "cls", {"keep": 1.0, "down": 0.2}, default_fraction=0.0
        )
        counts = {r.cls: r["count"] for r in out.groupBy("cls").count().collect()}
        assert counts["keep"] == 1000  # fraction 1.0 keeps every row
        assert "drop" not in counts  # default 0.0 removes the class
        assert 120 < counts["down"] < 280

    def test_split_partitions_exactly(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import (
            sample_fraction,
            train_test_split,
        )

        df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
        sp = train_test_split(df, "id", 0.1, salt="v1")
        assert sp.count() == 2000  # every row labeled
        test_ids = {r.id for r in sp.filter("split = 'test'").collect()}
        # the test set IS the sample_fraction set for the same key+salt
        frac_ids = {
            r.id for r in sample_fraction(df, "id", 0.1, salt="v1").collect()
        }
        assert test_ids == frac_ids


def test_vocabulary_counts_and_determinism(spark):
    from eventhub_to_timescale_spark.operators.text import vocabulary

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the dog sat sat"),
            (3, "THE end 42"),
        ],
        "doc_id long, text string",
    )
    rows = {r.token: r for r in vocabulary(docs).collect()}
    assert rows["the"].term_freq == 3 and rows["the"].doc_freq == 3
    assert rows["sat"].term_freq == 3 and rows["sat"].doc_freq == 2
    assert rows["42"].term_freq == 1  # numeric tokens lex separately
    import math

    assert rows["sat"].idf == round(math.log((3 + 1) / (2 + 1)), 6)
    # top-k cut is deterministic under ties (term_freq desc, token asc)
    top = vocabulary(docs, top_k=3).collect()
    assert [r.token for r in top] == ["sat", "the", "42"]


def test_quality_percentile_filter_exact_and_threshold_paths(spark):
    from eventhub_to_timescale_spark.operators.text import (
        filter_quality_percentile,
        quality_threshold_by_group,
    )

    rows = []
    for i in range(40):
        lang = "en" if i % 2 == 0 else "fr"
        # longer, cleaner text scores higher quality
        good = "the quick brown fox jumps over the lazy dog " * (1 + i % 5)
        rows.append((i, lang, good if i % 5 else "x!!"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    kept = filter_quality_percentile(docs, keep_frac=0.5, by="lang")
    out = kept.collect()
    # per-language cut: ~half of each language survives
    counts = {r.lang: 0 for r in out}
    for r in out:
        counts[r.lang] += 1
    assert 8 <= counts["en"] <= 12 and 8 <= counts["fr"] <= 12
    # survivors' minimum quality >= dropped rows' maximum per language
    all_scored = filter_quality_percentile(docs, keep_frac=1.0, by="lang")
    per_lang_all = {}
    for r in all_scored.collect():
        per_lang_all.setdefault(r.lang, []).append((r.doc_id, r.quality))
    kept_ids = {r.doc_id for r in out}
    for lang, pairs in per_lang_all.items():
        kept_q = [q for d, q in pairs if d in kept_ids]
        drop_q = [q for d, q in pairs if d not in kept_ids]
        assert min(kept_q) >= max(drop_q)

    # scale path agrees with the exact cut up to threshold ties
    approx = {
        r.doc_id
        for r in quality_threshold_by_group(docs, keep_frac=0.5).collect()
    }
    sym_diff = kept_ids ^ approx
    assert len(sym_diff) <= 6  # boundary ties only, never a wholesale drift


def test_pack_documents_first_fit_semantics(spark):
    from eventhub_to_timescale_spark.operators.packing import (
        pack_documents,
        packing_stats,
    )

    # one group (n_groups=1) so the packing order is just doc_id
    docs = spark.createDataFrame(
        [
            (0, "a b c"),          # 3 tokens, cum_before 0  -> bin 0
            (1, "d e f g"),        # 4 tokens, cum_before 3  -> bin 0
            (2, "h i j"),          # 3 tokens, cum_before 7  -> bin 0 (straddles)
            (3, "k l"),            # 2 tokens, cum_before 10 -> bin 1
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pack_documents(docs, token_budget=8, n_groups=1).collect()}
    assert [out[i].bin_id for i in range(4)] == [0, 0, 0, 1]
    assert out[2].bin_start_offset == 7  # first token lands in bin 0
    assert out[3].bin_start_offset == 2  # 10 % 8

    stats = {
        r.bin_id: r
        for r in packing_stats(
            pack_documents(docs, token_budget=8, n_groups=1), token_budget=8
        ).collect()
    }
    assert stats[0].n_docs == 3 and stats[0].n_tokens == 10
    assert stats[0].fill_ratio == 1.25  # overshoot by the straddler
    assert stats[1].n_tokens == 2

    # grouping is deterministic and partitions the corpus
    g = pack_documents(docs, token_budget=8, n_groups=2).collect()
    assert {r.doc_id % 2 for r in g} == {r.pack_group for r in g}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_documents(docs, token_budget=0)


def test_word_entropy_values(spark):
    import math

    from eventhub_to_timescale_spark.operators.text import word_entropy

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),           # one token: entropy 0
            (2, "a b c d"),           # uniform: entropy log2(4) = 2
            (3, "a a b b"),           # two tokens, 2 each: entropy 1
            (4, ""),                  # empty: defined 0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in word_entropy(docs).collect()}
    assert got[1]["word_entropy"] == 0.0
    assert got[2]["word_entropy"] == 2.0
    assert got[3]["word_entropy"] == 1.0
    assert got[4]["word_entropy"] == 0.0 and got[4]["n_words"] == 0
    # mixed: 3x'a', 1x'b' -> log2(4) - (3 log2 3)/4
    docs2 = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    want = round(2 - 3 * math.log2(3) / 4, 6)
    assert word_entropy(docs2).collect()[0]["word_entropy"] == want
