"""Unit tests for benchmark decontamination (ops/contamination.py)."""

from __future__ import annotations

from hashquery_spark.ops import ngram_contamination


def test_contamination_values(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # contains bench phrase
            (2, "completely unrelated words about spark engines here"),
            (3, "the quick brown fox"),  # fully inside a bench doc
            (4, "too short"),  # < 3 words -> zero grams
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, "the quick brown fox ran away")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in ngram_contamination(
            corpus, benchmark, "text", "doc_id", n=3, threshold=0.5
        ).collect()
    }
    assert len(out) == 4
    # doc 1: grams of 9 words = 7 distinct; "the quick brown"/"quick brown fox" hit
    assert out[1]["n_grams"] == 7
    assert out[1]["n_contaminated_grams"] == 2
    assert not out[1]["is_contaminated"]  # 2/7 < 0.5
    # doc 2: no overlap
    assert out[2]["n_contaminated_grams"] == 0 and out[2]["contamination"] == 0.0
    # doc 3: both grams hit -> fully contaminated
    assert out[3]["n_grams"] == 2 and out[3]["contamination"] == 1.0
    assert out[3]["is_contaminated"]
    # doc 4: no grams, present with score 0
    assert out[4]["n_grams"] == 0 and out[4]["contamination"] == 0.0


def test_contamination_case_and_punct_normalized(spark):
    corpus = spark.createDataFrame(
        [(1, "The QUICK, brown... fox!")], "doc_id long, text string"
    )
    benchmark = spark.createDataFrame(
        [(9, "the quick brown fox")], "doc_id long, text string"
    )
    row = ngram_contamination(corpus, benchmark, "text", "doc_id", n=3).collect()[0]
    assert row["n_contaminated_grams"] == row["n_grams"] == 2


def test_bloom_contamination_bounds_exact(spark):
    """The Bloom gate never under-counts the exact gram overlap; with a
    roomy filter it EQUALS the exact op, with a degenerate 2-word filter
    every gram-bearing doc is flagged (fill ratio -> 1)."""
    from hashquery_spark.ops import bloom_contamination, ngram_contamination

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    docs = [
        (i, " ".join(words[j % len(words)] for j in range(i, i + 6)))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    bench = df.where("doc_id < 10")
    corpus = df.where("doc_id >= 10")

    exact = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in ngram_contamination(corpus, bench, "text", "doc_id", n=3).collect()
    }
    roomy = {
        r["doc_id"]: r["n_flagged"]
        for r in bloom_contamination(
            corpus, bench, "text", "doc_id", n=3, m_words=4096, k=3
        ).collect()
    }
    tiny = bloom_contamination(
        corpus, bench, "text", "doc_id", n=3, m_words=2, k=3
    ).collect()

    assert set(exact) == set(roomy)
    for d, nf in roomy.items():
        assert nf >= exact[d]  # no false negatives, ever
    assert roomy == exact  # fp ~ 0 at 4096 words for ~30 distinct grams
    for r in tiny:
        if r["n_grams"] > 0:
            assert r["n_flagged"] == r["n_grams"]  # saturated filter
