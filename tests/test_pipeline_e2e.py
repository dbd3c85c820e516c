"""End-to-end training-data pipeline: the full corpus→training-set chain
composed from individual operators, with conservation invariants at every
stage. This is the integration surface a real 100 TB data pipeline would
run — incremental dedup against the prior snapshot, paragraph dedup,
quality curation, chunking, and sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hashquery_spark.ops import (
    chunk_documents,
    curate,
    dedup_against,
    dedup_paragraphs,
    pack_sequences,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_full_pipeline_conserves_and_filters(spark, corpus):
    n_raw = corpus.count()

    # 1. incremental dedup: drop anything already in the "prior snapshot"
    prior = corpus.where("doc_id % 5 == 0")
    fresh = dedup_against(corpus, prior, "text", "doc_id")
    n_fresh = fresh.count()
    assert n_fresh < n_raw  # the prior snapshot overlaps by construction
    assert fresh.columns == corpus.columns  # schema passthrough

    # 2. paragraph-level dedup + reassembly
    paras = dedup_paragraphs(fresh, "text", "doc_id")
    n_paras = paras.count()
    assert n_paras == fresh.where("text IS NOT NULL").count()  # one row per doc
    cleaned = paras.where("clean_text IS NOT NULL").select(
        "doc_id", F.col("clean_text").alias("text")
    )

    # 3. curation: language/quality/repetition gates + leakage-safe split
    kept = curate(cleaned, "text", "doc_id", min_quality=0.0, langs=("en",))
    assert kept.count() <= cleaned.count()
    assert set(r.split for r in kept.select("split").distinct().collect()) <= {
        "train",
        "test",
    }

    # 4. chunk the curated docs for fixed-window training
    docs_kept = cleaned.join(kept.select("doc_id"), on="doc_id")
    chunks = chunk_documents(docs_kept, "text", "doc_id", size=512, overlap=32)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("chunk_idx").alias("mx")
    )
    bad = per_doc.where("mx != n - 1").count()
    assert bad == 0  # chunk indices are dense per doc

    # 5. pack into fixed token budgets: every doc placed exactly once,
    # offsets stay inside the budget
    packed = pack_sequences(docs_kept, "text", "doc_id", budget=256)
    assert packed.count() == docs_kept.count()
    assert packed.where("seq_offset < 0 OR seq_offset >= 256").count() == 0
    # pack ids are dense from 0
    packs = packed.select("pack_id").distinct().count()
    assert packed.agg(F.max("pack_id")).collect()[0][0] == packs - 1


def test_model_centric_pipeline_with_classifier_and_packing(spark, corpus):
    """Second end-to-end shape: quality-classifier gating + graph-derived
    source weights + pack materialization — the ops added late in round 1
    composed the same way a real pipeline would chain them."""
    from hashquery_spark.ops import (
        char_entropy,
        classifier_fit,
        mix_corpora,
        pack_texts,
    )

    # 1. weak-label fit: "mentions data/spark" is the positive class
    labeled = corpus.withColumn(
        "y",
        (F.col("text").contains("data") | F.col("text").contains("spark")).cast("int"),
    )
    model = classifier_fit(
        labeled, "text", "doc_id", "y", n_features=2048, iters=3, lr=2.0
    )
    scored = model.score(corpus, "text", "doc_id")
    # word-soup docs nearly all mention the positive tokens, so gate on a
    # margin percentile rather than margin > 0 (real pipelines tune the
    # operating point the same way)
    thr = scored.agg(F.percentile("margin", F.lit(0.6)).alias("t"))
    kept_ids = (
        scored.crossJoin(F.broadcast(thr)).where("margin >= t").select("doc_id")
    )
    assert 0 < kept_ids.count() < corpus.count()

    # 2. entropy gate on the survivors (both gates are narrow passes)
    survivors = corpus.join(kept_ids, on="doc_id")
    ent = char_entropy(survivors, "text", "doc_id")
    good = survivors.join(ent.where("entropy > 1.5").select("doc_id"), on="doc_id")
    assert good.count() > 0

    # 3. re-weight sources to a target mixture (token-weighted)
    mixed = mix_corpora(
        good, "source", "doc_id",
        weights={"src0": 0.5, "src1": 0.25, "src2": 0.25},
        seed=7,
    )
    assert mixed.count() <= good.count()

    # 4. materialize training packs; every mixed doc lands exactly once
    packs = pack_texts(mixed, "text", "doc_id", budget=128, seed=7)
    assert packs.agg(F.sum("n_docs")).collect()[0][0] == mixed.count()
    # every pack's text contains every member doc's first token
    sample = packs.limit(3).collect()
    assert all(r["text"] for r in sample)


def test_sft_data_prep_pipeline(spark):
    """Round-4 chain: synthesize chat transcripts with planted failure
    modes -> chat_validate gate -> exact dedup of surviving transcripts
    -> pack_texts for training export. Conservation invariants at every
    stage; the gate drops EXACTLY the planted-bad share."""
    from hashquery_spark.ops import chat_validate, exact_dedup, pack_texts

    n = 600
    # ids 0..599: %3==0 valid unique, %3==1 valid DUPLICATE content
    # (all share one transcript), %3==2 broken (no assistant turn)
    base = spark.range(n).selectExpr(
        "id AS doc_id",
        "CASE"
        " WHEN id % 3 = 0 THEN concat('[{\"role\":\"user\",\"content\":\"q', CAST(id AS STRING), '\"},{\"role\":\"assistant\",\"content\":\"a', CAST(id AS STRING), '\"}]')"
        " WHEN id % 3 = 1 THEN '[{\"role\":\"user\",\"content\":\"same\"},{\"role\":\"assistant\",\"content\":\"same\"}]'"
        " ELSE '[{\"role\":\"user\",\"content\":\"only user\"}]'"
        " END AS messages",
    )
    gated = chat_validate(base, "messages", "doc_id").where("chat_ok")
    assert gated.count() == 400  # %3==0 and %3==1 survive, %3==2 dropped

    survivors = base.join(gated.select("doc_id"), on="doc_id")
    deduped = exact_dedup(survivors, "messages", "doc_id")
    # 200 unique valid + 1 canonical copy of the duplicate transcript
    assert deduped.count() == 201
    dup_row = deduped.where("dup_count > 1").collect()
    assert len(dup_row) == 1 and dup_row[0]["dup_count"] == 200

    kept = survivors.join(
        deduped.selectExpr("keep_id AS doc_id"), on="doc_id"
    )
    packed = pack_texts(kept, "messages", "doc_id", budget=64)
    agg = packed.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").alias("docs"),
    ).collect()[0]
    assert agg["docs"] == 201  # every kept transcript packed exactly once
    assert agg["n_packs"] >= 1
