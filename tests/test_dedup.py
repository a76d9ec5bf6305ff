"""Dedup-family tests: exact tiers against synthetic duplicates, and
the approximate tiers (MinHash-LSH, SimHash) against the exact jaccard
oracle tier — recall on the corpus's planted near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce_spark.operators.dedup import (
    doc_shingles,
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_near_dup_pairs,
    minhash_signatures,
    simhash_near_dup_pairs,
)
from distributed_mapreduce_spark.sources import table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_exact_dedup_keeps_min_id(spark):
    rows = [
        (1, "hello world  foo"),
        (2, "Hello   world foo"),  # same after normalization
        (3, "entirely different text"),
        (4, "hello world foo"),  # same again
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in exact_dedup(df).collect())
    assert kept == [1, 3]


def test_exact_jaccard_finds_planted_near_dups(spark, docs):
    """The fixture corpus plants near-duplicate pairs (jaccard ≥ 0.9
    with a gap to ~0.07) — the exact tier must surface them."""
    pairs = jaccard_pairs(doc_shingles(docs), 0.5).collect()
    assert len(pairs) > 0
    assert all(r.jaccard >= 0.5 for r in pairs)
    assert all(r.id_i < r.id_j for r in pairs)


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """LSH candidates + exact verification must recover ≥90% of the
    exact tier's pairs (k=32, b=8 s-curve is steep above 0.6)."""
    exact = {(r.id_i, r.id_j) for r in jaccard_pairs(doc_shingles(docs), 0.5).collect()}
    approx = {(r.id_i, r.id_j) for r in minhash_near_dup_pairs(docs, 0.5).collect()}
    assert approx <= exact, "verified LSH pairs must be a subset of exact pairs"
    assert len(approx) >= 0.9 * len(exact), f"recall too low: {len(approx)}/{len(exact)}"


def test_lsh_candidates_bounded(spark, docs):
    """LSH must prune: candidate count ≪ full pair space (n·(n−1)/2)."""
    n = docs.count()
    cands = lsh_candidate_pairs(minhash_signatures(doc_shingles(docs))).count()
    assert cands < 0.05 * n * (n - 1) / 2, f"{cands} candidates of {n * (n - 1) // 2}"


def test_simhash_finds_planted_near_dups(spark, docs):
    exact = {(r.id_i, r.id_j) for r in jaccard_pairs(doc_shingles(docs), 0.9).collect()}
    sim = {(r.id_i, r.id_j) for r in simhash_near_dup_pairs(docs, max_hamming=6).collect()}
    # simhash hamming≤6 should recover most ≥0.9-jaccard planted pairs
    assert len(sim & exact) >= 0.8 * len(exact), f"{len(sim & exact)}/{len(exact)}"


def test_minhash_signature_shape(spark, docs):
    sig = minhash_signatures(doc_shingles(docs.limit(20)), num_hashes=16)
    row = sig.select(F.size("sig").alias("k")).distinct().collect()
    assert [r.k for r in row] == [16]
