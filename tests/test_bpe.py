"""BPE merge training (operators/bpe.py): the distributed loop must
equal the sequential pure-Python fold (the run_mapreduce oracle
pattern), and golden merges on a hand-computable corpus."""

from __future__ import annotations

from distributed_mapreduce_spark.operators.bpe import (
    END,
    _merge_symbols,
    bpe_train,
    bpe_train_sequential,
)
from distributed_mapreduce_spark.sources import table


def test_merge_symbols_leftmost_nonoverlapping():
    # overlapping run "aaa": leftmost pair merges, no overlap reuse
    assert _merge_symbols(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_symbols(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert _merge_symbols(["x", "y", "z"], "y", "z") == ["x", "yz"]
    assert _merge_symbols([], "a", "b") == []


def test_bpe_golden_merges(spark):
    """Hand-computable corpus: 'low' ×3 and 'lower' ×1 share the stem.
    Round 1 must merge ('l','o') with weight 4; round 2 ('lo','w')
    with weight 4 — the stem wins before any suffix pair."""
    docs = spark.createDataFrame(
        [(1, "low low low lower")], "doc_id long, text string"
    )
    merges = bpe_train(docs, 2)
    assert [(m["left"], m["right"], m["pair_count"]) for m in merges] == [
        ("l", "o", 4),
        ("lo", "w", 4),
    ]


def test_bpe_distributed_equals_sequential(spark, sf_dir):
    """20 merge rounds on the documents fixture: the distributed loop
    and the sequential fold must learn the identical merge table
    (ranks, pairs, counts)."""
    docs = table(spark, sf_dir, "documents")
    dist = bpe_train(docs, 20)

    from pyspark.sql import functions as F

    from distributed_mapreduce_spark.functions.text import tokens

    wf = {
        r.w: r.c
        for r in docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    seq = bpe_train_sequential(wf, 20)
    assert dist == seq
    assert len(dist) == 20
    # merged tokens actually grow: the last merge's parts must include
    # at least one multi-char symbol or the end marker
    assert any(len(m["left"]) > 1 or m["right"] == END for m in dist)


def test_bpe_encode_compresses_and_bounds(spark, sf_dir):
    """Encoding with learned merges: every document's BPE token count
    is ≤ its raw symbol count (chars + end markers) and ≥ its word
    count (a word never merges past one symbol... except fully-merged
    single-symbol words, which still count 1) — and more merges never
    increase any document's count."""
    from pyspark.sql import functions as F

    from distributed_mapreduce_spark.functions.text import tokens
    from distributed_mapreduce_spark.operators.bpe import bpe_encode, bpe_train

    docs = table(spark, sf_dir, "documents")
    merges = bpe_train(docs, 12)
    enc = {r.id: r for r in bpe_encode(docs, merges).collect()}
    enc0 = {r.id: r for r in bpe_encode(docs, []).collect()}
    raw = {
        r.doc_id: (r.nw, r.nc)
        for r in docs.select(
            "doc_id",
            F.size(tokens("text")).alias("nw"),
            F.aggregate(
                F.transform(tokens("text"), lambda w: F.length(w) + 1),
                F.lit(0),
                lambda a, x: a + x,
            ).alias("nc"),
        ).collect()
    }
    assert set(enc) == set(raw)
    for did, r in enc.items():
        nw, nc = raw[did]
        assert r.n_words == nw
        assert enc0[did].n_symbols == nc  # zero merges = raw symbols
        assert nw <= r.n_symbols <= nc
    # merges strictly helped somewhere
    assert any(enc[d].n_symbols < enc0[d].n_symbols for d in enc)
