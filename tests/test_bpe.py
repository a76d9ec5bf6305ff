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


def test_bpe_batched_m1_equals_sequential(spark, sf_dir):
    """batch_size=1 must be EXACTLY the one-merge-per-round algorithm:
    identical merge table to the sequential fold over 12 rounds."""
    from pyspark.sql import functions as F

    from distributed_mapreduce_spark.functions.text import tokens
    from distributed_mapreduce_spark.operators.bpe import bpe_train_batched

    docs = table(spark, sf_dir, "documents")
    got = bpe_train_batched(docs, 12, batch_size=1)
    wf = {
        r.w: r.c
        for r in docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert got == bpe_train_sequential(wf, 12)


def test_bpe_batched_golden_disjoint_pairs(spark):
    """Hand-computable batch: corpus 'ab ab ab cd cd' has top pairs
    (a,b)×3 and (c,d)×2 — symbol-disjoint, so ONE batched round must
    learn both with their true snapshot counts, in sequential tiebreak
    order; the colliding pair (b,</w>) (shares b) must NOT enter the
    same batch as (a,b)... and (d,</w>) shares d with (c,d). Round 2
    then merges ('ab','</w>')×3 — counts reflect round 1's merges."""
    from distributed_mapreduce_spark.operators.bpe import bpe_train_batched

    docs = spark.createDataFrame(
        [(1, "ab ab ab cd cd")], "doc_id long, text string"
    )
    merges = bpe_train_batched(docs, 3, batch_size=4)
    got = [(m["left"], m["right"], m["pair_count"]) for m in merges]
    assert got[:2] == [("a", "b", 3), ("c", "d", 2)]
    assert got[2] == ("ab", END, 3)
    assert [m["rank"] for m in merges] == [0, 1, 2]


def test_bpe_batch_selection_output_collision_guard():
    """The batch selection must reserve merge OUTPUTS, not just the
    pairs' own symbols (ADVICE r6): ('ab','c') consumes the token
    ('a','b') creates, and ('a','bc') would create the same 'abc'
    token as ('ab','c') — neither may share a batch with its
    colliding partner, while genuinely disjoint pairs still fill it."""
    from distributed_mapreduce_spark.operators.bpe import _select_disjoint

    ranked = [
        ("a", "b", 9),  # chosen; reserves a, b, ab
        ("ab", "c", 8),  # left == chosen output 'ab' -> skipped
        ("x", "y", 7),  # disjoint -> chosen; reserves x, y, xy
        ("w", "xy", 6),  # right == chosen output 'xy' -> skipped
        ("c", "d", 5),  # disjoint -> chosen ('c' was never reserved)
    ]
    assert _select_disjoint(ranked, 3) == [("a", "b", 9), ("x", "y", 7), ("c", "d", 5)]
    # both spellings of 'abc' in one window: only the first survives
    assert _select_disjoint([("a", "bc", 4), ("ab", "c", 3), ("d", "e", 2)], 3) == [
        ("a", "bc", 4),
        ("d", "e", 2),
    ]
    # m=1 never filters: the guard cannot change batch_size=1 ≡ sequential
    assert _select_disjoint(ranked, 1) == [("a", "b", 9)]


def _batched_sequential_oracle(
    word_freqs: dict[str, int], n_merges: int, batch_size: int
) -> list[dict]:
    """Pure-Python replay of the batched algorithm (identical greedy
    symbol-disjoint selection, same tiebreak) — the testing.py
    mrsequential pattern applied to bpe_train_batched."""
    from collections import Counter

    vocab = {w: [*w, END] for w in word_freqs}
    merges: list[dict] = []
    while len(merges) < n_merges:
        counts: Counter = Counter()
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        m = min(batch_size, n_merges - len(merges))
        # mirror the distributed bounded collect: selection only sees
        # the top 4m candidates, so a collision-heavy window can fill
        # fewer than m merges and shift the next round's boundary
        ranked = ranked[: max(4 * m, 16)]
        chosen, used = [], set()
        for (left, right), c in ranked:
            # mirror the impl's output-collision guard (ADVICE r6):
            # left, right and the merge output left+right all reserve
            if left in used or right in used or (left + right) in used:
                continue
            chosen.append((left, right, c))
            used.update((left, right, left + right))
            if len(chosen) == m:
                break
        for left, right, c in chosen:
            merges.append(
                {
                    "rank": len(merges),
                    "left": left,
                    "right": right,
                    "pair_count": c,
                }
            )
            vocab = {w: _merge_symbols(s, left, right) for w, s in vocab.items()}
    return merges


def test_bpe_batched_distributed_equals_sequential_replay(spark, sf_dir):
    """12 merges at batch_size=4 on the documents fixture: the
    distributed batched loop must equal a pure sequential replay of the
    identical greedy symbol-disjoint selection — which also proves
    every recorded pair_count is the true corpus count at its round's
    start (the oracle recounts from scratch each round)."""
    from pyspark.sql import functions as F

    from distributed_mapreduce_spark.functions.text import tokens
    from distributed_mapreduce_spark.operators.bpe import bpe_train_batched

    docs = table(spark, sf_dir, "documents")
    merges = bpe_train_batched(docs, 12, batch_size=4)
    assert len(merges) == 12

    wf = {
        r.w: r.c
        for r in docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert merges == _batched_sequential_oracle(wf, 12, 4)


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
