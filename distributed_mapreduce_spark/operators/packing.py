"""Greedy sequence packing ([EXT] north star — the sample-packing step
of an LLM training pipeline: concatenate documents into fixed-budget
bins so no sequence slot is wasted).

Rule: within each group (source shard), walk documents in key order
and append each to the current bin unless it would overflow the
budget, in which case open a new bin. A document larger than the
budget gets a bin of its own. This is first-fit-*sequential* — the
deterministic variant real pipelines use (best-fit/first-fit-
decreasing pack tighter but destroy document order and determinism
under re-partitioning).

The fold is inherently sequential per group, so it runs as an
applyInPandas stateful pass — one Arrow batch per group, C-speed
inside. The DuckDB oracle expresses the same fold as a recursive CTE,
which makes the per-document bin assignment value-checkable.

Scale notes: parallelism = number of groups; each group's rows gather
on one executor (the shuffle applyInPandas implies), so groups must be
shard-sized — at 100 TB you pack per (source, date, part) shard, never
globally, and the group key IS the packing unit a trainer consumes.
Memory is one group's (key, length) pairs, not its text: pack on
metadata, join assignments back to payloads afterward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PACK_SCHEMA = "source string, doc_id bigint, bin_idx bigint, bin_fill bigint"


def pack_greedy(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """Per-group greedy sequential packing. Returns one row per input
    document: (group, key, bin_idx, bin_fill) where bin_fill is the
    running fill of the document's bin *after* placing it (the last
    row of a bin carries the bin's final fill)."""
    import pandas as pd

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col)
        bins: list[int] = []
        fills: list[int] = []
        bin_idx, fill = 0, 0
        for length in pdf[length_col]:
            length = int(length)
            if fill > 0 and fill + length > budget:
                bin_idx += 1
                fill = length
            else:
                fill += length
            bins.append(bin_idx)
            fills.append(fill)
        return pd.DataFrame(
            {
                "source": pdf[group_col].values,
                "doc_id": pdf[order_col].values,
                "bin_idx": bins,
                "bin_fill": fills,
            }
        )

    return (
        docs.select(group_col, order_col, length_col)
        .groupBy(group_col)
        .applyInPandas(pack, schema=PACK_SCHEMA)
    )


def chunk_fixed(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token chunking with overlap — the sibling of
    pack_greedy on the other side of the sequence-length problem:
    packing concatenates short documents up to a budget, chunking
    splits long documents down to one. This is the chunk step of an
    embedding/RAG pipeline (window the token stream so every chunk
    fits the encoder's context, overlapping so no span loses its
    context at a boundary).

    Rule: chunk starts at token offsets 0, s, 2s, … (s = chunk_tokens −
    overlap) while the offset is inside the document; each chunk takes
    the next chunk_tokens tokens (the final chunk may be shorter).
    Deterministic and layout-independent; empty documents produce no
    chunk. Returns (id, chunk_idx, n_chunk_tokens, chunk_md5) — the
    md5 of the space-joined chunk text stands in for the chunk payload
    so results are value-checkable without shipping text.

    Scale shape: a pure per-row generator expression (sequence →
    posexplode → slice) — no shuffle, no state, scan-speed at 100 TB;
    the fan-out is bounded by ⌈n_tokens/s⌉ rows per document."""
    from pyspark.sql import functions as F

    from distributed_mapreduce_spark.functions.text import tokens

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    t = docs.select(F.col(id_col).alias("id"), tokens(text_col).alias("ts")).where(
        F.size("ts") > 0
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("ts") - 1, F.lit(0)), F.lit(stride)
    )
    exploded = t.select("id", "ts", F.posexplode(starts).alias("chunk_idx", "start"))
    chunk = F.slice("ts", F.col("start") + 1, chunk_tokens)
    return exploded.select(
        "id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )
