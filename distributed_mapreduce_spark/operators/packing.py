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
