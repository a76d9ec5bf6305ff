"""Vector column expressions for embedding similarity ([EXT]).

All JVM-side: zip_with + a sequential aggregate fold, in double
precision. The fold accumulates left-to-right in element order, which
makes results bit-identical to a left-associative unrolled sum — the
form the DuckDB oracle uses (its native list_cosine_similarity runs in
float32 and drifts ~1e-7, too sloppy for hash parity).

Scale notes: these are per-row map expressions (no shuffle, codegen'd);
a 100 TB embedding column streams through them at scan speed. The
Pandas-UDF alternative only wins when batching into BLAS matmuls —
see operators/similarity.py for where that trade is taken.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential fold in element order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (guarded division)."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Σ aᵢ·bᵢ as a flat 64-term expression instead of an array fold.

    Same left-associative accumulation (bit-identical to `dot` and to
    the DuckDB unrolled SQL), but ~10× faster: higher-order functions
    (F.aggregate) evaluate their lambda per element in the interpreter,
    while a flat arithmetic expression stays inside whole-stage codegen.
    Use when the dimension is statically known — the hot N² pair loops.

    Pass column NAMES (possibly qualified) to build the identical tree
    through ONE parsed SQL string — see the construction-cost note on
    the *_expr_spark builders below."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(unrolled_dot_expr_spark(a, b, dim))
    import functools
    import operator

    return functools.reduce(
        operator.add,
        [
            F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
            for i in range(1, dim + 1)
        ],
    )


def dot_unrolled_literal(a: Column | str, vec: list[float]) -> Column:
    """Σ aᵢ·vecᵢ with the second operand as driver-held literals.
    Same per-term values and left-associative order as `dot_unrolled`
    (a float32 element cast to double equals its Python-float literal
    bit-for-bit), but the expression tree halves: no element_at/cast
    pair on the literal side, and no broadcast join to carry the
    query row. For the driver-held-query top-k path. A column NAME
    builds as one parsed string (construction-cost note below)."""
    if isinstance(a, str):
        return F.expr(unrolled_dot_literal_expr_spark(a, vec))
    import functools
    import operator

    return functools.reduce(
        operator.add,
        [
            F.element_at(a, i + 1).cast("double") * F.lit(float(vec[i]))
            for i in range(len(vec))
        ],
    )


def cosine_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Unrolled-codegen cosine, op-order-identical to cosine_sql.
    Column names build as one parsed string (note below)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(cosine_unrolled_expr_spark(a, b, dim))
    d = dot_unrolled(a, b, dim)
    denom = F.sqrt(dot_unrolled(a, a, dim)) * F.sqrt(dot_unrolled(b, b, dim))
    return F.when(denom > 0, d / denom).otherwise(F.lit(0.0))


# ── Spark-SQL string builders (construction-cost tier, r16) ──────────
# The unrolled Column-API trees above cost ~3 py4j round-trips per
# term to CONSTRUCT (dim=64 ⇒ hundreds of driver⇄JVM messages per
# expression; cProfile showed send_command dominating the heavy
# builders). These mirrors emit the SAME tree through one parsed SQL
# string: left-associative `+` chain, identical casts, double literals
# rendered as exact-round-trip repr with the D suffix (Spark parses
# bare decimal literals as DECIMAL — the D is semantic, not style).
# Plans, codegen and result bits are unchanged; only build-time py4j
# chatter goes. Takers pass column NAMES (optionally qualified).
#
# IDENTIFIER-ONLY CONTRACT (ADVICE r16): interpolated names are NOT
# quoted — a name that is not a plain (optionally dot-qualified) SQL
# identifier raises ParseException or resolves wrongly where the old
# Column API accepted it. Every in-repo caller passes repo-controlled
# names (`embedding`, `a.__v3`, ...); callers with user-supplied names
# must backtick-quote them (`` f"`{name}`" ``) before passing. Blanket
# quoting here is not possible: qualified names ("a.__v3") cannot be
# split on "." without corrupting names that contain literal dots.


def _finite_literal(v: float) -> str:
    """Render a float as an exact-round-trip Spark SQL DOUBLE literal.
    Non-finite values have no bare-literal SQL spelling ('infD'/'nanD'
    fail to parse where F.lit produced a valid Double) — refuse loudly
    (ADVICE r16): a NaN/Inf in a query vector or codebook is corrupt
    input, not a scoring request."""
    import math

    if not math.isfinite(v):
        raise ValueError(
            f"non-finite literal {v!r} cannot render as a SQL double; "
            "NaN/Inf in a query vector or codebook is corrupt input"
        )
    return f"{v!r}D"


def unrolled_dot_expr_spark(a: str, b: str, dim: int) -> str:
    """Spark-SQL mirror of dot_unrolled over named columns."""
    return " + ".join(
        f"CAST(element_at({a}, {i}) AS DOUBLE) * CAST(element_at({b}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )


def unrolled_dot_literal_expr_spark(a: str, vec: list[float]) -> str:
    """Spark-SQL mirror of dot_unrolled_literal (driver-held query)."""
    return " + ".join(
        f"CAST(element_at({a}, {i + 1}) AS DOUBLE) * {_finite_literal(float(vec[i]))}"
        for i in range(len(vec))
    )


def cosine_unrolled_expr_spark(a: str, b: str, dim: int) -> str:
    """Spark-SQL mirror of cosine_unrolled (same duplicated-denominator
    shape — codegen's subexpression elimination collapses it in both
    forms)."""
    d = unrolled_dot_expr_spark(a, b, dim)
    na = unrolled_dot_expr_spark(a, a, dim)
    nb = unrolled_dot_expr_spark(b, b, dim)
    return (
        f"CASE WHEN sqrt({na}) * sqrt({nb}) > 0 "
        f"THEN ({d}) / (sqrt({na}) * sqrt({nb})) ELSE 0.0D END"
    )


def pair_dot_expr_spark(a_prefix: str, b_prefix: str, dim: int) -> str:
    """Spark-SQL mirror of the flat pair multiply-add chain
    (Σ a.__vi * b.__vi over flat_normalized columns)."""
    return " + ".join(f"{a_prefix}{i} * {b_prefix}{i}" for i in range(dim))


def unrolled_dot_sql(a: str, b: str, dim: int) -> str:
    """DuckDB mirror of `dot`: explicit left-associative sum so the
    accumulation order (and hence every bit) matches the Spark fold."""
    return "(" + " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1)
    ) + ")"


def cosine_sql(a: str, b: str, dim: int) -> str:
    d = unrolled_dot_sql(a, b, dim)
    na = unrolled_dot_sql(a, a, dim)
    nb = unrolled_dot_sql(b, b, dim)
    return (
        f"(CASE WHEN sqrt({na}) * sqrt({nb}) > 0 "
        f"THEN {d} / (sqrt({na}) * sqrt({nb})) ELSE 0.0 END)"
    )


def round12_decimal_mean(c: Column) -> Column:
    """The certified engine-parity MEAN staging (one definition — the
    kmeans/linreg discipline, extracted by the r13 self-review when a
    third literal copy appeared): inputs round to 12 decimals into
    DECIMAL(22,12) so the sum is exact and accumulation-order-free,
    then divide out as double and round to 12 — bit-identical to the
    round12_decimal_mean_sql mirror on any row order."""
    return F.round(
        F.sum(F.round(c, 12).cast("decimal(22,12)")).cast("double") / F.count("*"),
        12,
    )


def round12_decimal_mean_sql(expr: str) -> str:
    """DuckDB mirror of round12_decimal_mean — same staging, same
    rounds, one definition per engine."""
    return (
        f"round(CAST(sum(CAST(round({expr}, 12) AS DECIMAL(22,12)))"
        f" AS DOUBLE) / count(*), 12)"
    )


def round12_decimal_sum(c: Column) -> Column:
    """round12_decimal_mean without the division — the exact
    order-free SUM staging (power iteration's s-accumulation)."""
    return F.round(F.sum(F.round(c, 12).cast("decimal(22,12)")).cast("double"), 12)


def round12_decimal_sum_sql(expr: str) -> str:
    return (
        f"round(CAST(sum(CAST(round({expr}, 12) AS DECIMAL(22,12)))"
        f" AS DOUBLE), 12)"
    )


def flat_normalized(
    emb,
    id_alias: str,
    prefix: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry: tuple[str, ...] = (),
):
    """Unit-normalize (norm bound ONCE as a column; zero-norm rows
    dropped), then unpack into `dim` scalar columns — pair scoring
    downstream is plain column arithmetic on UnsafeRow fields,
    measured ~4× faster than element_at() inside an N² projection.
    The ONE normalize+flatten builder shared by the batch all-pairs
    queries (queries/simops) and the streaming SemDeDup ingest sink,
    so their rounded dots can never drift apart. `carry` forwards
    per-row columns (e.g. a cell assignment) through the projection."""
    n = (
        emb.withColumn("__n", norm(F.col(vec_col)))
        .where(F.col("__n") > 0)
        .select(
            F.col(id_col).alias(id_alias),
            *carry,
            F.transform(
                vec_col, lambda x: x.cast("double") / F.col("__n")
            ).alias("__v"),
        )
    )
    # selectExpr: the dim-column unpack as parsed strings — one py4j
    # call instead of 2×dim (`__v[i]` is the same 0-based GetArrayItem
    # as Column.__getitem__); id_alias/carry are names, so they pass
    # through the parser unchanged.
    return n.selectExpr(
        id_alias,
        *carry,
        *[f"__v[{i}] as {prefix}{i}" for i in range(dim)],
    )
