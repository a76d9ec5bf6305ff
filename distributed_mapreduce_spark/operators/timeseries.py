"""Sequential time-series operators that SQL windows cannot express —
per-key ordered folds with state, run as Arrow-batched per-group
pandas (the pack_greedy pattern), graded against DuckDB recursive-CTE
replays of the identical recurrence.

EWMA: y₀ = x₀; yₜ = α·xₜ + (1−α)·yₜ₋₁ — the exponential smoothing
every monitoring/forecast pipeline runs. The recurrence is a chain of
IEEE multiply/add with a literal α, evaluated in the SAME order by the
Python loop and the oracle's recursive CTE, so results are bit-exact
cross-engine with no rounding discipline at all (each step is two
multiplies and one add on identical doubles — no reassociation
anywhere). Guarded by ✓test vs DuckDB and a closed-form unit test.

Scale shape: one shuffle on the key; each group folds locally in
Arrow batches (state = one double per key, rows stream through);
group size bounds memory, not group count. The 100 TB version is the
same code — EWMA of a century of per-entity history is still a
per-entity scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

EWMA_ALPHA = 0.1


def ewma_last(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
    alpha: float = EWMA_ALPHA,
) -> DataFrame:
    """Per-key EWMA over `value` in `order`; returns one row per key:
    (key, n_obs, last_value, ewma) — the smoothed current level."""
    import pandas as pd

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order, kind="stable")
        y = None
        for x in pdf[value]:
            x = float(x)
            y = x if y is None else alpha * x + (1.0 - alpha) * y
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n_obs": [len(pdf)],
                "last_value": [float(pdf[value].iloc[-1])],
                "ewma": [y],
            }
        )

    # Key type is taken from the input schema (ADVICE r5): hardcoding
    # bigint made this generic operator fail (or corrupt) on
    # string/date/other key types.
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(key, df.schema[key].dataType),
            StructField("n_obs", LongType()),
            StructField("last_value", DoubleType()),
            StructField("ewma", DoubleType()),
        ]
    )
    return df.select(key, *order, value).groupBy(key).applyInPandas(fold, out_schema)


def ewma_sql(
    table_sql: str,
    key: str,
    order_sql: str,
    value: str,
    alpha: float = EWMA_ALPHA,
) -> str:
    """DuckDB recursive-CTE replay of ewma_last: same recurrence, same
    operand order (alpha*x + (1-alpha)*y with literal alpha)."""
    return f"""
        WITH RECURSIVE src AS (
            SELECT {key} AS k, {value} AS x,
                   row_number() OVER (PARTITION BY {key} ORDER BY {order_sql}) AS rn,
                   count(*) OVER (PARTITION BY {key}) AS n
            FROM ({table_sql})
        ),
        fold AS (
            SELECT k, rn, n, x, CAST(x AS DOUBLE) AS y FROM src WHERE rn = 1
            UNION ALL
            SELECT s.k, s.rn, s.n, s.x,
                   {alpha} * CAST(s.x AS DOUBLE) + (1.0 - {alpha}) * f.y
            FROM src s JOIN fold f ON s.k = f.k AND s.rn = f.rn + 1
        )
        SELECT k AS {key},
               CAST(n AS BIGINT) AS n_obs,
               CAST(x AS DOUBLE) AS last_value,
               y AS ewma
        FROM fold WHERE rn = n
    """
