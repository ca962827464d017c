"""Round-9 additions: deepened in-engine gradient boosting (4 rounds),
plus the round's new operator waves.

Registered AFTER q14_round8 (registry/__init__.py import order) so the
existing ``queries()`` tail stays byte-stable.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from ._core import _REGISTRY, _t, register  # noqa: F401

from .q14_round8 import _gbdt_oracle


@register("gbdt_deep_boost", _gbdt_oracle(rounds=4))
def q_gbdt_deep_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOUR-round gradient boosting trained in-engine, exactly (VERDICT
    r8 #7 — deepen the gbdt_stump_boost family): same forward-stagewise
    stump algebra over (hour, weekday, day-index) on integer-cents event
    values, twice the additive depth. The integer-residual invariant
    makes depth free: residuals stay BIGINT through every round, so the
    round-4 leaf values are exactly as oracle-able as round-1's, and the
    oracle generator just unrolls two more MATERIALIZED CTE blocks.
    Train MSE is emitted for all five stages and is provably
    non-increasing (the monotone invariant that caught r8's
    threshold-grid duplication bug — now watching twice the trajectory).
    Scale shape unchanged: one stack+histogram pass per round, O(rows),
    split params are 1-row driver scalars."""
    from pyspark.sql import functions as F

    from ..ml import linear

    ev = _t(spark, sf_dir, "events")
    wide = ev.where(F.col("value").isNotNull()).select(
        F.expr("CAST(floor(value * CAST(100 AS DOUBLE)) AS BIGINT)").alias(
            "y"
        ),
        F.hour("ts").cast("long").alias("f1"),
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') % 7 AS BIGINT)"
        ).alias("f2"),
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("f3"),
    )
    return linear.gbdt_stump_rounds(
        wide, feature_cols=["f1", "f2", "f3"], rounds=4
    )
