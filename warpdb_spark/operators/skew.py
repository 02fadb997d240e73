"""Skew mitigation for hot join keys (100 TB stance).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in our session) handles most skew at runtime. ``salted_join``
is the explicit fallback for the pathological case AQE can't fix: a
single key so hot that even a split partition's build side is too big —
the left side's hot keys are sharded across ``salt`` sub-keys and the
right side is replicated ``salt`` times per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted: left rows scatter uniformly
    over ``salt`` shards of their key; right rows replicate to every
    shard. Correct for inner/left joins on a many-to-one relationship
    (right unique per key). Replication factor = ``salt`` on the right
    side only — size accordingly (small-to-medium right sides).
    """
    salted_left = left.withColumn(
        "__salt", (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salt).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")
