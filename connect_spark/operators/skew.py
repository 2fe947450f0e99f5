"""Skew-handling join (SCALE.md skew section): explicit salting for
hot keys when AQE's runtime skew splitting isn't available (streaming)
or when the hot side must pre-aggregate.

Pattern: replicate the small/dimension side `salt_factor`× with an
explicit salt column; the big side assigns each row a random salt in
[0, salt_factor). The join key becomes (key, salt) — a single hot key
spreads over `salt_factor` shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_factor: int = 8,
) -> DataFrame:
    """Equi-join resilient to hot keys in `big`. Result equals
    `big.join(small, on, how)` exactly; only the physical distribution
    changes."""
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            "salted_join replicates the small side across salts, which "
            "is only result-identical for inner/left joins; "
            f"how={how!r} (right/full outer) would emit duplicate or "
            "spurious null-extended small-side rows — use a plain join"
        )
    salted_big = big.withColumn(
        "_salt", (F.rand() * salt_factor).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return salted_big.join(
        salted_small, on=[on, "_salt"], how=how
    ).drop("_salt")
