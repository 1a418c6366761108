"""Skew-mitigation join helpers.

AQE's skew-join (enabled in the session factory) splits oversized
shuffle partitions at runtime and is the right default. Salting is the
*planned* alternative for the cases AQE cannot fix: a single hot key
whose rows exceed one task's memory even after splitting (AQE splits a
partition's files/ranges, but one key's rows still co-locate on the
build side), or a broadcast-too-big dimension joined on a power-law key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    *,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with the hot-key shuffle split across ``salt_buckets``.

    The fact (``left``) side gets a deterministic salt derived from a
    non-key column-free hash of its whole row partition id — here we use
    a uniform salt from ``monotonically_increasing_id`` masked to the
    bucket count, which is allowed because the salt only has to spread
    rows, not be stable across runs. The ``right`` side is exploded
    ``salt_buckets``× so every (key, salt) pair finds its match —
    classic replicate-the-small-side salting. Output equals the plain
    join exactly (proved by the ``j8_salted_join`` oracle).

    Cost model: right side inflates ×buckets (keep it the smaller
    side); the shuffle key becomes (key, salt) so one hot key spreads
    over ``salt_buckets`` tasks.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt = (F.monotonically_increasing_id() % salt_buckets).cast("int")
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return l_salted.join(r_salted, on=[*keys, "__salt"], how=how).drop("__salt")
