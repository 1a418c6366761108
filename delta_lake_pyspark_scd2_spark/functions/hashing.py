"""The engine-portable content-hash primitive, in ONE place.

Several operators need a deterministic pseudo-random value per row
that is reproducible on any cluster shape AND bit-compatible with the
DuckDB oracle expression::

    ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT

Deterministic sampling (`sample_hash`, classifier ``sample_frac``),
mixture resampling thresholds, and shard dealing all build on it —
keeping the cross-engine contract here means a change (e.g. widening
the prefix) cannot silently desynchronize one copy from the others'
oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Value range of the 8-hex-char prefix: [0, 16**8).
PREFIX_SPACE = 16**8


def md5_prefix_long(col: Column) -> Column:
    """First 8 md5 hex chars of the stringified column as a long in
    ``[0, PREFIX_SPACE)`` — uniform, deterministic, engine-portable."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
    )


def keep_hash(col: Column, mod: int) -> Column:
    """``md5_prefix_long % mod`` — the threshold form used by mixture
    resampling (compare against ``share * mod``)."""
    return md5_prefix_long(col) % mod


def uniform_draw(col: Column) -> Column:
    """The hash as a uniform draw in ``[0, 1)`` — the fraction form
    used by deterministic sampling predicates."""
    return md5_prefix_long(col).cast("double") / F.lit(float(PREFIX_SPACE))
