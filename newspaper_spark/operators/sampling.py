"""Deterministic sampling operators for training-data pipelines.

Both samplers decide membership from a hash of the ROW KEY, never from
an RNG: the sample is reproducible run-to-run, stable under
repartitioning, cheap at any scale (pure map, no coordination), and
exactly reconstructable by the DuckDB oracle. This is the standard
web-corpus design (e.g. keep-if hash(url)/2^k < rate) — a
`rand()`-based sample would be nondeterministic across retries and
unverifiable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hash → uniform [0, 1): first 8 md5 hex chars as a 32-bit integer.
#: DuckDB mirror: ('0x' || substring(md5(key || ':' || salt), 1, 8))::BIGINT
#: / 4294967296.0
def _hash_unit(key_col, salt: str):
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", key_col, F.lit(salt))), 1, 8), 16, 10
    ).cast("long")
    return h / F.lit(float(1 << 32))


def sample_fraction(
    df: DataFrame, fraction: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~`fraction` of rows by key hash."""
    return df.filter(_hash_unit(F.col(key_col).cast("string"), salt) < fraction)


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling: row kept iff
    hash(key) / 2^32 < fractions[stratum] (strata absent from the map
    get ``default_fraction``). One map-side filter — no shuffle, no
    per-stratum count job — so rebalancing a 100 TB corpus by language
    or source is a single scan."""
    frac = F.lit(float(default_fraction))
    for stratum, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == stratum, float(f)).otherwise(frac)
    return df.filter(_hash_unit(F.col(key_col).cast("string"), salt) < frac)
