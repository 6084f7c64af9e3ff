"""Record linkage: edit-distance matching without a cartesian product.

The blocking trick is the pigeonhole principle over POSITION bands: split a
fixed-width key into ``d_max + 1`` position groups; two strings within
Hamming distance ``d_max`` must agree on at least one whole group, so an
equi-join on (band_idx, band_value) finds every true match and only
near-collisions — the same band-join shape as the MinHash/SimHash near-dup
operators, applied to identifiers instead of documents.

Bands take every ``n_bands``-th character (stride layout) rather than
consecutive runs: zero-padded numeric ids share long constant prefixes, and
consecutive-run bands would put the entire table into one bucket. Stride
bands mix high- and low-variance positions into every band, keeping bucket
sizes near ``n / alphabet^(width/n_bands)``. At 100 TB this is a plain
shuffle join on small composite keys; no pair enumeration ever exceeds the
per-bucket candidate set, and AQE's skew split handles any residual hot
band.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hamming(a: Column, b: Column, width: int) -> Column:
    """Number of differing positions between two equal-width strings —
    a codegen'd sum of per-position comparisons (no UDF)."""
    return reduce(
        lambda acc, i: acc
        + F.when(
            F.substring(a, i + 1, 1) != F.substring(b, i + 1, 1), 1
        ).otherwise(0),
        range(width),
        F.lit(0),
    )


def stride_bands(key: Column, width: int, n_bands: int) -> Column:
    """Array of (band_idx, band_val) structs; band ``i`` concatenates
    characters at positions i, i+n_bands, i+2*n_bands, ... (1-based)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.concat(
                    *[
                        F.substring(key, p + 1, 1)
                        for p in range(i, width, n_bands)
                    ]
                ).alias("band_val"),
            )
            for i in range(n_bands)
        ]
    )


def fuzzy_self_matches(
    df: DataFrame,
    id_col: str,
    key: Column,
    width: int,
    max_dist: int,
) -> DataFrame:
    """All id pairs (id_a < id_b) whose fixed-width keys are within Hamming
    distance ``max_dist``, via exact pigeonhole banding (``max_dist + 1``
    stride bands -> guaranteed recall, no cartesian).

    Returns (id_a, id_b, n_diff).
    """
    n_bands = max_dist + 1
    keyed = df.select(
        F.col(id_col).alias("__id"), key.alias("__key")
    ).where(F.length(key) == width)
    banded = keyed.select(
        "__id", "__key", F.explode(stride_bands(F.col("__key"), width, n_bands)).alias("b")
    ).select("__id", "__key", "b.band_idx", "b.band_val")
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_val") == F.col("r.band_val"),
                F.col("l.__id") < F.col("r.__id"),
            ],
        )
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.col("l.__key").alias("key_a"),
            F.col("r.__key").alias("key_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn(
            "n_diff", hamming(F.col("key_a"), F.col("key_b"), width)
        )
        .where(F.col("n_diff") <= max_dist)
        .select("id_a", "id_b", "n_diff")
    )
