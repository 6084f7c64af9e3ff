"""UDF surface (SURVEY.md §2.10, U1-U4).

The engine's canonical implementations are native expressions
(functions.scalar); these UDF forms exist for capability parity with the
reference and as the template for genuinely-Python logic. Preference order
at scale: native expr ≫ pandas_udf (Arrow-vectorized) ≫ row-at-a-time udf
(kept only as the U1/U2 demo — it pays per-row serialization and blocks
predicate pushdown through it).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_weekend(dow):
    # U1 — row-at-a-time Python UDF exactly as the reference defines it
    # (spark_jobs/03a_engineer_features.py:27-36): 1 if dow∈{1,7} under the
    # Spark dayofweek convention.
    if dow is None:
        return None
    return 1 if dow in (1, 7) else 0


is_weekend_udf = F.udf(_is_weekend, T.IntegerType())


def _bucket_distance(miles):
    # No type hints: an annotated signature makes F.udf try (and fail) to
    # infer the eval type from them, warning on every catalog import.
    # U2's exact semantics incl. None→'<1mi' (spark_jobs/05c_make_report.py:27-36)
    if miles is None:
        return "<1mi"
    if miles >= 10:
        return ">=10mi"
    if miles >= 5:
        return "5-10mi"
    if miles >= 2:
        return "2-5mi"
    if miles >= 1:
        return "1-2mi"
    return "<1mi"


bucket_distance_udf = F.udf(_bucket_distance, T.StringType())


@F.pandas_udf(T.DoubleType())
def fare_per_mile_pandas(fare: pd.Series, distance: pd.Series) -> pd.Series:
    """Arrow-vectorized scalar pandas UDF (the fast Python path): guarded
    division matching functions.scalar.guarded_div."""
    out = fare / distance
    out[~(distance > 0)] = None
    return out


def _spread_groups(df: DataFrame, group_col: str) -> DataFrame:
    """Hash-partition a grouped-map input to cluster width, pinned against
    AQE coalescing.

    A grouped Python map is priced per ROW of Python work, not per shuffled
    byte — but AQE's partition coalescing sizes the exchange by bytes, so a
    small-by-bytes input collapses to one post-shuffle partition and every
    group runs serially through a single Python worker (measured 4.4 s vs
    1.1 s on the 1500-group events table). An explicit repartition on the
    group key at ``defaultParallelism`` satisfies the grouped-map clustering
    requirement (so no second exchange is inserted) and, being user-
    specified, is exempt from coalescing. Width follows the session's core
    count, not a constant; on a real cluster defaultParallelism is total
    executor cores, the same width the shuffle would get anyway.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target, group_col)


def center_values_per_group(
    df: DataFrame,
    group_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """U4 — grouped-map applyInPandas: subtract the group mean from each row.

    The mean is computed over exact integer cents (int64), so the result is
    independent of the row order pandas happens to receive — the property
    that makes this UDAF-style op oracle-checkable.
    """
    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField(group_col, T.LongType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("centered", T.DoubleType()),
        ]
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        # keep only FINITE cents before the int cast: a NULL/NaN/Inf value
        # would IntCastingNaNError the whole job; skipping them mirrors the
        # engine's dirty-data contract (exact.py::_cents -> NULL, SQL SUM
        # skips NULLs, COUNT(*) keeps the full denominator, and the dirty
        # row's centered value stays NULL through NaN arithmetic)
        raw = pdf[value_col] * 100
        cents = raw[np.isfinite(raw)].round().astype("int64")
        if len(cents) == 0:
            # all-dirty group: SQL SUM is NULL, so the oracle's centered
            # column is NULL — mirror it instead of fabricating mean=0
            # (Inf - 0 would even surface as a spurious Inf "centered")
            centered = pd.Series([None] * len(pdf), dtype="float64")
        else:
            mean = float(cents.sum()) / 100.0 / len(pdf)
            centered = pdf[value_col] - mean
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                group_col: pdf[group_col],
                value_col: pdf[value_col],
                "centered": centered,
            }
        )

    return (
        _spread_groups(df.select("event_id", group_col, value_col), group_col)
        .groupBy(group_col)
        .applyInPandas(center, out_schema)
    )


def center_values_per_group_arrow(
    df: DataFrame,
    group_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """The applyInArrow twin of :func:`center_values_per_group` — the
    grouped-map batch arrives as a ``pyarrow.Table`` and the arithmetic
    runs in Arrow compute kernels, skipping the Arrow→pandas→Arrow
    conversion the pandas form pays on both edges of every group. Same
    exact-integer-cents mean, so both forms (and the SQL window twin)
    are bit-identical regardless of batch row order."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField(group_col, T.LongType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("centered", T.DoubleType()),
        ]
    )

    def center(table: pa.Table) -> pa.Table:
        values = table.column(value_col)
        cents = pc.round(pc.multiply(values, pa.scalar(100.0)))
        # non-finite cents -> NULL before the int cast (Arrow raises on
        # NaN/Inf->int64); pc.sum skips NULLs like SQL SUM
        cents = pc.if_else(pc.is_finite(cents), cents, pa.scalar(None, pa.float64()))
        total = pc.sum(pc.cast(cents, pa.int64())).as_py()
        if total is None:
            # all-dirty group: SQL SUM is NULL, so the oracle's centered
            # column is NULL — mirror it instead of fabricating mean=0
            centered = pa.nulls(table.num_rows, pa.float64())
        else:
            mean = float(total) / 100.0 / max(table.num_rows, 1)
            centered = pc.subtract(values, pa.scalar(mean))
        return pa.table(
            {
                "event_id": table.column("event_id"),
                group_col: table.column(group_col),
                value_col: values,
                "centered": centered,
            }
        )

    return (
        _spread_groups(df.select("event_id", group_col, value_col), group_col)
        .groupBy(group_col)
        .applyInArrow(center, out_schema)
    )


def add_running_index(
    df: DataFrame, order_col: str, index_col: str = "idx"
) -> DataFrame:
    """U3's general form — mapInPandas per-partition batch transform: a
    global 0-based running index in ``order_col`` order, the distributed
    two-pass twin of ``row_number() OVER (ORDER BY order_col) - 1`` WITHOUT
    its single-partition window.

    Pass 1: range-repartition on the key + sort within partitions, then one
    narrow per-partition count; the cumulative offsets collected to the
    driver are ``numPartitions`` longs — bounded state, not data. Pass 2:
    mapInPandas stamps ``offset[pid] + local position`` per Arrow batch.
    The frame is persisted between the two passes so both jobs read the
    same shuffle output (partition layout pinned; at cluster scale a
    checkpoint to reliable storage serves the same purpose). Ties in
    ``order_col`` receive an arbitrary-but-consistent order, exactly like
    the window form.
    """
    from pyspark import StorageLevel, TaskContext

    part = df.repartitionByRange(order_col).sortWithinPartitions(order_col)
    part = part.persist(StorageLevel.MEMORY_AND_DISK)
    counts = (
        part.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    )  # bounded: one row per partition
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["pid"]):
        offsets[int(r["pid"])] = acc
        acc += int(r["count"])

    out_schema = T.StructType(part.schema.fields + [T.StructField(index_col, T.LongType())])

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        base = offsets.get(ctx.partitionId() if ctx else 0, 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf[index_col] = np.arange(base + seen, base + seen + len(pdf), dtype="int64")
            seen += len(pdf)
            yield pdf

    return part.mapInPandas(stamp, out_schema)


def make_tokenize_udtf():
    """Python UDTF (table function): one text in, one row PER TOKEN out
    with its position — the §2.10 U4 table-function surface (Spark 4's
    ``@udtf``), completing the UDF family next to scalar/pandas/grouped
    forms. Tokenization is ``re.split(r'\\s+', ...)`` to stay semantically
    identical to the native `tokens()` expression and the DuckDB
    ``string_split_regex`` twin. Like every Python UDF here this is the
    demo path — the native twin (posexplode of split) is what belongs in a
    100 TB plan."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, idx: int")
    class Tokenize:
        def eval(self, text: str):
            import re

            if text is not None:
                for i, tok in enumerate(re.split(r"\s+", text)):
                    yield tok, i

    return Tokenize
