"""Multimodal (binary) columns: schema, plumbing, and feature extraction.

Images/audio/video are modeled as opaque ``binary`` content plus typed
metadata — the layout a 100 TB multimodal training pipeline uses (content
in parquet binary columns or object-store refs, metadata queryable).

The Spark-side plumbing is real and tested: binary columns flow through
``mapInPandas`` in Arrow batches, features come back as typed columns.
The actual media *decoding* is stubbed (no image/audio libraries in this
container): ``decode_stub`` raises NotImplementedError unless the
deterministic fake decoder is requested, which derives pseudo
width/height/duration from the content hash so every downstream stage is
exercisable and oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video | blob
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("declared_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media content — gives the
    binary-column pipeline a deterministic corpus without media files.

    NULL payloads are filtered here: a row whose blob is missing is an
    ingest defect with nothing to decode, and letting a None reach the
    Arrow batches would crash every downstream mapInPandas on
    md5(None)/len(None) (the degenerate-row sweep pins this). The oracles
    carry the same ``text IS NOT NULL`` predicate."""
    docs = docs.filter(F.col("text").isNotNull())
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("blob").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").alias("declared_bytes"),
        ).alias("meta"),
    )


def _dims_from_digest(h: bytes) -> tuple[int, int]:
    return 16 + h[0] % 240, 16 + h[1] % 240


def decode_stub(content: bytes, kind: str, fake: bool = True) -> tuple[int, int]:
    """STUB decoder. Real image/audio decode libraries are not available in
    this environment; with ``fake=True`` it derives deterministic pseudo
    dimensions from the content hash (so plumbing and oracles are real),
    otherwise it raises — marking exactly where a real codec plugs in.
    """
    if not fake:
        raise NotImplementedError(
            f"no codec for kind={kind!r} in this environment; "
            "plug a real decoder in here"
        )
    return _dims_from_digest(hashlib.md5(content).digest())


def extract_features(media: DataFrame, batch_fake_decode: bool = True) -> DataFrame:
    """Binary→features via mapInPandas: Arrow batches of binary content in,
    typed feature rows out — the production shape for media feature
    extraction (decode/resize/frame-sample all live in this iterator).

    Only the three columns the function reads cross the Python boundary
    (an opaque map ships — and reads from storage — every column it is
    handed, so the unused ``meta`` struct was pure Arrow-transfer tax),
    and the content hash is computed ONCE per row: the stub decode and
    the checksum both derive from the same md5 digest, exactly as a real
    pipeline would decode one buffer once."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf["content"]
            if batch_fake_decode:
                digests = [hashlib.md5(c).digest() for c in contents]
                dims = [_dims_from_digest(h) for h in digests]
                checksums = [h.hex() for h in digests]
            else:  # the real-codec plug point: decode decides dimensions
                dims = [
                    decode_stub(c, k, fake=False)
                    for c, k in zip(contents, pdf["kind"])
                ]
                checksums = [hashlib.md5(c).hexdigest() for c in contents]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) for c in contents],
                    "checksum": checksums,
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        run, FEATURE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_offset_ms", T.LongType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, fps_ms: int = 40) -> DataFrame:
    """Frame sampling: one binary blob in, N frame rows out — the
    row-EXPANDING mapInPandas shape (decode → per-frame emit) that video
    pipelines need, vs extract_features' 1:1 shape.

    Partitioning: frames inherit the content row's partition — no shuffle;
    a downstream per-frame stage (e.g. an embedding UDF) sees Arrow batches
    of frames without a repartition. Frame count and checksums are derived
    deterministically from the content bytes (stub decoder discipline, see
    module docstring): n_frames = 1 + n_bytes % 4, frame i's checksum =
    md5(content || '|' || i) — reproducible by any engine for the oracle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids: list[int] = []
            idxs: list[int] = []
            offs: list[int] = []
            sums: list[str] = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = 1 + len(content) % 4
                for i in range(n):
                    mids.append(mid)
                    idxs.append(i)
                    offs.append(i * fps_ms)
                    sums.append(
                        hashlib.md5(content + b"|" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_offset_ms": pd.Series(offs, dtype="int64"),
                    "frame_checksum": pd.Series(sums, dtype="object"),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def with_resize_plan(features: DataFrame, target: int = 224) -> DataFrame:
    """Resize planning over extracted features: fit each media's (w, h)
    into a target×target box preserving aspect ratio. The TARGET geometry
    is pure column arithmetic (scale = target / max side, half-up floor
    rounding — the engine-portable idiom); the pixel resample itself is
    the stubbed codec step, exactly like decode. Keeping plan (cheap,
    JVM-side, oracle-checkable) separate from execution (Python, batched)
    is the production split: the plan can be pushed to a metadata-only
    pass, and only the batches that actually change size enter the UDF."""
    scale = F.lit(float(target)) / F.greatest("fake_width", "fake_height").cast(
        "double"
    )
    return features.select(
        "media_id",
        "fake_width",
        "fake_height",
        F.floor(F.col("fake_width").cast("double") * scale + F.lit(0.5))
        .cast("int")
        .alias("out_width"),
        F.floor(F.col("fake_height").cast("double") * scale + F.lit(0.5))
        .cast("int")
        .alias("out_height"),
        (F.greatest("fake_width", "fake_height") > target).alias("needs_resample"),
    )
