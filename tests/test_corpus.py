"""Corpus-assembly operators (operators/corpus.py): packing, mixture
sampling, frequency capping, Gopher rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.operators.corpus import (
    DOMAIN_CAP,
    PACK_BUDGET,
    cap_per_domain,
    gopher_flags,
    with_mixture_keep,
    with_pack_bins,
)
from nyc_taxi_pyspark_spark.sources.io import load_table

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_pack_bins_offset_invariants(spark):
    packed = with_pack_bins(_docs(spark)).select(
        "lang", "doc_id", "n_tokens", "pack_offset", "pack_bin"
    )
    rows = packed.orderBy("lang", "doc_id").collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for docs in by_lang.values():
        # Exclusive running sum: each offset is the previous offset + tokens.
        assert docs[0].pack_offset == 0
        for prev, cur in zip(docs, docs[1:]):
            assert cur.pack_offset == prev.pack_offset + prev.n_tokens
        for r in docs:
            assert r.pack_bin == r.pack_offset // PACK_BUDGET


def test_pack_bins_conserve_tokens(spark):
    packed = with_pack_bins(_docs(spark))
    total = packed.agg(F.sum("n_tokens")).first()[0]
    binned = (
        packed.groupBy("lang", "pack_bin")
        .agg(F.sum("n_tokens").alias("t"))
        .agg(F.sum("t"))
        .first()[0]
    )
    assert binned == total


def test_two_tier_rejoin_keeps_null_shard_rows(spark):
    """The r13 two-tier re-plans rejoin the cell offsets instead of
    windowing by shard alone; the rejoin must be NULL-SAFE because the
    window form kept NULL-shard rows as their own partition (the r13
    dirty-parity audit caught a plain equi-join dropping the NULL-lang
    fixture doc)."""
    rows = [
        (1, "a b c", None, "s1"),
        (2, "d e", None, "s1"),
        (3, "f g h i", "en", None),
        (4, "j", "en", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string"
    )
    packed = with_pack_bins(df)
    assert packed.count() == 4  # no row lost to the rejoin
    nulls = {
        r.doc_id: r.pack_offset
        for r in packed.filter(F.col("lang").isNull()).collect()
    }
    assert nulls == {1: 0, 2: 3}  # NULL lang is one shard, offsets exact
    capped = cap_per_domain(df)
    assert capped.count() == 4
    null_ranks = sorted(
        r.domain_rank for r in capped.filter(F.col("source").isNull()).collect()
    )
    assert null_ranks == [1, 2]  # NULL domain ranked as one group


def test_mixture_keep_deterministic_and_weighted(spark):
    d = _docs(spark)
    a = with_mixture_keep(d).select("doc_id", "mix_keep").collect()
    b = with_mixture_keep(d).select("doc_id", "mix_keep").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # weight 1.0 ⇒ every en doc kept; weight 0 default ⇒ unknown lang dropped.
    en = with_mixture_keep(d).filter("lang = 'en'")
    assert en.filter(~F.col("mix_keep")).count() == 0
    unknown = with_mixture_keep(d.withColumn("lang", F.lit("xx")))
    assert unknown.filter(F.col("mix_keep")).count() == 0


def test_cap_per_domain(spark):
    capped = cap_per_domain(_docs(spark))
    per_src = (
        capped.filter("cap_keep")
        .groupBy("source")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_src <= DOMAIN_CAP
    # Deterministic: the kept id set is stable across runs.
    kept1 = {r.doc_id for r in capped.filter("cap_keep").select("doc_id").collect()}
    kept2 = {
        r.doc_id
        for r in cap_per_domain(_docs(spark)).filter("cap_keep").select("doc_id").collect()
    }
    assert kept1 == kept2


def test_gopher_keep_implies_all_flags(spark):
    flagged = gopher_flags(_docs(spark))
    bad = flagged.filter(
        F.col("gopher_keep")
        & ~(
            F.col("flag_tokens")
            & F.col("flag_mean_len")
            & F.col("flag_short_words")
            & F.col("flag_stopwords")
        )
    )
    assert bad.count() == 0
    # Thresholds are calibrated to discriminate on this corpus: both kept
    # and rejected documents exist.
    kept = flagged.filter("gopher_keep").count()
    assert 0 < kept < flagged.count()


def test_chunk_dedup_flags_copied_prefix(spark):
    from nyc_taxi_pyspark_spark.operators.corpus import CHUNK_TOKENS, chunk_dedup

    words_a = [f"w{i}" for i in range(3 * CHUNK_TOKENS)]
    # B copies A's first two chunks verbatim, then a unique tail chunk.
    words_b = words_a[: 2 * CHUNK_TOKENS] + [f"u{i}" for i in range(CHUNK_TOKENS)]
    df = spark.createDataFrame(
        [(1, " ".join(words_a)), (2, " ".join(words_b))], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in chunk_dedup(df).collect()}
    assert rows[1].n_dup_chunks == 0
    assert rows[1].kept_tokens == 3 * CHUNK_TOKENS
    assert rows[2].n_dup_chunks == 2
    assert rows[2].kept_tokens == CHUNK_TOKENS


def test_chunk_dedup_within_doc_repeat(spark):
    from nyc_taxi_pyspark_spark.operators.corpus import CHUNK_TOKENS, chunk_dedup

    chunk = [f"r{i}" for i in range(CHUNK_TOKENS)]
    df = spark.createDataFrame(
        [(7, " ".join(chunk + chunk))], ["doc_id", "text"]
    )
    row = chunk_dedup(df).collect()[0]
    assert row.n_chunks == 2 and row.n_dup_chunks == 1
    assert row.kept_tokens == CHUNK_TOKENS


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    from nyc_taxi_pyspark_spark.catalog import QUERIES

    # Strictly-greater-than-30-min gap starts a new session: events at
    # +0, +10min, +40min stay ONE session (40-10 = exactly 1800s), while
    # +40min → +71min (1860s) splits.
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 10, "click", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=40), 10, "view", 0.0, "{}"),
        (4, t0 + dt.timedelta(minutes=71), 10, "purchase", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    ev.createOrReplaceTempView("___ev")
    import nyc_taxi_pyspark_spark.catalog.events as events_mod
    from unittest import mock

    with mock.patch.object(events_mod, "load_table", lambda s, d, n: ev):
        out = QUERIES["events_sessionize"](spark, "ignored").collect()
    sessions = sorted((r.sess_id, r.n_events) for r in out)
    assert sessions == [(1, 3), (2, 1)]


def test_nested_samples_are_subsets(spark):
    """The r-permille bucket rule gives subset-monotone samples: every doc
    in the 1% sample is in the 5%, every 5% doc in the 25%."""
    from pyspark.sql import functions as F

    from nyc_taxi_pyspark_spark.operators.corpus import _hash_bucket
    from nyc_taxi_pyspark_spark.sources.io import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", _hash_bucket("doc_id", 1000).alias("b")
    )
    counts = d.agg(
        F.sum((F.col("b") < 10).cast("int")).alias("p1"),
        F.sum((F.col("b") < 50).cast("int")).alias("p5"),
        F.sum((F.col("b") < 250).cast("int")).alias("p25"),
        F.count("*").alias("n"),
    ).first()
    assert 0 < counts.p1 <= counts.p5 <= counts.p25 <= counts.n
    # subset property is structural (b<10 implies b<50); spot-check the ids
    ids1 = {r.doc_id for r in d.filter("b < 10").collect()}
    ids5 = {r.doc_id for r in d.filter("b < 50").collect()}
    assert ids1 <= ids5


def test_corpus_budget_select_degenerate_no_bucket_fits(spark, tmp_path):
    # Every doc has fully-distinct tokens -> one q_permille=1000 bucket
    # holding 100% of tokens, which alone exceeds the 25% budget: nothing
    # is selectable. The query must still emit ONE summary row with
    # threshold 1001 and zeroed counts (mirroring its oracle's LEFT JOIN
    # shape), not an empty frame (ADVICE r7, catalog/corpus.py:473).
    import pandas as pd

    from nyc_taxi_pyspark_spark.catalog.corpus import corpus_budget_select

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b c", "d e f"],
            "lang": ["en", "en"],
            "source": ["web", "web"],
            "n_chars": [5, 5],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    rows = corpus_budget_select(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["threshold_permille"] == 1001
    assert r["n_selected"] == 0
    assert r["tokens_selected"] == 0
    assert r["total_tokens"] == 6
    assert r["token_budget"] == 1


def test_token_allocation_sums_to_budget_and_largest_remainder(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from nyc_taxi_pyspark_spark.catalog.corpus import (
        _ALLOC_BUDGET,
        corpus_token_allocation,
    )

    # crafted masses: 3/6/9 tokens over budget -> fractional shares force
    # one remainder unit; ties broken by source name
    texts = [("srcA", "a b c"), ("srcB", "d e f g h i"),
             ("srcC", "j k l m n o p q r")]
    d = tmp_path / "alloc"
    d.mkdir()
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array([t for _, t in texts]),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array([s for s, _ in texts]),
        "n_chars": pa.array([len(t) for _, t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    rows = corpus_token_allocation(spark, str(d)).collect()
    alloc = {r["source"]: r["alloc_tokens"] for r in rows}
    # exact-sum contract: allocations sum to the budget exactly
    assert sum(alloc.values()) == _ALLOC_BUDGET
    # proportionality: 3/18, 6/18, 9/18 of 10M = 1666666.67/3333333.3/5M
    assert alloc["srcC"] == 5_000_000
    assert alloc["srcA"] + alloc["srcB"] == 5_000_000
    assert abs(alloc["srcA"] - _ALLOC_BUDGET * 3 // 18) <= 1
    assert abs(alloc["srcB"] - _ALLOC_BUDGET * 6 // 18) <= 1
    # real-data contract at sf0.001: still sums exactly
    rows = corpus_token_allocation(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["alloc_tokens"] for r in rows) == _ALLOC_BUDGET
