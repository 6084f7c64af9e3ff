"""Corpus-assembly operators for LLM training-data pipelines.

The dedup/quality/split stages live in :mod:`~nyc_taxi_pyspark_spark.operators.text`;
this module adds the stages that turn a cleaned document pool into an actual
training mixture:

- **sequence packing** (:func:`with_pack_bins`) — lay documents end-to-end and
  assign each to the fixed-size context window its first token lands in,
- **domain mixture sampling** (:func:`with_mixture_keep`) — deterministic
  hash-based down/up-weighting per language/domain toward target mixture
  weights,
- **per-domain frequency capping** (:func:`cap_per_domain`) — keep at most N
  documents per source, chosen by deterministic hash order.

All three are pure column/window expressions — no Python UDFs, no collects.
The packing/capping prefixes are TWO-TIER (r13, caught by the plan audit's
low-cardinality-window axis): a language/source shard key alone is
single-digit-cardinality, so a window partitioned ONLY by it runs the whole
corpus through #shards tasks at any cluster width. Tier 1 buckets rows into
cells (fixed-width doc_id ranges for packing, the 256 md5-prefix values for
capping), aggregates one row per (shard, cell), and takes the exclusive
prefix over that REDUCED cell frame; tier 2 finishes within each (shard,
cell) partition — the data-sized window gains a high-cardinality key and
the shard-only window shrinks to the cell frame. Determinism comes from
md5-derived ordering/bucketing (not rand()), so results are stable across
runs, engines, partitionings, and corpus appends — the property a
reproducible data pipeline needs (same discipline as
:func:`~nyc_taxi_pyspark_spark.operators.text.split_assign`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.operators.text import STOPWORDS, tokens

PACK_BUDGET = 512
# two-tier packing prefix: doc_ids bucket into cells this wide; the
# shard-only window then runs over the 1/_PACK_CELL-sized cell frame
_PACK_CELL = 1024

# Target mixture weights (keep fraction per language). Values are exact
# multiples of 1/1000 so the md5-bucket comparison is integer-exact.
MIXTURE_WEIGHTS: dict[str, float] = {
    "en": 1.0,
    "de": 0.5,
    "es": 0.5,
    "fr": 0.25,
    "zh": 0.25,
}

DOMAIN_CAP = 10


def _hash_bucket(id_col: str, mod: int) -> Column:
    """First 8 hex digits of md5(id) as an integer bucket in [0, mod)."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % mod
    )


def with_pack_bins(
    df: DataFrame,
    budget: int = PACK_BUDGET,
    shard_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concatenation-style sequence packing (the GPT-lineage layout): within
    each shard, documents are laid end-to-end in deterministic id order, and
    a document's bin is the context window its first token lands in
    (``floor(offset / budget)``). Documents may span bin boundaries — that is
    the concat-packing contract; the packer's job is the offset bookkeeping.

    Adds ``n_tokens``, ``pack_offset`` (exclusive running token sum within
    the shard), and ``pack_bin``.

    Two-tier prefix (r13): 1024-id doc cells. Tier 1 aggregates one token
    total per (shard, cell) — map-side combined, no sort — and takes the
    exclusive prefix over the cell frame (1/1024 of the data; recurse the
    same split if that tier ever outgrows a task — the text_novelty_curve
    discipline); tier 2 resolves the within-cell offset with ONE ordered
    window keyed by (shard, cell) and adds the broadcast-joined cell
    offset. Exact because floor(id/1024) is monotone in id, so a lower
    cell always means a strictly smaller id; cells absent from the data
    contribute zero tokens and need no universe row. The input is
    consumed by both tiers — pass the session-persisted n_tokens layout
    (catalog._docs_ntok) so the double consumption reads cached blocks
    instead of scanning and tokenizing the corpus twice.
    """
    cell = F.floor(F.col(id_col) / F.lit(_PACK_CELL)).cast("bigint")
    # an ingest-time n_tokens column (catalog._docs_ntok layout) is used
    # as-is — recomputing it would tokenize the corpus once per plan branch
    base_cols = [c for c in df.columns if c != "n_tokens"]
    if "n_tokens" not in df.columns:
        df = df.withColumn("n_tokens", F.size(tokens()).cast("bigint"))
    out = df.withColumn("__cell", cell)
    w_cell = (
        Window.partitionBy(shard_col)
        .orderBy("__cell")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cells = (
        out.groupBy(shard_col, "__cell")
        .agg(F.sum("n_tokens").alias("__ct"))
        .select(
            shard_col,
            "__cell",
            F.coalesce(F.sum("__ct").over(w_cell), F.lit(0)).alias("__below"),
        )
    )
    w_in = (
        Window.partitionBy(shard_col, "__cell")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = (
        F.col("__below") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    ).cast("bigint")
    # NULL-SAFE rejoin: the window form this replaces kept NULL-shard rows
    # as their own partition (both engines), so a plain equi-join would
    # silently drop them (dirty-parity audit r13 caught exactly that on
    # the NULL-lang fixture doc)
    cells = cells.withColumnRenamed(shard_col, "__g_shard").withColumnRenamed(
        "__cell", "__g_cell"
    )
    cond = F.col(shard_col).eqNullSafe(F.col("__g_shard")) & F.col(
        "__cell"
    ).eqNullSafe(F.col("__g_cell"))
    # NO broadcast hint on the cell frame (ADVICE r13): its row count is
    # ~max(id)/_PACK_CELL per shard — data-proportional, not constant — so
    # an unconditional hint would exceed broadcast limits exactly at the
    # corpus sizes this packer targets. AQE decides at runtime from the
    # frame's ACTUAL post-aggregation size: broadcast when it is small
    # (every test/bench SF), shuffle join on the (shard, cell) composite
    # key — high-cardinality, skew-handled — when it is not.
    return (
        out.join(cells, cond)
        .withColumn("pack_offset", offset)
        .withColumn(
            "pack_bin",
            F.floor(F.col("pack_offset") / F.lit(float(budget))).cast("bigint"),
        )
        .select(*base_cols, "n_tokens", "pack_offset", "pack_bin")
    )


def with_mixture_keep(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain-mixture sampling: document kept iff its md5
    bucket (mod 1000) falls below ``weight[lang] * 1000``. Unlisted languages
    default to weight 0 (dropped). Adds ``mix_weight`` and ``mix_keep``.

    Hash-based rather than ``sample()`` so the decision is per-row stable:
    re-running over an appended corpus never flips an old row's fate, and
    the oracle engine re-derives the identical choice.
    """
    weights = MIXTURE_WEIGHTS if weights is None else weights
    weight = F.lit(0.0)
    for lang, wgt in weights.items():
        weight = F.when(F.col(lang_col) == lang, F.lit(float(wgt))).otherwise(weight)
    bucket = _hash_bucket(id_col, 1000)
    return df.withColumn("mix_weight", weight).withColumn(
        "mix_keep", bucket < (F.col("mix_weight") * 1000).cast("bigint")
    )


def cap_per_domain(
    df: DataFrame,
    cap: int = DOMAIN_CAP,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frequency capping: keep at most ``cap`` documents per domain, chosen
    by deterministic md5 order (a uniform-but-reproducible subsample, not
    "first N by id" which would bias toward old documents). Adds
    ``domain_rank`` and ``cap_keep``.

    Two-tier rank (r13): the cell is the first md5 hex byte — 256 values,
    a DOMAIN constant. Tier 1 counts rows per (domain, cell) and takes the
    exclusive prefix over that ≤256-row frame per domain (broadcast-sized
    for any real domain count); tier 2 ranks within each (domain, cell)
    partition by (md5, id). Exact because lowercase-hex prefix order
    matches full-string md5 order (char order '0'<…<'9'<'a'<…<'f' is
    nibble-value order), so rank = rows-in-lower-cells + within-cell
    row_number. The data-sized window is keyed by (domain, cell) — 256×
    the parallelism of the domain-only form the plan audit flagged.
    """
    fp = F.md5(F.col(id_col).cast("string"))
    out = df.withColumn("__fp", fp).withColumn(
        "__cell", F.conv(F.substring("__fp", 1, 2), 16, 10).cast("bigint")
    )
    w_cell = (
        Window.partitionBy(domain_col)
        .orderBy("__cell")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cells = (
        out.groupBy(domain_col, "__cell")
        .agg(F.count(F.lit(1)).alias("__cc"))
        .select(
            domain_col,
            "__cell",
            F.coalesce(F.sum("__cc").over(w_cell), F.lit(0)).alias("__below"),
        )
    )
    order = Window.partitionBy(domain_col, "__cell").orderBy("__fp", id_col)
    # NULL-SAFE rejoin — same contract as with_pack_bins: NULL-domain rows
    # were one window partition before, so they must match their cell row
    cells = cells.withColumnRenamed(domain_col, "__g_dom").withColumnRenamed(
        "__cell", "__g_cell"
    )
    cond = F.col(domain_col).eqNullSafe(F.col("__g_dom")) & F.col(
        "__cell"
    ).eqNullSafe(F.col("__g_cell"))
    return (
        out.join(F.broadcast(cells), cond)
        .withColumn(
            # bigint, NOT int: __below is a bigint COUNT, and a domain
            # exceeding 2^31 rows would wrap negative (ANSI off) or throw
            # (ANSI on) under an int cast — making cap_keep silently true
            # for over-cap docs at exactly the corpus sizes this engine
            # targets (ADVICE r13).
            "domain_rank",
            (F.col("__below") + F.row_number().over(order)).cast("bigint"),
        )
        .withColumn("cap_keep", F.col("domain_rank") <= cap)
        .select(*df.columns, "domain_rank", "cap_keep")
    )


# Gopher-style rule thresholds (Rae et al.-lineage quality heuristics),
# calibrated to the synthetic documents table's 10-99-token range so every
# flag actually discriminates at test scale.
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 80
GOPHER_MEAN_LEN_LO = 3.0
GOPHER_MEAN_LEN_HI = 5.5
GOPHER_SHORT_WORD_MAX_RATIO = 0.15
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher-rule battery: each rule is an independent boolean
    flag plus a composite ``gopher_keep`` — the filter-battery shape
    (SURVEY.md §2.2 P5) applied to corpus quality. Rules:

    - token count within ``[GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS]``
    - mean word length within ``[GOPHER_MEAN_LEN_LO, GOPHER_MEAN_LEN_HI]``
    - single-character-word ratio ≤ ``GOPHER_SHORT_WORD_MAX_RATIO``
    - at least ``GOPHER_MIN_STOPWORD_HITS`` stopword occurrences

    Ratios are integer-count divisions ⇒ deterministic doubles, hash-safe.
    """
    w = tokens(text_col)
    n_tok = F.size(w)
    sum_len = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    short_hits = F.aggregate(
        F.transform(w, lambda x: (F.length(x) <= 1).cast("int")),
        F.lit(0),
        lambda a, x: a + x,
    )
    stop_hits = F.aggregate(
        F.transform(w, lambda x: x.isin(*STOPWORDS).cast("int")),
        F.lit(0),
        lambda a, x: a + x,
    )
    from nyc_taxi_pyspark_spark.functions.exact import sdiv

    # sdiv + coalesce(false): a token-less doc has UNDEFINED ratios (NULL,
    # matching the oracle's NULL/0) but must FAIL the rules outright —
    # a bare comparison on NULL would leave the flag NULL where the
    # oracle's CASE yields 0 (round-11 dirty-parity audit)
    mean_len = sdiv(sum_len.cast("double"), n_tok.cast("double"))
    short_ratio = sdiv(short_hits.cast("double"), n_tok.cast("double"))
    # NULL-text doc: n_tok and the aggregate folds are NULL — every flag
    # must still read FALSE (and hits 0), like the oracle's CASE..ELSE 0
    flag_tokens = F.coalesce(
        n_tok.between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS), F.lit(False)
    )
    flag_mean_len = F.coalesce(
        (mean_len >= GOPHER_MEAN_LEN_LO) & (mean_len <= GOPHER_MEAN_LEN_HI),
        F.lit(False),
    )
    flag_short = F.coalesce(
        short_ratio <= GOPHER_SHORT_WORD_MAX_RATIO, F.lit(False)
    )
    stop_hits = F.coalesce(stop_hits, F.lit(0))
    flag_stop = stop_hits >= GOPHER_MIN_STOPWORD_HITS
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        mean_len.alias("mean_word_len"),
        short_ratio.alias("short_word_ratio"),
        stop_hits.alias("stopword_hits"),
        flag_tokens.alias("flag_tokens"),
        flag_mean_len.alias("flag_mean_len"),
        flag_short.alias("flag_short_words"),
        flag_stop.alias("flag_stopwords"),
        (flag_tokens & flag_mean_len & flag_short & flag_stop).alias("gopher_keep"),
    )


CHUNK_TOKENS = 16


def chunk_dedup(
    df: DataFrame,
    chunk: int = CHUNK_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-level exact dedup (Lee et al.'s window-dedup shape): split
    each document into fixed ``chunk``-token windows, keep each distinct
    chunk only at its first occurrence (lexicographically minimal
    (doc, position)), report per-document chunk/dup/kept-token counts.

    Catches the partial overlaps document-level fingerprints miss (boiler-
    plate, quoted passages, template prefixes). Plan shape at 100 TB: one
    row-expanding projection (×docs/chunk rows), ONE hash agg on the chunk
    text for the min-survivor, one equi-join back, one per-doc re-agg —
    no window over the (skew-prone) chunk key: the survivor is a
    ``min(struct(doc, pos))`` aggregate, so a boilerplate chunk repeated
    a million times costs map-side partial mins, not a million-row
    window partition.
    """
    w = tokens(text_col)
    n = F.size(w)
    n_chunks = F.floor(((n + F.lit(chunk - 1)) / F.lit(chunk))).cast("int")
    mk = lambda i: F.slice(w, i * chunk + 1, chunk)  # noqa: E731
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                F.array_join(mk(i), " ").alias("chunk"),
                F.size(mk(i)).cast("bigint").alias("chunk_len"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<chunk:string,chunk_len:bigint>>"))
    exploded = df.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "c")
    ).select(id_col, "chunk_idx", "c.chunk", "c.chunk_len")
    survivors = (
        exploded.groupBy("chunk")
        .agg(F.min(F.struct(id_col, "chunk_idx")).alias("m"))
        .select(
            "chunk",
            F.col(f"m.{id_col}").alias("min_doc"),
            F.col("m.chunk_idx").alias("min_idx"),
        )
    )
    flagged = exploded.join(survivors, "chunk").withColumn(
        "keep",
        (F.col(id_col) == F.col("min_doc")) & (F.col("chunk_idx") == F.col("min_idx")),
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum((~F.col("keep")).cast("int")).cast("bigint").alias("n_dup_chunks"),
        F.sum(F.when(F.col("keep"), F.col("chunk_len")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    k: int,
) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement: top-k by
    key u^(1/w), u a deterministic md5-derived uniform in (0,1). Inclusion
    probability is proportional to weight in the A-ES sense; the sample is
    reproducible across runs and partition layouts (no rand()).

    NOT oracle-hashable: pow() is a libm call whose last-ulp rounding is
    not guaranteed identical across engines, so two near-tied keys could
    order differently. The statistical contract (heavier ⇒ likelier, exact
    size k, determinism) is pytest-pinned instead. Plan: row-local key
    computation + TakeOrdered — no shuffle before the top-k."""
    u = (
        _hash_bucket(id_col, 1_000_000_007).cast("double")
        + F.lit(0.5)
    ) / F.lit(1_000_000_007.0)
    from nyc_taxi_pyspark_spark.functions.exact import sdiv

    # sdiv: a zero-weight row (empty document) gets a NULL key, which
    # sorts NULLS LAST under DESC — inclusion probability 0, the A-ES
    # limit — instead of ANSI-aborting the job on 1/0
    key = F.pow(u, sdiv(F.lit(1.0), weight))
    return (
        df.withColumn("__es_key", key)
        .orderBy(F.desc("__es_key"), F.col(id_col))
        .limit(k)
        .drop("__es_key")
    )
