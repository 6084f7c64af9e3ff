"""Text analysis & deduplication operators (BASELINE.json north-star
extension: the LLM-training-data pipeline surface over ``documents``).

Design for 100 TB:
  - Tokenization, shingling, MinHash signatures, SimHash, fingerprints and
    quality scores are all computed as *row-level array expressions*
    (split / transform / aggregate / array_min) — no explode, no shuffle,
    no Python. A signature scan parallelizes embarrassingly.
  - The only shuffles in near-dup detection are (1) the explode+self-join on
    LSH (band_idx, band_hash) — whose output is bounded by true-collision
    candidates, not O(n²) — and (2) the candidate-pair verification join.
  - Hash functions are md5 (hex string), identical across engines, so every
    stage is oracle-checkable in DuckDB — no Spark-private hash in the data
    path.

MinHash config: 8 hashes × (4 bands × 2 rows) ⇒ LSH threshold
(1/bands)^(1/rows) ≈ 0.5, matching the planted near-dup population in the
driver's documents table (pairwise Jaccard either <0.2 or ≥0.5).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.operators.iterative import cut_lineage

N_HASHES = 8
N_BANDS = 4
ROWS_PER_BAND = 2
SHINGLE_K = 3

# The 5 highest-frequency tokens in the documents vocabulary — used as the
# stopword set for quality scoring.
STOPWORDS = ("join", "hash", "row", "batch", "scan")


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokenization (regex split, consistent with DuckDB's
    string_split_regex)."""
    return F.split(F.col(text_col), r"\s+")


def distinct_tokens(text_col: str = "text") -> Column:
    return F.array_distinct(tokens(text_col))


def word_shingles(words: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-gram shingles as an array expression (no explode)."""
    return F.when(
        F.size(words) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(words, i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


CHAR_K = 8


def char_shingles(text_col: str = "text", k: int = CHAR_K) -> Column:
    """Distinct character k-gram shingles — the n-gram-Jaccard dedup basis
    (word-order robust, language agnostic)."""
    t = F.col(text_col)
    return F.when(
        F.length(t) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - (k - 1)),
                lambda i: F.substring(t, i, k),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_sig(shingles: Column, seed: int) -> Column:
    """One MinHash value: min over md5('<seed>|' || shingle) hex strings.

    md5 is engine-portable; min over hex strings is a valid uniform
    permutation surrogate. Null for empty shingle sets.
    """
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s)))
    )


# U+FFFF sorts above every md5 hex string ([0-9a-f]{32}) — the identity
# element for least() over hashes; mapped back to NULL on empty shingle sets.
_MINHASH_TOP = "￿"


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = N_HASHES,
    shingles: Column | None = None,
    keep_shingles_as: str | None = None,
) -> DataFrame:
    """Append h0..h{n-1} MinHash columns — a single narrow projection.
    ``shingles`` defaults to word trigrams; pass :func:`char_shingles` for
    the n-gram-Jaccard variant. ``keep_shingles_as`` additionally emits the
    shingle array under that name (the exact-Jaccard verification input),
    so a persisted layout computes shingles ONCE for both uses.

    All n lanes fold in ONE ``aggregate`` pass over the shingle array (an
    n-element running-minimum accumulator) instead of n separate
    transform+array_min passes — same md5 count, but no n intermediate
    hash arrays materialized per row: 1.55× faster and far less GC-visible
    at sf0.1, bit-identical output (equal to :func:`minhash_sig` per lane).
    """
    sh = shingles if shingles is not None else word_shingles(tokens(text_col))
    init = F.array(*[F.lit(_MINHASH_TOP) for _ in range(n_hashes)])
    fold = F.aggregate(
        F.col("__sh"),
        init,
        lambda acc, s: F.array(
            *[
                F.least(
                    F.element_at(acc, i + 1),
                    F.md5(F.concat(F.lit(f"{i}|"), s)),
                )
                for i in range(n_hashes)
            ]
        ),
    )
    extra = [F.col("__sh").alias(keep_shingles_as)] if keep_shingles_as else []
    return (
        df.withColumn("__sh", sh)
        .withColumn("__mh", fold)
        .select(
            *df.columns,
            *extra,
            *[
                F.nullif(
                    F.element_at(F.col("__mh"), i + 1), F.lit(_MINHASH_TOP)
                ).alias(f"h{i}")
                for i in range(n_hashes)
            ],
        )
    )


def minhash_layout(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_HASHES,
    shingles: Column | None = None,
    nonempty: Column | None = None,
) -> DataFrame:
    """(id, shingles, h0..h{n-1}) — the materialized near-dup layout.

    One pass over the corpus computes the shingle array AND the MinHash
    signature; persisting the result means the LSH band self-join reads the
    8 hash columns twice and the exact-Jaccard verification reads the
    shingle arrays for the (bounded) candidate set — the expensive
    shingle+signature pipeline never replans. Locally this is a
    ``persist()``; at 100 TB the h-columns are written next to the table at
    ingest (8 short hex strings/doc) and the shingle arrays are recomputed
    for candidates only, trading ~270 strings/doc of storage for an
    O(candidates) recompute — the layout API is the same either way.

    Docs with empty shingle sets are excluded up front: their NULL minhash
    values would collapse onto md5('') in ``lsh_bands`` and emit every
    short-doc pair as a candidate (with a NaN 0/0 Jaccard that passes
    ``>= threshold`` under Spark's NaN-is-largest ordering). ``nonempty``
    must be a CHEAP predicate equivalent to size(shingles)>0: filtering on
    the shingle expression itself would recompute the full shingle pipeline
    per use (predicate pushdown substitutes the alias), which tripled this
    query's wall clock before the layout existed.
    """
    if shingles is None:
        shingles = word_shingles(tokens(text_col))
        if nonempty is None:
            nonempty = F.size(tokens(text_col)) >= SHINGLE_K
    if nonempty is None:
        nonempty = F.size(shingles) > 0
    return with_minhash_signature(
        docs.filter(nonempty).select(id_col, text_col),
        text_col,
        n_hashes=n_hashes,
        shingles=shingles,
        keep_shingles_as="shingles",
    ).drop(text_col)


def near_dup_pairs_from_layout(
    layout: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """MinHash-LSH pair extraction over a precomputed :func:`minhash_layout`:
    band join -> exact Jaccard verification on candidates only.

    Returns (doc_a, doc_b, jaccard) with jaccard >= threshold. The band
    self-join touches only the id + hash columns; the verification joins the
    (small, broadcast) candidate-pair set back to the layout's shingle
    arrays and intersects them row-wise, so its cost is O(candidates),
    never O(n²) — and with the layout persisted, zero recomputation.
    """
    pairs = lsh_candidate_pairs(
        lsh_bands(layout, id_col, n_bands, rows_per_band), id_col
    )
    return _verify_pairs(layout, pairs, id_col, threshold)


def _verify_pairs(
    layout: DataFrame, pairs: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of a candidate (doc_a, doc_b) set against
    the layout's shingle arrays — O(candidates), shared by the full and the
    incremental (asymmetric) near-dup paths."""
    sa = layout.select(
        F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sb = layout.select(
        F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    shared = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union_size = F.size("sh_a") + F.size("sh_b") - shared
    jaccard = shared.cast("double") / union_size.cast("double")
    return (
        # pairs is the small side: Spark broadcasts it and streams the
        # layout scans; only candidate rows reach the jaccard projection.
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jaccard.alias("jaccard"))
        # union_size >= 1 after the empty-shingle filter in minhash_layout,
        # so jaccard is never NaN; the guard keeps the predicate NaN-safe.
        .filter(~F.isnan("jaccard") & (F.col("jaccard") >= threshold))
    )


def asymmetric_near_dup_pairs(
    layout: DataFrame,
    base_pred: Column,
    inc_pred: Column,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """Near-dup pairs between two DISJOINT slices of one signature layout —
    the incremental-ingest shape: an incoming batch band-joins only against
    the already-ingested base, so the daily cost is O(batch × collisions),
    never O(corpus²) and never base×base. Returns (doc_a ∈ base,
    doc_b ∈ incoming, jaccard ≥ threshold).

    At 100 TB the base side reads the persisted signature layout written at
    ingest; only the incoming batch computes signatures fresh.
    """
    bands = lsh_bands(layout, id_col, n_bands, rows_per_band)
    a = bands.filter(base_pred)
    b = bands.filter(inc_pred)
    pairs = (
        a.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    return _verify_pairs(layout, pairs, id_col, threshold)


def lsh_bands(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """(id, band_idx, band_hash) — one row per band via posexplode of the
    banded signature. LSH threshold ≈ (1/n_bands)^(1/rows_per_band)."""
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(n_bands)
        ]
    )
    return sig_df.select(
        F.col(id_col), F.posexplode(band_hashes).alias("band_idx", "band_hash")
    )


def lsh_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct id pairs (a < b) sharing at least one LSH band bucket.

    The self-join shuffles on (band_idx, band_hash); bucket sizes are small
    for honest hash functions, so output ≈ true candidates, not O(n²).
    """
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingles: Column | None = None,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    nonempty: Column | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pipeline: signature scan → band join →
    exact Jaccard verification on candidates only.

    Returns (doc_a, doc_b, jaccard) with jaccard >= threshold. The exact
    verification joins each candidate pair back to the two shingle arrays
    and intersects them row-wise (array_intersect on already-distinct
    arrays), so its cost is O(candidates), not O(n²). ``shingles`` +
    banding parameters select the variant (word-trigram default; char
    k-grams with tighter bands for n-gram-Jaccard dedup).
    """
    # Docs with empty shingle sets have NULL minhash values; concat_ws in
    # lsh_bands would collapse them all onto md5('') and emit every short-doc
    # pair as a candidate (with a NaN 0/0 Jaccard that passes >= threshold
    # under Spark's NaN-is-largest ordering). minhash_layout excludes them
    # up front — the oracle's NULL band hashes never join, so this is also
    # the parity fix. ``nonempty`` must be a CHEAP predicate equivalent to
    # size(shingles)>0: filtering on the shingle expression itself would
    # recompute the full shingle pipeline per use (predicate pushdown
    # substitutes the alias), which tripled this query's wall clock.
    layout = minhash_layout(
        docs,
        id_col,
        text_col,
        n_hashes=n_bands * rows_per_band,
        shingles=shingles,
        nonempty=nonempty,
    )
    return near_dup_pairs_from_layout(
        layout, id_col, threshold, n_bands, rows_per_band
    )


def fingerprint(text_col: str = "text") -> Column:
    """Exact-dup document fingerprint: md5 of the raw text."""
    return F.md5(F.col(text_col))


# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation —
# the GPT-2-style split shape reduced to a portable character-class regex
# (identical semantics in Java regex and RE2, so DuckDB can twin it).
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(text_col: str = "text") -> Column:
    """BPE-style pre-tokens via regexp_extract_all — the token-count basis
    an LLM-data pipeline budgets with (vs whitespace tokens, which undercount
    punctuation-heavy text)."""
    return F.regexp_extract_all(text_col, F.lit(BPE_PATTERN), 0)


ROLL_BASE = 131
ROLL_MOD = 2_147_483_647  # 2^31 - 1: keeps acc*131+255 far inside int64


def rolling_fingerprint(text_col: str = "text") -> Column:
    """Rabin–Karp rolling-hash fingerprint of the full document.

    Polynomial hash over character codes, folded left-to-right with the
    first code as the seed: ``h = fold(codes[2:], codes[1],
    (acc, c) -> (acc*131 + c) mod (2^31-1))``. Pure integer arithmetic ⇒
    engine-portable (DuckDB twin: ``list_reduce`` with the same lambda —
    its reduce seeds with the first element, hence the seed convention).
    Unlike md5 it supports incremental/windowed extension, the property
    content-defined chunking builds on. NULL for empty text."""
    t = F.col(text_col)
    codes = F.transform(F.split(t, ""), lambda c: F.ascii(c).cast("bigint"))
    return F.when(
        F.length(t) > 0,
        F.aggregate(
            F.slice(codes, 2, F.greatest(F.length(t) - 1, F.lit(0))),
            F.element_at(codes, 1),
            lambda acc, x: (acc * F.lit(ROLL_BASE) + x) % F.lit(ROLL_MOD),
        ),
    ).otherwise(F.lit(None).cast("bigint"))


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup via fingerprint group: keeps min(id) per distinct text —
    deterministic survivor, single hash-aggregate shuffle.

    This min-id/groupBy form is the recommended 100 TB dedup when only the
    survivor *id* is needed (narrowest shuffle: fp + id). When whole
    surviving rows are needed, use
    :func:`~nyc_taxi_pyspark_spark.operators.transforms.dedup_deterministic`
    (window ``row_number`` — one shuffle, no self-join, deterministic
    survivor). For EXTREME skew on one fingerprint (an empty/boilerplate
    document duplicated billions of times, overwhelming even AQE's skew
    split), use :func:`exact_dedup_salted`."""
    return (
        docs.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def exact_dedup_salted(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_salt: int = 16,
) -> DataFrame:
    """Exact dedup under extreme fingerprint skew: two-phase salted
    aggregation (min/count per (fp, salt), then min/sum per fp).

    The hot fingerprint's shuffle partition is split ``n_salt`` ways; both
    aggregates are algebraic so the result is bit-identical to
    :func:`exact_dedup`. Composes `operators.skew.salted_aggregate` with the
    dedup fingerprint — the documented answer to "one boilerplate doc
    repeated 10^9 times" at 100 TB."""
    from nyc_taxi_pyspark_spark.operators.skew import salted_aggregate

    with_fp = docs.select(fingerprint(text_col).alias("fp"), F.col(id_col))
    return salted_aggregate(
        with_fp,
        keys=["fp"],
        measures={id_col: F.min(id_col), "n_copies": F.count("*")},
        finals={id_col: F.min(id_col), "n_copies": F.sum("n_copies")},
        n_salt=n_salt,
    )


def simhash16(words: Column) -> Column:
    """16-bit SimHash over a distinct-word array.

    Bit b is set iff sum over words of ±1 (sign = parity of hex digit b of
    md5(word)) is positive. Integer arithmetic end-to-end ⇒ engine-portable.
    """
    def bit_contrib(b: int) -> Column:
        # NB: the transform lambda must have arity 1 — a second parameter
        # (even defaulted) makes PySpark pass the array index into it.
        def sign(w: Column) -> Column:
            digit = F.substring(F.md5(w), b + 1, 1)
            parity = (F.instr(F.lit("0123456789abcdef"), digit) - 1) % 2
            return F.when(parity == 1, F.lit(1)).otherwise(F.lit(-1))

        return F.aggregate(
            F.transform(words, sign), F.lit(0), lambda acc, x: acc + x
        )

    bit_terms = [
        F.when(bit_contrib(b) > 0, F.lit(2**b)).otherwise(F.lit(0))
        for b in range(16)
    ]
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def simhash32(words: Column, salt: str = "") -> Column:
    """32-bit SimHash over a distinct-word array as a BIGINT.

    Bit b is set iff the sum over words of ±1 (sign = parity of hex digit
    b+1 of md5(salt || word)) is positive — same scheme as
    :func:`simhash16` widened to all 32 md5 hex digits, and computed in
    TWO array passes instead of 32: one md5 per word (the hex string), then
    one fold with a 32-lane sign accumulator (zip_with elementwise add).
    Integer arithmetic end-to-end ⇒ engine-portable; a ``salt`` yields an
    independent half, so two calls give a portable 64-bit signature.
    """
    # Hex-digit parity via ONE translate pass per hash (each hex char maps
    # to its value's parity bit), then split-to-chars — far cheaper than 32
    # per-position instr/substring probes.
    parities = F.transform(
        words,
        lambda w: F.split(
            F.translate(
                F.md5(F.concat(F.lit(salt), w)),
                "0123456789abcdef",
                "0101010101010101",
            ),
            "",
        ),
    )
    acc = F.aggregate(
        parities,
        F.array_repeat(F.lit(0), 32),
        lambda acc, p: F.zip_with(
            acc,
            p,
            lambda a, c: a + F.when(c == "1", F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(32)])
    return F.aggregate(
        F.zip_with(
            acc, powers, lambda a, p: F.when(a > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


SIMHASH_MAX_HAMMING = 3
# Salt per 32-bit half: 4 independent halves = a 128-bit signature whose
# halves double as the pigeonhole bands.
SIMHASH_SALTS = ("", "b|", "c|", "d|")


def simhash_signature(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, s0..s{n-1}): the 128-bit signature table — at 100 TB this is a
    materialized column family of the documents table (computed at ingest,
    like the similarity engine's bucket layout), not per-query work."""
    d = docs.select(F.col(id_col), distinct_tokens(text_col).alias("__dw"))
    return d.select(
        F.col(id_col),
        *[
            simhash32(F.col("__dw"), salt).alias(f"s{i}")
            for i, salt in enumerate(SIMHASH_SALTS)
        ],
    )


def simhash_near_dup_pairs(
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = SIMHASH_MAX_HAMMING,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by 128-bit SimHash Hamming distance ≤ r.

    Pipeline: four salted :func:`simhash32` halves per doc (one narrow
    scan) → band equi-join where each 32-bit half IS a band → Hamming
    verification via bit_count(xor). By pigeonhole, a pair within Hamming
    r agrees exactly on ≥1 of r+1 bands, so banding is EXACT for the
    radius (unlike MinHash-LSH's probabilistic recall): output ≡
    brute-force all-pairs, which is what the DuckDB oracle runs. Shuffles
    only on (band_idx, band_val).

    Band width is the collision dial: on a template-heavy corpus (shared
    boilerplate vocabulary ⇒ correlated signature bits) 16-bit bands
    collided ~25× more than these 32-bit halves at sf0.1 — wide bands +
    a wide signature keep candidates ≈ true near-dups, never O(n²).
    SimHash remains weaker than MinHash when boilerplate dominates every
    hyperplane sign; both are offered — compare `text_near_dup_pairs`.

    Pass a (persisted) ``sigs`` table to skip signature computation: the
    self-join otherwise plans the full 4-half signature scan on BOTH band
    sides — materializing the signature once is an 8× cut in hash work
    (0.43 s vs 5.5 s at sf0.1), and mirrors the 100 TB reality where the
    signature is a stored column, not an expression.
    """
    n_bands = len(SIMHASH_SALTS)
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"exact banding holds only for radius <= {n_bands - 1}; "
            "widen the signature or add bands for a larger radius"
        )
    if sigs is None:
        sigs = simhash_signature(docs, id_col, text_col)
    half_cols = [f"s{i}" for i in range(n_bands)]
    bands = sigs.select(
        F.col(id_col),
        *half_cols,
        F.posexplode(F.array(*half_cols)).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.{c}").bitwiseXOR(F.col(f"b.{c}")))
        for c in half_cols
    )
    # Hamming-filter BEFORE deduplicating: the radius check is a cheap
    # row-local bit op on the join output, while distinct() is a shuffle —
    # so dedup only the (few) within-radius pairs, not every band
    # collision. On a correlated corpus the difference is ~25× shuffle
    # volume; a within-radius pair appears at most n_bands times.
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(hamming <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: token counts, distinct ratio, mean token
    length, stopword ratio, and a composite score. All integer-count based
    divisions ⇒ deterministic doubles."""
    w = tokens(text_col)
    dw = F.array_distinct(w)
    n_tok = F.size(w)
    n_distinct = F.size(dw)
    sum_len = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    stop_hits = F.aggregate(
        F.transform(
            w,
            lambda x: F.when(
                x.isin(*STOPWORDS), F.lit(1)
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    distinct_ratio = n_distinct.cast("double") / n_tok.cast("double")
    mean_len = sum_len.cast("double") / n_tok.cast("double")
    stop_ratio = stop_hits.cast("double") / n_tok.cast("double")
    score = 0.5 * distinct_ratio + 0.1 * mean_len - 0.4 * stop_ratio
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        mean_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


# Language marker profiles for the stopword-overlap language-ID heuristic.
# Real-text profiles; on the synthetic shared-vocabulary documents table the
# classifier degenerates (deterministically) — unit tests exercise it on
# real multilingual fixtures.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los"),
    "de": ("der", "die", "und", "das", "ist", "von", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}


def lang_scores(words: Column) -> dict[str, Column]:
    return {
        lang: F.size(
            F.array_intersect(words, F.array(*[F.lit(m) for m in markers]))
        )
        for lang, markers in LANG_PROFILES.items()
    }


def predict_lang(words: Column) -> Column:
    """Argmax over profile scores with fixed tie order (profile declaration
    order) — strictly-greater-else-next, deterministic on every engine."""
    scores = lang_scores(words)
    langs = list(LANG_PROFILES)
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [scores[lo] for lo in langs[langs.index(lang) + 1 :]]
        best_later = later[0]
        for c in later[1:]:
            best_later = F.greatest(best_later, c)
        expr = F.when(scores[lang] >= best_later, F.lit(lang)).otherwise(expr)
    return expr


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over a near-dup pair graph by min-label
    propagation: every node's label converges to the smallest id reachable
    from it, which is the deterministic cluster id (and the canonical
    survivor) regardless of iteration order or partitioning.

    Shape per iteration: one equi-join of the undirected edge list against
    the current labels + a min-aggregate — both shuffle on the node id, so
    AQE reuses one exchange layout throughout. Iterations needed = graph
    diameter; near-dup clusters are short chains (pairs/triples), so this
    converges in 2-3 rounds. If ``max_iter`` rounds pass without reaching
    the fixpoint (an adversarial long-diameter graph), the call logs a
    warning and falls back to :func:`connected_components_star` — the
    alternating large-star/small-star algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"), whose round count is
    logarithmic in component size rather than linear in diameter — so the
    returned labels are ALWAYS converged. Convergence is detected via the
    label sum: labels only ever decrease, so an unchanged sum IS the
    fixpoint — one scalar action per round, no change-count join; the sum
    is taken as decimal(38,0), which cannot wrap for any 64-bit id range.

    Returns (id, label) — label = min id of the component.
    """
    # Eager localCheckpoint (not persist): each round's frame must TRUNCATE
    # lineage, or the logical plan nests the whole iteration history and the
    # driver OOMs analyzing round ~20's plan even on tiny graphs.
    und = cut_lineage(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("t")))
        .distinct(),
        checkpoint_dir,
    )
    cur = cut_lineage(
        und.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id")),
        checkpoint_dir,
    )
    label_sum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_sum = cur.agg(label_sum).head()[0]
    if prev_sum is None:  # no edges at all
        und.unpersist()
        return cur
    converged = False
    for _ in range(max_iter):
        nbr = (
            und.join(cur.select(F.col("id").alias("t"), "label"), "t")
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("s", "id")
        )
        nxt = cut_lineage(
            cur.join(nbr, "id", "left").select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            ),
            checkpoint_dir,
        )
        cur_sum = nxt.agg(label_sum).head()[0]
        cur = nxt
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        logging.getLogger(__name__).warning(
            "connected_components: no fixpoint after %d min-label rounds "
            "(graph diameter > max_iter); falling back to large-star/"
            "small-star.",
            max_iter,
        )
        return connected_components_star(
            edges, src, dst, checkpoint_dir=checkpoint_dir
        )
    return cur


def _und_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct directed pairs (u, v), both directions, self-loops dropped."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components by alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    COSN'14) — round count logarithmic in component size, vs min-label
    propagation's linear-in-diameter, so a million-node chain at 100 TB
    converges in ~20 rounds instead of a million.

    Per round, ONE shuffle each for the two stars (a window min over the
    neighbor partition — no join) plus the distinct:
      - large-star: for every node u, point every LARGER neighbor v > u at
        m = min(N(u) ∪ {u});
      - small-star: direct edges large→small, point every smaller neighbor
        (and u itself) at the minimum.
    The edge set monotonically approaches the star graph whose centers are
    the component minima; an unchanged edge set is the fixpoint (checked
    with one exceptAll probe — edge count alone can alias). Labels are then
    read straight off the stars: (child → center) plus (center → center).

    Returns (id, label) — label = min id of the component; identical output
    contract (and fixpoint) to :func:`connected_components`.
    """
    from pyspark.sql import Window

    # localCheckpoint (eager) truncates lineage every round — without it the
    # logical plan doubles per round (window + union + distinct nests the
    # whole history) and the driver OOMs analyzing round ~10's plan long
    # before any executor works. Checkpoint blocks are reclaimed by the
    # ContextCleaner once unreferenced.
    cur = cut_lineage(_und_edges(edges, src, dst), checkpoint_dir)
    cur_count = cur.count()
    converged = False
    for _ in range(max_rounds):
        # large-star over the symmetric closure of the current edge set
        sym = cur.union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        w = Window.partitionBy("u")
        m_all = F.least(F.min("v").over(w), F.col("u"))
        large = (
            sym.select("u", "v", m_all.alias("m"))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over large→small directed edges
        directed = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m_small = F.min("v").over(w)  # all neighbors here are < u
        nb = directed.select("u", "v", m_small.alias("m"))
        nxt = cut_lineage(
            nb.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(nb.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct(),
            checkpoint_dir,
        )
        # Fixpoint = identical edge SET: equal counts AND no new edges.
        # (Both probes are needed — the set both gains and loses edges on
        # the way to the star forest, so either alone can alias; with equal
        # counts, an empty one-sided except proves set equality.)
        nxt_count = nxt.count()
        changed = (
            nxt_count != cur_count or nxt.exceptAll(cur).limit(1).count() > 0
        )
        cur, cur_count = nxt, nxt_count
        if not changed:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_star: no fixpoint after {max_rounds} "
            "rounds — raise max_rounds (expected ~log2(component size))."
        )
    # cur is a star forest: (child, center) edges, centers absent as child
    return (
        cur.select(F.col("u").alias("id"), F.col("v").alias("label"))
        .union(
            cur.select(F.col("v").alias("id"), F.col("v").alias("label"))
        )
        .distinct()
    )


# --------------------------------------------------- LLM preprocessing ops

# Patterns kept to the Java-regex ∩ RE2 common subset so Spark and the
# DuckDB oracle replace identical spans (no \b, no lookaround).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
URL_RE = "https?://[^ \\t\\n]+"


def normalize_text(text_col: str = "text") -> Column:
    """Standard LLM-corpus normalization: lowercase, strip punctuation to
    spaces, collapse whitespace runs, trim. Pure string expressions —
    whole-stage codegen, embarrassingly parallel."""
    c = F.lower(F.col(text_col))
    c = F.regexp_replace(c, "[^a-z0-9 \\t\\n]", " ")
    c = F.regexp_replace(c, "[ \\t\\n]+", " ")
    return F.trim(c)


def scrub_pii(text_col: str = "text") -> Column:
    """Redact emails then URLs with fixed placeholder tokens — the
    privacy-filter stage of a training-data pipeline. Order matters (an
    email inside a URL query string is redacted first); both engines apply
    the same order."""
    c = F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(c, URL_RE, "<URL>")


def split_assign(id_col: str = "doc_id", train_pct: int = 8, val_pct: int = 1) -> Column:
    """Deterministic train/val/test assignment by content-free id hash:
    bucket = first 8 hex digits of md5(id) mod 10. Hash-based (not random)
    so the split is stable across runs, engines, partitionings, and
    appends — the property a reproducible training pipeline needs. md5
    rather than xxhash64 because the oracle engine must re-derive it."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10
    )
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_tokens: int = 20,
    max_postings: int = 40,
) -> DataFrame:
    """Posting-list index build: (token, df, postings) for the
    ``top_tokens`` highest-document-frequency alphanumeric tokens, with
    each posting list capped at the first ``max_postings`` sorted doc ids
    and emitted as a CSV string (hash-stable scalar).

    Shape at scale: explode distinct tokens per doc (row-local), then ONE
    shuffle on token; a row_number window ranks doc ids within each token
    so only the first ``max_postings`` ids are ever collected — a stopword
    appearing in every document contributes a bounded array, not a
    corpus-sized one. The following groupBy reuses the window's hash
    partitioning (same key), so ranking + aggregation cost one shuffle
    total. A production index would write full postings partitioned by
    token range — this same plan minus cap and limit.
    """
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda t: t != "",
        )
    )
    exploded = docs.select(
        F.col(id_col).alias("__id"), F.explode(toks).alias("token")
    )
    w = Window.partitionBy("token").orderBy("__id")
    ranked = exploded.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("__rk") <= max_postings, F.col("__id"))
                    )
                ),
                ",",
            ).alias("postings"),
        )
        .orderBy(F.desc("df"), "token")
        .limit(top_tokens)
    )
