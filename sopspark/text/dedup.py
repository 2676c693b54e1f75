"""Deduplication operators for large-scale training-data pipelines.

Four families, each picked for a different scale/recall trade-off:

  * :func:`exact_dedup` — hash-groupBy; one shuffle on a 32-byte digest.
  * MinHash + LSH (:func:`minhash_signatures` → :func:`minhash_lsh_pairs` →
    :func:`minhash_dedup`) — the standard shingle → minhash → band →
    bucket-join pipeline; candidate generation never compares documents
    pairwise, only bucket-collided ones.
  * :func:`simhash` / :func:`simhash_dedup` — 64-bit fingerprints; near-dup
    = identical fingerprint (or banded Hamming buckets).
  * :func:`ngram_jaccard_pairs` — exact n-gram Jaccard verification for
    candidate pairs (the precision pass after LSH recall).

Scale notes: everything before the final verification is Catalyst-native
(split/transform/xxhash64/explode + hash aggregates with map-side partial
aggregation); signatures are fixed-width arrays, so shuffle volume is
O(docs × num_perm × 8 bytes) regardless of document length. Bucket joins
group by (band, band-hash) — hot buckets (boilerplate text) are bounded by
``max_bucket`` to keep candidate explosion quadratic only within a capped
bucket, and AQE skew-join covers the rest.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# oracle-shared hash primitive
# ---------------------------------------------------------------------------
# The fast path hashes with xxhash64 (JVM codegen, no equivalent in DuckDB).
# For machine-verified parity the pipelines also accept hash_fn="md5": a
# 48-bit integer from the first 12 hex chars of md5, which DuckDB replicates
# exactly as a strpos()-polynomial (see md5hex48_sql below), plus
# universal-hash lanes (a_i*h + b_i mod 2^31-1) from a fixed seeded table so
# both engines evaluate the identical arithmetic.

MERSENNE31 = (1 << 31) - 1


def md5_hash48(col: Column, seed: int | None = None) -> Column:
    """Non-negative 48-bit int from md5's first 12 hex chars (engine-shared)."""
    s = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("bigint")


def md5hex48_sql(e: str) -> str:
    """The DuckDB twin of :func:`md5_hash48` — SINGLE definition shared by
    every oracle builder (queries.py, sketch.py). The 16.0**(12-i) partial
    sums stay < 2^53, so the double arithmetic is exact for all 48-bit
    values."""
    return (
        "CAST(list_sum(list_transform(range(1,13), i -> "
        f"(strpos('0123456789abcdef', md5({e})[i:i]) - 1) * (16.0**(12-i)))) AS BIGINT)"
    )


def lane_params(num_perm: int, seed: int = 9176) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) universal-hash params < 2^31-1, via an LCG —
    identical literals are embedded in the DuckDB oracle SQL."""
    params, x = [], seed
    for _ in range(num_perm):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = 1 + x % (MERSENNE31 - 1)
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % MERSENNE31
        params.append((a, b))
    return params


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact text duplicate class."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("_h"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("_h")
    )


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

def _spread_for_explode(df: DataFrame) -> DataFrame:
    """Rebalance the doc table before a ~tokens-per-doc× explode.

    The shingle/token explode amplifies each input split by the average
    document length, so partitioning must be decided on the *post*-explode
    volume: a single small parquet file (or a 128 MB scan split of a 100 TB
    table, which explodes to gigabytes) would otherwise pin the whole
    hash-aggregate stage on too few cores. A round-robin shuffle of the
    narrow (id, text) projection is cheap relative to the explode it feeds;
    inputs already split finer than the cluster's parallelism pass through
    untouched."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _word_shingles_from(toks: Column, k: int) -> Column:
    """Word k-grams from a PRE-MATERIALIZED token array column. Callers
    should produce that column behind a generator barrier
    (``explode_outer(array(split(...)))``): referencing the split inline
    would re-evaluate it once per use below (n / idx / transform /
    fallback = 4x per row — nested higher-order functions defeat codegen
    subexpression elimination)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def _tokens_barrier(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    """(keep..., _tk) with the lowercased token array materialized once
    per row via the explode_outer(array(...)) generator barrier."""
    return df.select(
        *keep,
        F.explode_outer(F.array(F.split(F.lower(F.col(text_col)), r"\s+"))).alias("_tk"),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array<bigint>[num_perm]) via explode → num_perm min-aggs.

    The explode produces one row per (doc, shingle); the groupBy computes
    all permutations' minima in ONE hash aggregate with full map-side
    combine — shuffle volume is docs × num_perm longs, independent of text
    size. Each shingle string is hashed ONCE; permutation i derives from the
    base hash — num_perm cheap ops per shingle instead of num_perm string
    hashes (~6x faster at equal quality).

    hash_fn="xxhash64" (default, fast JVM path) or "md5" (DuckDB-replicable
    universal-hash lanes — the oracle-verified variant).
    """
    # explode_outer, not explode: InferFiltersFromGenerate would add a
    # size(shingles) > 0 filter that re-inlines the whole shingle HOF
    # expression (2x the scan-side compute). The shingle array is never
    # empty (the otherwise-branch yields a 1-element array), so outer is
    # value-identical; the cheap isNotNull guard covers null-text rows.
    # Tokens materialize behind their own barrier first — the shingle
    # expression references them 4x, and inline split would re-run 4x/row.
    shingled = (
        _tokens_barrier(
            _spread_for_explode(df.select(F.col(id_col), F.col(text_col))),
            text_col,
            keep=[id_col],
        )
        .select(
            F.col(id_col),
            F.explode_outer(_word_shingles_from(F.col("_tk"), shingle_k)).alias("_s"),
        )
        .where(F.col("_s").isNotNull())
    )
    # both variants derive permutation lanes from ONE base hash via the
    # same universal-hash LCG — 3 integer ops per lane. Re-hashing per lane
    # (xxhash64(_h, i)) measured ~1.7x slower at sf0.1 for zero quality
    # gain; only the base hash differs between the variants.
    if hash_fn == "md5":
        base = (md5_hash48(F.col("_s")) % MERSENNE31).alias("_h")
    else:
        base = F.pmod(F.xxhash64("_s"), F.lit(MERSENNE31)).alias("_h")
    params = lane_params(num_perm)
    lanes = [(F.lit(a) * F.col("_h") + F.lit(b)) % MERSENNE31 for a, b in params]
    hashed = shingled.select(F.col(id_col), base)
    aggs = [F.min(lane).alias(f"h{i}") for i, lane in enumerate(lanes)]
    sig = hashed.groupBy(id_col).agg(*aggs)
    return sig.select(F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig"))


def _band_rows(
    signatures: DataFrame, id_col: str, bands: int, r: int, hash_fn: str
) -> DataFrame:
    """Signature table → exploded ``(_id, band, bh)`` band-hash rows —
    the shared banding step of the LSH self-join and the incremental
    index probe. Band hash = xxhash64 over the band's signature slots
    directly (static element access), or the md5 lane for the
    oracle-replicable path."""
    rows = signatures.select(F.col(id_col).alias("_id"), F.col("sig"))

    def band_hash(b: int) -> Column:
        slots = [F.col("sig")[b * r + j] for j in range(r)]
        if hash_fn == "md5":
            return md5_hash48(F.concat_ws(",", *[s.cast("string") for s in slots]))
        return F.xxhash64(*slots)

    # explode_outer: the band array is a literal CreateArray (never empty),
    # and the inferred size()>0 filter under a plain explode would duplicate
    # every band-hash expression into the filter.
    return rows.select(
        "_id",
        F.explode_outer(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_hash(b).alias("bh"))
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", F.col("_b.band").alias("band"), F.col("_b.bh").alias("bh"))


def minhash_lsh_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    max_bucket: int = 200,
    num_perm: int | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """LSH banding: signature → ``bands`` band-hashes → explode → bucket
    self-join → distinct candidate pairs (a < b).

    Band hash b = xxhash64 over that band's signature slots directly
    (static element access — no array slicing or string building in the
    hot path). ``max_bucket`` caps pathological buckets (identical
    boilerplate): a bucket of B docs yields B²/2 pairs, so the cap bounds
    the worst case; capped buckets are still fully deduplicated via their
    first representative chain (a<b ordering keeps the union-find
    connected).

    Deliberate asymmetry with :func:`duplicate_spans`' drop-style
    ``max_bucket``: here the hot bucket IS the duplicate cluster we are
    hunting, so dropping it would lose exactly the boilerplate dup
    clusters LSH exists to find — keep-first preserves their
    representative chain. The cost is one sorted window task per hot
    bucket (8-byte ids, spillable sort — a straggler, not an OOM), and
    the keep-first rank is what the DuckDB oracles replicate (the
    ``capped`` CTE in ``_minhash_dedup_oracle_sql`` /
    ``_minhash_probe_oracle_sql``) — changing this guard means changing
    both sides.
    """
    if num_perm is None:  # one-row probe; static band exprs need the width
        first = signatures.select(F.size("sig").alias("n")).first()
        num_perm = int(first["n"]) if first else 64
    banded = _band_rows(signatures, id_col, bands, num_perm // bands, hash_fn)

    # bucket cap: rank within bucket, drop beyond max_bucket
    w = Window.partitionBy("band", "bh").orderBy("_id")
    capped = banded.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= max_bucket)

    a = capped.select(F.col("band"), F.col("bh"), F.col("_id").alias("a"))
    b = capped.select(F.col("band"), F.col("bh"), F.col("_id").alias("b"))
    pairs = (
        a.join(b, on=["band", "bh"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return pairs


def jaccard_of_signatures(
    pairs: DataFrame,
    signatures: DataFrame,
    id_col: str = "doc_id",
    signatures_b: DataFrame | None = None,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Estimated Jaccard = fraction of equal minhash slots (zip_with).
    ``signatures_b`` lets the pair sides come from DIFFERENT signature
    tables (the cross-index probe path); default is the self-join case."""
    sa = signatures.select(F.col(id_col).alias(a_col), F.col("sig").alias("_siga"))
    sb = (signatures_b if signatures_b is not None else signatures).select(
        F.col(id_col).alias(b_col), F.col("sig").alias("_sigb")
    )
    return (
        pairs.join(sa, on=a_col)
        .join(sb, on=b_col)
        .withColumn(
            "jaccard_est",
            F.aggregate(
                F.zip_with("_siga", "_sigb", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.size("_siga"),
        )
        .select(a_col, b_col, "jaccard_est")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Full near-dup pipeline → (id, rep) cluster assignment.

    shingle → minhash → LSH candidates → signature-Jaccard ≥ threshold →
    connected components (duplicate clusters are transitive) → keep min id
    as representative.
    """
    from sopspark.plans.graph import connected_components

    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_k, hash_fn).localCheckpoint()
    cand = minhash_lsh_pairs(sigs, id_col, bands, num_perm=num_perm, hash_fn=hash_fn)
    verified = jaccard_of_signatures(cand, sigs, id_col).where(F.col("jaccard_est") >= threshold)
    # ids stay numeric through CC so the representative is the numeric min
    edges = verified.select(F.col("a").cast("long"), F.col("b").cast("long"))
    cc = connected_components(edges)
    ids = df.select(F.col(id_col).cast("long").alias("node"))
    mapping = ids.join(cc, on="node", how="left").select(
        F.col("node").alias(id_col),
        F.coalesce(F.col("rep"), F.col("node")).alias("rep"),
    )
    return mapping


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash fingerprint, Catalyst-only: per-token hash → per-bit vote sum
    → sign. explode + one hash aggregate (map-side combined).

    hash_fn="md5" uses the 48-bit engine-shared hash (set bits=48 with it)
    so the DuckDB oracle can replicate the fingerprint bit-for-bit."""
    tok_hash = md5_hash48(F.col("_t")) if hash_fn == "md5" else F.xxhash64("_t")
    # explode_outer + isNotNull: split() never yields an empty array, and the
    # inferred size()>0 filter under plain explode would re-run the tokenize.
    toks = _spread_for_explode(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode_outer(F.split(F.lower(F.col(text_col)), r"\s+")).alias("_t")
    ).where(F.col("_t").isNotNull()).withColumn("_h", tok_hash)

    def bit(i: int):
        return F.shiftleft(F.lit(1).cast("bigint"), i)

    votes = [
        F.sum(F.when(F.col("_h").bitwiseAND(bit(i)) != 0, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = agg.select(
        F.col(id_col),
        F.aggregate(
            F.array(*[F.when(F.col(f"b{i}") > 0, bit(i)).otherwise(F.lit(0).cast("bigint")) for i in range(bits)]),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc.bitwiseOR(v),
        ).alias("fingerprint"),
    )
    return fp


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-fingerprint near-dup classes (Hamming-0); for Hamming-k see
    :func:`simhash_near_dup_pairs`."""
    fp = simhash(df, text_col, id_col)
    return (
        fp.groupBy("fingerprint")
        .agg(F.min(id_col).alias("rep"), F.collect_list(id_col).alias("members"))
    )


def simhash_hamming_pairs(
    fingerprints: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """All id pairs (a < b) whose ``bits``-wide fingerprints are within
    Hamming distance ``max_hamming``, via pigeonhole banding.

    Split the ``bits`` bits into ``max_hamming + 1`` disjoint bands: two
    words at distance ≤ k must agree *exactly* on at least one band, so an
    equi-join on (band, band_bits) finds every true pair — no cross join.
    Shuffle key is the narrow (band, bits) pair; candidate verification is
    one ``bit_count(a ^ b)``. This is the 100 TB path: cost ≈ Σ per-bucket²,
    with buckets of width bits/(k+1) keeping collisions rare.
    """
    bands = max_hamming + 1
    width = bits // bands
    fp = fingerprints.select(F.col(id_col), F.col("fingerprint"))

    def band_key(i: int):
        lo = i * width
        size = bits - lo if i == bands - 1 else width
        mask = -1 if size >= 64 else (1 << size) - 1  # -1 = all 64 bits (2^64-1 overflows long)
        return F.shiftrightunsigned("fingerprint", lo).bitwiseAND(F.lit(mask).cast("bigint"))

    # explode_outer: literal band array is never empty; avoids the inferred
    # size()>0 filter duplicating the band-key expressions.
    banded = fp.select(
        id_col,
        "fingerprint",
        F.explode_outer(
            F.array(*[F.struct(F.lit(i).alias("band"), band_key(i).alias("bits")) for i in range(bands)])
        ).alias("_bk"),
    ).select(id_col, "fingerprint", F.col("_bk.band").alias("band"), F.col("_bk.bits").alias("bits"))
    left = banded.select(F.col(id_col).alias("a"), F.col("fingerprint").alias("_fa"), "band", "bits")
    right = banded.select(F.col(id_col).alias("b"), F.col("fingerprint").alias("_fb"), "band", "bits")
    return (
        left.join(right, on=["band", "bits"])
        .where(F.col("a") < F.col("b"))
        .withColumn("hamming", F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .dropDuplicates(["a", "b"])
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-duplicate id pairs (a < b, Hamming ≤ k) over raw text.

    The fingerprints are checkpointed before banding: the band equi-join is
    a self-join, and without a materialization both sides would re-execute
    the whole tokenize → explode → 48-agg fingerprint subtree (the most
    expensive stage of the pipeline) once each."""
    fp = simhash(df, text_col, id_col, bits=bits, hash_fn=hash_fn).localCheckpoint()
    return simhash_hamming_pairs(fp, max_hamming, id_col, bits=bits)


# ---------------------------------------------------------------------------
# n-gram jaccard (exact verification)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact word-k-gram Jaccard for candidate pairs (a, b) — the precision
    pass. array_intersect/array_union stay JVM-side."""
    sh = _tokens_barrier(df, text_col, keep=[id_col]).select(
        F.col(id_col), F.array_distinct(_word_shingles_from(F.col("_tk"), k)).alias("_sh")
    )
    a = sh.select(F.col(id_col).alias("a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col(id_col).alias("b"), F.col("_sh").alias("_shb"))
    return (
        pairs.join(a, on="a")
        .join(b, on="b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.greatest(F.size(F.array_union("_sha", "_shb")), F.lit(1)),
        )
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# paragraph-level exact dedup (Lee et al. 2021, arXiv:2107.06499 "ExactSubstr"
# relaxed to paragraph granularity — the NearDup/paragraph variant)
# ---------------------------------------------------------------------------

def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    joiner: str | None = None,
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide duplicate-paragraph removal with document reassembly.

    CONTRACT: ``sep`` is a Java REGEX (pre-escape literal separators —
    e.g. ``sep=r"\\|"`` with ``joiner="|"``), while ``joiner`` is a
    literal; this asymmetry is deliberate (split-on-pattern, rejoin-with-
    canonical-text) and pinned by
    ``tests/test_textops.py::test_paragraph_dedup_min_chars_and_joiner``.
    :func:`dedup_clusters` wraps this domain with a LITERAL ``para_sep``
    (it escapes before calling split) to match its DuckDB
    ``string_split`` twin. A paragraph occurrence
    survives iff it is the FIRST occurrence of that exact paragraph text
    corpus-wide (ordered by ``(doc_id, pos)``) or shorter than
    ``min_chars``. Documents are reassembled from surviving paragraphs in
    original order (``joiner`` defaults to ``sep``). Returns
    ``(doc_id, text, n_paras, n_kept)`` — every input document appears,
    even when all of its paragraphs were removed (empty text).

    Scale shape: posexplode (no shuffle) → keeper table via
    ``groupBy(sha2(para)).agg(min(struct(doc_id, pos)))`` — the min is
    map-side combined, so a corpus-dominating boilerplate paragraph
    (the classic hot key) collapses to one row per map task BEFORE the
    exchange — → sort-merge join back on the 32-byte digest (AQE skew
    join covers the probe side) → one groupBy(doc_id) reassembly whose
    state is bounded by the largest single document. Paragraph text
    never shuffles twice: the keeper table carries only the digest.
    """
    joiner = sep if joiner is None else joiner
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "para"),
    ).withColumn("_h", F.sha2(F.col("para"), 256))
    firsts = (
        paras.where(F.length("para") >= min_chars)
        .groupBy("_h")
        .agg(F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("_first"))
    )
    flagged = paras.join(firsts, "_h", "left").withColumn(
        "_keep",
        (F.length("para") < min_chars)
        | ((F.col("_first.i") == F.col(id_col)) & (F.col("_first.p") == F.col("pos"))),
    )
    parts = F.array_sort(F.collect_list(F.struct("pos", "para", "_keep")))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(F.col("_keep").cast("int")).cast("long").alias("n_kept"),
        F.concat_ws(
            joiner,
            F.transform(F.filter(parts, lambda s: s["_keep"]), lambda s: s["para"]),
        ).alias(text_col),
    )


def jaccard_similarity_join(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 1,
) -> DataFrame:
    """EXACT token-set Jaccard similarity join: every unordered pair with
    ``J(a, b) >= threshold``, no false negatives — the complement of the
    MinHash-LSH path (:func:`minhash_lsh_pairs`), for when recall must be
    1.0 and the threshold is high.

    Prefix filtering (Chaudhuri et al. ICDE'06; Bayardo et al. WWW'07
    "Scaling Up All Pairs Similarity Search"): tokens get a GLOBAL
    rare-first order (corpus frequency asc, token asc); each document
    only indexes its first ``n - ceil(t*n) + 1`` tokens in that order.
    Any pair with J >= t must share a token within BOTH prefixes (the
    first common token in global order cannot sit past either prefix,
    else the intersection is provably < t*n), so an equi-join of the
    prefix inverted index finds every qualifying pair; a length filter
    ``t*na <= nb`` prunes candidates before the exact verify.

    Scale shape: the frequency table is one count agg; prefixes bound
    the inverted index at ~(1-t) of the token volume, and the RARE-FIRST
    order is the structural skew defense — a corpus-hot token sorts last
    and almost never lands in a prefix, so posting lists stay short
    exactly where a naive token join explodes. Verification is
    pair-driven JVM ``array_intersect`` on the two token arrays.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    t = float(threshold)
    if shingle > 1:
        # token = lowercased word k-gram (the minhash shingle rule) —
        # materialized behind the generator barrier like every shingle
        # consumer
        toks = _tokens_barrier(docs, text_col, keep=[id_col]).select(
            F.col(id_col).alias("_id"),
            F.array_sort(
                F.array_distinct(_word_shingles_from(F.col("_tk"), shingle))
            ).alias("_set"),
        )
    else:
        toks = docs.select(
            F.col(id_col).alias("_id"),
            F.array_sort(F.array_distinct(F.split(F.col(text_col), " "))).alias("_set"),
        )
    # persisted: the scan+shingle subplan is consumed by the frequency
    # agg, the rank join, the size join, and both verify sides — without
    # this the corpus is re-shingled ~5x (the _tokens_barrier lesson);
    # released in the finally after the eager result checkpoint
    toks = toks.withColumn("_n", F.size("_set")).persist()
    try:
        return _jaccard_join_body(toks, t).localCheckpoint(eager=True)
    finally:
        toks.unpersist()


def _jaccard_join_body(toks: DataFrame, t: float) -> DataFrame:
    # global rare-first rank: (freq asc, token asc) over distinct doc-tokens
    tok = toks.select("_id", F.explode("_set").alias("_tok"))
    freq = tok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_f"))
    ranked = (
        tok.join(freq, "_tok")
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_f"), F.col("_tok")))
            ).alias("_ord")
        )
        .select(
            "_id",
            F.transform(F.col("_ord"), lambda s: s["_tok"]).alias("_sorted"),
        )
    )
    sized = ranked.join(toks.select("_id", "_set", "_n"), "_id")
    # EPS guards the two prune inequalities against double rounding-up
    # (e.g. 0.07*100 -> 7.000000000000001): subtracting it can only
    # LENGTHEN the prefix / LOOSEN the length filter, so pruning stays
    # strictly conservative and the verify step keeps the exact contract
    EPS = 1e-9
    prefix_len = (
        F.col("_n") - F.ceil(F.lit(t) * F.col("_n") - F.lit(EPS)).cast("int") + 1
    )
    pre = sized.select(
        "_id", "_set", "_n",
        F.explode(F.slice("_sorted", 1, prefix_len)).alias("_tok"),
    )
    a = pre.select(F.col("_id").alias("_ida"), F.col("_n").alias("_na"), "_tok")
    b = pre.select(F.col("_id").alias("_idb"), F.col("_n").alias("_nb"), "_tok")
    # candidate ids only — the token ARRAYS are re-joined after the pair
    # dedup so they ship once per surviving pair, not once per shared
    # prefix token
    cands = (
        a.join(b, "_tok")
        .where(F.col("_ida") < F.col("_idb"))
        # length filter: J >= t forces t*na <= nb and t*nb <= na
        .where(
            (F.lit(t) * F.col("_na") - F.lit(EPS) <= F.col("_nb"))
            & (F.lit(t) * F.col("_nb") - F.lit(EPS) <= F.col("_na"))
        )
        .select("_ida", "_idb", "_na", "_nb")
        .dropDuplicates(["_ida", "_idb"])
    )
    sets = toks.select("_id", "_set")
    cands = (
        cands.join(sets.select(F.col("_id").alias("_ida"), F.col("_set").alias("_seta")), "_ida")
        .join(sets.select(F.col("_id").alias("_idb"), F.col("_set").alias("_setb")), "_idb")
    )
    inter = F.size(F.array_intersect("_seta", "_setb"))
    union = F.col("_na") + F.col("_nb") - inter
    return (
        cands.withColumn("_j", inter.cast("double") / union)
        .where(F.col("_j") >= t)
        .select(
            F.col("_ida").alias("doc_a"),
            F.col("_idb").alias("doc_b"),
            F.round("_j", 6).alias("jaccard"),
        )
    )


def minhash_probe(
    index_sigs: DataFrame,
    batch_sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    num_perm: int | None = None,
) -> DataFrame:
    """Incremental ingest near-dup check: probe a NEW batch's signatures
    against a PRE-BUILT corpus signature index — the production ingest
    path, where the 100 TB corpus is never rescanned; only its (tiny,
    persisted) signature/band table is joined.

    Candidates are the cross band-hash equi-join (batch bands × index
    bands — NOT a self-join), verified by the minhash slot-agreement
    estimate. Returns ``(new_id, index_id, jaccard_est)`` for pairs with
    ``jaccard_est >= threshold``. Both signature tables must come from
    :func:`minhash_signatures` with the same num_perm/shingle/hash
    settings (signature compatibility is the caller's contract, exactly
    as with a persisted ANN index).
    """
    if num_perm is None:
        first = batch_sigs.select(F.size("sig").alias("n")).first()
        num_perm = int(first["n"]) if first else 64
    r = num_perm // bands
    ib = _band_rows(index_sigs, id_col, bands, r, hash_fn)
    bb = _band_rows(batch_sigs, id_col, bands, r, hash_fn)
    cands = (
        bb.select(F.col("_id").alias("new_id"), "band", "bh")
        .join(ib.select(F.col("_id").alias("index_id"), "band", "bh"), ["band", "bh"])
        .select("new_id", "index_id")
        .distinct()
    )
    est = jaccard_of_signatures(
        cands, batch_sigs, id_col,
        signatures_b=index_sigs, a_col="new_id", b_col="index_id",
    )
    return est.where(F.col("jaccard_est") >= threshold).select(
        "new_id", "index_id", F.round("jaccard_est", 6).alias("jaccard_est")
    )


# ---------------------------------------------------------------------------
# multi-signal duplicate clustering
# ---------------------------------------------------------------------------

def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    para_sep: str = "\n\n",
    para_min_chars: int = 20,
    simhash_max_hamming: int = 3,
    simhash_bits: int = 48,
    jaccard_threshold: float = 0.4,
    jaccard_shingle: int = 4,
    hash_fn: str = "xxhash64",
    cc_driver_threshold: int = 200_000,
) -> DataFrame:
    """Multi-signal duplicate clustering — the production shape where several
    candidate generators feed ONE union-find, so a document flagged by any
    signal lands in the same transitive cluster (how large-corpus dedup is
    actually run: merge exact-, near-, and fuzzy-dup evidence, then keep one
    representative per component).

    Signals (each independently oracle-verified elsewhere in the registry):

      1. shared exact paragraph (split on ``para_sep``, paragraphs shorter
         than ``para_min_chars`` ignored) — STAR edges to the min doc id per
         duplicated paragraph, grouped on the sha2 digest so the shuffle key
         is 32 bytes regardless of paragraph length; boilerplate hot
         paragraphs collapse map-side and emit O(docs-with-that-para) edges,
         never a pairwise expansion;
      2. SimHash banded Hamming ≤ ``simhash_max_hamming`` near-dup pairs
         (:func:`simhash_near_dup_pairs` — pigeonhole band equi-join);
      3. exact token-shingle Jaccard ≥ ``jaccard_threshold`` pairs
         (:func:`jaccard_similarity_join` — AllPairs prefix filtering, no
         false negatives).

    The union of the three edge lists feeds
    :func:`sopspark.plans.graph.connected_components` (alternating
    large/small-star, O(log n) rounds). Returns ``(node, component, csize)``
    for every document touched by at least one signal; ``component`` is the
    min doc id of the cluster, ``csize`` its size. 100 TB shape: each signal
    is an equi-join on a narrow hash key, CC shuffles only the (tiny
    relative to the corpus) duplicate-evidence edge list.
    """
    d = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text"))

    paras = (
        # re.escape: para_sep is a LITERAL separator (the DuckDB twin uses
        # string_split), so regex metacharacters must not change semantics
        d.select(
            "doc_id", F.explode(F.split("text", re.escape(para_sep))).alias("para")
        )
        .where(F.length("para") >= para_min_chars)
        .select("doc_id", F.sha2(F.col("para"), 256).alias("dig"))
        .distinct()
    )
    stars = (
        paras.groupBy("dig")
        .agg(F.min("doc_id").alias("v"), F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
    )
    para_e = (
        paras.join(stars, "dig")
        .where(F.col("doc_id") != F.col("v"))
        .select(F.col("doc_id").alias("u"), "v")
    )

    sim_e = simhash_near_dup_pairs(
        d, max_hamming=simhash_max_hamming, bits=simhash_bits, hash_fn=hash_fn
    ).select(F.col("a").cast("long").alias("u"), F.col("b").cast("long").alias("v"))

    jac_e = jaccard_similarity_join(
        d, threshold=jaccard_threshold, shingle=jaccard_shingle
    ).select(F.col("doc_a").cast("long").alias("u"), F.col("doc_b").cast("long").alias("v"))

    edges = para_e.unionByName(sim_e).unionByName(jac_e)

    from sopspark.plans.graph import connected_components

    cc = connected_components(edges, driver_threshold=cc_driver_threshold)
    sizes = cc.groupBy("rep").agg(F.count(F.lit(1)).alias("csize"))
    return cc.join(sizes, "rep").select(
        F.col("node"), F.col("rep").alias("component"), F.col("csize")
    )


# ---------------------------------------------------------------------------
# duplicated-span detection (exact substring granularity)
# ---------------------------------------------------------------------------

def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    min_span: int = 12,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Maximal duplicated token spans between document pairs — the exact
    SUBSTRING granularity of Lee et al. 2021 (arXiv:2107.06499 §4 does this
    with a suffix array on one machine; the distributed re-expression is
    k-token shingles with positions, an equi-join on the shingle, and a
    gaps-and-islands merge along each alignment diagonal):

      1. tokenize + position-stamped k-token shingles (array materialized in
         its own projection — the CSE barrier idiom);
      2. shingle equi-join across documents (``a < b``): every match is a
         k-token agreement at offsets ``(pa, pb)``;
      3. matches on one diagonal (``pa - pb`` constant) with consecutive
         ``pa`` are ONE longer duplicate — merged with the classic
         ``pa - row_number()`` islands trick over a (a, b, diag)-partitioned
         window (bounded partitions, no global sort);
      4. island → span ``[a_start, a_end]`` / ``b_start`` with
         ``span_tokens = islands + k - 1``; spans shorter than ``min_span``
         are dropped.

    ``max_bucket`` (DEFAULT ON at 1000; ``None`` disables) DROPS shingles
    occurring more than ``max_bucket`` times corpus-wide — such shingles are boilerplate and
    carry no alignment signal, and the drop is computed with one
    map-side-combined count aggregate + an anti-join, so the hot shingle
    never funnels into a single sorted window task (a keep-first cap
    would sort the entire hot bucket in one task — the exact skew the
    guard exists to defuse). SQL-replicable (``HAVING count <=``), so a
    guarded oracle stays exact. Returns
    ``(a, b, a_start, a_end, b_start, span_tokens)`` over 0-based token
    offsets.
    """
    d = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text"))
    toks = d.select("doc_id", F.split(F.lower("text"), r"\s+").alias("w"))
    grams = (
        toks.where(F.size("w") >= k)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - k),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(" ", F.slice("w", i + 1, k)).alias("g"),
                    ),
                )
            ).alias("x"),
        )
        .select("doc_id", F.col("x.pos").alias("pos"), F.col("x.g").alias("g"))
    )
    if max_bucket is not None:
        hot = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket)
            .select("g")
        )
        grams = grams.join(hot, "g", "left_anti")

    a = grams.select(F.col("doc_id").alias("a"), F.col("pos").alias("pa"), "g")
    b = grams.select(F.col("doc_id").alias("b"), F.col("pos").alias("pb"), "g")
    pairs = a.join(b, "g").where(F.col("a") < F.col("b")).select("a", "b", "pa", "pb")

    diag = (F.col("pa") - F.col("pb")).alias("diag")
    iw = Window.partitionBy("a", "b", F.col("pa") - F.col("pb")).orderBy("pa")
    isl = pairs.select(
        "a", "b", diag, "pa", (F.col("pa") - F.row_number().over(iw)).alias("grp")
    )
    spans = (
        isl.groupBy("a", "b", "diag", "grp")
        .agg(F.min("pa").alias("a_start"), F.max("pa").alias("a_max"))
        .select(
            "a",
            "b",
            "a_start",
            (F.col("a_max") + k - 1).alias("a_end"),
            (F.col("a_start") - F.col("diag")).alias("b_start"),
            (F.col("a_max") - F.col("a_start") + k).alias("span_tokens"),
        )
        .where(F.col("span_tokens") >= min_span)
    )
    return spans


def strip_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    min_span: int = 12,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """The CUT step of exact-substring dedup (Lee et al. 2021 §4 apply
    their suffix-array hits by deleting one copy of each duplicate): every
    span reported by :func:`duplicate_spans` is removed from the LATER
    document of the pair (``b`` side — the ``a < b`` orientation makes
    "first occurrence survives" deterministic), overlapping cut ranges are
    merged per document (classic running-max islands under a doc-keyed
    window — bounded partitions), and documents are reassembled from the
    surviving tokens.

    Returns ``(doc_id, n_tokens, n_removed, text)`` for EVERY input
    document. Untouched documents pass through with their original text
    verbatim; cut documents are rebuilt space-joined (matching the
    tokenization — deterministic and SQL-replicable). Scale shape: the cut
    table is duplicate-evidence-sized (≪ corpus); tokens shuffle once on
    doc_id for the interval anti-flagging + reassembly, whose state is
    bounded by the largest single document.

    Known tradeoff of the default-on ``max_bucket`` guard: shingles above
    the corpus-wide cap are dropped BEFORE pair formation, so spans made
    entirely of extreme boilerplate (a license header verbatim in >1000
    documents) are neither detected nor cut here. That is deliberate:
    cutting an N-copy template through this pairwise path costs O(N²)
    pair rows — at that duplication level the right tool is the hash-keyed
    paragraph/exact layer (:func:`paragraph_dedup` / :func:`dedup_clusters`
    handle it in one equi-join), which is how Lee et al. split the work
    too. Pass ``max_bucket=None`` only on corpora known to be free of
    heavy boilerplate.
    """
    spans = duplicate_spans(
        docs, text_col, id_col, k=k, min_span=min_span, max_bucket=max_bucket
    )
    cuts = spans.select(
        F.col("b").alias("_doc"),
        F.col("b_start").alias("s"),
        (F.col("b_start") + F.col("span_tokens") - 1).alias("e"),
    ).distinct()

    wprev = Window.partitionBy("_doc").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wrun = Window.partitionBy("_doc").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = cuts.withColumn("_pm", F.max("e").over(wprev)).withColumn(
        "_grp",
        F.sum(
            (F.col("_pm").isNull() | (F.col("s") > F.col("_pm"))).cast("int")
        ).over(wrun),
    )
    merged = islands.groupBy("_doc", "_grp").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )

    d = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text"))
    cut_ids = merged.select(F.col("_doc").alias("doc_id")).distinct()
    toks = d.join(cut_ids, "doc_id").select(
        "doc_id", F.posexplode(F.split("text", r"\s+")).alias("pos", "tok")
    )
    flagged = toks.join(
        merged,
        (toks["doc_id"] == merged["_doc"])
        & (toks["pos"] >= merged["s"])
        & (toks["pos"] <= merged["e"]),
        "left",
    )
    parts = F.array_sort(F.collect_list(F.struct("pos", "tok", F.col("s").isNull().alias("_keep"))))
    rebuilt = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("s").isNotNull().cast("int")).cast("long").alias("n_removed"),
        F.concat_ws(
            " ", F.transform(F.filter(parts, lambda x: x["_keep"]), lambda x: x["tok"])
        ).alias("text"),
    )
    untouched = d.join(cut_ids, "doc_id", "left_anti").select(
        "doc_id",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("n_removed"),
        "text",
    )
    return rebuilt.unionByName(untouched)
