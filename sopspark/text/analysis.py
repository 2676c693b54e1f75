"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All Catalyst-native — no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tiny public stopword profiles for the stopword-overlap language heuristic;
# order matters: earlier profiles win score ties (en > fr > de > es)
_PROFILES = [
    ("en", ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]),
    ("fr", ["le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"]),
    ("de", ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "für"]),
    ("es", ["el", "la", "y", "de", "un", "una", "es", "que", "por", "en"]),
]


def detect_language(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-overlap language ID, pure Catalyst (whole-stage codegen):
    per language, count distinct-token overlap with its stopword profile via
    ``array_intersect``; argmax with first-profile-wins tie-break; 'und'
    when no profile hits."""
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    # one array of per-language overlap counts; argmax = array_position of
    # the max, which returns the FIRST index → earlier profiles win ties.
    # (The equivalent nested-CASE formulation duplicates every intersect
    # O(L²) times with structurally distinct copies, which defeats codegen
    # common-subexpression elimination and costs seconds of Janino compile;
    # here the count array is one shared subtree.)
    counts_arr = F.array(
        *[
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in prof])))
            for _lang, prof in _PROFILES
        ]
    )
    langs_arr = F.array(*[F.lit(lang) for lang, _prof in _PROFILES])
    best = F.array_max(counts_arr)
    pred = F.when(
        best > 0, F.element_at(langs_arr, F.array_position(counts_arr, best).cast("int"))
    ).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score, pure Catalyst:
    length, word count, mean word length, punctuation ratio, uppercase
    ratio, digit ratio, stopword ratio."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(t, r"\s+")
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    mean_wl = (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1))
    out = (
        df.withColumn("n_chars_m", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_wl, 4))
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4))
        .withColumn("upper_ratio", F.round(n_upper / F.greatest(n_chars, F.lit(1)), 4))
        .withColumn("digit_ratio", F.round(n_digit / F.greatest(n_chars, F.lit(1)), 4))
    )
    score = (
        F.when((F.col("n_words") >= 5) & (F.col("n_words") <= 100000), 0.4).otherwise(0.0)
        + F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 12), 0.3).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, 0.2).otherwise(0.0)
        + F.when(F.col("digit_ratio") <= 0.3, 0.1).otherwise(0.0)
    )
    return out.withColumn("quality", F.round(score, 4))


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (regex pieces:
    word fragments of ≤4 chars, digits, punctuation)."""
    t = F.col(text_col)
    ws = F.size(F.split(t, r"\s+"))
    # BPE-ish: count regex pieces — 4-char chunks of words + digits + punct
    pieces = F.size(
        F.regexp_extract_all(t, F.lit(r"[A-Za-z]{1,4}|[0-9]+|[^\sA-Za-z0-9]"), F.lit(0))
    )
    return df.withColumn("ws_tokens", ws).withColumn("bpe_tokens", pieces)


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.75,
    min_tokens: int = 10,
    max_tokens: int = 5000,
) -> DataFrame:
    """Composed training-data curation pipeline: exact-dedup representative
    ∘ language filter ∘ quality floor ∘ token-budget window — the standard
    pretraining-corpus gauntlet, end to end in one Catalyst plan.

    Exactly ONE shuffle: the dedup window partitions by the sha2 text
    digest (min-id representative + duplicate count in the same exchange);
    every filter afterwards is a codegen'd projection, so Catalyst collapses
    langid + quality + token counting + the filters into a single stage on
    top of it. At 100 TB this is scan → hash-exchange on a 32-byte key →
    one codegen stage — no joins, no second shuffle.
    """
    # per-row features are computed BELOW the window exchange: the shuffle
    # materializes them as plain attributes, so the filter above the Window
    # references columns instead of re-inlining the big text expressions
    # (which Catalyst would otherwise duplicate into the post-window stage,
    # tripling its codegen)
    feat = token_counts(quality_score(detect_language(df)))
    w = Window.partitionBy(F.sha2(F.col(text_col), 256))
    # both window aggregates in ONE select so they share a single Window
    # node (separate withColumn calls re-derive the partition expression and
    # Catalyst plans a second exchange)
    out = feat.select(
        "*",
        F.min(id_col).over(w).alias("rep_id"),
        F.count(F.lit(1)).over(w).alias("dup_count"),
    )
    return out.where(
        (F.col(id_col) == F.col("rep_id"))
        & (F.col("lang_pred") == lang)
        & (F.col("quality") >= min_quality)
        & F.col("ws_tokens").between(min_tokens, max_tokens)
    ).select(
        id_col,
        "lang_pred",
        "quality",
        "ws_tokens",
        F.col("dup_count").cast("long").alias("dup_count"),
    )


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing-style document fingerprint: k-gram rolling hashes → min
    hash per sliding window → distinct fingerprint set, all Catalyst array
    ops. Deterministic; robust to small edits. hash_fn="md5" selects the
    48-bit engine-shared hash (DuckDB-replicable oracle path)."""
    if hash_fn == "md5":
        from sopspark.text.dedup import md5_hash48

        h = md5_hash48
    else:
        h = F.xxhash64
    # tokens behind their own generator barrier: the gram expression
    # references them 4x and an inline split would re-run per reference
    from sopspark.text.dedup import _tokens_barrier

    tdf = _tokens_barrier(df, text_col, keep=list(df.columns))
    toks = F.col("_tk")
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: h(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        ),
    ).otherwise(F.array(h(F.concat_ws(" ", toks))))
    # Materialize the gram-hash array in its OWN projection before winnowing.
    # Inlining `grams` into the window-min transform nests two higher-order
    # functions, and lambda bodies are evaluated interpreted with no CSE
    # against the outer scope — every sliding-window slot re-hashed every
    # gram (O(n²) md5/xxhash per row; 112 s for 500 docs at sf0.01).  As a
    # named column referenced more than once below, CollapseProject keeps
    # the projection separate, so each gram is hashed exactly once.
    gdf = tdf.withColumn("_grams", grams).drop("_tk")
    g = F.col("_grams")
    winnowed = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(g) - window, F.lit(0))),
            lambda i: F.array_min(F.slice(g, i + 1, window)),
        )
    )
    return gdf.withColumn("fingerprints", winnowed).drop("_grams")


# --- PII redaction ----------------------------------------------------------
# Patterns chosen to mean the same thing under Java regex (Spark) and RE2
# (DuckDB oracle): no backrefs, no lookaround.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{3}-\d{3}-\d{4}", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / phone numbers / IPv4 addresses and count each kind.

    Pure Catalyst (``regexp_extract_all`` + chained ``regexp_replace``),
    whole-stage-codegen'd — zero Python, zero shuffles; at 100 TB this is a
    map-only stage fused into whatever scan feeds it. Counts are taken on
    the ORIGINAL text; replacements apply in declaration order (email →
    phone → ip), which is well-defined because the patterns cannot overlap
    (an email match consumes its digits before the phone/ip pass sees them
    only in pathological strings — order is part of the operator contract).
    """
    t = F.col(text_col)
    out = df
    for name, pat, _tok in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}s", F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        )
    red = t
    for _name, pat, tok in PII_PATTERNS:
        red = F.regexp_replace(red, pat, tok)
    return out.withColumn(f"{text_col}_redacted", red)


# --- deterministic stratified sampling --------------------------------------

def _md5_unit48(col):
    """First 48 bits of md5 as an integer in [0, 2^48) — the engine-shared
    hash idiom (DuckDB replicates it exactly; see queries._md5hex48_sql)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast("long")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang_pred",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: keep a row iff
    ``hash48(id) < rate[stratum] * 2^48``. The mixture knob of a
    training-data pipeline (e.g. downsample boilerplate languages).

    Scale design: a pure filter — NO shuffle, no RNG state, reproducible
    across runs/retries/speculative tasks (the hash is a function of the
    row id only), and pushdown-friendly (Catalyst folds the rate CASE and
    the threshold comparison into the scan's residual filter).
    """
    thresholds = F.create_map(
        *[x for k, v in rates.items() for x in (F.lit(k), F.lit(int(v * 2**48)))]
    )
    thr = F.coalesce(
        thresholds[F.col(strata_col)], F.lit(int(default_rate * 2**48))
    )
    return df.where(_md5_unit48(F.col(id_col)) < thr)


# --- training-batch sequence packing ----------------------------------------

def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences
    (conttiguous chunked packing): documents are sharded, ordered by id
    within each shard, and a document starts a new bin whenever the running
    token total before it crosses a multiple of ``budget``.

    Scale design: packing is PER-SHARD — each shard packs independently
    under its own window (one hash exchange on the shard key, ``shards`` ≈
    a few × cluster width), which is how real pipelines shard packing; a
    single global ordering would serialize on one reducer. Deterministic:
    shard and order are functions of the id alone, so retries/speculation
    reproduce the same bins.
    """
    toks = F.size(F.split(F.col(text_col), r"\s+"))
    shard = F.pmod(F.col(id_col).cast("bigint"), F.lit(shards))
    out = df.select(F.col(id_col), shard.alias("shard"), toks.alias("n_tokens"))
    w = Window.partitionBy("shard").orderBy(id_col)
    cum_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return out.withColumn("bin", F.floor(cum_before / budget).cast("bigint"))


# --- benchmark contamination ------------------------------------------------

def contamination(
    df: DataFrame,
    bench: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark-contamination ratio: the fraction of a
    document's word ``k``-grams that appear in ANY benchmark document —
    the standard eval-set decontamination check before training.

    Scale design: the benchmark gram set is broadcast (benchmarks are
    tiny next to a 100 TB corpus), so scoring is scan → explode → one
    broadcast hash join → per-doc hash aggregate; the only shuffle is the
    final per-document aggregate keyed on unique doc ids (skew-free).
    """
    from sopspark.text.dedup import _tokens_barrier, _word_shingles_from

    bench_grams = (
        _tokens_barrier(bench, text_col, keep=[])
        .select(F.explode_outer(_word_shingles_from(F.col("_tk"), k)).alias("g"))
        .where(F.col("g").isNotNull())
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = (
        _tokens_barrier(df, text_col, keep=[id_col])
        .select(F.col(id_col), F.explode_outer(_word_shingles_from(F.col("_tk"), k)).alias("g"))
        .where(F.col("g").isNotNull())
    )
    scored = doc_grams.join(F.broadcast(bench_grams), on="g", how="left")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_contaminated") / F.col("n_grams"), 6),
        )
    )


# --- consecutive-duplicate collapse ------------------------------------------

def collapse_repeats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Collapse runs of consecutive duplicate words ("a a the" → "a the")
    — a cheap intra-document repetition cleaner. Pure array expressions
    (split → indexed filter → concat), zero shuffle, whole-stage codegen;
    at 100 TB this fuses into whatever scan feeds it."""
    # Materialize the token array in its own projection first: referencing
    # the raw split() expression inside the filter lambda would re-split
    # the text per token (no CSE into lambda bodies — the same O(n²)
    # blowup as the round-2 fingerprint bug).
    tdf = df.withColumn("_toks", F.split(F.col(text_col), r"\s+"))
    toks = F.col("_toks")
    # keep token i iff i == 0 or toks[i] != toks[i-1]; element_at is
    # 1-based, so element_at(toks, i) with the lambda's 0-based i IS the
    # previous element
    kdf = tdf.withColumn(
        "_kept",
        F.filter(toks, lambda x, i: (i == F.lit(0)) | (x != F.element_at(toks, i))),
    )
    return (
        kdf.withColumn("text_collapsed", F.concat_ws(" ", F.col("_kept")))
        .withColumn("n_collapsed", F.size(toks) - F.size(F.col("_kept")))
        .drop("_toks", "_kept")
    )


def _bigram_rows(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) bigram stream with a ``<s>`` sentinel context —
    shared by the self-trained LM score and the DSIR cross-model
    weights."""
    from sopspark.text.search import tokens_col

    n = F.size("_tk")
    toks = (
        docs.select(
            F.col(id_col), F.explode_outer(F.array(tokens_col(text_col))).alias("_t0")
        )
        .select(F.col(id_col), F.concat(F.array(F.lit("<s>")), F.col("_t0")).alias("_tk"))
        .where(F.size("_tk") >= 2)
    )
    return toks.select(
        F.col(id_col),
        F.explode_outer(
            F.arrays_zip(
                F.slice(F.col("_tk"), 1, n - 1).alias("w1"),
                F.slice(F.col("_tk"), 2, n - 1).alias("w2"),
            )
        ).alias("_b"),
    ).select(F.col(id_col), F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet-style LM quality signal: train an add-alpha-smoothed bigram LM
    on the corpus itself, then score every document by its mean per-bigram
    natural-log probability (higher = more typical of the corpus;
    boilerplate and garbage score low).

    All Catalyst, two passes over the token stream:

    1. bigram counts C(w1,w2) — one explode + one map-side-combined
       aggregate; context counts C(w1) derive from the bigram table (no
       extra scan), vocab size V is a 1-row aggregate broadcast back.
    2. score join — each document bigram joins the model on (w1,w2) and a
       per-document aggregate averages ``ln((C12+α)/(C1+αV))``.

    The model table is vocabulary-sized, not corpus-sized; AQE picks
    broadcast vs shuffle join at runtime. A ``<s>`` sentinel provides the
    first token's context. Deterministic given the corpus (counts are
    exact integers; the one double average is rounded to 6 places).
    """
    big = _bigram_rows(docs, text_col, id_col)

    # the bigram count table is materialized ONCE (localCheckpoint): both
    # consumers below (context-count window, vocab aggregate) would
    # otherwise re-execute the whole tokenize+aggregate subtree, tripling
    # the stream scans. After the checkpoint the token stream is read
    # exactly twice overall — once for the counts, once for scoring. The
    # checkpointed table is the LM model itself (vocab²-bounded, tiny
    # relative to the corpus), which is the natural artifact to pin.
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).localCheckpoint(eager=True)
    wc1 = Window.partitionBy("w1")
    vocab = bc.select("w2").agg(F.count_distinct("w2").alias("v"))
    model = bc.withColumn("c1", F.sum("c12").over(wc1)).crossJoin(F.broadcast(vocab))

    logp = F.log(
        (F.col("c12").cast("double") + F.lit(alpha))
        / (F.col("c1").cast("double") + F.lit(alpha) * F.col("v").cast("double"))
    )
    return (
        big.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("lm_logp"),
        )
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted domain-mixture sampling: draw ~``total`` rows whose domain
    proportions follow ``weights`` (the data-mixing step of a training
    pipeline — e.g. 60% web, 30% code, 10% books). Domains absent from
    ``weights`` are dropped.

    Per-domain rate = min(1, total·w_d / Σw / n_d) — derived from actual
    domain counts, so under-represented domains saturate at keep-all
    rather than oversampling. Selection is the deterministic hash-
    Bernoulli filter (`hash48(id) < rate·2^48`): no shuffle on the data
    path, stable under retries/speculation. The only job beyond the scan
    is the tiny per-domain count aggregate, broadcast back as a rate map.
    """
    wsum = float(sum(weights.values()))
    if wsum <= 0 or total <= 0:
        raise ValueError("weights must sum > 0 and total must be positive")

    counts = (
        df.where(F.col(domain_col).isin(list(weights)))
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    target = F.create_map(
        *[
            x
            for k, w in weights.items()
            for x in (F.lit(k), F.lit(float(total) * float(w) / wsum))
        ]
    )
    rates = counts.select(
        F.col(domain_col),
        F.least(
            F.lit(1.0), target[F.col(domain_col)] / F.col("_n").cast("double")
        ).alias("_rate"),
    )
    # the rate table is |domains| rows — broadcast join, then the same
    # deterministic threshold filter as stratified_sample
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(
            # explicit floor: double→int truncation direction differs
            # between engines (Spark truncates, DuckDB rounds), floor is
            # identical in both
            _md5_unit48(F.col(id_col))
            < F.floor(F.col("_rate") * F.lit(float(2**48)))
        )
        .drop("_rate")
    )


# --- Gopher-style repetition / quality rules --------------------------------
# Rahimi et al. "Scaling Language Models: Methods, Analysis & Insights from
# Training Gopher" (arXiv:2112.11446) §A1.1 repetition-removal heuristics,
# re-expressed as one map-only Catalyst projection: every feature is a pure
# function of the row's own text (lines/tokens/bigram arrays materialized
# once behind a projection barrier), so at 100 TB this fuses into the scan
# with zero exchanges — the per-document hashmap of the original becomes a
# sorted-array run-length aggregate.

GOPHER_THRESHOLDS = {
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_top_bigram_char_frac": 0.18,
    "max_symbol_word_ratio": 0.10,
    "min_alpha_word_frac": 0.80,
    "min_words": 50,
    "max_words": 100_000,
    "min_stop_hits": 2,
}



def gopher_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher repetition-removal features + keep decision, pure Catalyst.

    Features (per arXiv:2112.11446 §A1.1, whitespace-token / newline-line
    granularity): duplicate-line fraction, duplicate-line CHARACTER
    fraction, fraction of characters in the most common word bigram,
    symbol-to-word ratio (# and ellipses), fraction of words with an
    alphabetic character, stopword hits (the en profile), word count.

    Both repetition modes are computed WITHOUT a shuffle: sort the per-doc
    array and run-length-scan it in one ``aggregate`` (ties in the bigram
    mode → lexicographically smallest bigram, the first maximal run) — the
    O(L log L) in-row analogue of the reference pattern's per-document
    hash table. Every array (lines, tokens, sorted lines, sorted bigrams,
    scan states) is materialized in its OWN projection, each referenced
    ≥ 2× downstream so CollapseProject cannot re-inline the higher-order
    subtree into its consumers (nested HOF lambdas evaluate interpreted
    with no CSE — the round-2 fingerprint lesson). ``gopher_keep``
    applies ``GOPHER_THRESHOLDS``.
    """
    t = F.col(text_col)
    base = df.select(
        id_col,
        text_col,
        F.explode_outer(F.array(F.split(t, r"\n"))).alias("_lines"),
    ).select(
        id_col,
        text_col,
        "_lines",
        F.explode_outer(F.array(F.split(t, r"\s+"))).alias("_tk"),
    )
    lines, toks = F.col("_lines"), F.col("_tk")
    n_lines = F.size(lines)
    n_words = F.size(toks)
    n_chars = F.length(t)

    bigrams = F.when(
        n_words >= 2,
        F.array_sort(
            F.transform(
                F.sequence(F.lit(0), n_words - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = base.withColumn("_slines", F.array_sort(lines)).withColumn("_bg", bigrams)
    sl, bg = F.col("_slines"), F.col("_bg")

    # run-length scan over the sorted lines: total chars inside lines that
    # occur more than once (first element: init.prev='' with run=0 flushes
    # a zero-length run, so a genuine leading '' line still starts at 1)
    lscan = F.aggregate(
        sl,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("dup"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(x == a["prev"], a["dup"]).otherwise(
                a["dup"]
                + F.when(a["run"] > 1, a["run"] * F.length(a["prev"])).otherwise(F.lit(0))
            ).alias("dup"),
        ),
        lambda a: a["dup"]
        + F.when(a["run"] > 1, a["run"] * F.length(a["prev"])).otherwise(F.lit(0)),
    )
    # longest run over the sorted bigrams (strict > keeps the FIRST, i.e.
    # lexicographically smallest, maximal run)
    bscan = F.aggregate(
        bg,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"),
            F.lit("").alias("best"), F.lit(0).alias("bestrun"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                > acc["bestrun"],
                x,
            ).otherwise(acc["best"]).alias("best"),
            F.greatest(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                acc["bestrun"],
            ).alias("bestrun"),
        ),
    )
    base = base.withColumn("_dupchars", lscan).withColumn("_bscan", bscan)

    line_chars = F.aggregate(lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    dup_line_frac = F.lit(1.0) - F.size(F.array_distinct(sl)) / n_lines.cast("double")
    dup_line_char_frac = F.col("_dupchars") / F.greatest(line_chars, F.lit(1)).cast("double")
    # bigram char coverage: count * (len("w1 w2") - 1 separator space)
    top_bigram_char_frac = F.when(
        F.size(bg) > 0,
        F.col("_bscan")["bestrun"].cast("double")
        * (F.length(F.col("_bscan")["best"]) - 1)
        / F.greatest(n_chars, F.lit(1)).cast("double"),
    ).otherwise(F.lit(0.0))

    n_hash = n_chars - F.length(F.regexp_replace(t, r"#", ""))
    n_ell3 = (n_chars - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / F.lit(3)
    n_ell1 = n_chars - F.length(F.regexp_replace(t, "\u2026", ""))
    symbol_word_ratio = (n_hash + n_ell3 + n_ell1).cast("double") / F.greatest(
        n_words, F.lit(1)
    ).cast("double")

    alpha_word_frac = F.size(
        F.filter(toks, lambda w: w.rlike("[A-Za-z]"))
    ) / F.greatest(n_words, F.lit(1)).cast("double")

    en_stop = _PROFILES[0][1]
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(w) for w in en_stop]),
        )
    )

    th = GOPHER_THRESHOLDS
    out = (
        base.withColumn("n_words", n_words)
        .withColumn("dup_line_frac", F.round(dup_line_frac, 6))
        .withColumn("dup_line_char_frac", F.round(dup_line_char_frac, 6))
        .withColumn("top_bigram_char_frac", F.round(top_bigram_char_frac, 6))
        .withColumn("symbol_word_ratio", F.round(symbol_word_ratio, 6))
        .withColumn("alpha_word_frac", F.round(alpha_word_frac, 6))
        .withColumn("stop_hits", stop_hits)
    )
    keep = (
        (F.col("dup_line_frac") <= th["max_dup_line_frac"])
        & (F.col("dup_line_char_frac") <= th["max_dup_line_char_frac"])
        & (F.col("top_bigram_char_frac") <= th["max_top_bigram_char_frac"])
        & (F.col("symbol_word_ratio") <= th["max_symbol_word_ratio"])
        & (F.col("alpha_word_frac") >= th["min_alpha_word_frac"])
        & F.col("n_words").between(th["min_words"], th["max_words"])
        & (F.col("stop_hits") >= th["min_stop_hits"])
    )
    return out.withColumn("gopher_keep", keep).drop(
        "_lines", "_tk", "_slines", "_bg", "_dupchars", "_bscan"
    )


def normalize_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode curation normalization: NFC canonical composition, C0/C1
    control-character strip (tab/newline/CR survive), space/tab-run
    collapse, trim. Returns ``(id_col, text, changed)``.

    UDF discipline: NFC is the ONE step Catalyst cannot express, so it —
    and only it — runs as an Arrow-batched pandas UDF; the control strip
    and whitespace collapse stay JVM-side ``regexp_replace`` (portable
    character classes, no codegen break around them). The whole operator
    is map-only: zero shuffle, scales linearly with input bytes. The
    DuckDB oracle replicates NFC via ``nfc_normalize`` (both engines
    implement Unicode canonical composition, verified to agree on
    decomposed latin, compatibility-exempt ligatures, and halfwidth
    forms).
    """
    import unicodedata

    # explicit returnType form: the module-wide `from __future__ import
    # annotations` turns hints into strings the UDF inferrer can't resolve
    _nfc = F.pandas_udf(
        lambda s: s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        ),
        "string",
    )

    nfc = _nfc(F.col(text_col))
    stripped = F.regexp_replace(
        nfc, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]", ""
    )
    collapsed = F.trim(F.regexp_replace(stripped, "[ \\t]+", " "))
    return df.select(
        F.col(id_col),
        collapsed.alias("text"),
        (collapsed != F.col(text_col)).alias("changed"),
    )


def group_split(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Leakage-free train/val/test assignment: every row of a GROUP
    (conversation, user, document family) lands in the same split, so
    evaluation data can never share a group with training data. Adds a
    ``split`` column.

    Assignment is ``hash48(seed:group) / 2^48`` against the cumulative
    weight ladder — a pure map-side expression: NO shuffle, no RNG state,
    stable across runs/retries/speculative tasks, and adding corpus
    shards later never reassigns existing groups. The engine-shared md5
    idiom makes the DuckDB twin exact.

    ``weights`` must sum to 1 (within 1e-9); iteration order fixes which
    split owns each hash interval, so use a plain dict with a stable
    insertion order (e.g. train/val/test). Rows with a NULL group key get
    ``split = NULL`` — unkeyable rows must be visibly quarantined, not
    silently folded into the last split (which would skew its fraction
    and put them in evaluation data).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    h = _md5_unit48(F.concat(F.lit(f"{seed}:"), F.col(group_col).cast("string")))
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = h < F.lit(int(acc * 2**48))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(
        "split",
        F.when(F.col(group_col).isNull(), F.lit(None).cast("string")).otherwise(expr),
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 "Data
    Selection for Language Models via Importance Resampling",
    length-normalized bigram variant): score every RAW document under an
    add-alpha bigram model of the TARGET corpus and one of the RAW
    corpus; ``dsir_logw = mean ln p_target - mean ln p_raw`` — positive
    means the document looks more like the target domain than like the
    raw pool, so selecting/reweighting by it steers a pretraining
    mixture toward the target distribution.

    Bigrams unseen by a model back off to ``alpha / (C(w1) + alpha·V)``
    with C-values 0 (left joins + coalesce), so cross-domain documents
    score finitely. Scale shape: each model is a vocabulary²-bounded
    count table (map-side combined, localCheckpoint-pinned like
    :func:`bigram_lm_score`); scoring is two model joins over the raw
    bigram stream — AQE picks broadcast when the model fits. Vocabulary
    sizes are collected as literals (2 one-row jobs).
    """
    big = _bigram_rows(raw, text_col, id_col)

    def fit(rows: DataFrame):
        bc = (
            rows.groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("c12"))
            .localCheckpoint(eager=True)
        )
        ctx = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
        v = bc.select(F.count_distinct("w2").alias("v")).first()["v"]
        return bc, ctx, int(v) if v else 1

    def logp(c12: str, c1: str, v: int):
        return F.log(
            (F.coalesce(F.col(c12), F.lit(0)).cast("double") + F.lit(alpha))
            / (
                F.coalesce(F.col(c1), F.lit(0)).cast("double")
                + F.lit(alpha) * F.lit(float(v))
            )
        )

    tb, tc, tv = fit(_bigram_rows(target, text_col, id_col))
    rb, rc, rv = fit(big)
    # ONE pass over the raw bigram stream: both model joins feed a single
    # per-doc aggregate — scoring each model separately would re-explode
    # the raw corpus and add a second shuffle plus a doc-level join
    joined = (
        big.join(tb.select("w1", "w2", F.col("c12").alias("_tc12")), ["w1", "w2"], "left")
        .join(tc.select("w1", F.col("c1").alias("_tc1")), ["w1"], "left")
        .join(rb.select("w1", "w2", F.col("c12").alias("_rc12")), ["w1", "w2"], "left")
        .join(rc.select("w1", F.col("c1").alias("_rc1")), ["w1"], "left")
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(
            F.avg(logp("_tc12", "_tc1", tv)) - F.avg(logp("_rc12", "_rc1", rv)), 6
        ).alias("dsir_logw"),
    )


def pmi_cooccurrence(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information over within-document token
    co-occurrence: ``pmi(x, y) = ln( p(x,y) / (p(x)·p(y)) )`` with
    probabilities over documents (distinct presence, unordered pairs
    x < y) — the classic distributional-semantics association table
    (word2vec's shifted-PMI matrix, collocation mining).

    Scale shape: distinct (doc, token) explode → token document
    frequencies (one agg) + within-doc pair counts via a self-join of
    the distinct token stream ON THE DOC KEY (pairs bounded per doc by
    its distinct-token count, AQE-skew-splittable) → one more agg, then
    a broadcast-sized join of the two frequency tables onto the pairs.
    ``min_count`` floors the pair support so the PMI table stays the
    vocabulary-pair size of frequent terms, not the corpus size.
    """
    from sopspark.text.search import tokens_col

    # null-id rows excluded EVERYWHERE (the SQL twin's COUNT(DISTINCT)
    # ignores nulls — counting them here would shift every pmi value)
    base = docs.where(F.col(id_col).isNotNull())
    toks = (
        base.select(F.col(id_col).alias("_d"), F.explode(F.array_distinct(tokens_col(text_col))).alias("_t"))
        .distinct()
    )
    # the doc denominator rides along as a lazy 1-row broadcast — no
    # eager count job at construction time, keeping the operator a pure
    # DataFrame-in/DataFrame-out transform like the rest of the package
    ndf = base.select(F.count_distinct(id_col).cast("double").alias("_nd"))
    tf = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    a = toks.select(F.col("_d"), F.col("_t").alias("x"))
    b = toks.select(F.col("_d"), F.col("_t").alias("y"))
    pairs = (
        a.join(b, "_d")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
        .where(F.col("n_xy") >= min_count)
    )
    fx = tf.select(F.col("_t").alias("x"), F.col("_df").alias("_dx"))
    fy = tf.select(F.col("_t").alias("y"), F.col("_df").alias("_dy"))
    nd = F.col("_nd")
    return (
        pairs.join(fx, "x")
        .join(fy, "y")
        .crossJoin(F.broadcast(ndf))
        .select(
            "x", "y", "n_xy",
            F.round(
                F.log(
                    (F.col("n_xy") / nd) / ((F.col("_dx") / nd) * (F.col("_dy") / nd))
                ),
                6,
            ).alias("pmi"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted random sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, Inf. Process. Lett. 97(5) — algorithm A-Res): each row draws
    ``u = uniform(0,1]`` and the k largest values of ``u^(1/w)`` —
    equivalently ``ln(u)/w``, which avoids pow underflow — form the
    sample; inclusion probability is proportional to weight, exactly the
    "select the best k documents by quality-weighted lottery" primitive
    of data-mixing pipelines.

    Deterministic: ``u`` derives from the engine-shared 48-bit md5 hash of
    ``(seed, id)``, so the sample is stable across runs, retries, and
    engines (the DuckDB oracle replays it bit-for-bit). Rows with
    non-positive weight are never sampled (their key is -inf in the
    limit). The ranking key is rounded at 9 decimals with an id tie-break
    so a last-ulp ``ln`` divergence between engines cannot flip the
    order.

    Scale shape: map-only key projection; the global top-k plans as
    TakeOrderedAndProject (per-partition heaps + driver merge of k rows —
    never a single-partition global sort).

    Returns ``(id_col, weight_col, samp_key)`` ordered by key desc.
    """
    from sopspark.text.dedup import md5_hash48

    u = (md5_hash48(F.col(id_col).cast("string"), seed=seed) + F.lit(1)) / F.lit(
        float(2**48)
    )
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    return (
        df.where(F.col(weight_col).cast("double") > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("double").alias(weight_col),
            key.alias("samp_key"),
        )
        .orderBy(F.desc("samp_key"), F.asc(id_col))
        .limit(k)
    )
