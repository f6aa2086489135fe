"""Text-analysis operators for training-data curation.

Pure-Catalyst (JVM, whole-stage-codegen) implementations of the standard
corpus-quality battery; nothing here touches Python at runtime, so at
100 TB these are scan-bound single-pass projections with no shuffle
except the final aggregations a caller adds.

  token_counts     — whitespace tokens (T1) + a BPE-ish subword proxy:
                     runs of word chars OR single non-word-non-space
                     chars, the standard pre-tokenizer split.
  quality_features — length / punctuation / stopword / uppercase /
                     repetition ratios; composite score in [0, 1].
  lang_id          — stopword-overlap n-gram-free heuristic over a fixed
                     per-language lexicon (en/es/fr/de). argmax with a
                     deterministic tie order.
  fingerprint      — 60-bit content hash + min-shingle (winnowing-style)
                     hash for copy detection across re-crawls.
  repetition_features — Gopher-style within-doc repetition battery
                     (dup-token / top-bigram / dup-trigram fractions).
  ngram_contamination — train/eval n-gram overlap (decontamination).
  pii_scrub        — email/IP/SSN/phone redaction + counts.
  dataset_split    — deterministic leakage-safe train/val/test split.

All regexes use portable POSIX-ish classes so the DuckDB oracle matches
byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import phash
from ..functions.tokenize import tokens_col

# BPE-ish pre-tokenizer: word-char runs or single punctuation marks.
SUBWORD_RE = "[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es", "se", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est", "du", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "den", "von", "mit"],
}
LANG_ORDER = ["en", "es", "fr", "de"]  # deterministic tie-break order


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_subwords, avg_token_len)."""
    toks = tokens_col("text")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(SUBWORD_RE), 0)).alias("n_subwords"),
        F.when(
            F.size(toks) > 0,
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
            / F.size(toks),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_token_len"),
    )


def _ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))


def quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, punct_ratio, stopword_ratio,
    upper_ratio, unique_token_ratio, quality_score).

    quality_score blends the classic filters (Gopher/C4-style): enough
    tokens, low punctuation noise, some stopwords, low repetition."""
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    toks = tokens_col("text")
    base = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        toks.alias("toks"),
        F.size(F.regexp_extract_all("text", F.lit("[^A-Za-z0-9_ \\t\\n]"), 0)).alias("n_punct"),
        F.size(F.regexp_extract_all("text", F.lit("[A-Z]"), 0)).alias("n_upper"),
    )
    feats = base.select(
        "doc_id",
        "n_chars",
        F.size("toks").alias("n_tokens"),
        _ratio(F.col("n_punct"), F.col("n_chars")).alias("punct_ratio"),
        _ratio(
            F.size(F.filter(F.col("toks"), lambda t: F.array_contains(en_stop, F.lower(t)))),
            F.size("toks"),
        ).alias("stopword_ratio"),
        _ratio(F.col("n_upper"), F.col("n_chars")).alias("upper_ratio"),
        _ratio(F.size(F.array_distinct("toks")), F.size("toks")).alias("unique_token_ratio"),
    )
    score = (
        F.when(F.col("n_tokens") >= 10, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("punct_ratio") <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.lit(0.25) * F.least(F.col("stopword_ratio") * 5, F.lit(1.0))
        + F.lit(0.25) * F.col("unique_token_ratio")
    )
    return feats.withColumn("quality_score", score)


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_hits) — argmax of distinct-stopword hits
    per language lexicon; 'und' when nothing matches."""
    low = F.array_distinct(F.transform(tokens_col("text"), F.lower))
    hit_cols = {
        lang: F.size(
            F.array_intersect(low, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
        )
        for lang in LANG_ORDER
    }
    sel = docs.select("doc_id", *[c.alias(f"hits_{lang}") for lang, c in hit_cols.items()])
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_ORDER])
    pred = F.lit("und")
    for lang in reversed(LANG_ORDER):  # earlier langs win ties
        pred = F.when((best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)).otherwise(pred)
    return sel.select("doc_id", pred.alias("lang_pred"), best.alias("lang_hits"))


def fingerprints(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """(doc_id, content_hash, min_shingle_hash) — exact-copy hash plus the
    winnowing-style minimum shingle hash (stable under small edits)."""
    from .dedup import doc_shingles

    content = docs.select("doc_id", phash(F.col("text")).alias("content_hash"))
    min_sh = (
        doc_shingles(docs, shingle_n)
        .select("doc_id", phash(F.col("shingle")).alias("h"))
        .groupBy("doc_id")
        .agg(F.min("h").alias("min_shingle_hash"))
    )
    return content.join(min_sh, "doc_id", "left")


# ---------------------------------------------------------------------------
# PII scrubbing and deterministic dataset splitting
# ---------------------------------------------------------------------------

# RE2-safe (no backrefs/lookaround) so the DuckDB oracle uses the SAME
# patterns; \b and the classes below behave identically in Java regex
# and RE2 on ASCII input. Order matters: emails first (their local part
# can contain digits), then IPs (before phones, which could eat the
# first 10 digits of a dotted quad), then SSNs, then phones.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "[PHONE]"),
]


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, text_redacted, n_email, n_ipv4, n_ssn, n_phone): redact
    the standard PII battery and count what was removed.

    Pure Catalyst — a chain of ``regexp_count`` + ``regexp_replace``
    projections inside one whole-stage-codegen span; at 100 TB this is
    a scan-bound map with zero shuffle (the training-data scrub pass
    runs as a projection on ingest). Counts are computed BEFORE any
    replacement, on the raw text, so pattern order affects only the
    redacted string, never the counts."""
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        *[
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ],
    )
    red = F.col("_t")
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return out.select(
        "doc_id",
        red.alias("text_redacted"),
        *[f"n_{name}" for name, _, _ in PII_PATTERNS],
    )


def _ngrams_col(tokens: Column, n: int) -> Column:
    """Space-joined token n-grams as an array column. Empty array for
    docs shorter than n (sequence(0, negative) would DESCEND — guarded)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
    )
    return F.when(F.size(tokens) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_features(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, dup_token_frac, top_bigram_frac,
    dup_trigram_frac) — the Gopher-style within-document repetition
    battery (Rae et al. 2021 §A1.1: "fraction of characters in the most
    common n-gram" / "fraction of characters in duplicated n-grams",
    here over T1 tokens):

      dup_token_frac   — 1 - distinct/total tokens
      top_bigram_frac  — occurrences of the most frequent 2-gram / all
                         2-gram occurrences
      dup_trigram_frac — fraction of 3-gram occurrences whose gram
                         appears more than once

    Shape at scale: per-doc n-gram histograms via explode + two-level
    hash agg on (doc_id, gram) — partial (map-side combine) then final,
    ONE shuffle keyed by doc_id+gram so no doc concentrates a task; the
    alternative per-row array fold is O(distinct x len) per doc and
    blows up on long documents. Zero Python at runtime."""
    toks = tokens_col("text")
    base = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        _ratio(
            F.size(toks) - F.size(F.array_distinct(toks)), F.size(toks)
        ).alias("dup_token_frac"),
        _ngrams_col(toks, 2).alias("_g2"),
        _ngrams_col(toks, 3).alias("_g3"),
    )

    def _gram_stats(col: str, agg: Column, out: str) -> DataFrame:
        cnt = (
            base.select("doc_id", F.explode(col).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return cnt.groupBy("doc_id").agg(agg.alias(out))

    top2 = _gram_stats(
        "_g2", F.max("c").cast("double") / F.sum("c"), "top_bigram_frac"
    )
    dup3 = _gram_stats(
        "_g3",
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("double")
        / F.sum("c"),
        "dup_trigram_frac",
    )
    return (
        base.select("doc_id", "n_tokens", "dup_token_frac")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("dup_trigram_frac", F.lit(0.0)).alias("dup_trigram_frac"),
        )
    )


def ngram_contamination(
    docs: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """(doc_id, n_ngrams, n_contaminated, contamination_frac) — the
    standard train/test decontamination check (GPT-3 appendix C shape):
    for each training document, the fraction of its DISTINCT token
    n-grams that also occur anywhere in the benchmark corpus.

    ``benchmark`` is any (doc_id, text) relation holding the held-out
    eval sets. Eval sets are small by definition, so the benchmark's
    distinct n-gram set broadcasts and the probe is a map-side hash
    join against the (far larger) training scan — no shuffle of the
    training side. Docs shorter than n yield n_ngrams = 0, frac 0.0."""
    toks = tokens_col("text")
    d = docs.select(
        "doc_id",
        F.explode_outer(F.array_distinct(_ngrams_col(toks, n))).alias("g"),
    )
    bench = (
        benchmark.select(F.explode(_ngrams_col(toks, n)).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = d.join(F.broadcast(bench), "g", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.col("g")).cast("int").alias("n_ngrams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("int").alias("n_contaminated"),
        _ratio(F.coalesce(F.sum("_hit"), F.lit(0)), F.count(F.col("g"))).alias(
            "contamination_frac"
        ),
    )


def dataset_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Add a deterministic ``split`` column (train/val/test/...) by
    hashing the row id — the standard leakage-safe dataset partition.

    Assignment: ``phash(salt || id) % 10_000`` lands in cumulative
    weight buckets, so membership is a pure function of (salt, id) —
    stable across runs, cluster sizes, and row order, and any row keeps
    its split when the corpus grows (unlike randomSplit, whose
    assignment depends on partitioning). Weights are normalized;
    boundaries use integer basis points. Zero shuffle — one projection.
    """
    total = sum(weights.values())
    names, bounds, acc = [], [], 0
    for name, w in weights.items():
        acc += w
        names.append(name)
        bounds.append(int(round(acc / total * 10_000)))
    bounds[-1] = 10_000  # rounding guard: last bucket absorbs residue
    h = F.pmod(phash(F.concat(F.lit(salt + "-"), F.col(id_col).cast("string"))), F.lit(10_000))
    expr = F.lit(names[-1])
    for name, hi in zip(reversed(names[:-1]), reversed(bounds[:-1])):
        expr = F.when(h < hi, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


# GPT-2-style pre-tokenization pieces, ASCII-restricted so the same
# pattern means the same thing in Java regex (Spark), RE2 (DuckDB
# oracle), and Python re (tests) — no lookarounds, no unicode classes
BPE_PIECE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+|\s+"


def bpe_piece_counts(docs: DataFrame) -> DataFrame:
    """Tokenizer-piece statistics per document: the number of GPT-2-style
    pre-tokenization pieces (``BPE_PIECE_RE``) and the chars-per-piece
    ratio — the cheap proxy a curation pipeline uses for "how many LLM
    tokens will this cost" and for flagging token-inefficient content
    (boilerplate markup, hex dumps score low chars/piece). Whole-stage
    codegen projection, zero shuffle; the regex count is the piece count
    a byte-level BPE would start from (merges only reduce it).

    Returns (doc_id, n_chars, n_pieces, chars_per_piece)."""
    pieces = F.regexp_extract_all("text", F.lit(f"({BPE_PIECE_RE})"), 1)
    n_pieces = F.size(pieces)
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_pieces.alias("n_pieces"),
        F.when(n_pieces > 0, F.length("text") / n_pieces)
        .otherwise(F.lit(0.0))
        .alias("chars_per_piece"),
    )


def dataset_mix(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-domain subsampling to target mixture rates — the
    companion of :func:`dataset_split` for LLM-data mixture weighting
    ("keep 100% of code, 30% of web, 5% of boilerplate"). Membership is a
    pure function of (salt, id): ``phash(salt || id) % 10^6 < rate·10^6``
    per group, so the sample is stable across runs/cluster sizes, is a
    SUBSET of any higher-rate sample of the same salt (rates can be
    tuned monotonically without churn), and composes with
    ``dataset_split`` under a different salt. Groups absent from
    ``rates`` keep ``default_rate``. Zero shuffle — one projection +
    filter, pushed to the scan."""
    h = F.pmod(
        phash(F.concat(F.lit(salt + "-"), F.col(id_col).cast("string"))),
        F.lit(1_000_000),
    )
    thresh = F.lit(int(round(default_rate * 1_000_000)))
    for name, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(group_col).cast("string") == name,
            F.lit(int(round(rate * 1_000_000))),
        ).otherwise(thresh)
    return df.filter(h < thresh)


def pack_shards(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    salt: str = "pack-v1",
    npart: int | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training shards — the
    "write N ~equal shards" step of a dataset export, deterministic and
    fully distributed.

    Documents are ordered by ``phash(salt || id)`` (a stable
    data-independent permutation that decorrelates shard membership from
    source order — adjacent source docs land in different shards), the
    GLOBAL running token total is computed with the same two-phase
    range-partition + per-partition-offset pattern as
    functions/ordinal.dense_ordinal (no single-partition window), and

        shard_id = floor(tokens_before_doc / budget_tokens)

    Docs are never split, so a shard can overflow by at most its last
    document. Returns (id, n_tokens, shard_id).

    Scale shape: one range shuffle on the hash key + a tiny per-partition
    sum collect (#partitions rows) — the window below is per-PARTITION,
    never global."""
    spark = docs.sparkSession
    npart = npart or max(spark.sparkContext.defaultParallelism, 4)
    key = phash(F.concat(F.lit(salt + "-"), F.col(id_col).cast("string")))
    toks = docs.select(
        F.col(id_col),
        F.size(tokens_col("text")).alias("n_tokens"),
        key.alias("_k"),
    )
    ranged = (
        toks.repartitionByRange(npart, "_k", id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        sums = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
        offsets, acc = {}, 0
        for r in sorted(sums, key=lambda r: r._pid):
            offsets[r._pid] = acc
            acc += int(r.s or 0)
        off_df = spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
        )
        w = (
            Window.partitionBy("_pid")
            .orderBy("_k", id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        out = (
            ranged.withColumn(
                "_cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            )
            .join(F.broadcast(off_df), "_pid")
            .select(
                id_col,
                "n_tokens",
                F.floor((F.col("_off") + F.col("_cum")) / F.lit(int(budget_tokens)))
                .cast("long")
                .alias("shard_id"),
            )
        )
        # materialization contract mirrors dense_ordinal: the count pass and
        # the window pass must see the same sampled range boundaries, so the
        # intermediate stays pinned until the result is consumed; localCheckpoint
        # cuts the lineage so the caller needs no unpersist choreography
        out = out.localCheckpoint(eager=True)
    finally:
        ranged.unpersist()
    return out


def lm_cross_entropy(docs: DataFrame, k_smooth: float = 1.0) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained bigram language
    model with add-k smoothing — the classic statistical-LM quality
    signal a curation pipeline uses to rank documents by "fluency"
    relative to the corpus (the cheap stand-in for a neural-perplexity
    filter; cf. the CCNet/KenLM filtering recipe).

        P(w2|w1) = (C(w1,w2) + k) / (C(w1·) + k·V)
        ce(doc)  = -(1/B) Σ_positions ln P(w2|w1)

    with C(w1·) the bigram-context count (Σ_w2 C(w1,w2)), V the corpus
    vocabulary size, and B the document's bigram count (multiplicity as
    written). Lower = more typical of the corpus; boilerplate repeated
    corpus-wide scores low, line noise scores high.

    Shape at scale: one zip_with + explode into per-position bigrams,
    then a (doc_id, w1, w2) hash agg; corpus bigram counts REUSE that
    aggregate (sum of m) rather than re-shuffling raw pairs, context
    counts reuse the bigram counts, and the vocabulary size is a 1-row
    broadcast. The only corpus-sized joins are doc-bigrams ⋈ bigram
    counts (equi-join on the bigram key, the same zipf distribution the
    posting build salts) — nothing quadratic, no Python.

    Returns (doc_id, n_bigrams, cross_entropy); documents with fewer
    than 2 tokens have no bigrams and are absent (nothing to score).
    """
    toks = docs.select("doc_id", tokens_col("text").alias("l"))
    tail = F.slice(F.col("l"), 2, F.greatest(F.size("l") - 1, F.lit(0)))
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                "l", tail, lambda x, y: F.struct(x.alias("w1"), y.alias("w2"))
            )
        ).alias("p"),
    ).filter(F.col("p.w2").isNotNull())
    dbig = (
        pairs.select("doc_id", "p.w1", "p.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    big = dbig.groupBy("w1", "w2").agg(F.sum("m").alias("c12"))
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = toks.select(F.explode("l").alias("term")).agg(
        F.countDistinct("term").cast("double").alias("v")
    )
    k = F.lit(float(k_smooth))
    lp = F.log(
        (F.col("c12") + k) / (F.col("c1") + k * F.col("v"))
    )
    return (
        dbig.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("int").alias("n_bigrams"),
            (-F.sum(F.col("m") * lp) / F.sum("m")).alias("cross_entropy"),
        )
    )


def collocations_pmi(docs: DataFrame, min_count: int = 5) -> DataFrame:
    """Corpus-level bigram collocation mining by pointwise mutual
    information — the classic "significant phrase" detector (Church &
    Hanks 1990) a curation pipeline runs to find multi-word entities
    worth protecting from tokenization or dedup shingling.

    PMI(w1, w2) = ln( P(w1,w2) / (P(w1) P(w2)) ) with
    P(w1,w2) = c12 / T (T = total bigrams) and P(w) = c / N
    (N = total tokens). Rare pairs have unstable PMI, so pairs with
    c12 < ``min_count`` are dropped (standard practice).

    Shape at scale: one explode + hash agg for unigrams, one zip_with +
    explode + hash agg for bigrams (both map-side combining, keyed by
    term — the same key distribution as the posting build, so the same
    AQE skew handling applies), then two vocab-sized equi-joins and a
    1-row totals broadcast. No self-joins, nothing quadratic.

    Returns (w1, w2, c12, pmi) — caller ranks/limits.
    """
    toks = docs.select(tokens_col("text").alias("l"))
    uni = (
        toks.select(F.explode("l").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tail = F.slice(F.col("l"), 2, F.greatest(F.size("l") - 1, F.lit(0)))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                "l", tail, lambda x, y: F.struct(x.alias("w1"), y.alias("w2"))
            )
        ).alias("p")
    ).filter(F.col("p.w2").isNotNull())
    big = (
        pairs.select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    totals = uni.agg(
        F.sum("c").cast("double").alias("n_tok")
    ).crossJoin(
        pairs.agg(F.count(F.lit(1)).cast("double").alias("n_big"))
    )
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    return (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c12",
            F.log(
                (F.col("c12") * F.col("n_tok") * F.col("n_tok"))
                / (F.col("n_big") * F.col("c1") * F.col("c2"))
            ).alias("pmi"),
        )
    )


def quality_stratified_sample(
    docs: DataFrame,
    bounds: list[float],
    rates: list[float],
    salt: str = "qsample-v1",
    id_col: str = "doc_id",
    k_smooth: float = 1.0,
) -> DataFrame:
    """CCNet-style perplexity-stratified sampling (Wenzek et al. 2020):
    bucket documents by bigram-LM cross-entropy — ascending ``bounds``
    cut points give len(bounds)+1 buckets (head = most corpus-typical)
    — and keep a deterministic per-bucket rate, e.g. keep all of head,
    half of middle, a tenth of tail. ``rates[i]`` is the keep rate of
    bucket i; len(rates) must be len(bounds)+1.

    Membership reuses the dataset_mix rule — a pure function of
    (salt, id) — so samples are stable across runs and cluster sizes,
    monotone under rate increases, and compose with dataset_split /
    dataset_mix under different salts. Documents too short to score
    (< 2 tokens, no bigram) land in the LAST bucket (unknown quality is
    treated as tail). Returns the kept docs as (doc_id, cross_entropy
    NULL-able, bucket).

    Scale shape: the LM scoring is lm_cross_entropy's linear joins; the
    bucket gate is then one projection + filter — no extra shuffle
    beyond the scoring itself."""
    if len(rates) != len(bounds) + 1:
        raise ValueError("rates must have len(bounds)+1 entries")
    ce = lm_cross_entropy(docs, k_smooth=k_smooth).select(
        id_col, "cross_entropy"
    )
    joined = docs.select(id_col).join(ce, id_col, "left")
    bucket = F.when(
        F.col("cross_entropy").isNull(), F.lit(len(bounds))
    )
    expr = F.lit(0)
    for b in bounds:
        expr = expr + F.when(
            F.col("cross_entropy") >= F.lit(float(b)), 1
        ).otherwise(0)
    bucket = bucket.otherwise(expr)
    h = F.pmod(
        phash(F.concat(F.lit(salt + "-"), F.col(id_col).cast("string"))),
        F.lit(1_000_000),
    )
    thresh = F.lit(int(round(rates[-1] * 1_000_000)))
    for i in range(len(rates) - 2, -1, -1):
        thresh = F.when(
            F.col("bucket") == i, F.lit(int(round(rates[i] * 1_000_000)))
        ).otherwise(thresh)
    return (
        joined.withColumn("bucket", bucket.cast("int"))
        .filter(h < thresh)
        .select(id_col, F.round("cross_entropy", 6).alias("cross_entropy"), "bucket")
    )


def dsir_importance(
    docs: DataFrame,
    target_pred: Column,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, weight) — DSIR-style data selection via importance
    weights (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score every document by how much more
    likely its unigrams are under the TARGET distribution (docs matching
    ``target_pred``) than under the RAW pool, weight(d) = sum over token
    occurrences of log p_target(w) - log p_raw(w), both add-``alpha``
    smoothed over the raw pool's vocabulary. High weight = "looks like
    the target domain"; downstream callers resample/top-k by it.

    The paper hashes n-grams into 10^4 buckets so the feature space is
    fixed-size; here the raw vocabulary plays that role directly (the
    driver corpus has 31 terms; at web scale swap the term key for
    ``phash(term) % n_buckets`` — same plan shape, bounded key space).

    Scale shape: ONE tokenize+explode pass feeding (a) the doc-term tf
    agg and (b) two vocab-keyed count aggs (target-filtered and raw);
    the per-term log-ratio relation is vocabulary-sized and joins back
    onto doc_tf by term (broadcastable when hashed to buckets); final
    doc-keyed sum. No quadratics, no Python, map-side partials on every
    agg."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_target"),
        tokens_col(text_col).alias("toks"),
    )
    occ = toks.select(
        "doc_id", "is_target", F.explode("toks").alias("term")
    )
    dtf = occ.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    counts = occ.groupBy("term").agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.sum(F.col("is_target").cast("long")).alias("tgt_n"),
    )
    totals = counts.agg(
        F.sum("raw_n").alias("raw_total"),
        F.sum("tgt_n").alias("tgt_total"),
        F.count(F.lit(1)).alias("vocab"),
    )
    a = F.lit(float(alpha))
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        (
            F.log(
                (F.col("tgt_n").cast("double") + a)
                / (F.col("tgt_total").cast("double") + a * F.col("vocab"))
            )
            - F.log(
                (F.col("raw_n").cast("double") + a)
                / (F.col("raw_total").cast("double") + a * F.col("vocab"))
            )
        ).alias("log_ratio"),
    )
    return (
        dtf.join(ratio, "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf").cast("double") * F.col("log_ratio")).alias("weight"))
    )


def dsir_topk(
    docs: DataFrame,
    target_pred: Column,
    k: int = 20,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, weight, rank) — the top-k selection tail over
    dsir_importance: the documents from the raw pool most like the
    target domain. Deterministic tie-break on doc_id; one global
    window over the (already tiny) agg output — at scale replace with
    the two-phase quantile select pack_shards uses if k grows beyond
    driver-window comfort."""
    w = Window.orderBy(F.desc(F.round("weight", 6)), F.asc("doc_id"))
    return (
        dsir_importance(docs, target_pred, alpha, id_col, text_col)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "weight", "rank")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsample-v1",
) -> DataFrame:
    """(id, weight, wkey, rank) — deterministic weighted sampling WITHOUT
    replacement (Efraimidis & Spirakis 2006): key_i = u_i^(1/w_i) with
    u_i a uniform in (0, 1]; the k largest keys are distributed exactly
    as k sequential weighted draws without replacement. Rows with
    weight <= 0 are excluded (their draw probability is 0).

    u_i comes from the portable 60-bit hash of (salt, id) — the same
    derandomization as dataset_split/dataset_mix, so the sample is a
    pure function of (salt, id, weight): stable across runs,
    partitionings, and engine (the SQL oracle replays it exactly), and
    any surviving row keeps its key when the corpus grows. Keys are
    6-dp-rounded before ranking with id tie-break (house convention) so
    pow()'s last-ulp engine differences cannot flip an ordering.

    Scale shape: one zero-shuffle projection computes keys, then the
    rank-k filter is a per-partition top-k (TakeOrderedAndProject /
    WindowGroupLimit) — no global sort of the corpus. This is the
    quality-weighted corpus subsampling step (sample proportional to
    quality/importance scores) that sits between scoring and packing in
    a curation pipeline."""
    u = (
        phash(F.concat(F.lit(salt + "-"), F.col(id_col).cast("string")))
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    keyed = (
        df.filter(w > 0)
        .select(
            F.col(id_col),
            w.alias("weight"),
            F.round(F.pow(u, F.lit(1.0) / w), 6).alias("wkey"),
        )
    )
    win = Window.orderBy(F.desc("wkey"), F.asc(id_col))
    return (
        keyed.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )
