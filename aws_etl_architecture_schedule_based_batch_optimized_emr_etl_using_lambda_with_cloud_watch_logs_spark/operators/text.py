"""Text-analysis operators (SURVEY §2.M4): token counting, quality
scoring, language ID, document fingerprinting.

Design rule: every score is a deterministic closed-form column
expression (``split`` / ``filter`` / ``size`` / ``md5`` …) so (a) it
runs JVM-side with codegen at any scale and (b) an independent SQL
engine (the DuckDB oracle) can reproduce it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col

# Tiny deterministic stopword inventories for the n-gram/stopword
# language heuristic. Public knowledge (most-frequent function words).
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "los", "las", "en", "un", "una", "por"],
    "fr": ["le", "la", "les", "des", "est", "dans", "que", "une", "pour", "sur"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
}


def token_count_col(text: str | Column = "text") -> Column:
    return F.size(tokens_col(text))


def _lit_array(words: list[str]) -> Column:
    return F.array(*[F.lit(w) for w in words])


def stopword_hits_col(tokens: Column, lang: str) -> Column:
    """Number of tokens (with multiplicity) that are stopwords of
    ``lang``."""
    return F.size(
        F.filter(tokens, lambda t: F.array_contains(_lit_array(STOPWORDS[lang]), t))
    )


def language_id(
    df: DataFrame, text_col: str = "text", langs: list[str] | None = None
) -> DataFrame:
    """Heuristic language ID: the language whose stopword inventory
    hits the most tokens wins; ties break in ``langs`` order;
    zero hits → 'und'. Adds ``pred_lang`` and per-language hit
    counts."""
    langs = langs or list(STOPWORDS)
    toks = tokens_col(text_col)
    df = df.withColumn("_toks", toks)
    for lang in langs:
        df = df.withColumn(f"hits_{lang}", stopword_hits_col(F.col("_toks"), lang))
    best = F.lit("und")
    best_hits = F.lit(0)
    # Iterate in priority order; strict > keeps earlier-lang ties.
    for lang in langs:
        hits = F.col(f"hits_{lang}")
        take = hits > best_hits
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_hits = F.when(take, hits).otherwise(best_hits)
    return df.withColumn("pred_lang", best).drop("_toks")


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality-scoring features: lengths, token stats, punctuation and
    stopword ratios, alpha ratio. All closed-form expressions."""
    text = F.col(text_col)
    toks = tokens_col(text_col)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars / n_tokens, 6).alias("avg_token_len"),
        F.round(
            F.size(F.array_distinct(toks)) / n_tokens, 6
        ).alias("distinct_token_ratio"),
        # n_chars = 0 (empty doc) guards: under ANSI mode x/0 throws
        # ArithmeticException, so one empty document would kill the
        # whole quality scan; both ratios are conventionally 0 there
        # (n_tokens is never 0 — the phantom '' token — so the other
        # denominators are safe)
        F.when(
            n_chars > 0,
            F.round(
                (n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", "")))
                / n_chars,
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("punct_ratio"),
        F.when(
            n_chars > 0,
            F.round(
                (n_chars - F.length(F.regexp_replace(text, r"[a-zA-Z]", "")))
                / n_chars,
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("alpha_ratio"),
        F.round(
            stopword_hits_col(toks, "en") / n_tokens, 6
        ).alias("en_stopword_ratio"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic document fingerprint: md5 of the sorted distinct
    token set (classic "fingerprint clustering" for dedup — robust to
    token order and repetition). Reproducible in any engine with
    md5."""
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
        ).alias("fingerprint"),
    )


# Disjoint GPT-2-style token classes (no lookarounds, so the same
# pattern behaves identically under Java regex and RE2):
BPE_CLASS_PATTERNS = {
    "alpha": r" ?[a-zA-Z]+",
    "num": r" ?[0-9]+",
    "other": r" ?[^a-zA-Z0-9\s]+",
}


def bpe_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting, whitespace + BPE-ish regex classes: per doc the
    whitespace token count plus per-class subword-style counts (letter
    runs, digit runs, punctuation runs — the disjoint core of the
    GPT-2 pre-tokenizer). Closed-form ``regexp_extract_all`` counts,
    reproducible in any RE2/PCRE engine."""
    text = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for name, pat in BPE_CLASS_PATTERNS.items()
    }
    return df.select(
        F.col(id_col),
        F.size(tokens_col(text_col)).alias("n_ws_tokens"),
        counts["alpha"].alias("n_alpha_tokens"),
        counts["num"].alias("n_num_tokens"),
        counts["other"].alias("n_other_tokens"),
        (counts["alpha"] + counts["num"] + counts["other"]).alias("n_bpe_tokens"),
    )


def _winnow_powers(k: int):
    import numpy as np

    base = np.uint64(257)
    return base ** np.arange(k - 1, -1, -1, dtype=np.uint64)  # wraps mod 2^64


def _winnow_doc(text: str | None, k: int, window: int, powers):
    """Per-doc winnowing kernel: normalized text → rolling k-gram
    hashes → per-window minima → unique int64 fingerprints. Shared by
    :func:`winnow_fingerprints` and the combined-signature pass."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    norm = " ".join((text or "").lower().split())
    data = np.frombuffer(norm.encode(), dtype=np.uint8).astype(np.uint64)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)))
    grams = sliding_window_view(data, k)  # (n-k+1, k)
    hashes = (grams * powers[None, :]).sum(axis=1, dtype=np.uint64)
    if len(hashes) >= window:
        fps = sliding_window_view(hashes, window).min(axis=1)
    else:
        fps = hashes.min(keepdims=True)
    return np.unique(fps).view(np.int64)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    with_counts: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (rolling hash): polynomial
    rolling hashes over character k-grams, keeping the minimum hash
    of each sliding window of ``window`` consecutive k-gram hashes
    (the MOSS scheme — guarantees any match of length ≥ k+window-1
    shares a fingerprint). Vectorized per Arrow batch; returns one
    row per (doc, distinct fingerprint) for set-overlap joins.

    ``with_counts=True`` appends the doc's distinct-fingerprint count
    ``n_fp`` to every row, so overlap consumers need no second pass
    (and therefore no recomputation) of this Python stage.
    """
    import numpy as np
    import pandas as pd

    # the Arrow kernel packs ids with np.full(dtype=int64) and the
    # output schema is LongType — fail fast at plan time instead of
    # an opaque executor-side ValueError for a non-integral id_col
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise TypeError(
            f"winnow_fingerprints requires an integral {id_col!r} "
            f"(got {id_type}); hash or dense-rank string ids first"
        )

    powers = _winnow_powers(k)

    def gen(batches):
        for pdf in batches:
            ids_out, fps_out, counts_out = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                uniq = _winnow_doc(text, k, window, powers)
                ids_out.append(np.full(len(uniq), doc_id, dtype=np.int64))
                fps_out.append(uniq)
                if with_counts:
                    counts_out.append(
                        np.full(len(uniq), len(uniq), dtype=np.int64)
                    )
            if ids_out:
                out = {id_col: np.concatenate(ids_out),
                       "fingerprint": np.concatenate(fps_out)}
                if with_counts:
                    out["n_fp"] = np.concatenate(counts_out)
                yield pd.DataFrame(out)

    from pyspark.sql.types import LongType, StructField, StructType

    from .dedup import _parallelize_narrow

    fields = [StructField(id_col, LongType(), False),
              StructField("fingerprint", LongType(), False)]
    if with_counts:
        fields.append(StructField("n_fp", LongType(), False))
    schema = StructType(fields)
    return _parallelize_narrow(df.select(id_col, text_col)).mapInPandas(
        gen, schema
    )


# PII patterns chosen to behave identically under Java regex (Spark)
# and RE2/PCRE (DuckDB oracle): no lookarounds, ASCII classes, \b word
# boundaries only.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    # start anchored like ipv4: either a literal '+' or a word
    # boundary before the first digit — the unanchored form matched
    # (and redacted) the 12-char tail of longer digit runs like
    # "98555-123-4567". Alternation instead of lookbehind keeps the
    # RE2 (DuckDB) compatibility promise above.
    ("phone", r"(?:\+\d{3}|\b\d{3})[-. ]\d{3}[-. ]\d{4}\b"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing for training corpora: count and mask emails,
    IPv4 addresses, and phone-shaped numbers. Counts come from the
    ORIGINAL text (per class, before any masking); redaction chains
    the replacements in declaration order. Pure ``regexp_replace`` /
    ``regexp_extract_all`` column expressions — JVM codegen at any
    scale, bit-reproducible in the SQL oracle."""
    text = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    redacted = text
    for name, pat in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return df.select(
        F.col(id_col), *counts, redacted.alias("redacted")
    )


def repetition_signals(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher/C4-style repetition quality signals per document:
    the fraction of n-gram occurrences taken by the single most
    frequent n-gram (``top_ngram_frac`` — boilerplate/spam lists
    score high) and the fraction that are repeats of an earlier
    occurrence (``dup_ngram_frac``). One explode + two shrinking
    hash aggregates keyed on (doc, gram) then doc — no self-joins,
    scale-linear."""
    from .dedup import ngrams_col, tokens_col

    per_gram = (
        df.select(
            F.col(id_col),
            F.explode(ngrams_col(tokens_col(text_col), n)).alias("gram"),
        )
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.max("cnt").alias("_top"),
            F.sum("cnt").alias("_total"),
            F.count("*").alias("_distinct"),
        )
        .select(
            id_col,
            F.col("_total").alias("n_ngrams"),
            F.round(F.col("_top") / F.col("_total"), 6).alias(
                "top_ngram_frac"
            ),
            F.round(
                (F.col("_total") - F.col("_distinct")) / F.col("_total"), 6
            ).alias("dup_ngram_frac"),
        )
    )


def boilerplate_ngrams(
    df: DataFrame,
    n: int = 3,
    min_doc_frac: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate detection: word n-grams appearing in at least
    ``min_doc_frac`` of documents (headers, footers, license
    blurbs...) — the corpus-level heavy-hitter pass a C4-style
    cleaner runs before stripping. Distinct shingles per doc →
    hash-aggregate document frequency → threshold against a 1-row
    corpus count (broadcast cross join). Two shuffles total, both on
    shrinking keys; no per-pair work.

    The doc frequency is a plain ``count(*)`` (r14 optimization
    round, guide §2.3): ``shingles_col`` is ``array_distinct`` per
    doc, so the exploded (doc, ngram) rows are already unique and
    ``count_distinct(doc_id)`` computed the identical value through
    Spark's two-phase distinct aggregate — an extra (ngram, doc_id)
    keyed exchange the plain count doesn't pay."""
    from .dedup import shingles_col, tokens_col

    total = df.agg(F.count("*").alias("_n_docs"))
    docfreq = (
        df.select(
            F.col(id_col),
            F.explode(shingles_col(tokens_col(text_col), n)).alias("ngram"),
        )
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    return (
        docfreq.crossJoin(F.broadcast(total))
        .filter(F.col("doc_freq") >= F.col("_n_docs") * min_doc_frac)
        .select(
            "ngram",
            "doc_freq",
            F.round(F.col("doc_freq") / F.col("_n_docs"), 6).alias("doc_frac"),
        )
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus token frequency table: explode → hash-aggregate (the
    canonical map-side-combined word count). The phantom ''
    token that ``tokens_col`` emits for empty/whitespace-only
    documents is excluded — the same artifact convention as
    entropy_scores / bpe / drift / dsir."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )


def diversity_report(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Distinct-n diversity metrics per group: for each n, the count
    of n-gram occurrences, the count of DISTINCT n-grams, and their
    ratio — the standard text-generation/corpus diversity diagnostic
    (low distinct-2/distinct-3 ⇒ templated or repetitive data). One
    corpus scan: each doc's n-gram arrays for every n are tagged and
    concatenated, one explode, one (group, n, gram) aggregate, one
    (group, n) roll-up. The ratio is integer-exact
    (``distinct·10⁶ DIV total``) so any engine reproduces it.

    At 100 TB both aggregates are map-side-combined shrinking
    hash-aggregates keyed on (group, n, gram) then (group, n) — the
    same shuffle bound as the word-count."""
    from .dedup import ngrams_col

    # empty/whitespace-only docs contribute no n-grams: tokens_col
    # gives them one phantom '' token, and ngrams_col's short-doc
    # fallback would mint a '' gram per n — filter the docs out
    # instead (ngrams_col already returns the tokens for n == 1, so
    # no per-n special case is needed)
    toks = F.array_remove(tokens_col(text_col), "")

    def _tag(n: int):
        # a 2-arg lambda would make transform() pass (element, index)
        # and bind the index over the closure default — close properly
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.concat(*[F.transform(ngrams_col(toks, n), _tag(n)) for n in ns])
    per_gram = (
        df.filter(F.size(toks) > 0)
        .select(F.col(group_col), F.explode(tagged).alias("t"))
        .select(group_col, F.col("t.n").alias("n"), F.col("t.gram").alias("gram"))
        .groupBy(group_col, "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_ngrams"),
            F.countDistinct("gram").cast("bigint").alias("distinct_ngrams"),
        )
    )
    return per_gram.withColumn(
        "distinct_ratio_q",
        F.expr("CAST(distinct_ngrams * 1000000 DIV total_ngrams AS BIGINT)"),
    )


def zipf_slope(
    df: DataFrame, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """Zipf-fit diagnostic: least-squares slope of ln(freq) over
    ln(rank) for the top-k tokens. Natural corpora sit near −1;
    a much flatter slope flags templated/synthetic data, a steeper
    one flags tiny-vocabulary degeneracy — a one-row corpus health
    check for dataset cards.

    Plan: word-count aggregate → TakeOrderedAndProject top-k (rank
    ties broken on the token so both engines agree) → closed-form
    least squares from four sums over k rows. Results quantized at
    1e4 (float enters only via ln over ≤k values)."""
    freq = (
        df.select(F.explode(tokens_col(text_col)).alias("token"))
        # a corpus heavy in empty docs would otherwise rank the
        # phantom '' token into the fit and skew the slope
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(top_k)
    )
    # Global (unpartitioned) window — Spark warns, but the input is
    # the already-limited top_k ≤ 100 frame, so the single-partition
    # WindowExec touches ≤ 100 rows regardless of corpus size.
    w = Window.orderBy(F.desc("n"), "token")
    xy = freq.withColumn("rank", F.row_number().over(w)).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    agg = xy.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("k")
    return agg.select(
        F.col("k").cast("bigint").alias("n_tokens_fit"),
        F.round(slope * F.lit(1e4)).cast("bigint").alias("slope_q"),
        F.round(intercept * F.lit(1e4)).cast("bigint").alias("intercept_q"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information:
    PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) with p(ab) over the bigram
    stream and p(·) over the token stream — the standard
    multiword-expression / tokenizer-merge-candidate extractor, and
    a templated-data tell (unnaturally high-PMI pairs at high count
    ⇒ boilerplate). ``min_count`` filters the unstable low-frequency
    tail; ranking is on the 1e6-quantized PMI with (w1, w2)
    tie-breaks so any engine reproduces the list.

    Plan: two map-side-combined aggregates (unigram + bigram counts)
    + two joins of the bigram frame against the vocabulary-sized
    unigram frame + one-row total frames cross-joined — all shuffles
    keyed on words, bounded by vocabulary, then
    TakeOrderedAndProject."""
    from .lm import bigrams_col

    # array_remove drops the phantom '' token of empty documents
    # from BOTH streams (and the n_tok/n_bi denominators) at once
    toks = df.select(
        F.array_remove(tokens_col(text_col), "").alias("t")
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(F.explode(bigrams_col(F.col("t"))).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    n_tok = uni.agg(F.sum("c").cast("double").alias("n_tok"))
    n_bi = (
        toks.select(
            F.greatest(F.size("t") - 1, F.lit(0)).alias("m")
        )
        .agg(F.sum("m").cast("double").alias("n_bi"))
    )
    c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    pmi = (
        F.log(
            (F.col("c_ab") / F.col("n_bi"))
            / ((F.col("c_a") / F.col("n_tok")) * (F.col("c_b") / F.col("n_tok")))
        )
        * F.lit(1e6)
    )
    return (
        bi.join(c1, ["w1"])
        .join(c2, ["w2"])
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("bigint").alias("n_pair"),
            F.round(pmi).cast("bigint").alias("pmi_q"),
        )
        .orderBy(F.desc("pmi_q"), "w1", "w2")
        .limit(top_k)
    )


def source_overlap_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Cross-slice contamination audit: for every pair of corpus
    slices (sources, dumps, shards), the count of shared distinct
    word n-gram shingles and the overlap fraction
    |A∩B| / min(|A|,|B|) — high overlap between slices that claim to
    be independent means duplicated provenance (a mirror, a re-crawl)
    and inflated effective dataset size. The fraction is
    integer-exact (``·10⁶ DIV min``).

    Plan (r14 optimization round, guide §1.2/§2.4): ONE distinct
    (slice, shingle) pass → ONE shingle-keyed aggregate collecting
    each shingle's sorted slice set → per-shingle ordered-pair
    fan-out (i ≤ j over the set, so the diagonal carries the
    per-slice sizes and the off-diagonal the co-occurrence counts)
    → one bounded ≤ n_slices² matrix, eagerly checkpointed so its
    two consumers (sizes, common) don't re-run the corpus pass.
    The pre-r14 form computed the corpus-scale ``sh`` frame THREE
    times (sizes + both sides of a shingle-keyed self-join); the
    aggregate form reads it once and shuffles it once. Per-shingle
    fan-out stays bounded by n_slices² (slices are few — this is a
    slice-level audit, not a doc-level one). Counts are exact
    integers, so results are identical to the self-join form: a
    shingle shared by slices {g₁ < g₂} contributed exactly one
    joined row per pair there and contributes exactly one struct
    per pair here; NULL slices never reached the output (NULL fails
    ``a.g < b.g``) and are likewise absent from ``collect_set``."""
    from .dedup import shingles_col

    sh = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(
                shingles_col(tokens_col(text_col), n)
            ).alias("sh"),
        )
        .distinct()
    )
    gs = sh.groupBy("sh").agg(
        F.array_sort(F.collect_set("g")).alias("gs")
    )
    pairs_ij = F.flatten(
        F.transform(
            "gs",
            lambda x, i: F.transform(
                F.slice(F.col("gs"), i + 1, F.size("gs")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    matrix = (
        gs.select(F.explode(pairs_ij).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint()
    )
    sizes = matrix.filter(F.col("a") == F.col("b")).select(
        F.col("a").alias("g"), F.col("n").alias("n_sh")
    )
    common = matrix.filter(F.col("a") != F.col("b")).select(
        F.col("a").alias("source_a"),
        F.col("b").alias("source_b"),
        F.col("n").alias("n_common"),
    )
    sa = sizes.select(
        F.col("g").alias("source_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("g").alias("source_b"), F.col("n_sh").alias("n_b")
    )
    return (
        common.join(sa, ["source_a"])
        .join(sb, ["source_b"])
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.expr(
                "CAST(n_common * 1000000 DIV least(n_a, n_b) AS BIGINT)"
            ).alias("overlap_q"),
        )
    )


def entropy_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon-entropy quality signal: per-document token-level and
    character-level entropy (nats). Low-entropy documents are
    degenerate (repeated boilerplate, keyword stuffing, padding);
    anomalously-high char entropy flags binary junk — the cheap
    compressibility proxy used by web-corpus filters alongside the
    Gopher repetition signals (``repetition_signals``).

    For counts ``c_i`` over N symbols,  H = ln N − (Σ c_i·ln c_i)/N.
    The Σ term is made integer-exact — ``c_i · round(ln(c_i)·1e6)``
    summed as BIGINT — so the per-doc result is bit-stable under any
    partitioning and byte-identical to the SQL oracle; floats enter
    only at the final ``ln N`` subtraction. Two explode → shrinking
    hash-aggregate pipelines (map-side combined), all JVM built-ins;
    at 100 TB both aggregates are keyed on (doc_id, symbol) — the
    same doc-sharded layout the corpus already has, so the shuffle
    is bounded by the distinct-symbol count per doc, not N.
    Docs with no tokens get NULL entropies.
    """
    _q = 1_000_000.0

    def _h(sym: Column, out: str, src: DataFrame) -> DataFrame:
        per = (
            src.select(F.col(id_col).alias("doc_id"), sym.alias("s"))
            .filter(F.col("s") != "")
            .groupBy("doc_id", "s")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        qlc = F.round(F.log(F.col("c").cast("double")) * F.lit(_q)).cast(
            "bigint"
        )
        return per.groupBy("doc_id").agg(
            F.sum("c").alias(f"_n_{out}"),
            F.sum(F.col("c") * qlc).alias(f"_s_{out}"),
        )

    tok = _h(F.explode(tokens_col(text_col)), "tok", df)
    chr_ = _h(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), "")), "chr", df
    )
    ent = lambda n, s: F.round(  # noqa: E731
        F.log(F.col(n).cast("double")) - F.col(s) / (F.col(n) * F.lit(_q)), 6
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(tok, ["doc_id"], "left")
        .join(chr_, ["doc_id"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_n_tok"), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
            ent("_n_tok", "_s_tok").alias("token_entropy"),
            ent("_n_chr", "_s_chr").alias("char_entropy"),
        )
    )


GOPHER_RULES = {
    # Rule → (description). Thresholds follow the Gopher paper's
    # rule SHAPES (Rae et al. 2021, Table A1), with the word-count
    # floor and stopword test adapted to this corpus's scale; each
    # is a closed-form predicate over the quality/repetition frames.
    "too_short": "n_tokens < 40",
    "too_long": "n_tokens > 100000",
    "bad_token_len": "avg_token_len outside [3, 10]",
    "low_alpha": "alpha_ratio < 0.6",
    "low_stopword": "en_stopword_ratio < 0.01 (no English glue words)",
    "repetitive": "top 2-gram frac > 0.20 or dup 2-gram frac > 0.60",
}


def gopher_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style composite quality filter: the rule-chain pass a
    curation pipeline runs before dedup. Output per doc: ``keep``
    plus a deterministic comma-joined ``reasons`` string (sorted
    rule names), so downstream accounting can report drop causes.
    One plan: the closed-form feature expressions join the
    repetition aggregate on doc_id — no extra corpus scans beyond
    ``repetition_signals``'s single explode."""
    # NULL text must FAIL the filter, not sail through it: NULL
    # features make every rule predicate NULL, array_compact drops
    # them all, and keep comes out true for exactly the document
    # most obviously droppable. The empty-document convention (same
    # as pack_sequences) routes NULLs into the too_short rule.
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    q = quality_features(df, text_col, id_col)
    r = repetition_signals(df, 2, text_col, id_col)
    j = q.join(r, [id_col], "left")
    rules = [
        ("too_short", F.col("n_tokens") < 40),
        ("too_long", F.col("n_tokens") > 100000),
        (
            "bad_token_len",
            (F.col("avg_token_len") < 3) | (F.col("avg_token_len") > 10),
        ),
        ("low_alpha", F.col("alpha_ratio") < 0.6),
        ("low_stopword", F.col("en_stopword_ratio") < 0.01),
        (
            "repetitive",
            (F.col("top_ngram_frac") > 0.20)
            | (F.col("dup_ngram_frac") > 0.60),
        ),
    ]
    reasons = F.array_compact(
        F.array(
            *[
                F.when(cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in rules
            ]
        )
    )
    return j.select(
        id_col,
        "n_tokens",
        (F.size(reasons) == 0).alias("keep"),
        F.concat_ws(",", F.array_sort(reasons)).alias("reasons"),
    )


def novelty_scores(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """N-gram novelty: the fraction of a document's distinct
    n-gram shingles that appear in NO other document. Low novelty
    marks templated/near-duplicate content the dedup pass should
    look at; corpus-level mean novelty is a diversity metric
    tracked across ingestion batches.

    Plan (r14 optimization round, guide §2.4 — remove the shuffle
    outright): a gram with df = 1 has exactly ONE (doc, gram) row,
    so its owning doc can be carried THROUGH the doc-frequency
    aggregate (``min(doc_id)`` — the only doc_id in the group) and
    the novel counts recovered from the gram-keyed frame alone:
    one shingle explode → one (gram, df, owner) aggregate → the
    df = 1 slice re-aggregated per owner (≤ one row per DOC, not
    per gram) → doc-scale left join onto per-doc shingle counts
    computed as a pure expression (``size(shingles)`` — the arrays
    are distinct per doc, so count(*) over exploded rows ≡ array
    size). The pre-r14 form joined the corpus-scale shingle frame
    back to the vocab-sized df frame on the gram key — a second
    full explode plus a shingle-keyed shuffle of the biggest frame
    in the job, both gone. Values are exact integers throughout,
    so results are bit-identical (same counts into the same
    rounded division)."""
    from .dedup import shingles_col, tokens_col

    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_col(tokens_col(text_col), n)).alias("g"),
    )
    novel = (
        sh.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.min("doc_id").alias("_owner"),
        )
        .filter(F.col("df") == 1)
        .groupBy(F.col("_owner").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(shingles_col(tokens_col(text_col), n))
        .cast("bigint")
        .alias("n_shingles"),
    )
    return base.join(novel, ["doc_id"], "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_novel"), F.lit(0))
        .cast("bigint")
        .alias("n_novel"),
        F.round(
            F.coalesce(F.col("n_novel"), F.lit(0)) / F.col("n_shingles"), 6
        ).alias("novel_frac"),
    )


def dataset_card(
    df: DataFrame,
    group_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-slice dataset-card statistics — the accounting table a
    corpus release ships (docs, token/char volume, length
    distribution, dedup-relevant distinct ratio) broken out by
    slice (lang × source by default). One map-side-combined
    aggregate; the median is an exact interpolated percentile,
    fine per-slice (slice count ≪ corpus) — swap for
    ``approx_percentile`` if slices ever have billions of rows."""
    group_cols = group_cols or ["lang", "source"]
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    return (
        df.select(
            *group_cols,
            F.length(text_col).alias("_nc"),
            n_tokens.alias("_nt"),
            # per-doc ratio floored to a 1e-6 integer via pure
            # INTEGER division (`div`) — float rounding hits
            # engine-specific half-way behavior — so the slice mean
            # is an exact-integer sum: partitioning-invariant and
            # oracle-identical
            (
                F.size(F.array_distinct(toks)).cast("bigint")
                * F.lit(1_000_000)
            ).alias("_num"),
            n_tokens.cast("bigint").alias("_den"),
        )
        .withColumn("_qdr", F.expr("_num div _den"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
            F.sum("_nc").cast("bigint").alias("n_chars"),
            F.min("_nt").cast("bigint").alias("min_tokens"),
            F.expr("percentile(_nt, 0.5)").alias("median_tokens"),
            F.max("_nt").cast("bigint").alias("max_tokens"),
            # mean via integer division as well: a decimal ROUND of
            # sum/n can land exactly on a 1e-6 half-way point, where
            # engines' tie-breaking differs (observed on the fr ×
            # src19 slice). floor-divide then scale — exact ints all
            # the way, one deterministic double at the end.
            (
                F.expr("sum(_qdr) div count(1)") / F.lit(1e6)
            ).alias("avg_distinct_ratio"),
        )
    )
