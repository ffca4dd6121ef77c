"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting — all pure Column expressions (whole-stage codegen),
SQL-portable for the DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny deterministic stopword sets for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein"],
    "fr": ["le", "la", "de", "et", "un", "est", "que"],
}
LANGS = sorted(LANG_STOPWORDS)


def _stopword_hits(words, lang: str):
    vocab = LANG_STOPWORDS[lang]
    return F.size(F.filter(words, lambda w: w.isin(*vocab)))


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish unit estimate (≈ chars/4, the usual
    subword heuristic) + distinct-token count."""
    words = F.split(F.col("text"), " ")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.ceil(F.length("text") / 4).cast("int").alias("n_subword_est"),
    )


# BPE-ish tokenization regex: letter runs, digit runs, single punctuation.
# Deliberately plain ASCII classes — identical semantics in Java and RE2/DuckDB.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
BPE_PIECE_CHARS = 4  # ≈ chars per subword piece (standard BPE heuristic)


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """Regex 'BPE-ish' token counting (the pre-tokenizer split a byte-BPE
    vocab would see) + a per-token subword-piece estimate: each regex token
    contributes ceil(len/4) pieces — a far better length estimate than
    chars/4 for punctuation-heavy text."""
    toks = F.expr(f"regexp_extract_all(text, '{BPE_TOKEN_RE}', 0)")
    pieces = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / BPE_PIECE_CHARS).cast("long"),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).alias("n_regex_tokens"),
        pieces.cast("int").alias("n_pieces"),
    )


def quality_bp_expr() -> Column:
    """The composite quality score of :func:`quality_score` as a bare
    Column over ``text`` — shared with the budget selections so they can
    compute it in the SAME projection as their token counts instead of
    self-joining two projections of the corpus scan (r6)."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    en_hits = _stopword_hits(words, "en")
    distinct_ratio = F.size(F.array_distinct(words)) / n
    stop_ratio = en_hits / n
    mean_wlen = (F.length("text") - (n - 1)) / n  # chars excluding separators
    score = (
        distinct_ratio * 0.5 + F.least(stop_ratio * 2, F.lit(1.0)) * 0.3
        + F.least(mean_wlen / 8, F.lit(1.0)) * 0.2
    )
    return F.floor(score * 10000).cast("int")


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/stopword/repetition quality features + a composite score.
    Integer-ratio math, rounded to 4 — engine-portable."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    en_hits = _stopword_hits(words, "en")
    distinct_ratio = F.size(F.array_distinct(words)) / n
    stop_ratio = en_hits / n
    mean_wlen = (F.length("text") - (n - 1)) / n  # chars excluding separators

    # basis points via floor: engine-portable (round() half-mode differs across
    # engines exactly at representable midpoints like 77/160)
    def bp(c):
        return F.floor(c * 10000).cast("int")

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.alias("n_words"),
        bp(distinct_ratio).alias("distinct_ratio_bp"),
        bp(stop_ratio).alias("stopword_ratio_bp"),
        bp(mean_wlen).alias("mean_word_len_bp"),
        quality_bp_expr().alias("quality_bp"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic: argmax over per-language hit counts
    (ties → lexicographically first language; 'und' when all zero)."""
    words = F.split(F.col("text"), " ")
    hits = {lang: _stopword_hits(words, lang) for lang in LANGS}
    sel = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lang").alias("lang_label"),
        *[hits[lang].alias(f"hits_{lang}") for lang in LANGS],
    )
    # fold in lexicographic order with strict '>' — first language wins ties
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in LANGS:
        this = F.col(f"hits_{lang}")
        best = F.when(this > best_hits, F.lit(lang)).otherwise(best)
        best_hits = F.when(this > best_hits, this).otherwise(best_hits)
    return sel.select("doc_id", "lang_label", *[f"hits_{lang}" for lang in LANGS],
                      best.alias("lang_pred"))


def repetition_stats(docs: DataFrame, gram_n: int = 2) -> DataFrame:
    """Gopher-style repetition signals: duplicate word-n-gram ratio and the
    mass of the single most frequent n-gram.  Explode n-grams → one
    map-side-combined count aggregation keyed on (doc_id, gram), then a
    per-doc rollup — two narrow shuffles, no all-pairs anything.  Integer /
    floor-basis-point math keeps values engine-portable.  Grams come from
    codegen expressions (explode(sequence) + slice + concat_ws), not an
    interpreted HOF lambda — same multiset, ~3× less per-token compute."""
    words = F.split(F.col("text"), " ")
    base = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), words.alias("w"))
        .filter(F.size("w") >= gram_n)
        .select(
            "doc_id",
            "w",
            F.explode(F.sequence(F.lit(0), F.size("w") - gram_n)).alias("i"),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.col("w"), F.col("i") + 1, gram_n)).alias(
                "gram"
            ),
        )
    )
    per_gram = base.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.max("c").alias("top_gram_count"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("int").alias("n_grams"),
            F.col("n_distinct_grams").cast("int").alias("n_distinct_grams"),
            F.col("top_gram_count").cast("int").alias("top_gram_count"),
            F.floor(
                (F.col("n_grams") - F.col("n_distinct_grams")) * 10000 / F.col("n_grams")
            ).cast("int").alias("dup_gram_bp"),
            F.floor(F.col("top_gram_count") * 10000 / F.col("n_grams"))
            .cast("int").alias("top_gram_bp"),
        )
    )


# Gopher-rule thresholds (Rae et al. 2021 §A1.1, adapted to this corpus's
# scale-free stand-ins) — module constants so the SQL oracle mirrors exactly.
GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN_BP = 20_000   # mean word length ≥ 2.0 chars
GOPHER_MAX_MEAN_WLEN_BP = 120_000  # ≤ 12.0 chars
GOPHER_MAX_SYMBOL_BP = 1_000       # non-alnum-nonspace chars ≤ 10% of chars
GOPHER_MIN_STOPWORD_HITS = 1       # ≥ 1 English stopword


def gopher_quality_filter(docs: DataFrame) -> DataFrame:
    """Gopher-style document quality gate: per-rule boolean flags + the
    composite keep decision, all Column expressions (whole-stage codegen;
    the filter pushes into the scan when used as a predicate)."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    nc = F.length("text")
    mean_wlen_bp = F.floor((nc - (n - 1)) * 10000 / n)
    # ANSI mode: integer division by zero throws — empty text counts as
    # fully-symbolic (fails the gate) rather than erroring the job
    symbol_bp = F.when(
        nc > 0,
        F.floor(
            F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9 ]", "")) * 10000 / nc
        ),
    ).otherwise(F.lit(10000))
    stop_hits = _stopword_hits(words, "en")
    flag_words = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    flag_wlen = (mean_wlen_bp >= GOPHER_MIN_MEAN_WLEN_BP) & (
        mean_wlen_bp <= GOPHER_MAX_MEAN_WLEN_BP
    )
    flag_symbol = symbol_bp <= GOPHER_MAX_SYMBOL_BP
    flag_stop = stop_hits >= GOPHER_MIN_STOPWORD_HITS
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.alias("n_words"),
        mean_wlen_bp.cast("int").alias("mean_wlen_bp"),
        symbol_bp.cast("int").alias("symbol_bp"),
        stop_hits.cast("int").alias("stopword_hits"),
        flag_words.alias("pass_words"),
        flag_wlen.alias("pass_wlen"),
        flag_symbol.alias("pass_symbol"),
        flag_stop.alias("pass_stopwords"),
        (flag_words & flag_wlen & flag_symbol & flag_stop).alias("keep"),
    )


# PII patterns: plain character classes only — identical semantics in Java
# regex (Spark) and RE2 (DuckDB).  Deliberately high-precision/low-recall
# (curation pipelines over-redact with NER models downstream; the regex pass
# is the cheap first sweep).
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_IPV4_RE = (
    "[0-9][0-9]?[0-9]?[.][0-9][0-9]?[0-9]?[.]"
    "[0-9][0-9]?[0-9]?[.][0-9][0-9]?[0-9]?"
)
PII_PHONE_RE = r"\+[0-9][0-9 -]{7,14}[0-9]"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex PII sweep: count and redact emails, IPv4s, and international
    phone numbers.  Pure Column expressions — runs inside whole-stage
    codegen; at corpus scale this is a map-only pass with zero shuffle."""
    t = F.col(text_col)

    def count_of(pattern):
        return F.size(F.expr(f"regexp_extract_all({text_col}, '{pattern}', 0)"))

    redacted = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_IPV4_RE, "<IP>")
    redacted = F.regexp_replace(redacted, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        count_of(PII_EMAIL_RE).cast("int").alias("n_emails"),
        count_of(PII_IPV4_RE).cast("int").alias("n_ips"),
        count_of(PII_PHONE_RE.replace("\\", "\\\\")).cast("int").alias("n_phones"),
        redacted.alias("redacted"),
    )


def fingerprint(docs: DataFrame, window: int = 16) -> DataFrame:
    """Document fingerprint: md5 of normalized text + a positional rolling
    fingerprint (md5 of each ``window``-word block, minimum kept) — the
    winnowing-style representative."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    words = F.split(norm, " ")
    blocks = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(words) - 1) / window).cast("int")),
        lambda i: F.md5(F.concat_ws(" ", F.slice(words, i * window + 1, window))),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(norm).alias("fingerprint"),
        F.array_min(blocks).alias("min_block_fp"),
    )


def vocab_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus vocabulary top-k: (word, n_docs, n_occurrences), ordered by
    occurrences desc with deterministic tie-break on the word.  The classic
    heavy-shuffle corpus statistic done right: explode → ONE hash aggregation
    keyed on word (map-side partial agg condenses each task to its distinct
    words before the exchange) → global top-k, which Spark plans as
    TakeOrderedAndProject (per-partition heaps + driver merge of k rows, no
    full sort)."""
    words = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    exploded = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(words).alias("word")
    ).filter(F.col("word") != "")
    return (
        exploded.groupBy("word")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("word"))
        .limit(k)
    )


def boilerplate_block_dedup(
    docs: DataFrame, block_words: int = 16, max_block_df: int = 5
) -> DataFrame:
    """CCNet-style boilerplate removal at block granularity: split each doc
    into consecutive ``block_words``-word blocks, drop every block whose
    corpus-wide document frequency exceeds ``max_block_df`` (headers,
    footers, license stubs — text repeated across many docs), and reassemble
    the survivors in order.

    Returns (doc_id, clean_text, n_kept, n_dropped).

    Scale shape: explode → ONE aggregation keyed on block md5 (map-side
    partial agg; the hot-block set is what the agg returns, bounded above by
    total_blocks / max_block_df) → left_anti join (no forced broadcast — on
    boilerplate-heavy corpora the hot set is large, AQE decides) → one
    groupBy doc_id with array_sort reassembly.  Never quadratic; block df is
    the same integer both engines compute, so the DuckDB oracle is exact.
    The per-doc block count is linear in doc length — no cap needed beyond
    the upstream page capping."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    words = F.split(norm, " ")
    n_blocks = F.ceil(F.size(words) / block_words).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.array_join(F.slice(words, i * block_words + 1, block_words), " "),
    )
    exploded = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(blocks).alias("block_idx", "block_text"),
    ).withColumn("block_hash", F.md5("block_text"))
    hot = (
        exploded.groupBy("block_hash")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > max_block_df)
        .select("block_hash")
    )
    kept = exploded.join(hot, "block_hash", "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("block_idx", "block_text"))
                ),
                lambda s: s["block_text"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("int").alias("n_kept"),
    )
    totals = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), n_blocks.alias("n_total")
    )
    return (
        totals.join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            (F.col("n_total") - F.coalesce("n_kept", F.lit(0))).cast("int").alias("n_dropped"),
        )
    )


def host_template_strip(
    docs: DataFrame,
    host_col: str = "source",
    min_host_docs: int = 3,
    max_ratio_bp: int = 5000,
) -> DataFrame:
    """Site-template removal: a LINE (newline-delimited) that appears in at
    least ``max_ratio_bp``/10000 of one host's pages is that site's chrome
    (nav, footer, cookie banner) and is stripped from every page of the
    host.  The RELATIVE per-host threshold is what distinguishes this from
    :func:`boilerplate_block_dedup`'s absolute corpus-wide df cap: a
    10-page blog's footer (df=10) and a 10^7-page portal's nav (df=10^7)
    are both template, while a quote legitimately repeated on 10 pages of
    the portal is not.  Hosts with fewer than ``min_host_docs`` pages are
    left untouched (no statistical support).

    Returns (doc_id, clean_text, n_kept, n_dropped); ``clean_text`` joins
    the surviving lines with a space, n_* count lines.

    Scale shape: explode lines → per-(host, line) distinct-doc df via
    dropDuplicates + ONE keyed agg (both partial-agg map-side; the df
    relation is bounded by distinct lines, never pages×lines) → join the
    #hosts-bounded page-count relation → left_anti join of the line rows
    against the template set (AQE decides broadcast; at web scale the
    template set is large, never forced) → one groupBy doc_id reassembly.
    All keyed aggs, no corpus-wide window, no pair expansion."""
    host = F.coalesce(F.col(host_col), F.lit("")).alias("host")
    base = docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").cast("long").alias("doc_id"), host, "text"
    )
    lines = base.select(
        "doc_id", "host",
        F.posexplode(F.split("text", "\n")).alias("line_idx", "line"),
    ).withColumn("line_key", F.md5(F.trim("line")))
    host_pages = base.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    line_df = (
        lines.filter(F.trim("line") != "")
        .select("host", "line_key", "doc_id")
        .dropDuplicates()  # in-page repeats count once toward df
        .groupBy("host", "line_key")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    templates = (
        line_df.join(host_pages, "host")
        .filter(
            (F.col("n_pages") >= min_host_docs)
            & (F.col("df") * 10000 >= F.lit(max_ratio_bp) * F.col("n_pages"))
        )
        .select("host", "line_key")
    )
    kept = lines.join(templates, ["host", "line_key"], "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("int").alias("n_kept"),
    )
    # per-doc line totals are derivable map-side from the un-exploded text
    # (a third explode+agg pass over the corpus would be pure waste)
    totals = base.select(
        "doc_id", F.size(F.split("text", "\n")).alias("n_total")
    )
    return totals.join(reassembled, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
        (F.col("n_total") - F.coalesce("n_kept", F.lit(0)))
        .cast("int")
        .alias("n_dropped"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3, round_to: int = 4) -> DataFrame:
    """Per-doc top-k TF-IDF terms — the keyword-extraction staple:
    score = tf(term, doc) * ln(N / df(term)).  Returns (doc_id, term,
    score, rk) with a full deterministic tie-break (score desc, term asc).

    Scale shape: explode → per-(doc, term) count (one shuffle, map-side
    combine) → per-term document frequency (second agg on the term key) →
    join (AQE picks broadcast when the vocab is small) → per-doc window
    top-k.  N comes from a scalar subquery-style cross join of a 1-row
    aggregate — never a driver collect.  ln() rounded to ``round_to`` so
    the DuckDB oracle hash-matches the floats."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    terms = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(norm, " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = terms.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = docs.select(
        F.countDistinct(F.col("doc_id").cast("long")).alias("n")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), round_to).alias(
                "score"
            ),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def bigram_logprob_score(docs: DataFrame, round_to: int = 4) -> DataFrame:
    """CCNet-style LM quality score without an external model: train a
    corpus bigram model in-plan (counts with add-one smoothing) and score
    each doc by its average bigram log-probability — low scores flag
    gibberish/outlier documents exactly the way a KenLM perplexity filter
    does, with the corpus itself as the model.

    score(doc) = mean over bigrams (w1 w2) of
                 ln( (c(w1 w2) + 1) / (c(w1) + V) )
    with V = distinct unigram count.  Returns (doc_id, n_bigrams,
    avg_lp_micro): the mean in integer micro-nats, computed with EXACT
    integer arithmetic (ties away from zero) — a rounded-double mean can
    land on a .00005 boundary where Spark's HALF_UP BigDecimal rounding
    and another engine's double rounding disagree in the last digit
    (observed on the adversarial giant-doc corpus).

    Scale shape: two keyed aggregations (bigram counts, unigram counts —
    map-side combine, shuffle volume = vocab), joins back on the bigram
    (AQE decides), one final per-doc mean.  No driver collect; V and the
    model live in the plan."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    words = F.split(norm, " ")
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"), words.alias("w"))
    bigrams = base.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.struct(
                    F.get(F.col("w"), i).alias("w1"),
                    F.get(F.col("w"), i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    bg_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    unigrams = base.select(F.explode("w").alias("w1")).filter(F.col("w1") != "")
    ug_counts = unigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c_ug"))
    vocab = unigrams.select(F.countDistinct("w1").alias("v"))

    # per-bigram log-probs are quantized to integer micro-nats BEFORE the
    # mean: integer sums are associative, so the average is bit-identical
    # at any parallelism and in any engine (a double mean is order-dependent
    # in its last bits)
    scored = (
        bigrams.join(bg_counts, ["w1", "w2"])
        .join(ug_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.log((F.col("c_bg") + 1) / (F.col("c_ug") + F.col("v"))) * 1_000_000
            ).cast("long").alias("lp_micro"),
        )
    )
    # exact integer mean: lp_micro <= 0 always (smoothed prob <= 1), so the
    # magnitude is non-negative and round-half-up over positives — where
    # floor == truncate in every engine — implements ties-away-from-zero
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            (-F.sum("lp_micro")).alias("mag"),
        )
        .select(
            "doc_id",
            F.col("cnt").cast("int").alias("n_bigrams"),
            (-F.expr("(2 * mag + cnt) div (2 * cnt)")).alias("avg_lp_micro"),
        )
    )


def chunk_documents(
    docs: DataFrame, chunk_words: int = 64, stride: int = 48
) -> DataFrame:
    """Overlapping fixed-window chunking — the context-window prep step of a
    training pipeline: windows of ``chunk_words`` words starting every
    ``stride`` words (overlap = chunk-stride), last window shortened, docs
    shorter than a window become one chunk.  Pure HOF math, map-only, one
    output row per chunk: (doc_id, chunk_idx, start_word, n_words,
    chunk_text)."""
    assert 0 < stride <= chunk_words
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    words = F.split(norm, " ")
    n = F.size(words)
    n_chunks = F.when(
        n <= chunk_words, F.lit(1)
    ).otherwise(F.ceil((n - chunk_words) / stride).cast("int") + 1)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * stride).alias("start_word"),
            F.slice(words, i * stride + 1, chunk_words).alias("w"),
        ),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(chunks).alias("chunk_idx", "c"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.col("c.start_word").alias("start_word"),
        F.size("c.w").cast("int").alias("n_words"),
        F.array_join("c.w", " ").alias("chunk_text"),
    )


def lang_segments(
    blocks: DataFrame, text_col: str = "text", k_col: str = "k"
) -> DataFrame:
    """Mixed-language document splitting: contiguous same-language runs
    over ORDERED blocks of a document.

    Input rows are (doc_id, ``k_col`` = block order, ``text_col``); each
    block is classified with the same stopword-argmax heuristic (and the
    same strict-``>`` lexicographic tie rule) as :func:`lang_id`, then
    adjacent same-language blocks merge by gaps-and-islands (the
    row_number-difference trick — two per-doc windows, one keyed agg; no
    corpus-wide state).  Returns one row per run:
    (doc_id, seg, lang, start_k, end_k, n_blocks), ``seg`` dense in
    document order.  The per-block granularity is what page-level lang-id
    (the mC4 approach) cannot give: a French quotation inside an English
    article becomes its own span instead of poisoning the page label."""
    from pyspark.sql import Window

    words = F.split(F.col(text_col), " ")
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in LANGS:
        this = _stopword_hits(words, lang)
        best = F.when(this > best_hits, F.lit(lang)).otherwise(best)
        best_hits = F.when(this > best_hits, this).otherwise(best_hits)
    base = blocks.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(k_col).cast("int").alias("k"),
        best.alias("lang"),
    )
    w_all = Window.partitionBy("doc_id").orderBy("k")
    w_lang = Window.partitionBy("doc_id", "lang").orderBy("k")
    isl = base.select(
        "*",
        (F.row_number().over(w_all) - F.row_number().over(w_lang)).alias("grp"),
    )
    segs = isl.groupBy("doc_id", "lang", "grp").agg(
        F.min("k").alias("start_k"),
        F.max("k").alias("end_k"),
        F.count(F.lit(1)).cast("int").alias("n_blocks"),
    )
    w_seg = Window.partitionBy("doc_id").orderBy("start_k")
    return segs.select(
        "doc_id",
        (F.row_number().over(w_seg) - 1).cast("int").alias("seg"),
        "lang",
        F.col("start_k").cast("int").alias("start_k"),
        F.col("end_k").cast("int").alias("end_k"),
        "n_blocks",
    )


#: abbreviations whose trailing period is NOT a sentence boundary.
#: Detection is lookaround-free — '(^|[^A-Za-z])<ab>\.' with a \1 backref —
#: because the DuckDB oracle's RE2 engine has no lookbehind; the same
#: pattern class keeps both engines byte-identical.
SENT_ABBREVS = (
    "Mrs", "Mr", "Ms", "Dr", "Prof", "St", "vs", "etc", "e.g", "i.e",
    "Fig", "No",
)
#: sentinels: \x1f protects an abbreviation period, \x1e marks a boundary
_ABBR_MARK = "\x1f"
_SENT_MARK = "\x1e"


def sentence_split(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Rule-based sentence segmentation (punkt-lite), one row per
    sentence: (doc_id, sent_no, sentence, n_words).

    Chain: protect abbreviation periods ('Dr.', 'e.g.') with a sentinel,
    mark `[.!?]+` + whitespace runs as boundaries, split, restore, trim,
    drop empties — every step a replace/regexp_replace the DuckDB oracle
    replays verbatim (no lookarounds, explicit `[ \\t\\r\\n]` whitespace
    class: the subset where Java and RE2 agree byte-for-byte).  Map-only;
    the explode fans out behind the scan, no shuffle."""
    import re as _re

    s = F.coalesce(F.col(text_col), F.lit(""))
    for ab in SENT_ABBREVS:
        s = F.regexp_replace(
            s,
            "(^|[^A-Za-z])" + _re.escape(ab) + r"\.",
            "$1" + ab + _ABBR_MARK,
        )
    s = F.regexp_replace(s, r"([.!?]+)[ \t\r\n]+", "$1" + _SENT_MARK)
    arr = F.filter(
        F.transform(
            F.split(s, _SENT_MARK),
            lambda t: F.trim(F.replace(t, F.lit(_ABBR_MARK), F.lit("."))),
        ),
        lambda t: t != "",
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(arr).alias("sent_no", "sentence"),
    ).select(
        "doc_id",
        F.col("sent_no").cast("int").alias("sent_no"),
        "sentence",
        F.size(F.split("sentence", " ")).cast("int").alias("n_words"),
    )


def sentence_split_sql(expr: str) -> str:
    """The identical chain as a DuckDB scalar expression producing the
    sentence ARRAY over ``expr`` (oracle twin of :func:`sentence_split`
    up to the explode)."""
    import re as _re

    out = f"coalesce({expr}, '')"
    for ab in SENT_ABBREVS:
        pat = "(^|[^A-Za-z])" + _re.escape(ab) + r"\."
        out = f"regexp_replace({out}, '{pat}', '\\1{ab}' || chr(31), 'g')"
    out = (
        f"regexp_replace({out}, '([.!?]+)[ \\t\\r\\n]+', "
        f"'\\1' || chr(30), 'g')"
    )
    return (
        f"list_filter(list_transform(string_split({out}, chr(30)), "
        f"s -> trim(replace(s, chr(31), '.'))), s -> s <> '')"
    )
