"""Distributed BPE vocabulary induction (Sennrich et al. 2016): learn a
byte-pair-encoding merge table from the corpus itself — the "train the
tokenizer" step of a training-data pipeline (the consuming side,
``bpe_token_count``, already exists in :mod:`chug_spark.ops.textstats`).

Scale shape — the classic two-phase split:

1. ONE corpus-scale aggregation builds the distinct-word frequency table
   (map-side partial agg; the only thing that ever touches 100 TB).
2. The merge loop runs entirely over that *bounded* word table (vocab is
   ~10^6-10^7 rows regardless of corpus size).  Each round: adjacent-pair
   counts via explode + sum(freq) (partial agg), the arg-max pair pulled
   to the driver as ONE scalar row (same driver-as-control-plane pattern
   as the connected-components convergence probe and the k-means
   trainer), then the merge applied to every word's symbol array with a
   left-to-right non-overlapping fold.  ``localCheckpoint`` every few
   rounds truncates the iterative lineage so round K's plan doesn't embed
   K withColumns.

Determinism: ties in pair counts break on (count desc, left asc,
right asc) — byte-identical merge tables at any parallelism.  A pure-
Python reference trainer (tests/test_bpe.py) pins the algorithm.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

#: end-of-word marker (attached to the last character, standard BPE)
EOW = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized corpus — the one corpus-scale agg."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    return (
        docs.select(F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols() -> F.Column:
    """word -> [c1, c2, ..., cn + EOW]"""
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    return F.transform(
        chars,
        lambda c, i: F.when(i == n - 1, F.concat(c, F.lit(EOW))).otherwise(c),
    )


def _merge_expr(left: str, right: str) -> F.Column:
    """left-to-right non-overlapping merge of the (left, right) symbol pair
    inside ``syms`` — a fold: append, or fuse with the previous element
    when it completes the pair."""
    merged = left + right
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[int, str, str, int]]:
    """Learn up to ``num_merges`` BPE merges from ``docs``; returns
    ``[(rank, left, right, pair_count), ...]`` in merge order.  Stops early
    when the best remaining pair occurs fewer than ``min_pair_count``
    times."""
    state = word_frequencies(docs, text_col).select(
        "freq", _initial_symbols().alias("syms")
    )
    state = state.localCheckpoint(eager=True)  # cut corpus lineage: the loop
    #                                            must never rescan the corpus
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        # filter BEFORE the explode/select: keeps the sequence() upper bound
        # non-negative (a 1-symbol row would emit a descending [0,-1] range
        # whose F.get probes produce NULL pair rows) and avoids referencing
        # `syms` after a projection that dropped it
        pairs = (
            state.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("syms") - 2),
                        lambda i: F.struct(
                            F.get("syms", i).alias("a"),
                            F.get("syms", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(
            F.desc("cnt"), F.asc("a"), F.asc("b")
        ).first()
        if top is None or top["cnt"] < min_pair_count:
            break
        merges.append((rank, top["a"], top["b"], int(top["cnt"])))
        state = state.select("freq", _merge_expr(top["a"], top["b"]).alias("syms"))
        if (rank + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)
    return merges


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    sample_tokens: int = 30,
) -> DataFrame:
    """Apply a learned merge table to the corpus (the Sennrich *apply*
    phase): per word, replay the merges in rank order.  One Arrow-batched
    pandas UDF with the merge list in the closure (broadcast-sized: the
    merge table is KBs) and a per-batch word→tokens memo — natural text
    repeats words heavily, so the memo turns per-word cost into a dict
    hit.  Map-only, no shuffle.

    Returns (doc_id, n_words, n_tokens, tokens_csv) where ``tokens_csv``
    is the first ``sample_tokens`` tokens comma-joined (the value surface
    for the md5 pin; a csv because the driver's canonicalizer cannot hash
    list cells)."""
    ranked = [(a, b, a + b) for a, b in merges]

    def seg_word(word: str, memo: dict) -> list[str]:
        toks = memo.get(word)
        if toks is None:
            syms = [*word[:-1], word[-1] + EOW]
            for a, b, ab in ranked:
                if len(syms) < 2:
                    break
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            toks = memo[word] = syms
        return toks

    @F.pandas_udf("n_words int, n_tokens int, tokens_csv string")
    def seg(texts: pd.Series) -> pd.DataFrame:
        import re

        memo: dict = {}
        nw, nt, csv = [], [], []
        for t in texts:
            words = [
                w
                for w in re.sub(r"\s+", " ", (t or "").lower()).strip().split(" ")
                if w
            ]
            toks: list[str] = []
            for w in words:
                toks.extend(seg_word(w, memo))
            nw.append(len(words))
            nt.append(len(toks))
            csv.append(",".join(toks[:sample_tokens]))
        return pd.DataFrame({"n_words": nw, "n_tokens": nt, "tokens_csv": csv})

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        seg(F.col(text_col)).alias("s"),
    ).select("doc_id", "s.n_words", "s.n_tokens", "s.tokens_csv")


def bpe_merge_table(
    docs: DataFrame,
    num_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """DataFrame view of :func:`bpe_train` for the driver contract:
    (rank, left, right, merged, pair_count)."""
    merges = bpe_train(docs, num_merges, min_pair_count, text_col)
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(r, a, b, a + b, c) for r, a, b, c in merges],
        "rank int, left string, right string, merged string, pair_count int",
    )
