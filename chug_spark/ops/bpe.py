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

Two control planes for phase 2, byte-identical outputs (pytest parity):
:func:`bpe_train` keeps the state in Spark (one job per merge — the
didactic/unbounded-vocab path), :func:`bpe_train_fast` collects the
bounded vocab to the driver and runs the incremental pair-index loop
(the production path: 1000 merges in seconds, 32k-50k feasible).

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


def bpe_train_fast(
    docs: DataFrame,
    num_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Scale path of :func:`bpe_train`: identical merge table (pytest
    parity), different control plane.

    The corpus-scale word-frequency aggregation stays distributed — the only
    thing that ever touches 100 TB — and the *bounded* vocab table (10^6-ish
    rows at any corpus size) collects to the driver, where the merge loop
    runs with the classic incremental pair index (Sennrich et al. 2016):
    a lazy max-heap over pair counts + per-pair posting lists, so each merge
    touches only the words containing the merged pair instead of launching a
    Spark job.  1000 merges run in seconds where the job-per-merge loop is a
    wall-clock ceiling at 32k-50k merges; use :func:`bpe_train` only when
    the vocab itself cannot fit on the driver."""
    import heapq
    from collections import defaultdict

    rows = word_frequencies(docs, text_col).collect()
    words: list[list[str]] = []
    freqs: list[int] = []
    for r in rows:
        w, f = r["word"], int(r["freq"])
        words.append([*w[:-1], w[-1] + EOW])
        freqs.append(f)

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, syms in enumerate(words):
        f = freqs[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += f
            pair_words[p].add(wi)

    # lazy-deletion heap ordered exactly like the Spark loop's arg-max:
    # (count desc, left asc, right asc)
    heap = [(-c, p[0], p[1]) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        best = None
        while heap:
            negc, a, b = heap[0]
            cur = pair_counts.get((a, b), 0)
            if -negc == cur and cur > 0:
                best = (a, b, cur)
                break
            heapq.heappop(heap)  # stale entry
        if best is None or best[2] < min_pair_count:
            break
        a, b, cnt = best
        merges.append((rank, a, b, cnt))
        ab = a + b
        touched: dict[tuple[str, str], int] = {}
        for wi in list(pair_words[(a, b)]):
            syms = words[wi]
            f = freqs[wi]
            # remove this word's old adjacency contributions
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= f
                touched[p] = pair_counts[p]
            # the same left-to-right non-overlapping fold as _merge_expr
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] += f
                touched[p] = pair_counts[p]
                pair_words[p].add(wi)
        del pair_counts[(a, b)]
        del pair_words[(a, b)]
        touched.pop((a, b), None)
        for p, c in touched.items():
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))  # lazy: stale copies ok
            else:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
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
    fast: bool = True,
) -> DataFrame:
    """DataFrame view of :func:`bpe_train` for the driver contract:
    (rank, left, right, merged, pair_count)."""
    train = bpe_train_fast if fast else bpe_train
    merges = train(docs, num_merges, min_pair_count, text_col)
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(r, a, b, a + b, c) for r, a, b, c in merges],
        "rank int, left string, right string, merged string, pair_count int",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (driver contract): the merge loop is iterative, but with
# a FIXED merge budget it unrolls into a chain of materialized CTEs — one
# (best-pair, fold) level per merge — reproducing bpe_train/bpe_segment
# byte-for-byte (verified EQUAL at sf0.01).  MATERIALIZED is load-bearing:
# each state CTE is referenced twice and plain CTE inlining would expand the
# chain exponentially.
# ---------------------------------------------------------------------------

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _fold_sql() -> str:
    """left-to-right non-overlapping pair merge as a DuckDB list_reduce —
    the SQL twin of :func:`_merge_expr` (b.a/b.b from the joined best-pair
    CTE row)."""
    return (
        "list_reduce(list_prepend(CAST([] AS VARCHAR[]), "
        "list_transform(syms, x -> [x])), "
        "(acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.a AND x[1] = b.b "
        "THEN list_append(acc[1:len(acc)-1], b.a || b.b) "
        "ELSE list_append(acc, x[1]) END)"
    )


def _cte_chain(num_merges: int, min_pair_count: int, with_final: bool) -> str:
    parts = [f"""w AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
s0 AS MATERIALIZED (
  SELECT word, freq,
         list_transform(generate_series(1, len(word)),
           i -> CASE WHEN i = len(word) THEN substr(word, i, 1) || '{EOW}'
                     ELSE substr(word, i, 1) END) AS syms
  FROM w
)"""]
    for k in range(num_merges):
        parts.append(f"""b{k} AS MATERIALIZED (
  SELECT a, b, cnt FROM (
    SELECT syms[i] AS a, syms[i+1] AS b, sum(freq) AS cnt
    FROM s{k}, unnest(generate_series(1, len(syms)-1)) AS u(i)
    WHERE len(syms) >= 2 GROUP BY 1, 2)
  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
)""")
        if k < num_merges - 1 or with_final:
            parts.append(f"""s{k+1} AS MATERIALIZED (
  SELECT word, freq,
         CASE WHEN b.cnt >= {min_pair_count} THEN {_fold_sql()} ELSE syms END AS syms
  FROM s{k} CROSS JOIN b{k} b
)""")
    merges = "\nUNION ALL ".join(
        f"SELECT {k} AS rank, a, b, cnt FROM b{k} WHERE cnt >= {min_pair_count}"
        for k in range(num_merges))
    return "WITH " + ",\n".join(parts) + f", merges AS (\n{merges}\n)"


def vocab_oracle_sql(num_merges: int = 30, min_pair_count: int = 2) -> str:
    """DuckDB twin of :func:`bpe_merge_table` (columns rank/left/right/
    merged/pair_count)."""
    return _cte_chain(num_merges, min_pair_count, with_final=False) + """
SELECT CAST(rank AS INT) AS rank, a AS "left", b AS "right",
       a || b AS merged, CAST(cnt AS INT) AS pair_count
FROM merges ORDER BY rank
"""


def apply_oracle_sql(
    num_merges: int = 30, min_pair_count: int = 2, sample_tokens: int = 30
) -> str:
    """DuckDB twin of the train-then-apply round trip (:func:`bpe_train` +
    :func:`bpe_segment`): segment every distinct word with the final fold
    state, then re-attach per document in word order."""
    chain = _cte_chain(num_merges, min_pair_count, with_final=True)
    return chain + f""", docw AS MATERIALIZED (
  SELECT doc_id, u.i AS pos, ws[i] AS word
  FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ws FROM documents) t,
       unnest(generate_series(1, len(ws))) AS u(i)
  WHERE ws[i] <> ''
), seg AS MATERIALIZED (
  SELECT doc_id, pos, s.syms FROM docw JOIN s{num_merges} s USING (word)
), ranked AS (
  SELECT doc_id, syms[u.j] AS tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos, u.j) AS rn
  FROM seg, unnest(generate_series(1, len(syms))) AS u(j)
), tok_agg AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
         string_agg(tok, ',' ORDER BY rn) FILTER (WHERE rn <= {sample_tokens}) AS tokens_csv
  FROM ranked GROUP BY doc_id
), word_agg AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_words FROM docw GROUP BY doc_id
)
SELECT d.doc_id, coalesce(w.n_words, 0) AS n_words,
       coalesce(t.n_tokens, 0) AS n_tokens,
       coalesce(t.tokens_csv, '') AS tokens_csv
FROM (SELECT doc_id FROM documents) d
LEFT JOIN word_agg w USING (doc_id) LEFT JOIN tok_agg t USING (doc_id)
"""
