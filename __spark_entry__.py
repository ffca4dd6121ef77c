"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship doc-read extraction on sf0.001;
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL for every SQL-expressible
query (same column names/types; order-insensitive value-hash compare).

The extraction queries run over the span table derived *deterministically*
from the driver's flat ``documents`` table (chug_spark.synth.
spans_from_documents): words split on ' ', pages of 8 words, 2 lines of 4
words per page; span 0 = anno JSON, spans 1..n = media refs
md5(doc_id||':'||page).  The DuckDB oracles rebuild the identical corpus in
SQL and apply the same reference extraction semantics
(page selection per src/chug/doc/doc_read_processor.py:52-68, line join
:121, media pairing doc_processor.py:199-224).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_DEFAULT = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# shared DuckDB SQL fragments (corpus derivation contract — keep in sync with
# chug_spark/synth.py spans_from_documents)
# ---------------------------------------------------------------------------

_PAGES_CTE = """
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         string_split(text, ' ') AS words,
         CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INT) AS n_pages
  FROM documents
),
pages AS (
  SELECT doc_id, n_pages, u.p AS p,
         array_to_string(
           list_filter(
             [array_to_string(list_slice(words, u.p*8 + 1, u.p*8 + 4), ' '),
              array_to_string(list_slice(words, u.p*8 + 5, u.p*8 + 8), ' ')],
             x -> x <> ''),
           chr(10)) AS page_text
  FROM d, unnest(generate_series(0, n_pages - 1)) AS u(p)
)
"""

# deterministic per-doc page pick: first 16 md5 hex chars of 'doc|seed|page'
# as a big-endian u64, mod n (chug_spark.determinism.doc_rand_below)
_RAND_PICK = (
    "list_reduce(list_prepend(0, list_transform(generate_series(1, 16),"
    " i -> strpos('0123456789abcdef',"
    " substr(md5(doc_id || '|{seed}|page'), i, 1)) - 1)),"
    " (a, b) -> (a*16 + b) % n_pages)"
)


def _docread_sql(which: str, seed: int = 0) -> str:
    if which == "all_valid" or which == "all":
        sel = "pages"  # clean corpus: every page valid → identity selection
        k = "p"
    elif which == "first":
        sel = "(SELECT * FROM pages WHERE p = 0)"
        k = "0"
    elif which == "last":
        # literal last page (ref wds/decode.py:228-231 page_indices=[-1])
        sel = "(SELECT * FROM pages WHERE p = n_pages - 1)"
        k = "0"
    elif which == "random":
        pick = _RAND_PICK.format(seed=seed)
        sel = f"(SELECT * FROM pages WHERE p = {pick})"
        k = "0"
    else:  # pragma: no cover
        raise ValueError(which)
    return f"""
{_PAGES_CTE}
SELECT doc_id, CAST(2*{k} AS INT) AS "offset", 'text' AS kind,
       page_text AS text, CAST(NULL AS VARCHAR) AS media_ref
FROM {sel} s
UNION ALL
SELECT doc_id, CAST(2*{k} + 1 AS INT) AS "offset", 'media' AS kind,
       CAST(NULL AS VARCHAR) AS text,
       md5(doc_id || ':' || CAST(p AS VARCHAR)) AS media_ref
FROM {sel} s
"""


_SPANS_DERIVE_SQL = """
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         string_split(text, ' ') AS words,
         CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INT) AS n_pages
  FROM documents
),
anno AS (
  SELECT doc_id,
         '{"pages": [' || array_to_string(
            list_transform(generate_series(0, n_pages - 1), p ->
              '{"text": [' || array_to_string(
                 list_transform(
                   list_filter(
                     [array_to_string(list_slice(words, p*8 + 1, p*8 + 4), ' '),
                      array_to_string(list_slice(words, p*8 + 5, p*8 + 8), ' ')],
                     x -> x <> ''),
                   s -> '"' || s || '"'),
                 ', ') || ']}'),
            ', ') || ']}' AS anno_json,
         n_pages
  FROM d
)
SELECT doc_id, CAST(0 AS INT) AS "offset", 'anno' AS kind,
       anno_json AS text, CAST(NULL AS VARCHAR) AS media_ref
FROM anno
UNION ALL
SELECT doc_id, CAST(u.p + 1 AS INT) AS "offset", 'media' AS kind,
       CAST(NULL AS VARCHAR) AS text,
       md5(doc_id || ':' || CAST(u.p AS VARCHAR)) AS media_ref
FROM anno, unnest(generate_series(0, n_pages - 1)) AS u(p)
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _docread(which: str, seed: int = 0):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from chug_spark.flagship import docread_flat

        return docread_flat(spark, sf_dir, page_sampling=which, seed=seed)

    return q


def _spans_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chug_spark.extract import flatten_spans
    from chug_spark.synth import spans_from_documents

    return flatten_spans(spans_from_documents(spark, sf_dir))


def _extract_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial synthetic corpus through the full pipeline incl. payload
    render UDF — not SQL-expressible (rows-only check)."""
    from chug_spark.config import ExtractJobCfg
    from chug_spark.extract import extract_docread, flatten_spans
    from chug_spark.synth import generate_docs

    docs = generate_docs(spark, n_docs=120, seed=13)
    cfg = ExtractJobCfg(page_sampling="all_valid", render_dpi=24)
    spans_out, _ = extract_docread(spark, docs, cfg)
    return flatten_spans(spans_out)


def _extract_synth_struct(which: str = "all_valid"):
    """The payload-decode branch (D1/D2, ref wds/decode.py:49-164) with a HARD
    oracle: the real extract pipeline over a SQL-derivable payload corpus,
    projecting everything except the pixel-derived media_ref (replaced by a
    has_media presence flag).  Page counts, chunk-capped k_global ordering,
    dense offsets, raw-span interleaving, per-chunk decode-error rows AND
    anno_parse policy-error rows (every-31st doc's anno JSON is truncated)
    are all reproduced by the DuckDB oracle; pixel hashes stay pytest-pinned
    via extract_synth.  ``which='random'`` re-runs the same corpus under the
    random page policy (D5 wraparound pick on the payload branch)."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        from chug_spark.config import ExtractJobCfg
        from chug_spark.extract import extract_docread_flat
        from chug_spark.synth import payload_corpus_from_documents

        docs = payload_corpus_from_documents(spark, sf_dir)
        cfg = ExtractJobCfg(page_sampling=which, render_dpi=24, max_pages_per_task=4)
        flat, errors = extract_docread_flat(spark, docs, cfg)
        ok = flat.select(
            "doc_id", "offset", "kind", "text",
            F.col("media_ref").isNotNull().alias("has_media"),
        )
        err = errors.select(
            "doc_id",
            F.lit(-1).cast("int").alias("offset"),
            F.lit("error").alias("kind"),
            F.concat("stage", F.lit(":"), "error").alias("text"),
            F.lit(False).alias("has_media"),
        )
        return ok.unionByName(err)

    return q


def _extract_synth_struct_sql(which: str = "all_valid") -> str:
    if which == "all_valid":
        sel = "pages"          # every page valid → identity selection
        k = "p"
    elif which == "random":
        pick = _RAND_PICK.format(seed=0)
        sel = f"(SELECT * FROM pages WHERE p = {pick})"
        k = "0"
    else:  # pragma: no cover
        raise ValueError(which)
    # n_sel per doc (for per-chunk error rows and the tail offset)
    n_sel = "n_pages" if which == "all_valid" else "1"
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, doc_id AS did,
         string_split(text, ' ') AS words,
         CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INT) AS n_pages
  FROM documents
),
pages AS (
  SELECT doc_id, did, n_pages, u.p AS p,
         array_to_string(
           list_filter(
             [array_to_string(list_slice(words, u.p*8 + 1, u.p*8 + 4), ' '),
              array_to_string(list_slice(words, u.p*8 + 5, u.p*8 + 8), ' ')],
             x -> x <> ''),
           chr(10)) AS page_text
  FROM d, unnest(generate_series(0, n_pages - 1)) AS u(p)
)
SELECT doc_id, CAST(0 AS INT) AS "offset", 'text' AS kind,
       'hdr ' || doc_id AS text, false AS has_media
FROM d WHERE did % 23 <> 0 AND did % 31 <> 0
UNION ALL
SELECT doc_id, CAST(1 + 2*{k} AS INT), 'text', page_text, false
FROM {sel} s WHERE did % 23 <> 0 AND did % 31 <> 0
UNION ALL
SELECT doc_id, CAST(2 + 2*{k} AS INT), 'media', CAST(NULL AS VARCHAR), true
FROM {sel} s WHERE did % 23 <> 0 AND did % 31 <> 0
UNION ALL
SELECT doc_id, CAST(1 + 2*{n_sel} AS INT), 'text', 'tail ' || doc_id, false
FROM d WHERE did % 23 <> 0 AND did % 31 <> 0 AND did % 2 = 0
UNION ALL
SELECT doc_id, CAST(-1 AS INT), 'error', 'media:media_decode:ValueError', false
FROM d, unnest(generate_series(1, CAST(ceil({n_sel} / 4.0) AS INT))) AS u(c)
WHERE did % 23 = 0 AND did % 31 <> 0
UNION ALL
SELECT doc_id, CAST(-1 AS INT), 'error', 'anno:anno_parse', false
FROM d WHERE did % 31 = 0
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: doc-read extraction (all_valid) over the span corpus derived
    from sf0.001 documents."""
    from chug_spark.flagship import docread_flat

    return docread_flat(spark, SF_DEFAULT, page_sampling="all_valid")


# The driver sweeps the FIRST 50 queries() entries per round.  Front-load
# (a) the flagship extraction suite, (b) rows that were red or never swept
# in the previous round, (c) rows whose implementation changed this round;
# rotate long-green rows (pytest-pinned) to the back.  Names not listed
# keep their registration order after the front block.
_SWEEP_FRONT = [
    # flagship (core metric, keep every round) + the new D1/D2 hard oracle
    "docread_all_valid", "docread_first", "docread_last", "docread_all",
    "docread_random", "spans_derive", "extract_synth_struct",
    "extract_synth_struct_random",
    # r4 hash-red rows, fixed this round (HUGEINT->BIGINT oracle casts) —
    # must re-verify in the driver env
    "sessionize", "sessionize_presplit", "corpus_report",
    # changed/new in r5: dom_extract gained a full oracle; image/bpe twins;
    # nougat train leg; bpe queries switched to the driver-side fast trainer
    "dom_extract", "image_eval_struct", "image_train_struct",
    "aug_schedule_nougat", "media_train_nougat", "bpe_vocab", "bpe_apply",
    # r1-r3-green rows never swept in r4 (stale evidence rotation — the
    # oracle-bearing 32 of the 36; the 4 rows-only ones rotate to r6 since
    # the driver can only count their rows): see OPERATORS.md
    "group_members", "urldir", "coalesce_rename", "filter_incomplete",
    "base_plus_ext", "vqa_prompt", "line_join", "target_mask", "weighted_mix",
    "aug_schedule", "dedup_exact", "url_dedup", "substring_spans",
    "substring_cut", "minhash_pairs", "minhash_verified", "minhash_recall",
    "simhash_pairs", "ngram_jaccard", "cosine_threshold",
    "ann_topk", "ivf_topk", "knn_exact", "semantic_pairs",
    "semantic_dedup", "stratified_sample", "dedup_clusters",
    "curation_keep", "curation_sampled",
    # new r5: S1-S4 shard machinery + streaming≡batch get driver surfaces
    "shard_plan", "shard_resample", "stream_extract",
]


def _sweep_order(q: dict) -> dict:
    front = {k: q[k] for k in _SWEEP_FRONT if k in q}
    front.update({k: v for k, v in q.items() if k not in front})
    return front


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "docread_all_valid": _docread("all_valid"),
        "docread_first": _docread("first"),
        "docread_last": _docread("last"),
        "docread_all": _docread("all"),
        "docread_random": _docread("random", seed=0),
        "spans_derive": _spans_derive,
        "extract_synth": _extract_synth,
        "extract_synth_struct": _extract_synth_struct("all_valid"),
        "extract_synth_struct_random": _extract_synth_struct("random"),
    }
    from chug_spark.entry_ext import extra_queries

    q.update(extra_queries())
    return _sweep_order(q)


def oracle_sql() -> dict[str, str]:
    sql = {
        "docread_all_valid": _docread_sql("all_valid"),
        "docread_first": _docread_sql("first"),
        "docread_last": _docread_sql("last"),
        "docread_all": _docread_sql("all"),
        "docread_random": _docread_sql("random", seed=0),
        "spans_derive": _SPANS_DERIVE_SQL,
        # extract_synth: non-SQL-expressible (pixel-hash media_refs) → rows-only;
        # its structural twin below carries the hard oracle for the same path
        "extract_synth_struct": _extract_synth_struct_sql("all_valid"),
        "extract_synth_struct_random": _extract_synth_struct_sql("random"),
        # streaming ≡ batch: the streaming drain must reproduce the batch
        # extraction oracle on the same derived corpus
        "stream_extract": _docread_sql("all_valid"),
        # crash+resume ≡ clean batch run on the same derived corpus
        "checkpoint_resume": _docread_sql("all_valid"),
    }
    from chug_spark.entry_ext import extra_oracle_sql

    sql.update(extra_oracle_sql())
    return sql
