"""Doc-read extraction pipeline — the flagship job.

Reimplements the semantics of the reference's fused decode+process stage
(``src/chug/task_pipeline/pipeline_doc_read.py:20-62`` →
``src/chug/doc/doc_read_processor.py:43-154`` + ``doc_processor.py:183-232``)
as an idiomatic Spark plan over the span table (BASELINE.json ``input_hint``)::

    documents(doc_id, spans)                               -- Iceberg-shaped scan
      → valid_sample gate (size(spans) > 0)                -- tariterators.py:53
      → Catalyst: anno pick / from_json / validity flags   -- doc_processor.py:184-190
      → pandas UDF: page-sampling policy per doc           -- doc_read_processor.py:52-68
      → payload docs: cap pages per sub-row, salted        -- north rule skew handling
        repartition, decode UDF (render→hash→drop)         -- wds/decode.py:49-122
      → passthrough docs: pure-SQL page pairing            -- no Python at all
      → assemble: groupBy(doc_id) + array_sort → dense offsets
      → errors side-output (doc_id, stage, error)          -- wds/helpers.py:41-68

Design rules (SURVEY.md §4/§7):

- every stochastic choice is a pure function of (doc_id, seed) — output is
  identical at any parallelism;
- filters/projections are Column expressions so Catalyst pushes them into the
  scan; only the page-policy scan (tiny) and payload rendering (heavy) run in
  Python, both Arrow-vectorized;
- a giant multi-page doc is split into ≤max_pages_per_task sub-rows *before*
  the decode UDF and re-assembled by ``array_sort(collect_list(...))`` — span
  order is restored by sort keys, never by collect order.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import media as media_mod
from .config import CONTINUE_POLICIES, VALID_PAGE_RETRIES, ExtractJobCfg
from .determinism import doc_rand_below
from .functions import clean_text
from .schema import ANNO_SCHEMA, ERRORS_SCHEMA

# page-validity flags computed SQL-side and consumed by the policy UDF
_FLAG_INVALID = 0   # page has a text list, but it is empty
_FLAG_VALID = 1     # page has a non-empty text list
_FLAG_MISSING = 2   # page lacks both 'lines.text' and 'text' → KeyError in ref


def _policy_udf(page_sampling: str, seed: int):
    """Vectorized page-sampling policy: (doc_id, flags, has_anno, has_media)
    → struct(indices array<int>, error string).

    Faithful to the reference's control flow:
    - ``get_next_valid_page_index`` advance-with-wraparound, ≤10 retries,
      RuntimeError when exhausted (doc_processor.py:18-45);
    - policy branches random/first/last/all_valid/all
      (doc_read_processor.py:52-68; 'last' from the decode path,
      wds/decode.py:228-231), including the wraparound *duplicates*
      ``all_valid`` produces when invalid pages exist;
    - mid-loop RuntimeError in all_valid keeps indices collected so far
      (doc_read_processor.py:69-70 ``except RuntimeError: pass``);
    - a scanned page lacking a text key entirely → KeyError → document error;
    - 'random' start = randrange(-1, num_pages-1) (doc_read_processor.py:55),
      re-keyed on (doc_id, seed) for schedule independence (SURVEY.md §7.4.1).
    """

    ret_type = T.StructType(
        [
            T.StructField("indices", T.ArrayType(T.IntegerType())),
            T.StructField("error", T.StringType()),
        ]
    )

    def next_valid(cur: int, n: int, flags) -> int:
        for _ in range(VALID_PAGE_RETRIES):
            cur = (cur + 1) % n
            f = flags[cur]
            if f == _FLAG_MISSING:
                raise KeyError("text")
            if f == _FLAG_VALID:
                return cur
        raise RuntimeError("no non-empty page found")

    def one(doc_id, flags, has_anno, has_media):
        if not has_anno:
            return None, "no_annotation"
        if flags is None:
            return None, "anno_parse"
        n = len(flags)
        if n == 0:
            return None, "empty_annotation"
        idx: list[int] = []
        try:
            if page_sampling == "random":
                start = doc_rand_below(doc_id, seed, n, tag="page") - 1
                idx = [next_valid(start, n, flags)]
            elif page_sampling == "first":
                idx = [next_valid(-1, n, flags)]
            elif page_sampling == "last":
                # literal last page, no valid-page scan: the reference's
                # 'last' exists only in the decode path, as page_indices=[-1]
                # (wds/decode.py:228-231); an empty page yields an empty text
                # span, a missing text key is still a document error
                if flags[n - 1] == _FLAG_MISSING:
                    raise KeyError("text")
                idx = [n - 1]
            elif page_sampling == "all_valid":
                cur = -1
                for _ in range(n):
                    cur = next_valid(cur, n, flags)
                    idx.append(cur)
            elif page_sampling == "all":
                # text assembly raises on the FIRST empty/missing page, in
                # page order (doc_read_processor.py:118-119 + KeyError on a
                # missing text key) → whole-sample skip
                for f in flags:
                    if f == _FLAG_MISSING:
                        return None, "missing_text_key"
                    if f == _FLAG_INVALID:
                        return None, "empty_page_in_all"
                idx = list(range(n))
            else:  # pragma: no cover
                return None, f"bad_policy:{page_sampling}"
        except RuntimeError:
            pass
        except KeyError:
            return None, "missing_text_key"
        if not idx:
            return None, "no_valid_pages"
        if not has_media:
            return None, "no_page_images"
        return idx, None

    @F.pandas_udf(ret_type)
    def select_pages(
        doc_id: pd.Series, flags: pd.Series, has_anno: pd.Series, has_media: pd.Series
    ) -> pd.DataFrame:
        out_idx, out_err = [], []
        for d, fl, ha, hm in zip(doc_id, flags, has_anno, has_media):
            i, e = one(d, None if fl is None else list(fl), bool(ha), bool(hm))
            out_idx.append(i)
            out_err.append(e)
        return pd.DataFrame({"indices": out_idx, "error": out_err})

    # The function IS pure (hash-keyed determinism), but marking it
    # nondeterministic stops Catalyst from substituting the UDF call into
    # Filter conditions (where PythonUDF is unevaluable) and from duplicating
    # it across the ok/error branches via CollapseProject.
    return select_pages.asNondeterministic()


def _policy_sql(page_sampling: str, seed: int):
    """Pure-Catalyst twin of :func:`_policy_udf` — kept as an EXECUTABLE
    SPEC, not the default engine.  The wraparound
    ``get_next_valid_page_index`` scan (≤10 retries, KeyError on a missing
    text key, RuntimeError on exhaustion) becomes a bounded aggregate fold,
    and ``all_valid``'s n-step collection an outer fold over it; whole-row
    equivalence to the pandas UDF is locked by
    tests/test_extract_flat.py::test_policy_sql_equals_udf across all 5
    policies on the adversarial corpus.

    Measured negative result (r5): Spark evaluates higher-order lambdas via
    CodegenFallback — interpreted per lambda application — so this nested
    fold costs 1-2 orders of magnitude MORE per row than the Arrow-
    vectorized pandas state machine over pruned inputs, even after a
    substitution barrier stopped Catalyst from duplicating the fold (and
    its from_json-derived inputs) across branches.  The policy stays a
    pandas UDF by measurement, not assumption; flip cfg.policy_engine to
    'sql' to reproduce.
    """

    def next_valid(flags, n, start):
        # fold VALID_PAGE_RETRIES steps; acc = (done, idx, err, cur)
        def stf(done, idx, err, cur):
            return F.struct(
                done.alias("done"), idx.cast("int").alias("idx"),
                err.cast("string").alias("err"), cur.cast("int").alias("cur"),
            )

        init = stf(F.lit(False), F.lit(None), F.lit(None), start)

        def step(acc, _):
            cur2 = F.pmod(acc["cur"] + 1, n).cast("int")
            fcur = F.element_at(flags, cur2 + 1)
            return F.when(acc["done"], acc).otherwise(
                F.when(fcur == _FLAG_MISSING,
                       stf(F.lit(True), F.lit(None), F.lit("key"), cur2))
                .when(fcur == _FLAG_VALID,
                      stf(F.lit(True), cur2, F.lit(None), cur2))
                .otherwise(stf(F.lit(False), F.lit(None), F.lit(None), cur2))
            )

        res = F.aggregate(
            F.sequence(F.lit(1), F.lit(VALID_PAGE_RETRIES)), init, step
        )
        # not done after 10 steps == the reference's RuntimeError
        return F.when(
            res["done"],
            F.struct(res["idx"].alias("idx"), res["err"].alias("err")),
        ).otherwise(
            F.struct(F.lit(None).cast("int").alias("idx"),
                     F.lit("run").cast("string").alias("err"))
        )

    def apply(doc_id, flags, has_anno, has_media):
        n = F.size(flags)

        if page_sampling in ("first", "random"):
            if page_sampling == "first":
                start = F.lit(-1)
            else:
                # doc_rand_below(doc_id, seed, n, tag='page') - 1:
                # incremental (a*16 + digit) % n fold over the first 16 md5
                # hex chars == full-u64 % n (same fold as the DuckDB oracle)
                h = F.md5(F.concat(doc_id, F.lit(f"|{seed}|page")))
                pick = F.aggregate(
                    F.sequence(F.lit(1), F.lit(16)),
                    F.lit(0).cast("long"),
                    lambda a, i: F.pmod(
                        a * 16 + F.conv(F.substring(h, i, F.lit(1)), 16, 10).cast("long"),
                        n.cast("long"),
                    ),
                )
                start = (pick - 1).cast("int")
            nv = next_valid(flags, n, start)
            ind = F.when(nv["err"].isNull(), F.array(nv["idx"]))
            # 'run' (exhausted retries) keeps ind null → no_valid_pages below,
            # matching the UDF's `except RuntimeError: pass` with empty idx
            perr = F.when(nv["err"] == "key", F.lit("key"))
        elif page_sampling == "last":
            missing = F.element_at(flags, n) == _FLAG_MISSING
            ind = F.when(~missing, F.array((n - 1).cast("int")))
            perr = F.when(missing, F.lit("key"))
        elif page_sampling == "all":
            firstbad = F.get(
                F.filter(
                    F.sequence(F.lit(0), n - 1),
                    lambda i: F.element_at(flags, i + 1) != _FLAG_VALID,
                ),
                0,
            )
            ind = F.when(
                firstbad.isNull(),
                F.transform(F.sequence(F.lit(0), n - 1), lambda i: i.cast("int")),
            )
            perr = F.when(
                F.element_at(flags, firstbad + 1) == _FLAG_MISSING, F.lit("key")
            ).when(
                F.element_at(flags, firstbad + 1) == _FLAG_INVALID,
                F.lit("empty_page_in_all"),
            )
        elif page_sampling == "all_valid":
            # outer fold: n next_valid scans, partial kept on exhaustion
            def stf(cur, idx, done, keyerr):
                return F.struct(
                    cur.cast("int").alias("cur"), idx.alias("idx"),
                    done.alias("done"), keyerr.alias("keyerr"),
                )

            init = stf(F.lit(-1), F.array().cast("array<int>"),
                       F.lit(False), F.lit(False))

            def step(acc, _):
                nv = next_valid(flags, n, acc["cur"])
                return F.when(acc["done"] | acc["keyerr"], acc).otherwise(
                    F.when(nv["err"] == "key",
                           stf(acc["cur"], acc["idx"], F.lit(True), F.lit(True)))
                    .when(nv["err"] == "run",
                          stf(acc["cur"], acc["idx"], F.lit(True), F.lit(False)))
                    .otherwise(
                        stf(nv["idx"], F.concat(acc["idx"], F.array(nv["idx"])),
                            F.lit(False), F.lit(False))
                    )
                )

            res = F.aggregate(F.sequence(F.lit(1), n), init, step)
            ind = F.when(~res["keyerr"], res["idx"])
            perr = F.when(res["keyerr"], F.lit("key"))
        else:  # pragma: no cover - validate() rejects earlier
            raise ValueError(page_sampling)

        error = (
            F.when(~has_anno, F.lit("no_annotation"))
            .when(flags.isNull(), F.lit("anno_parse"))
            .when(n == 0, F.lit("empty_annotation"))
            .when(perr == "key", F.lit("missing_text_key"))
            .when(perr.isNotNull(), perr)
            # ind.isNull() first: size(NULL) is NULL under ANSI but -1 with
            # spark.sql.ansi.enabled=false, so relying on size alone would
            # silently pass retry-exhausted docs on non-ANSI sessions
            .when(ind.isNull() | (F.size(ind) == 0), F.lit("no_valid_pages"))
            .when(~has_media, F.lit("no_page_images"))
        )
        sel = F.struct(
            F.when(error.isNull(), ind).alias("indices"),
            error.alias("error"),
        )
        # Substitution barrier — the same role as the pandas UDF's
        # asNondeterministic(): the value IS deterministic (rand(seed) > -1
        # is always true), but the nondeterministic marker stops Catalyst
        # from inlining this non-cheap fold into Filter conditions and
        # duplicating it (together with its from_json-derived inputs) across
        # the ok/error branches — measured as a >10x interpreted-eval blowup
        # without it.
        return F.when(F.rand(0) > -1.0, sel).otherwise(sel)

    return apply


def _decode_udf(image_mode: str, render_dpi: int, max_pages: int):
    """mapInPandas body for the payload branch: render selected pages of the
    synthetic media payload → stable content refs (decode semantics of
    wds/decode.py:49-122: index wrap p % num_pages, render scale dpi/72,
    mode conversion).  Pixels are hashed and dropped inside the loop —
    nothing pixel-sized crosses Arrow (SURVEY.md §7.4.5)."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("anchor", T.IntegerType()),
            T.StructField("k_global", T.IntegerType()),
            T.StructField("page_text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("error", T.StringType()),
        ]
    )

    def decode(batches):
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "anchor", "k_global", "page_text", "media_ref", "error")}
            for doc_id, anchor, chunk_id, payload, indices, texts in zip(
                pdf["doc_id"], pdf["anchor"], pdf["chunk_id"],
                pdf["payload"], pdf["chunk_indices"], pdf["chunk_texts"],
            ):
                try:
                    mode_in, num_pages, seed = media_mod.parse_payload_ref(payload)
                    for pos, (page_idx, page_text) in enumerate(zip(indices, texts)):
                        arr = media_mod.render_page(
                            seed, int(page_idx) % num_pages,
                            image_mode=image_mode, render_dpi=render_dpi,
                        )
                        ref = media_mod.content_ref(arr)
                        del arr
                        rows["doc_id"].append(doc_id)
                        rows["anchor"].append(anchor)
                        rows["k_global"].append(int(chunk_id) * max_pages + pos)
                        rows["page_text"].append(page_text)
                        rows["media_ref"].append(ref)
                        rows["error"].append(None)
                except Exception as exn:  # corrupt payload → error row, keep going
                    rows["doc_id"].append(doc_id)
                    rows["anchor"].append(anchor)
                    rows["k_global"].append(None)
                    rows["page_text"].append(None)
                    rows["media_ref"].append(None)
                    rows["error"].append(f"media_decode:{type(exn).__name__}")
            yield pd.DataFrame(rows)

    return decode, out_schema


def _prepare(docs: DataFrame, cfg: ExtractJobCfg) -> DataFrame:
    """Catalyst-only derivation of per-doc working columns from the span
    array.  No shuffle, no Python; everything prunes/pushes down."""
    ss = F.expr("array_sort(spans, (a, b) -> a.offset - b.offset)")
    annos = F.filter(ss, lambda s: s["kind"] == F.lit("anno"))
    medias = F.filter(ss, lambda s: s["kind"] == F.lit("media"))
    texts = F.filter(ss, lambda s: s["kind"] == F.lit("text"))

    df = (
        docs
        # valid_sample gate: drop empty samples silently (tariterators.py:53)
        .filter(F.size("spans") > 0)
        .select(
            "doc_id",
            annos.alias("_annos"),
            medias.alias("_medias"),
            texts.alias("text_spans"),
        )
        .select(
            "doc_id",
            "text_spans",
            F.get("_annos", 0)["text"].alias("anno_txt"),
            F.get("_annos", 0)["offset"].alias("anchor"),
            F.get("_medias", 0)["media_ref"].alias("first_media"),
            F.transform("_medias", lambda s: s["media_ref"]).alias("media_refs"),
        )
        .withColumn("pages", F.from_json("anno_txt", ANNO_SCHEMA)["pages"])
        # Effective page text: lines.text when a 'lines' branch exists, else
        # top-level text — NO cross-branch fallback: a 'lines' struct lacking
        # 'text' is a missing key (ref doc_processor.py:40-43 KeyError), even
        # if a top-level 'text' also exists.  from_json conflates absent keys
        # with explicit JSON nulls, so the engine contract is null == missing
        # on both branches; the pytest oracle (tests/oracle.py:_page_lines)
        # mirrors this exactly.
        .withColumn(
            "page_texts",
            F.transform(
                "pages",
                lambda p: F.when(p["lines"].isNotNull(), p["lines"]["text"]).otherwise(
                    p["text"]
                ),
            ),
        )
        .withColumn(
            "flags",
            F.transform(
                "pages",
                lambda p: F.when(
                    (p["lines"].isNotNull() & p["lines"]["text"].isNull())
                    | (p["lines"].isNull() & p["text"].isNull()),
                    F.lit(_FLAG_MISSING),
                )
                .when(
                    F.size(
                        F.when(p["lines"].isNotNull(), p["lines"]["text"]).otherwise(
                            p["text"]
                        )
                    )
                    > 0,
                    F.lit(_FLAG_VALID),
                )
                .otherwise(F.lit(_FLAG_INVALID)),
            ),
        )
        .withColumn("is_payload", F.col("first_media").startswith(media_mod.SYNTH_PREFIX))
        .withColumn("n_media", F.size("media_refs"))
    )
    return df


def _raw_items(text_spans_col, cfg: ExtractJobCfg):
    """raw input text spans as (anchor, sub, kind, text, media_ref) items"""
    return F.transform(
        text_spans_col,
        lambda t: F.struct(
            t["offset"].alias("anchor"),
            F.lit(0).alias("sub"),
            F.lit("text").alias("kind"),
            (clean_text(t["text"]) if cfg.clean_text else t["text"]).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        ),
    )


def _finish_items(items):
    """sort by (anchor, sub) — leading struct fields, so the default
    array_sort comparator applies — then dense-renumber offsets"""
    return F.transform(
        F.array_sort(items),
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def _extract_core(
    spark: SparkSession, docs: DataFrame, cfg: ExtractJobCfg
):
    """Shared front of the extraction pipeline: branch probe + split,
    per-branch derivation + page-sampling policy, payload chunking + decode
    UDF.  Returns ``(pt_ok, pl_ok, policy_errors, decoded_ok,
    decode_errors)``; the nested/flat assembly tails diverge from here.
    """
    # ---- cheap branch probe BEFORE any heavy work -------------------------
    # payload vs passthrough is decided from the first media span's ref
    # prefix alone (no json parse, no UDF), so each branch runs the heavy
    # derivation only over its own subset of rows; for a pure-passthrough
    # corpus the payload subtree filters everything out at the scan.
    #
    # Deliberate trade-off: the two branches each scan the input (2x read)
    # instead of materializing a probe-tagged intermediate.  The probe is a
    # cheap columnar expression evaluated during the scan, while a shared
    # intermediate would cost a full-corpus shuffle or cache — infeasible at
    # 10^12 docs — and would drag passthrough rows (zero-shuffle path)
    # through the payload subtree's exchanges.  Scans are the cheap,
    # horizontally-scaling resource here; shuffles are not.
    _probe = F.coalesce(
        F.get(
            F.expr(
                "array_sort(filter(spans, s -> s.kind = 'media'),"
                " (a, b) -> a.offset - b.offset)"
            ),
            0,
        )["media_ref"].startswith(media_mod.SYNTH_PREFIX),
        F.lit(False),
    )
    # valid_sample gate: drop empty samples silently (tariterators.py:53)
    gated = docs.filter(F.size("spans") > 0)

    # ---- adaptive branch resolution ---------------------------------------
    # An absent branch still schedules its whole subtree (second scan, policy
    # UDF stage, chunk explode, repartition exchange, mapInPandas Python
    # workers, persist, window) — measured 3.0 s of fixed overhead at sf0.1
    # for a pure-passthrough corpus.  'auto' resolves the shape with two
    # LIMIT-1 probe jobs: on a mixed corpus each stops at the first matching
    # row (~one scan partition); on a homogeneous corpus one probe pays a
    # single-column scan and buys skipping the entire other subtree.  At
    # 10^12 rows the shape is a known table property — set cfg.branch
    # explicitly and no probe job runs.
    branch = cfg.branch
    if branch == "auto":
        has_pl = not gated.filter(_probe).isEmpty()
        has_pt = not gated.filter(~_probe).isEmpty()
        branch = "mixed" if (has_pl and has_pt) else ("payload" if has_pl else "passthrough")
    pt_in = gated.filter(~_probe) if branch in ("mixed", "passthrough") else None
    pl_in = gated.filter(_probe) if branch in ("mixed", "payload") else None

    if cfg.policy_engine == "sql":
        policy_col = _policy_sql(cfg.page_sampling, cfg.seed)
        select_pages = None
    else:
        policy_col = None
        select_pages = _policy_udf(cfg.page_sampling, cfg.seed)

    def prepared(branch_docs: DataFrame) -> tuple[DataFrame, DataFrame]:
        """heavy derivation + page policy over one branch; returns (ok, errors)"""
        df = _prepare(branch_docs, cfg)
        sel = (
            policy_col(
                F.col("doc_id"), F.col("flags"),
                F.col("anno_txt").isNotNull(), F.col("n_media") > 0,
            )
            if policy_col is not None
            else select_pages(
                F.col("doc_id"), F.col("flags"),
                F.col("anno_txt").isNotNull(), F.col("n_media") > 0,
            )
        )
        df = df.withColumn("sel", sel).select(
            "doc_id", "text_spans", "anchor", "first_media", "media_refs",
            "page_texts", "n_media",
            F.col("sel")["indices"].alias("indices"),
            F.col("sel")["error"].alias("error"),
        )
        errs = df.filter(F.col("error").isNotNull()).select(
            "doc_id", F.lit("anno").alias("stage"), F.col("error").alias("error")
        )
        # pre-join selected page text SQL-side: only the selected pages'
        # strings cross into any UDF (explicit column pruning, SURVEY.md §4)
        ok = (
            df.filter(F.col("error").isNull())
            .withColumn(
                "sel_texts",
                F.transform(
                    "indices",
                    lambda i: F.array_join(F.get("page_texts", i), cfg.line_break),
                ),
            )
            .drop("page_texts")
        )
        return ok, errs

    pt_ok, pt_errors = prepared(pt_in) if pt_in is not None else (None, None)
    if pl_in is None:
        policy_errors = pt_errors if pt_errors is not None else empty_errors(spark)
        return pt_ok, None, policy_errors, None, None
    pl_ok, pl_errors = prepared(pl_in)
    policy_errors = pl_errors if pt_errors is None else pt_errors.unionByName(pl_errors)

    # ---------------- payload branch: cap -> salt -> decode UDF --------------
    k = cfg.max_pages_per_task
    n_parts = cfg.salt_buckets or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    payload_rows = (
        pl_ok
        .select(
            "doc_id", "anchor", F.col("first_media").alias("payload"),
            F.posexplode(
                # per-partition size cap: <=k pages decoded per task row
                F.transform(
                    F.sequence(
                        F.lit(0), F.floor((F.size("indices") - 1) / k).cast("int")
                    ),
                    lambda c: F.struct(
                        F.slice("indices", c * k + 1, k).alias("chunk_indices"),
                        F.slice("sel_texts", c * k + 1, k).alias("chunk_texts"),
                    ),
                )
            ).alias("chunk_id", "chunk"),
        )
        .select(
            "doc_id", "anchor", "payload", "chunk_id",
            F.col("chunk")["chunk_indices"].alias("chunk_indices"),
            F.col("chunk")["chunk_texts"].alias("chunk_texts"),
        )
        # salted repartition on (doc_id, chunk_id): a giant doc's chunks fan
        # out across executors instead of stalling one (north rule)
        .repartition(n_parts, "doc_id", "chunk_id")
    )
    decode_fn, decode_schema = _decode_udf(cfg.image_mode, cfg.render_dpi, k)
    decoded = payload_rows.mapInPandas(decode_fn, schema=decode_schema)
    # consumed by three branches (ok rows, error rows, bad-doc anti-join):
    # never render a page more than once
    if cfg.persist_intermediate:
        from pyspark.storagelevel import StorageLevel

        decoded = decoded.persist(StorageLevel.MEMORY_AND_DISK)
    decode_errors = decoded.filter(F.col("error").isNotNull()).select(
        "doc_id", F.lit("media").alias("stage"), F.col("error").alias("error")
    )
    decoded_ok = decoded.filter(F.col("error").isNull())
    return pt_ok, pl_ok, policy_errors, decoded_ok, decode_errors


def _payload_items(
    pl_ok: DataFrame, decoded_ok: DataFrame, decode_errors: DataFrame, cfg: ExtractJobCfg
) -> DataFrame:
    """span item rows + one ``__error__`` marker row per decode-error chunk.

    The marker rides the SAME doc_id shuffle the reassembly needs anyway, so
    the whole-sample skip (a doc with any decode error contributes nothing)
    is a window/aggregate predicate instead of a ``broadcast(bad_docs)``
    anti-join — which both forced a full decode pass to finish before the
    main stage could start AND broadcast a set whose size scales with the
    error count (unbounded at 10^12 docs)."""
    marks = decode_errors.select(
        "doc_id",
        F.lit(-1).alias("anchor"),
        F.lit(-1).alias("sub"),
        F.lit("__error__").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )
    return _payload_span_rows(pl_ok, decoded_ok, cfg).unionByName(marks)


def _payload_span_rows(pl_ok: DataFrame, decoded_ok: DataFrame, cfg: ExtractJobCfg) -> DataFrame:
    """decode rows + raw input spans -> flat (doc_id, anchor, sub, kind,
    text, media_ref) item rows for the payload branch."""
    page_spans = decoded_ok.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("anchor").alias("anchor"),
                    (F.col("k_global") * 2).alias("sub"),
                    F.lit("text").alias("kind"),
                    F.col("page_text").alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                ),
                F.struct(
                    F.col("anchor").alias("anchor"),
                    (F.col("k_global") * 2 + 1).alias("sub"),
                    F.lit("media").alias("kind"),
                    F.lit(None).cast("string").alias("text"),
                    F.col("media_ref").alias("media_ref"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.*")

    raw_spans = (
        pl_ok
        .select("doc_id", F.explode(_raw_items(F.col("text_spans"), cfg)).alias("s"))
        .select("doc_id", "s.*")
    )
    return page_spans.unionByName(raw_spans)


def extract_docread(
    spark: SparkSession, docs: DataFrame, cfg: Optional[ExtractJobCfg] = None
) -> tuple[DataFrame, DataFrame]:
    """Run doc-read extraction.  Returns ``(spans_out, errors)``:

    - ``spans_out``: nested ``(doc_id, spans)`` with the output span contract —
      per selected page k: a text span (lines joined by cfg.line_break,
      doc_read_processor.py:121) then its paired media span, anchored at the
      annotation's input position; raw input text spans pass through
      (cleaned) at their own positions; offsets renumbered densely 0..n-1.
    - ``errors``: (doc_id, stage, error) lineage rows for skipped documents
      (continue-policy analogue of wds/helpers.py:41-68).

    Documents that error at any stage contribute *no* output spans (the
    reference's whole-sample skip).

    For a flat consumer, :func:`extract_docread_flat` produces
    ``flatten_spans``-identical rows without building the per-doc arrays.
    """
    cfg = (cfg or ExtractJobCfg()).validate()
    pt_ok, pl_ok, policy_errors, decoded_ok, decode_errors = _extract_core(
        spark, docs, cfg
    )
    if pl_ok is None:
        return _passthrough_nested(pt_ok, cfg), policy_errors

    # ---------------- payload assembly: decode rows -> span items -> regroup -
    all_items = _payload_items(pl_ok, decoded_ok, decode_errors, cfg)
    errors = policy_errors.unionByName(decode_errors)

    # dense offset renumbering + nesting in ONE shuffle; span order restored
    # by sort keys, never by collect_list order (SURVEY.md §7.4.3).  The
    # whole-sample skip is the exists-marker predicate on the grouped array —
    # same shuffle, no broadcast (see _payload_items).
    payload_nested = (
        all_items.groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct("anchor", "sub", "kind", "text", "media_ref")
            ).alias("items")
        )
        .filter(~F.exists("items", lambda s: s["kind"] == F.lit("__error__")))
        .select("doc_id", _finish_items(F.col("items")).alias("spans"))
    )
    if pt_ok is None:
        return payload_nested, errors
    return _passthrough_nested(pt_ok, cfg).unionByName(payload_nested), errors


def _passthrough_nested(pt_ok: DataFrame, cfg: ExtractJobCfg) -> DataFrame:
    # ---------------- passthrough branch: one projection, ZERO shuffle -------
    # pre-resolved media docs never touch Python and never explode: the final
    # ordered span array is assembled per-row with higher-order functions
    pt_page_items = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size("indices") - 1),
            lambda j: F.array(
                F.struct(
                    F.col("anchor").alias("anchor"),
                    (j * 2).alias("sub"),
                    F.lit("text").alias("kind"),
                    F.get("sel_texts", j).alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                ),
                F.struct(
                    F.col("anchor").alias("anchor"),
                    (j * 2 + 1).alias("sub"),
                    F.lit("media").alias("kind"),
                    F.lit(None).cast("string").alias("text"),
                    F.get(
                        "media_refs",
                        F.pmod(F.get("indices", j), F.col("n_media")).cast("int"),
                    ).alias("media_ref"),
                ),
            ),
        )
    )
    return pt_ok.select(
        "doc_id",
        _finish_items(
            F.concat(_raw_items(F.col("text_spans"), cfg), pt_page_items)
        ).alias("spans"),
    )


def extract_docread_flat(
    spark: SparkSession, docs: DataFrame, cfg: Optional[ExtractJobCfg] = None
) -> tuple[DataFrame, DataFrame]:
    """Doc-read extraction emitting flat (doc_id, offset, kind, text,
    media_ref) rows directly — value-identical to
    ``flatten_spans(extract_docread(...))`` (locked by a pytest exceptAll
    equivalence test + the driver oracle), but the passthrough branch never
    builds or sorts a per-doc span array: dense offsets are computed
    analytically and the page items come out of ONE codegen explode.

    Why: the nested assembly's array_sort/transform lambdas evaluate
    interpreted per element (ROUND3.md codegen-vs-HOF lesson); for flat
    consumers (the flagship query, any columnar sink) that work is pure
    overhead.  Passthrough stays zero-shuffle; the payload branch replaces
    groupBy+collect_list+array_sort with a window rank over the same single
    shuffle.

    Offset derivation (passthrough): output order is (anchor, sub) where raw
    text spans carry their own input offset as anchor and all 2K page items
    share the annotation's anchor.  ``text_spans`` is offset-sorted, so the
    i-th raw span has exactly i raw predecessors, plus the 2K page items iff
    its anchor exceeds the annotation's; a page item at position m has
    R_a + m predecessors, R_a = #raw spans before the annotation.
    """
    cfg = (cfg or ExtractJobCfg()).validate()
    pt_ok, pl_ok, policy_errors, decoded_ok, decode_errors = _extract_core(
        spark, docs, cfg
    )
    if pl_ok is None:
        return _passthrough_flat(pt_ok, cfg), policy_errors

    all_items = _payload_items(pl_ok, decoded_ok, decode_errors, cfg)
    errors = policy_errors.unionByName(decode_errors)
    # whole-sample skip as a window predicate on the SAME doc_id shuffle the
    # row_number needs (unordered max + ordered row_number share one
    # Exchange); no broadcast, no pre-pass (see _payload_items)
    w_doc = Window.partitionBy("doc_id")
    w = Window.partitionBy("doc_id").orderBy("anchor", "sub")
    payload_flat = (
        all_items.withColumn(
            "_bad",
            F.max(F.when(F.col("kind") == "__error__", 1).otherwise(0)).over(w_doc),
        )
        # _bad == 0 alone is the whole-sample skip: a doc containing any
        # __error__ marker has _bad = 1 on EVERY row, markers included
        .filter(F.col("_bad") == 0)
        .select(
            "doc_id",
            (F.row_number().over(w) - 1).cast("int").alias("offset"),
            "kind", "text", "media_ref",
        )
    )
    if pt_ok is None:
        return payload_flat, errors
    return _passthrough_flat(pt_ok, cfg).unionByName(payload_flat), errors


def _passthrough_flat(pt_ok: DataFrame, cfg: ExtractJobCfg) -> DataFrame:
    # ONE generator for both raw and page rows: pt_ok's subtree (scan +
    # derivation + policy UDF) must evaluate exactly once — a raw/page
    # union of two selects over pt_ok would run it twice, incl. the Python
    # policy UDF.  Row m of sequence(0, n_raw + 2K - 1) is raw span #m when
    # m < n_raw, else page item #(m - n_raw); every downstream expression is
    # codegen (element_at / when / pmod), no array is built or sorted.
    n_raw = F.size("text_spans")
    k2 = (F.size("indices") * 2).alias("k2")
    pt = pt_ok.select(
        "doc_id", "anchor", "media_refs", "n_media", "indices", "sel_texts",
        "text_spans", k2,
        F.size(
            F.filter("text_spans", lambda t: t["offset"] < F.col("anchor"))
        ).alias("ra"),
        F.explode(F.sequence(F.lit(0), n_raw + F.size("indices") * 2 - 1)).alias("m"),
    )
    m = F.col("m")
    is_raw = m < F.size("text_spans")
    t = F.get("text_spans", m)
    p = m - F.size("text_spans")
    j = (p / 2).cast("int")
    is_page_text = p % 2 == 0
    raw_text = clean_text(t["text"]) if cfg.clean_text else t["text"]
    pt_flat = pt.select(
        "doc_id",
        F.when(
            is_raw,
            m + F.when(t["offset"] > F.col("anchor"), F.col("k2")).otherwise(F.lit(0)),
        ).otherwise(F.col("ra") + p).cast("int").alias("offset"),
        F.when(is_raw | is_page_text, F.lit("text"))
        .otherwise(F.lit("media")).alias("kind"),
        F.when(is_raw, raw_text)
        .when(is_page_text, F.get("sel_texts", j)).alias("text"),
        F.when(
            ~is_raw & ~is_page_text,
            F.get(
                "media_refs",
                F.pmod(F.get("indices", j), F.col("n_media")).cast("int"),
            ),
        ).alias("media_ref"),
    )
    return pt_flat


def flatten_spans(spans_out: DataFrame) -> DataFrame:
    """Nested (doc_id, spans) → flat (doc_id, offset, kind, text, media_ref)."""
    return spans_out.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s")["offset"].alias("offset"),
        F.col("s")["kind"].alias("kind"),
        F.col("s")["text"].alias("text"),
        F.col("s")["media_ref"].alias("media_ref"),
    )


def run_extract(
    spark: SparkSession, docs: DataFrame, cfg: Optional[ExtractJobCfg] = None
) -> tuple[DataFrame, DataFrame]:
    """extract_docread + error-policy enforcement (stop policies fail the job,
    mirroring the reference handler registry wds/helpers.py:57-65)."""
    cfg = (cfg or ExtractJobCfg()).validate()
    spans_out, errors = extract_docread(spark, docs, cfg)
    if cfg.error_handler not in CONTINUE_POLICIES:
        first = errors.limit(1).collect()
        if first:
            r = first[0]
            raise RuntimeError(
                f"extraction error (policy={cfg.error_handler}): "
                f"doc={r['doc_id']} stage={r['stage']} error={r['error']}"
            )
    return spans_out, errors


def empty_errors(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], ERRORS_SCHEMA)


#: span kinds the engine emits (extract pipeline: text/media; the derived
#: span corpus additionally carries 'anno' annotation spans)
KNOWN_SPAN_KINDS = ("text", "media", "anno")


def audit_spans(
    spans: DataFrame, known_kinds: tuple = KNOWN_SPAN_KINDS
) -> DataFrame:
    """Span-table data-quality audit: one row per doc over a FLAT span
    relation (doc_id, offset, kind, text, media_ref), checking the
    engine's interleaved-span invariants:

    - ``dense``: offsets are exactly 0..n-1 with no gaps or duplicates
    - media spans carry a media_ref and no text (``n_bad_media`` counts
      violations); non-media spans carry no media_ref (``n_bad_ref``)
    - every kind is known (``n_unknown``)

    ``ok`` folds them all.  At 10^12 rows this is the cheap standing
    gate between extraction and consumers — ONE map-side-combined agg
    keyed on doc_id, no joins, no windows.
    """
    off = F.col("offset")
    kind = F.col("kind")
    n = F.count(F.lit(1))
    g = spans.groupBy("doc_id").agg(
        n.cast("int").alias("n_spans"),
        F.sum((kind == "text").cast("int")).cast("int").alias("n_text"),
        F.sum((kind == "media").cast("int")).cast("int").alias("n_media"),
        F.sum((kind == "anno").cast("int")).cast("int").alias("n_anno"),
        # fail CLOSED: a NULL kind makes isin() NULL, which sum() would
        # silently skip — coalesce so NULL kinds count as unknown (ADVICE r5)
        F.sum((~F.coalesce(kind.isin(*known_kinds), F.lit(False))).cast("int"))
        .cast("int").alias("n_unknown"),
        # fail CLOSED: a group whose offsets are all NULL yields NULL
        # min/max — a broken table must audit false, not NULL (ADVICE r5)
        F.coalesce(
            (F.min(off) == 0)
            & (F.max(off) == n - 1)
            & (F.countDistinct(off) == n),
            F.lit(False),
        ).alias("dense"),
        F.sum(
            (
                (kind == "media")
                & (F.col("media_ref").isNull() | F.col("text").isNotNull())
            ).cast("int")
        ).cast("int").alias("n_bad_media"),
        F.sum(
            ((kind != "media") & F.col("media_ref").isNotNull()).cast("int")
        ).cast("int").alias("n_bad_ref"),
    )
    ok = F.coalesce(
        F.col("dense")
        & (F.col("n_unknown") == 0)
        & (F.col("n_bad_media") == 0)
        & (F.col("n_bad_ref") == 0),
        F.lit(False),
    )
    return g.select("*", ok.alias("ok"))
