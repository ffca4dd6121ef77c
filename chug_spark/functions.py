"""Column-expression library: the reference's scalar/projection/filter
operators re-expressed as Catalyst expressions (SURVEY.md §2.2/§2.8).

Everything here is JVM-side (whole-stage codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Projections / renames / filters
# ---------------------------------------------------------------------------


def coalesce_rename(df: DataFrame, rename: dict[str, str], keep: bool = False) -> DataFrame:
    """``wds.rename`` with ';'-fallback keys (first present wins), reference
    usage src/chug/task_pipeline/pipeline_image_text.py:63-70 and the
    FeatureInfo contract src/chug/common/types.py:94-104.

    ``rename`` maps output_name -> ';'-delimited list of source columns.
    ``keep=False`` drops all other columns (the reference default there).
    """
    cols = []
    consumed = set()
    for out, keys in rename.items():
        alts = [k for k in keys.split(";") if k in df.columns]
        if not alts:
            raise ValueError(f"no source column for {out!r} among {keys!r}")
        consumed.update(alts)
        cols.append(F.coalesce(*[F.col(k) for k in alts]).alias(out))
    if keep:
        passthrough = [F.col(c) for c in df.columns if c not in consumed]
        cols = passthrough + cols
    return df.select(*cols)


def any_present(df_columns: list[str], keys: str) -> Column:
    """'sample has at least one of these keys' → at least one column non-null
    (reference filter_incomplete, pipeline_image_text.py:22-29)."""
    alts = [F.col(k) for k in keys.split(";") if k in df_columns]
    if not alts:
        return F.lit(False)
    return F.coalesce(*alts).isNotNull()


def filter_incomplete(df: DataFrame, image_key: str, text_key: str) -> DataFrame:
    """Keep rows with ≥1 image column AND ≥1 text column non-null
    (pipeline_image_text.py:22-29, applied via wds.select :42-50).
    Expressed as a Column predicate so Catalyst pushes it into the scan."""
    return df.filter(
        any_present(df.columns, image_key) & any_present(df.columns, text_key)
    )


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY.md §2.8)
# ---------------------------------------------------------------------------

BASE_EXT_RE = r"^((?:.*/|)[^.]+)[.]([^/]*)$"


def base_plus_ext(path: Column) -> tuple[Column, Column]:
    """Split ``dir/name.ext1.ext2`` → (base, all-ext); empty string when no
    match (reference regex src/chug/wds/tariterators.py:8-25)."""
    return (
        F.regexp_extract(path, BASE_EXT_RE, 1),
        F.regexp_extract(path, BASE_EXT_RE, 2),
    )


def file_extension(key: Column) -> Column:
    """Final extension, ``re.sub(r'.*[.]', '', key)``
    (reference src/chug/wds/decode.py:217)."""
    return F.regexp_replace(key, r".*[.]", "")


def urldir(url: Column) -> Column:
    """Directory part of a url/path, scheme preserved
    (reference src/chug/wds/helpers.py:10-15)."""
    return F.regexp_replace(url, r"/[^/]*$", "")


def flatten_nested(df: DataFrame, nested: str, remove_original: bool = True) -> DataFrame:
    """Merge a struct column's fields up into the row
    (reference wds ``flatten_nested``, src/chug/wds/filters.py:129-142;
    json-flatten usage doc_processor.py:188-190).  Existing columns of the
    same name are replaced (replace_existing=True semantics)."""
    nested_fields = [f.name for f in df.schema[nested].dataType.fields]
    keep = [c for c in df.columns if c not in nested_fields and c != nested]
    cols = [F.col(c) for c in keep] + [F.col(f"{nested}.{f}").alias(f) for f in nested_fields]
    if not remove_original:
        cols.append(F.col(nested))
    return df.select(*cols)


def join_lines(lines: Column, line_break: str = "\n") -> Column:
    """Page text = lines joined by line_break
    (reference src/chug/doc/doc_read_processor.py:121)."""
    return F.array_join(lines, line_break)


def clean_text(col: Column) -> Column:
    """Deterministic text cleanup for raw text fragments: drop control chars,
    collapse whitespace runs, trim.  (The 'text-cleanup' of the north rule;
    the reference leaves raw ``txt`` members untouched, so this is engine
    policy, kept trivially SQL-portable.)

    ``(?U)`` (Java UNICODE_CHARACTER_CLASS) makes ``\\s`` match the Unicode
    White_Space set (NBSP, NEL, U+2028, ...), matching Python's ``\\s`` in the
    pytest oracle — the control-char strip removes \\x1c-\\x1f first, which is
    the only place the two engines' whitespace sets differ.  After the
    collapse, only ASCII spaces remain, so plain trim() finishes the job."""
    c = F.regexp_replace(col, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    c = F.regexp_replace(c, r"(?U)\s+", " ")
    return F.trim(c)


def vqa_prompt(
    question: Column,
    answer: Column | None,
    question_prefix: str = "<s_question>",
    question_suffix: str = "</s_question>",
    answer_prefix: str = "<s_answer>",
    answer_suffix: str = "</s_answer>",
) -> Column:
    """Donut-style VQA prompt assembly
    (reference src/chug/doc/doc_vqa_processor.py:82-84, defaults :21-24):
    ``qp + q + qs + ap [+ a + as]`` — answer part only when answer non-null."""
    base = F.concat(F.lit(question_prefix), question, F.lit(question_suffix), F.lit(answer_prefix))
    if answer is None:
        return base
    return F.when(
        answer.isNotNull(), F.concat(base, answer, F.lit(answer_suffix))
    ).otherwise(base)


def rand_below_col(key: Column, seed: int, n: int, tag: str = "") -> Column:
    """Column form of :func:`chug_spark.determinism.doc_rand_below`: the
    first 16 md5 hex chars of ``"{key}|{seed}|{tag}"`` as a big-endian u64,
    mod n — computed as a left fold ``(acc*16 + digit) % n`` so the value
    never leaves signed-64 range.  Identical in Python (int.from_bytes % n),
    Spark, and DuckDB (list_reduce) — the engine-portable uniform int in
    [0, n)."""
    hx = F.md5(F.concat_ws("|", key.cast("string"), F.lit(str(seed)), F.lit(tag)))
    digits = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda i: F.conv(hx.substr(i, F.lit(1)), 16, 10).cast("long"),
    )
    return F.aggregate(
        digits,
        F.lit(0).cast("long"),
        lambda acc, d: F.pmod(acc * 16 + d, F.lit(n)),
    )


def md5_pick_index(key: Column, n: Column) -> Column:
    """Deterministic 'random' index in [0, n): first two md5 hex chars → 0..255
    → mod n.  Engine-portable (md5 is identical in Spark and DuckDB), used to
    replace ``random.choice(answers)`` (doc_vqa_processor.py:78) with a
    schedule-independent rule."""
    v = F.conv(F.substring(F.md5(key), 1, 2), 16, 10).cast("int")
    return F.pmod(v, n).cast("int")


def prompt_end_pos(ids: Column, token_id: int, empty_default: int = 0) -> Column:
    """0-based index of the *last* occurrence of ``token_id`` in an int array
    (reference src/chug/text/tokenization.py:7-9).  ``empty_default`` when
    absent."""
    rev_pos = F.array_position(F.reverse(ids), F.lit(token_id))
    return F.when(rev_pos > 0, (F.size(ids) - rev_pos).cast("int")).otherwise(
        F.lit(empty_default)
    )


def text_input_to_target(
    ids: Column, pad_token_id: int, prompt_end_token_id: int | None = None, ignore_id: int = -100
) -> Column:
    """Target-id masking (reference src/chug/text/tokenization.py:12-39):
    pad → ignore_id; everything up to and including the *last* prompt-end
    token → ignore_id.  Pure higher-order functions, no UDF."""
    masked = F.transform(
        ids, lambda x: F.when(x == F.lit(pad_token_id), F.lit(ignore_id)).otherwise(x)
    )
    if prompt_end_token_id is None:
        return masked
    # empty_default=0: when the prompt-end token is absent the reference
    # masks target[:0+1] — index 0 — (tokenization.py:8-9,:36-38).
    # Search the already pad-masked ids, as the reference does
    # (tokenization.py:26,36): with an eos-as-pad tokenizer
    # (prompt_end_token_id == pad_token_id) every occurrence is already
    # ignore_id, so only index 0 gets masked — not every pad position.
    end_pos = prompt_end_pos(masked, prompt_end_token_id, empty_default=0)
    return F.transform(
        masked,
        lambda x, i: F.when(i <= end_pos, F.lit(ignore_id)).otherwise(x),
    )


def canonical_url(url):
    """Canonicalize a URL for dedup (the first dedup layer of every web
    corpus): lowercase scheme+host, strip default ports and fragments, drop
    tracking params (utm_*, fbclid, gclid, ref), sort surviving query params,
    trim trailing slash on the path.  Pure regex/HOF Column math — map-only,
    engine-portable (DuckDB twin in the driver oracle)."""
    base = F.regexp_replace(url, r"#.*$", "")           # fragment
    head = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(base, F.length(head) + 1, 1_000_000)
    head = F.lower(head)
    head = F.regexp_replace(head, r":80$|:443$", "")    # default ports
    # trailing-slash trim ('(.)/$' keeps a bare '/' path intact)
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"(.)/$", "$1")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[^=]*|fbclid|gclid|ref)="),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        head, path, F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit(""))
    )
