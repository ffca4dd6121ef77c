"""Doc-VQA task: Q/A extraction with fallback keys, deterministic answer
choice, Donut-style prompt assembly (reference
src/chug/doc/doc_vqa_processor.py:66-105, defaults :21-24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import VqaTaskCfg
from ..functions import any_present, md5_pick_index, vqa_prompt
from ..schema import DEFAULT_DOC_KEY


def filter_missing(
    df: DataFrame,
    image_key: str = DEFAULT_DOC_KEY,
    question_key: str = "question;query",
    answer_key: str = "answer;answers",
) -> DataFrame:
    """VQA validity filter: sample needs question AND answer AND image
    (reference src/chug/task_pipeline/pipeline_doc_vqa.py:25-34).  Column
    predicate → pushes into the scan."""
    return df.filter(
        any_present(df.columns, question_key)
        & any_present(df.columns, answer_key)
        & any_present(df.columns, image_key)
    )


def resolve_media_ref(df: DataFrame, media_col: str = "media_ref",
                      image_mode: str = "L", render_dpi: int = 144) -> DataFrame:
    """Attach ``image_ref`` — the decoded first page of the sample's media
    (DocVqaProcessor returns page_indices=[0], doc_vqa_processor.py:105; the
    inherited DocProcessor.__call__ then decodes that one page).  Pre-resolved
    refs pass through SQL-side; synthetic payloads render page 0 in an
    Arrow-batched UDF."""
    import pandas as pd

    from pyspark.sql import types as T

    from .. import media as media_mod

    from pyspark.util import PythonEvalType

    # NOTE: no type hints — `pd` is function-local and the module uses
    # `from __future__ import annotations`, so hint resolution would fail
    @F.pandas_udf(T.StringType(), functionType=PythonEvalType.SQL_SCALAR_PANDAS_UDF)
    def first_page_ref(refs):
        out = []
        for ref in refs:
            try:
                decoded, _n = media_mod.decode_media_pages(
                    ref, image_mode=image_mode, page_indices=[0],
                    render_dpi=render_dpi,
                )
                out.append(decoded[0])
            except Exception:
                out.append(None)
        return pd.Series(out)

    is_payload = F.col(media_col).startswith(media_mod.SYNTH_PREFIX)
    return df.withColumn(
        "image_ref",
        F.when(is_payload, first_page_ref(F.col(media_col))).otherwise(F.col(media_col)),
    )


def build_vqa(df: DataFrame, cfg: VqaTaskCfg | None = None) -> DataFrame:
    """Apply the VQA task to a samples DataFrame with (fallback) question /
    question_id / answers columns (FIXTURES.md §3 shape).

    - fallback key resolution = coalesce (constants.py:4-6 via _get_value,
      doc_processor.py:48-56)
    - answer = deterministic uniform choice over ``answers`` keyed on doc_id
      (replaces ``random.choice``, doc_vqa_processor.py:78 — SURVEY.md §7.2.7)
    - text_input = qp + q + qs + ap [+ a + as] (doc_vqa_processor.py:82-84)
    """
    cfg = cfg or VqaTaskCfg()

    def fallback(keys: str):
        alts = [F.col(k) for k in keys.split(";") if k in df.columns]
        return F.coalesce(*alts) if alts else F.lit(None)

    question = fallback(cfg.question_key)
    question_id = fallback(cfg.question_id_key)
    answers = fallback(cfg.answer_key)

    pick = md5_pick_index(F.col("doc_id").cast("string"), F.size(answers))
    answer = (
        F.when(answers.isNotNull(), F.get(answers, pick))
        if cfg.include_target
        else F.lit(None).cast("string")
    )

    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        question.alias("question"),
        question_id.alias("question_id"),
        answers.alias("answers"),
        answer.alias("answer"),
        vqa_prompt(
            question, answer,
            cfg.question_prefix, cfg.question_suffix,
            cfg.answer_prefix, cfg.answer_suffix,
        ).alias("text_input"),
    )


def vqa_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic VQA fixture from the driver's flat documents
    table (question = words 1-5, answers = [words 6-7, words 8-9]) and apply
    the task — SQL-portable end to end (oracle in entry_ext)."""
    words = F.split(F.col("text"), " ")
    fixture = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array_join(F.slice(words, 1, 5), " ").alias("question"),
        F.array(
            F.array_join(F.slice(words, 6, 2), " "),
            F.array_join(F.slice(words, 8, 2), " "),
        ).alias("answers"),
    )
    out = build_vqa(fixture)
    return out.select("doc_id", "question", "answer", "text_input")
