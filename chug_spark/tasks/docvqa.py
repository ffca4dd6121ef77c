"""Doc-VQA task: Q/A extraction with fallback keys, deterministic answer
choice, Donut-style prompt assembly (reference
src/chug/doc/doc_vqa_processor.py:66-105, defaults :21-24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import VqaTaskCfg
from ..functions import md5_pick_index, vqa_prompt


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
