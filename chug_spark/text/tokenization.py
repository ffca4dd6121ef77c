"""Tokenization as Catalyst expressions + an optional pandas-UDF slot.

The reference tokenizes with a HuggingFace tokenizer (no HF downloads in this
sandbox): ``add_special_tokens=False, max_length, padding='max_length',
truncation=True`` (src/chug/text/tokenization.py:42-58), then builds target
ids by masking pad and prompt positions (:12-39).

This module provides:

- a deterministic *toy* tokenizer (token id = length(word) % 97) implemented
  as pure Column expressions — used by tests and the driver oracle queries;
  identical padding/truncation semantics to the reference call;
- :func:`make_tokenize_udf` — the production slot: wraps ANY callable
  tokenizer (e.g. a HF tokenizer broadcast to executors) into an
  Arrow-batched pandas UDF, mirroring ``create_text_preprocessor``
  (src/chug/text/tokenization.py:99-130).
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import prompt_end_pos, text_input_to_target

TOY_VOCAB_MOD = 97


def toy_token_ids(text: Column) -> Column:
    """Whitespace toy tokenizer: id = length(word) % 97 (deterministic,
    SQL-portable stand-in for a real vocab)."""
    return F.transform(
        F.split(text, " "), lambda w: (F.length(w) % TOY_VOCAB_MOD).cast("int")
    )


def pad_or_truncate(ids: Column, max_length: int, pad_id: int = 0) -> Column:
    """padding='max_length' + truncation=True semantics
    (tokenization.py:47-56): always exactly ``max_length`` ids."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(max_length)),
        lambda i: F.coalesce(F.get(ids, i - 1), F.lit(pad_id)).cast("int"),
    )


def tokenize_col(text: Column, max_length: int, pad_id: int = 0) -> Column:
    return pad_or_truncate(toy_token_ids(text), max_length, pad_id)


def target_ids_col(
    input_ids: Column, pad_id: int, prompt_end_token_id: Optional[int] = None,
    ignore_id: int = -100,
) -> Column:
    """text_input_to_target as Column expressions (tokenization.py:12-39)."""
    return text_input_to_target(input_ids, pad_id, prompt_end_token_id, ignore_id)


def prepare_text_input_cols(
    text: Column,
    max_length: int,
    pad_id: int = 0,
    task_start_token: Optional[str] = None,
    eos_token: Optional[str] = "</s>",
    prompt_end_token_id: Optional[int] = None,
    include_target: bool = True,
) -> dict[str, Column]:
    """prepare_text_input (tokenization.py:61-96) with the toy tokenizer:
    optional task-start prefix, optional eos append, tokenize, optional
    target masking."""
    t = text
    if task_start_token:
        t = F.concat(F.lit(task_start_token), t)
    if eos_token:
        t = F.concat(t, F.lit(" " + eos_token))
    ids = tokenize_col(t, max_length, pad_id)
    out = {"text_input": ids}
    if include_target:
        out["text_target"] = target_ids_col(ids, pad_id, prompt_end_token_id)
    return out


def make_tokenize_udf(
    tokenizer_factory: Callable[[], Callable],
    max_length: int,
    ids_only: bool = True,
):
    """Production tokenizer slot: Arrow-batched pandas UDF around a
    user-supplied tokenizer (constructed once per executor via the factory —
    the broadcast pattern for HF tokenizers).  Mirrors ``tokenize``
    (src/chug/text/tokenization.py:42-58).

    The tokenizer is called ONCE per Arrow batch with the whole list of
    strings — HF fast tokenizers batch-encode in a single Rust call, ~10×
    the throughput of per-row encode calls."""

    state: dict = {}

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def tok(texts: pd.Series) -> pd.Series:
        if "t" not in state:
            state["t"] = tokenizer_factory()
        tokenizer = state["t"]
        enc = tokenizer(
            list(texts),
            add_special_tokens=False,
            max_length=max_length,
            padding="max_length",
            truncation=True,
        )
        ids_rows = enc["input_ids"] if isinstance(enc, dict) else enc
        return pd.Series([list(map(int, ids)) for ids in ids_rows])

    return tok


def hf_tokenizer_factory(name_or_path: str, _transformers_mod=None, **kwargs):
    """Factory for :func:`make_tokenize_udf` backed by a HF tokenizer —
    the production configuration from the reference
    (src/chug/text/tokenization.py:42-58 uses a ``transformers`` tokenizer
    with add_special_tokens=False / padding='max_length' / truncation=True,
    which :func:`make_tokenize_udf` already applies).

    Optional-import shim: ``transformers`` is not in this sandbox, so the
    availability check happens eagerly on the driver (fail fast, not at
    executor task time), while the actual ``AutoTokenizer.from_pretrained``
    runs lazily once per executor inside the returned factory.  Tests inject
    a fake module via ``_transformers_mod`` to lock the dispatch.

    Usage::

        tok_udf = make_tokenize_udf(hf_tokenizer_factory("gpt2"), max_length=512)
    """
    if _transformers_mod is None:
        import importlib.util

        if importlib.util.find_spec("transformers") is None:
            raise ImportError(
                "hf_tokenizer_factory needs the 'transformers' library "
                "(pip install transformers); in this sandbox use the toy "
                "Column-expression tokenizer (tokenize_col) instead"
            )

    def factory():
        mod = _transformers_mod
        if mod is None:
            import transformers as mod  # type: ignore[no-redef]
        return mod.AutoTokenizer.from_pretrained(name_or_path, **kwargs)

    return factory
