"""extract_docread_flat ≡ flatten_spans(extract_docread(...)) — the flat
assembly path (flagship) must be value-identical to the nested contract on
the adversarial corpus for every page-sampling policy."""

import pytest

from chug_spark.config import ExtractJobCfg
from chug_spark.extract import extract_docread, extract_docread_flat, flatten_spans
from chug_spark.synth import generate_docs


@pytest.mark.parametrize("policy", ["all_valid", "first", "last", "all", "random"])
def test_flat_equals_nested(spark, policy):
    docs = generate_docs(spark, n_docs=120, seed=13)
    cfg = ExtractJobCfg(page_sampling=policy, render_dpi=24)
    nested = flatten_spans(extract_docread(spark, docs, cfg)[0])
    flat = extract_docread_flat(spark, docs, cfg)[0]
    assert nested.exceptAll(flat).count() == 0
    assert flat.exceptAll(nested).count() == 0


def test_flat_errors_match_nested(spark):
    docs = generate_docs(spark, n_docs=120, seed=13)
    cfg = ExtractJobCfg(page_sampling="all_valid", render_dpi=24)
    ne = extract_docread(spark, docs, cfg)[1]
    fe = extract_docread_flat(spark, docs, cfg)[1]
    assert sorted(map(tuple, ne.collect())) == sorted(map(tuple, fe.collect()))
