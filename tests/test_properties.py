"""Property-based tests (SURVEY.md §5.3): randomized documents → invariants
hold and Spark output equals the oracle exactly.  Hypothesis generates the
span structures; one Spark round-trip per example batch keeps runtime sane."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chug_spark.config import ExtractJobCfg
from chug_spark.extract import extract_docread, flatten_spans
from chug_spark.schema import DOCUMENTS_SCHEMA

import oracle

lines_st = st.lists(
    st.text(alphabet="abc XYZ09", min_size=0, max_size=12), min_size=0, max_size=4
)

page_st = st.one_of(
    st.fixed_dictionaries({"text": lines_st}),
    st.fixed_dictionaries({"lines": st.fixed_dictionaries({"text": lines_st})}),
    st.fixed_dictionaries({"bbox": st.just([])}),  # missing text key entirely
    # null-vs-absent shapes (engine contract: null == missing, both branches)
    st.fixed_dictionaries({"text": st.none()}),            # explicit null text
    st.fixed_dictionaries(                                  # lines lacks text,
        {"lines": st.fixed_dictionaries({"bbox": st.just([])}),
         "text": lines_st}),                                # top-level NOT used
    st.fixed_dictionaries({"lines": st.none(), "text": lines_st}),  # null lines
    st.none(),                                              # null page element
)

anno_st = st.one_of(
    st.builds(lambda pages: json.dumps({"pages": pages}),
              st.lists(page_st, min_size=0, max_size=6)),
    st.just("{corrupt"),
    st.just('{"nopages": 1}'),
)


@st.composite
def doc_st(draw, idx):
    spans = []
    off = 0
    if draw(st.booleans()):
        spans.append({"kind": "text", "text": draw(st.text(max_size=20)),
                      "media_ref": None, "offset": off}); off += 1
    if draw(st.booleans()):
        spans.append({"kind": "anno", "text": draw(anno_st),
                      "media_ref": None, "offset": off}); off += 1
    n_media = draw(st.integers(min_value=0, max_value=4))
    for k in range(n_media):
        spans.append({"kind": "media", "text": None,
                      "media_ref": f"page:{idx}:{k}", "offset": off}); off += 1
    return (f"h{idx:04d}", spans)


@st.composite
def corpus_st(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    return [draw(doc_st(i)) for i in range(n)]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus_st(), st.sampled_from(["all_valid", "first", "last", "all", "random"]))
def test_fuzzed_corpus_matches_oracle(spark, rows, policy):
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    spans_out, errors = extract_docread(
        spark, docs, ExtractJobCfg(page_sampling=policy, render_dpi=12, seed=2)
    )
    got = {}
    for r in flatten_spans(spans_out).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["kind"], r["text"], r["media_ref"], r["offset"])
        )
    for v in got.values():
        v.sort(key=lambda s: s[3])
    errs = {(r["doc_id"], r["stage"], r["error"]) for r in errors.collect()}

    want, want_errs = oracle.extract_corpus(
        rows, page_sampling=policy, seed=2, render_dpi=12
    )
    assert got == want
    assert errs == set(want_errs)

    # invariants: offsets dense 0..n-1; every doc is either emitted, errored,
    # or empty-input; never both emitted and errored
    for doc_id, spans in got.items():
        assert [s[3] for s in spans] == list(range(len(spans)))
        assert all(s[0] in ("text", "media") for s in spans)
    errored_docs = {e[0] for e in errs}
    assert not (set(got) & errored_docs)


# ---------------------------------------------------------------------------
# event ops vs pure-Python oracles
# ---------------------------------------------------------------------------

_event_st = st.lists(
    st.tuples(
        st.integers(0, 3),                    # user_id
        st.integers(0, 10_000),               # seconds offset
        st.sampled_from(["view", "error"]),   # event_type
    ),
    min_size=1,
    max_size=60,
)


def _mk_events(spark, raw):
    import datetime as dt

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec), u, et, 1.0)
        for i, (u, sec, et) in enumerate(raw)
    ]
    return spark.createDataFrame(rows, schema), rows


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_event_st, st.sampled_from([60, 600, 3600]))
def test_sessionize_matches_python_oracle(spark, raw, gap_sec):
    from chug_spark.ops.events import sessionize

    events, rows = _mk_events(spark, raw)
    got = {
        (r["user_id"], r["session_no"]): (r["start_us"], r["end_us"], r["n_events"])
        for r in sessionize(events, gap_minutes=gap_sec // 60 or 1).collect()
    }
    gap_us = (gap_sec // 60 or 1) * 60 * 1_000_000

    want = {}
    by_user = {}
    for i, (u, sec, _et) in enumerate(raw):
        by_user.setdefault(u, []).append((sec * 1_000_000 + 0, i))
    for u, evs in by_user.items():
        evs.sort()
        base = 1_704_067_200_000_000  # 2024-01-01 in us
        sess_no, prev = 0, None
        cur = []
        for tus, i in evs:
            t = base + tus
            if prev is None or t - prev >= gap_us:
                if cur:
                    want[(u, sess_no)] = (cur[0], cur[-1], len(cur))
                sess_no += 1
                cur = []
            cur.append(t)
            prev = t
        want[(u, sess_no)] = (cur[0], cur[-1], len(cur))
    assert got == want


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_event_st)
def test_asof_matches_python_oracle(spark, raw):
    from chug_spark.ops.events import asof_attach_last_mark

    events, rows = _mk_events(spark, raw)
    got = {
        r["event_id"]: (r["last_mark_id"], r["us_since_mark"])
        for r in asof_attach_last_mark(events, mark_type="error").collect()
    }

    base = 1_704_067_200_000_000
    marks = {}  # (user, tus) -> max event_id
    for i, (u, sec, et) in enumerate(raw):
        if et == "error":
            key = (u, base + sec * 1_000_000)
            marks[key] = max(marks.get(key, -1), i)
    want = {}
    for i, (u, sec, _et) in enumerate(raw):
        t = base + sec * 1_000_000
        cands = [(mt, mid) for (mu, mt), mid in marks.items() if mu == u and mt <= t]
        if cands:
            mt, mid = max(cands)  # latest mark; ties resolved by max id via dict
            want[i] = (mid, t - mt)
        else:
            want[i] = (None, None)
    assert got == want


# ---------------------------------------------------------------------------
# exact-substring dedup vs a pure-Python oracle
# ---------------------------------------------------------------------------

_doc_words_st = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14),
    min_size=1,
    max_size=8,
)


def _py_substring_spans(texts, w):
    """Independent reimplementation: repeated w-word windows -> merged
    per-doc islands."""
    wins = {}
    for d, words in enumerate(texts):
        for i in range(len(words) - w + 1):
            wins.setdefault(tuple(words[i : i + w]), []).append((d, i))
    spans = {}
    for occ in wins.values():
        if len(occ) >= 2:
            for d, i in occ:
                spans.setdefault(d, set()).add(i)
    out = {}
    for d, starts in spans.items():
        islands = []
        for s in sorted(starts):
            e = s + w - 1
            if islands and s <= islands[-1][1] + 1:
                islands[-1] = (islands[-1][0], max(islands[-1][1], e), islands[-1][2] + 1)
            else:
                islands.append((s, e, 1))
        out[d] = islands
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_doc_words_st, st.sampled_from([2, 3]))
def test_substring_spans_match_python_oracle(spark, docs_words, w):
    from chug_spark.ops.dedup import exact_substring_spans

    texts = [" ".join(ws) if ws else "x" for ws in docs_words]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {}
    for r in exact_substring_spans(docs, window_words=w).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_windows"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    want = _py_substring_spans([t.split(" ") for t in texts], w)
    want = {k: sorted(v) for k, v in want.items() if v}
    assert got == want


# ---------------------------------------------------------------------------
# Unicode normalization: idempotence + cleanliness on adversarial text
# ---------------------------------------------------------------------------

_dirty_atom = st.one_of(
    st.text(alphabet="ab c,.<>&'\"-", min_size=0, max_size=6),
    st.sampled_from(
        [m for m, _ in __import__("chug_spark.ops.textnorm",
                                  fromlist=["MOJIBAKE"]).MOJIBAKE]
        + ["’", "“", "—", "…", " ", "​",
           "﻿", "\x01", "\x07", "\t", "\n", "  ", "\x9d", "Ã", "â€"]
    ),
)
_dirty_text = st.lists(_dirty_atom, min_size=0, max_size=12).map("".join)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_dirty_text, min_size=1, max_size=25))
def test_normalize_unicode_idempotent_and_clean(spark, texts):
    import re

    from chug_spark.ops.textnorm import text_normalize

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    once = text_normalize(docs)
    rows = once.collect()
    for r in rows:
        t = r["text_norm"]
        # no control/zero-width residue, no multi-space, trimmed
        assert not re.search(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f​‌‍﻿]", t)
        assert "  " not in t and t == t.strip()
    twice = text_normalize(
        once.select("doc_id", once["text_norm"].alias("text"))
    )
    assert twice.filter(twice["changed"]).count() == 0


# ---------------------------------------------------------------------------
# DOM extractor: arbitrary tag soup never throws, invariants hold
# (pure Python — no Spark round-trip, so hypothesis can hammer it)
# ---------------------------------------------------------------------------

_soup_atom = st.one_of(
    st.sampled_from(
        ["<div>", "</div>", "<p>", "</p>", "<a href='x'>", "</a>", "<li>",
         "<script>", "</script>", "<title>", "</title>", "<img src='m.png'>",
         "<nav>", "</nav>", "<td>", "<!-- c -->", "<br>", "<x'>", "</", ">"]
    ),
    st.text(alphabet="ab c,.&;'\"<>", min_size=0, max_size=8),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_soup_atom, min_size=0, max_size=40).map("".join))
def test_dom_extract_one_total_on_tag_soup(soup):
    from chug_spark.ops.dom import extract_one

    title, path, score, n_blocks, text = extract_one(soup)
    assert isinstance(title, str) and isinstance(text, str)
    assert path is None or isinstance(path, str)
    assert score >= 0.0 and n_blocks >= 0
    # dropped subtrees never leak (script content is CDATA + dropped)
    assert "<script>" not in text


# ---------------------------------------------------------------------------
# r5 kernels: nougat stage kernels survive arbitrary shapes; the fast BPE
# trainer matches the pure-Python reference on random corpora
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=70),
    st.integers(min_value=1, max_value=70),
    st.text(alphabet="abcdef|0123", min_size=1, max_size=12),
)
def test_nougat_kernels_any_shape(h, w, key):
    """grid_distort / gaussian_noise / jpeg_compress are total on any
    (h, w) >= (1, 1) — incl. sub-8x8 JPEG blocks and images smaller than
    the 5-cell distortion grid — shape-preserving, deterministic, u8."""
    import numpy as np

    from chug_spark.ops.media_features import (
        gaussian_noise,
        grid_distort,
        jpeg_compress,
    )

    arr = ((np.arange(h)[:, None] * 31 + np.arange(w)[None, :] * 7) % 256).astype(
        np.uint8
    )
    for fn in (
        lambda a: grid_distort(a, key, 0.05),
        lambda a: gaussian_noise(a, key, 20.0),
        lambda a: jpeg_compress(a, key, 95),
    ):
        out = fn(arr)
        assert out.shape == arr.shape and out.dtype == np.uint8
        assert (out == fn(arr)).all()


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.text(alphabet="abcdz ", min_size=0, max_size=40),
        min_size=0, max_size=25,
    ),
    st.integers(min_value=1, max_value=12),
)
def test_bpe_fast_matches_pure_python(spark, texts, num_merges):
    """bpe_train_fast == a direct pure-Python Sennrich trainer on arbitrary
    corpora (incl. empty texts, 1-char words, heavy repetition)."""
    from collections import Counter

    from chug_spark.ops.bpe import EOW, bpe_train_fast

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train_fast(docs, num_merges=num_merges)

    # reference: naive recount-every-round trainer
    import re

    freqs = Counter()
    for t in texts:
        for word in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            if word:
                freqs[word] += 1
    state = {w: [*w[:-1], w[-1] + EOW] for w in freqs}
    want = []
    for rank in range(num_merges):
        pc = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freqs[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        if cnt < 2:
            break
        want.append((rank, a, b, cnt))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    assert got == want
