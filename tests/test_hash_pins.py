"""Value-regression pins for the rows-only driver queries.

``extract_synth``, ``media_features`` and ``media_train`` exercise the numpy
render/augment UDFs, which have no SQL expression — the external driver can
only count their rows.  Their outputs ARE deterministic (hash-keyed draws,
synthetic payloads), so this suite pins the order-insensitive md5 of the
full result at sf0.001: the value check the driver can't provide.  Pinned
values are recorded in TESTDATA.md; regenerate with the canonical form
below if the query semantics intentionally change.
"""

from __future__ import annotations

import hashlib

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

PINS = {
    "extract_synth": (2143, "b7ec0043eba4e6539cb79cd05254f996"),
    "media_features": (500, "d9a26478dc4d4c159ac13dc0225008bb"),
    "media_train": (250, "ebddc395659715b0a942c57d29b5ddb3"),
    "audio_features": (500, "b87a10b164f40cb0dddbd5c76528839c"),
    "media_frames": (375, "afc5b2230834cc20dedd95076f208536"),
    "media_dhash": (499, "62755f6a655d215f60b9893e5d0f071f"),
    "dom_extract": (500, "7af5fd72066c2c5d1809c0e41118c94a"),
    "image_eval": (399, "3f11336087d7f837e0bddb5b68c975f0"),
    "image_train": (150, "ebc6a5207ccc071d961078e9547d38d1"),
    "media_train_nougat": (250, "aabdf66145bb298f04c1a30c9a668683"),
    "bpe_vocab": (30, "bd900031c0cd1c0a1e11ec72af7f0636"),
    "bpe_apply": (500, "9bb743ff66958ff07bac28091db348ad"),
}


def result_hash(df) -> tuple[int, str]:
    """Order-insensitive canonical md5: columns sorted by name, floats at 6
    decimals, rows sorted as rendered lines."""
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()

    def canon(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        return repr(v)

    lines = sorted("|".join(canon(r[c]) for c in cols) for r in rows)
    return len(rows), hashlib.md5("\n".join(lines).encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(PINS))
def test_rows_only_query_hash_pin(spark, name):
    n_rows, digest = result_hash(entry.queries()[name](spark, SF_DIR))
    assert (n_rows, digest) == PINS[name]
