"""Schedule-independent determinism helpers.

The reference derives RNG seeds from (worker id, epoch)
(``src/chug/common/random.py:8-43``), which makes its streams depend on the
parallelism schedule.  To satisfy span-sequence equality at *any* parallelism
(local[2] == local[32] == 1000 executors), every stochastic decision in this
engine is a pure function of ``(doc_id, seed[, tag])`` — SURVEY.md §4/§7.4.1.

The same functions are used by the Spark UDFs and by the pure-Python oracle in
``tests/oracle.py`` so both sides compute identical choices.
"""

from __future__ import annotations

import hashlib


def stable_hash64(*parts: object) -> int:
    """64-bit deterministic hash of the string forms of ``parts``.

    md5-based so it is reproducible across Python versions, processes and
    engines (never use built-in ``hash`` — PYTHONHASHSEED).
    """
    h = hashlib.md5("|".join(str(p) for p in parts).encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big")


def doc_rand_below(doc_id: str, seed: int, n: int, tag: str = "") -> int:
    """Deterministic uniform integer in [0, n) keyed on (doc_id, seed, tag).

    Replaces the reference's ``self.generator.randrange(...)``
    (src/chug/doc/doc_read_processor.py:55) and ``random.choice(answers)``
    (src/chug/doc/doc_vqa_processor.py:78) with a schedule-independent rule.
    Uniformity is the preserved semantic; the exact RNG stream is not
    (documented deviation, SURVEY.md §7.2.7).
    """
    if n <= 0:
        raise ValueError("n must be positive")
    return stable_hash64(doc_id, seed, tag) % n
