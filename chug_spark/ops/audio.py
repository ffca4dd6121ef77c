"""Audio-column feature extraction — the audio leg of the multimodal suite.

Same architecture as the image path (``ops/media_features.py``): audio is an
opaque reference/binary column; decode happens inside an Arrow-batched
``mapInPandas`` body that materializes samples, reduces them to features,
and DROPS the waveform before anything crosses the Arrow boundary.  Real
codecs (soundfile / av) are absent in this container, so decode is a
deterministic synthetic waveform keyed on the ref (same pattern as the
synthetic page renderer in ``chug_spark/media.py``) — the Spark-side
plumbing (schema, partitioning, batch shape, feature math) is real and
tested, and :func:`decode_real_audio` is the documented optional-import
slot.

Features are the standard cheap audio descriptors: duration, RMS energy,
zero-crossing rate, peak amplitude, dominant-frequency bin (numpy rFFT) —
all integer-quantized so results are bit-identical at any parallelism and
pinnable by md5.
"""

from __future__ import annotations

import hashlib
import importlib.util
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

SAMPLE_RATE = 16_000

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms_bp", T.IntegerType()),       # rms * 10^4
        T.StructField("zcr_bp", T.IntegerType()),       # zero-crossing rate * 10^4
        T.StructField("peak_bp", T.IntegerType()),      # peak |amplitude| * 10^4
        T.StructField("dom_freq_hz", T.IntegerType()),  # dominant rFFT bin -> Hz
        T.StructField("error", T.StringType()),
    ]
)


def synth_waveform(ref: str, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Deterministic stand-in decode: a few md5-derived sinusoids + a hash
    envelope.  Pure function of the ref — identical on any executor."""
    h = hashlib.md5(ref.encode()).digest()
    n = sample_rate // 10 + int.from_bytes(h[:2], "big") % sample_rate  # 0.1-1.1 s
    t = np.arange(n, dtype=np.float64) / sample_rate
    wave = np.zeros(n)
    for k in range(3):
        freq = 100 + int.from_bytes(h[2 + 2 * k : 4 + 2 * k], "big") % 3900
        amp = (1 + h[8 + k] % 9) / 30.0
        wave += amp * np.sin(2 * np.pi * freq * t)
    return wave


def decode_real_audio(payload: bytes):  # pragma: no cover
    """Optional-import slot for real audio bytes → (samples, sample_rate).
    Neither soundfile nor av ships in this container."""
    if importlib.util.find_spec("soundfile") is not None:
        import io

        import soundfile as sf

        data, rate = sf.read(io.BytesIO(payload), dtype="float64")
        return data, rate
    raise NotImplementedError(
        "audio decode needs soundfile (pip install soundfile) or av; in this "
        "sandbox use synthetic refs via extract_audio_features"
    )


def audio_features_row(ref: str, wave: np.ndarray, sample_rate: int) -> dict:
    n = int(wave.shape[0])
    rms = float(np.sqrt(np.mean(wave * wave))) if n else 0.0
    zc = int(np.count_nonzero(np.signbit(wave[1:]) != np.signbit(wave[:-1])))
    peak = float(np.max(np.abs(wave))) if n else 0.0
    spec = np.abs(np.fft.rfft(wave))
    dom_bin = int(np.argmax(spec[1:]) + 1) if spec.shape[0] > 1 else 0
    dom_hz = int(round(dom_bin * sample_rate / n)) if n else 0
    return {
        "media_ref": ref,
        "n_samples": n,
        "duration_ms": int(round(n * 1000 / sample_rate)),
        "rms_bp": int(np.floor(rms * 10_000)),
        "zcr_bp": int(np.floor(zc / max(n - 1, 1) * 10_000)),
        "peak_bp": int(np.floor(peak * 10_000)),
        "dom_freq_hz": dom_hz,
        "error": None,
    }


def extract_audio_features(
    docs_audio: DataFrame, sample_rate: int = SAMPLE_RATE
) -> DataFrame:
    """(doc_id, media_ref) → one feature row per clip.  Repartitions on
    doc_id for even clip distribution, decodes+reduces inside the batch loop
    (waveform never leaves the UDF), emits flat integer features."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                try:
                    wave = synth_waveform(str(ref), sample_rate)
                    row = audio_features_row(str(ref), wave, sample_rate)
                    row["doc_id"] = str(doc_id)
                    rows.append(row)
                except Exception as ex:  # never kill the partition on one clip
                    rows.append(
                        {
                            "doc_id": str(doc_id),
                            "media_ref": str(ref),
                            "error": f"{type(ex).__name__}: {ex}",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    # explicit count: a bare repartition(col) is AQE-coalescible, and tiny
    # ref rows would fold into one partition — serializing the synth/FFT
    # loop (same trap measured at 3x on media_dhash)
    n_parts = int(
        docs_audio.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    base = docs_audio.select("doc_id", "media_ref").repartition(n_parts, "doc_id")
    return base.mapInPandas(body, AUDIO_FEATURES_SCHEMA)
