"""Property-based tests (hypothesis) for the round-4 codecs and
normalization: PPM/WAV roundtrips over arbitrary payloads and
normalize_text idempotence / reference parity."""

import re
import unicodedata

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rdfa_ray.stages.multimodal import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav_pcm16,
)
from rdfa_ray.stages.text import normalize_text


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**32 - 1),
)
def test_ppm_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(0, 5000),
    sr=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_property(n, sr, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    got_sr, got = decode_wav(encode_wav_pcm16(sr, samples))
    assert got_sr == sr
    assert np.array_equal(got, samples)


class _OneBatchDS:
    """Drives a map_batches stage's kernel on one in-memory Arrow table
    without a Ray session (normalize_text only ever calls map_batches
    once)."""

    def __init__(self, tbl):
        self.tbl = tbl
        self.result = None

    def map_batches(self, fn, **kw):
        self.result = fn(self.tbl)
        return self


def _normalize_one(value):
    tbl = pa.table(
        {"doc_id": pa.array([0], pa.int64()),
         "text": pa.array([value], pa.string())}
    )
    return normalize_text(_OneBatchDS(tbl)).result.column("text_norm").to_pylist()[0]


def _reference(value):
    # unicodedata NFC + NBSP->space + control strip + ASCII-ws collapse
    # + ASCII-space trim — the documented 4-step contract
    v = unicodedata.normalize("NFC", value)
    v = v.replace("\u00A0", " ")
    v = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", v)
    v = re.sub(r"[ \t\n\r\f\v]+", " ", v)
    return v.strip(" ")


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_normalize_matches_reference_and_is_idempotent(s):
    got = _normalize_one(s)
    assert got == _reference(s)
    assert _normalize_one(got) == got  # idempotence
