"""Real stdlib codecs in the multimodal stages (round 4): P6 PPM
decode/encode/resize and RIFF PCM16 WAV parse + features, plus the
flagged branches for malformed and compressed payloads."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rdfa_ray.stages.multimodal import (
    WAV_TYPE,
    audio_features,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav_pcm16,
    media_features,
    synthesize_media_batch,
)


def test_ppm_roundtrip_and_malformed():
    arr = (np.arange(5 * 4 * 3) % 256).astype(np.uint8).reshape(5, 4, 3)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)
    with pytest.raises(ValueError, match="bad magic"):
        decode_ppm(b"\x89PNG....")
    with pytest.raises(ValueError, match="truncated PPM body"):
        decode_ppm(encode_ppm(arr)[:-10])
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n4 5\n127\n" + b"\0" * 60)


def test_wav_roundtrip_and_malformed():
    samples = ((np.arange(800) * 997) % 65536 - 32768).astype(np.int16)
    sr, back = decode_wav(encode_wav_pcm16(8000, samples))
    assert sr == 8000
    assert np.array_equal(back, samples)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\0" * 40)
    # stereo/float refuse loudly
    import struct

    bad = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bad)


def test_media_features_real_ppm_dims_and_flags(ray_session):
    docs = rd.from_items(
        [{"doc_id": i, "text": "t%d" % i} for i in range(12)],
        override_num_blocks=2,
    )
    got = media_features(docs).to_pandas().set_index("media_id")
    for mid in range(12):
        row = got.loc[mid]
        m = mid % 6
        if m == 0:  # real PPM decode: exact synthetic dims
            assert row["decode_error"] == ""
            assert row["width"] == 300 + (mid % 4) * 8
            assert row["height"] == 200 + (mid % 3) * 8
            feat = np.asarray(row["feature"])
            assert len(feat) == 16
            assert feat[:3].max() <= 1.0 and feat[:3].min() > 0.0
            assert abs(feat[6:].sum() - 1.0) < 1e-3  # histogram sums to 1
        elif m == 3:
            assert "truncated" in row["decode_error"]
        elif m == 5:
            assert "codec libraries" in row["decode_error"]
        else:
            assert row["decode_error"].startswith("not an image")


def test_audio_features_real_wav(ray_session):
    docs = rd.from_items(
        [{"doc_id": i, "text": "t%d" % i} for i in range(12)],
        override_num_blocks=2,
    )
    got = audio_features(docs).to_pandas().set_index("media_id")
    wav_ids = [i for i in range(12) if i % 6 in (1, 4)]
    for mid in range(12):
        row = got.loc[mid]
        if mid in wav_ids:
            assert row["decode_error"] == ""
            assert row["sample_rate"] == 8000
            assert row["n_samples"] == 1600 + (mid % 4) * 400
            assert row["duration_ms"] == row["n_samples"] * 1000 // 8000
            assert 0 < row["rms_milli"] <= 1000
            assert len(row["envelope_milli"]) == 16
        else:
            assert row["decode_error"] != ""
            assert row["n_samples"] == 0
    # determinism across runs
    again = audio_features(docs).to_pandas().set_index("media_id")
    assert (again["rms_milli"] == got["rms_milli"]).all()


def test_synthesized_wav_parses_with_stdlib_wave_module():
    # cross-check our RIFF writer against CPython's own wave reader
    import io
    import wave

    t = synthesize_media_batch(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["x"], pa.string())})
    )
    assert t.column("media_type").to_pylist() == [WAV_TYPE]
    payload = t.column("payload").to_pylist()[0]
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == 1600 + (1 % 4) * 400


def test_ppm_body_starting_with_whitespace_byte():
    # regression (caught by the multimodal_features oracle): a first
    # pixel byte of 32 (' ') or 12 ('\f') was swallowed by the naive
    # header split and mis-reported as truncation
    for first in (32, 12, 9, 10, 13):
        arr = np.full((3, 4, 3), first, dtype=np.uint8)
        back = decode_ppm(encode_ppm(arr))
        assert np.array_equal(back, arr)
