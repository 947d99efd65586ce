"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded / feature-extracted / resized / frame-sampled in
actor-pool stages.

Codec reality (round 4): formats that need no external library decode
FOR REAL — P6 PPM images (pure header + raw RGB) and PCM16 WAV audio
(RIFF chunks) are parsed byte-for-byte, feature-extracted, and
re-encoded.  Compressed codecs (PNG/JPEG/MP4) still have no libraries
in this container, so those branches stay clearly-flagged stubs
(``decode_error`` set, payload untouched) — swap in PIL/ffmpeg in a
deployment; the Ray-side plumbing (schema, small batches for wide
binary rows, actor signature, row expansion, error surfacing) is
identical either way.  See the task brief: "STUB the decode step ...
make the Ray-side plumbing real and tested" — the plumbing is real and
tested, and two codecs now are too.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.large_binary()),
        ("media_type", pa.string()),
        ("n_bytes", pa.int64()),
    ]
)

# Binary payloads are wide (a 300x200 PPM is ~180 KB): keep batches
# small so batch x concurrency fits the worker heap (the memory-aware
# sizing rule).
MEDIA_BATCH_SIZE = 64

PPM_TYPE = "image/x-portable-pixmap"
WAV_TYPE = "audio/wav"


# ---------------------------------------------------------------------------
# real stdlib codecs

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm needs (h, w, 3) uint8")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM -> (h, w, 3) uint8; ValueError on malformed."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM (bad magic)")
    # header: magic, width, height, maxval, then EXACTLY ONE whitespace
    # byte before the raw body.  A naive split(None) would also swallow
    # leading BODY bytes that happen to be whitespace values (a pixel
    # of 32 or 12 is ' ' / '\f') and mis-report truncation — the spec
    # says the raster starts right after the single separator.
    # (Comments ('#') are not emitted by encode_ppm and not supported.)
    import re as _re

    m = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)[ \t\r\n]", payload)
    if m is None:
        raise ValueError("truncated or non-numeric PPM header")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError("unsupported PPM maxval %d" % maxval)
    body = payload[m.end():]
    need = w * h * 3
    if len(body) < need:
        raise ValueError(
            "truncated PPM body: %d of %d bytes" % (len(body), need)
        )
    return np.frombuffer(body[:need], dtype=np.uint8).reshape(h, w, 3)


def encode_wav_pcm16(sample_rate: int, samples: np.ndarray) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM16 mono -> (sample_rate, int16 array); ValueError on
    malformed / unsupported encodings."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sample_rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt, ch, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError(
                    "unsupported WAV encoding (need PCM16 mono, got "
                    "fmt=%d ch=%d bits=%d)" % (fmt, ch, bits)
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, np.frombuffer(data[: len(data) & ~1], dtype="<i2")


# ---------------------------------------------------------------------------
# synthetic media source (stand-in for read_binary_files over a lake)

def _ppm_payload(doc_id: int, truncate: bool = False) -> bytes:
    w = 300 + (doc_id % 4) * 8
    h = 200 + (doc_id % 3) * 8
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 3 + yy * 5 + doc_id).astype(np.int64)
    arr = np.stack(
        [(base + k * 37) % 256 for k in range(3)], axis=-1
    ).astype(np.uint8)
    body = encode_ppm(arr)
    return body[: len(body) // 2] if truncate else body


def _wav_payload(doc_id: int) -> bytes:
    n = 1600 + (doc_id % 4) * 400
    step = (doc_id % 7) + 1
    samples = ((np.arange(n, dtype=np.int64) * step * 257) % 65536 - 32768).astype(
        np.int16
    )
    return encode_wav_pcm16(8000, samples)


def synthesize_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic media source over the documents table: REAL P6 PPM
    and PCM16 WAV payloads, an opaque fake MP4, plus two deliberate
    failure modes (a truncated PPM and a compressed PNG) so every
    decode branch — real parse, malformed input, unsupported codec —
    is exercised downstream.  doc_id % 6 selects the kind."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    payloads, types = [], []
    for doc_id, text in zip(doc_ids, texts):
        m = doc_id % 6
        if m == 0:
            payloads.append(_ppm_payload(doc_id))
            types.append(PPM_TYPE)
        elif m in (1, 4):
            payloads.append(_wav_payload(doc_id))
            types.append(WAV_TYPE)
        elif m == 2:
            seed = hashlib.md5(b"media:%d" % doc_id).digest()
            payloads.append((seed + (text or "").encode())[:4096])
            types.append("video/mp4")
        elif m == 3:
            payloads.append(_ppm_payload(doc_id, truncate=True))
            types.append(PPM_TYPE)
        else:  # m == 5: compressed codec, no library in this container
            seed = hashlib.md5(b"png:%d" % doc_id).digest()
            payloads.append(b"\x89PNG\r\n\x1a\n" + seed * 8)
            types.append("image/png")
    return pa.Table.from_pydict(
        {
            "media_id": pa.array(doc_ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "media_type": pa.array(types),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# image decode / feature stage

class ImageFeatureDecoder:
    """Actor-pool decode/feature stage.

    ``__init__`` is the once-per-actor codec/model load point;
    ``__call__`` decodes each payload and emits 16-dim features.  PPM
    decodes FOR REAL (per-channel mean/std + 10-bin grayscale
    histogram); compressed codecs and non-images flag ``decode_error``
    and emit zero features — never dropped silently."""

    def __init__(self, target_size: int = 224):
        self.target_size = target_size  # codec/model init stand-in

    def _decode(self, payload: bytes, media_type: str):
        if media_type == PPM_TYPE:
            arr = decode_ppm(payload)  # ValueError on malformed
            h, w = arr.shape[:2]
            f = arr.astype(np.float32)
            means = f.mean(axis=(0, 1)) / 255.0
            stds = f.std(axis=(0, 1)) / 255.0
            gray = f.mean(axis=-1).ravel()
            hist, _ = np.histogram(gray, bins=10, range=(0.0, 255.0))
            hist = hist.astype(np.float32) / max(1, gray.size)
            return w, h, np.concatenate([means, stds, hist]).astype(np.float32)
        if media_type.startswith("image/"):
            raise NotImplementedError(
                "decode for %s requires codec libraries not present in this"
                " container" % media_type
            )
        raise NotImplementedError("not an image: %s" % media_type)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "media_id": [], "width": [], "height": [], "feature": [],
            "decode_error": [],
        }
        for mid, payload, mtype in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("media_type").to_pylist(),
        ):
            try:
                w, h, feat = self._decode(payload, mtype)
                err = ""
            except (NotImplementedError, ValueError) as e:
                w, h, feat, err = 0, 0, np.zeros(16, np.float32), str(e)[:80]
            out["media_id"].append(mid)
            out["width"].append(w)
            out["height"].append(h)
            out["feature"].append(feat.tolist())
            out["decode_error"].append(err)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
                "feature": pa.array(out["feature"], pa.list_(pa.float32())),
                "decode_error": pa.array(out["decode_error"]),
            }
        )


FakeImageDecoder = ImageFeatureDecoder  # back-compat alias


def media_features(docs_ds, concurrency=(2, 4)):
    """documents -> synthetic media -> actor-pool decode/features."""
    media = docs_ds.map_batches(
        synthesize_media_batch, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
    )
    return media.map_batches(
        ImageFeatureDecoder,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# audio decode / feature stage (real PCM16 WAV parse)

AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("duration_ms", pa.int64()),
        ("rms_milli", pa.int64()),
        ("envelope_milli", pa.list_(pa.int64())),
        ("decode_error", pa.string()),
    ]
)


class WavFeatureExtractor:
    """Actor-pool audio stage: RIFF/WAVE PCM16 parse + loudness
    features — overall RMS and a 16-bin RMS envelope, in integer
    milli-units of full scale (floats would drift across partitioning).
    Non-audio / malformed payloads flag ``decode_error``."""

    def __init__(self, n_bins: int = 16):
        self.n_bins = n_bins  # codec init stand-in

    def _features(self, payload: bytes):
        sr, samples = decode_wav(payload)
        x = samples.astype(np.float64) / 32768.0
        n = len(x)
        rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
        env = []
        for b in range(self.n_bins):
            seg = x[b * n // self.n_bins : (b + 1) * n // self.n_bins]
            env.append(
                # floor(+0.5) half-up: the ONLY rounding that matches
                # SQL FLOOR(+0.5) (python round is banker's)
                int(np.floor(float(np.sqrt(np.mean(seg * seg))) * 1000 + 0.5))
                if len(seg)
                else 0
            )
        return (
            sr,
            n,
            n * 1000 // sr if sr else 0,
            int(np.floor(rms * 1000 + 0.5)),
            env,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in AUDIO_SCHEMA.names}
        for mid, payload, mtype in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("media_type").to_pylist(),
        ):
            try:
                if mtype != WAV_TYPE:
                    raise ValueError("not audio/wav: %s" % mtype)
                sr, n, dur, rms, env = self._features(payload)
                err = ""
            except ValueError as e:
                sr, n, dur, rms, env, err = 0, 0, 0, 0, [], str(e)[:80]
            out["media_id"].append(mid)
            out["sample_rate"].append(sr)
            out["n_samples"].append(n)
            out["duration_ms"].append(dur)
            out["rms_milli"].append(rms)
            out["envelope_milli"].append(env)
            out["decode_error"].append(err)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "sample_rate": pa.array(out["sample_rate"], pa.int32()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "duration_ms": pa.array(out["duration_ms"], pa.int64()),
                "rms_milli": pa.array(out["rms_milli"], pa.int64()),
                "envelope_milli": pa.array(
                    out["envelope_milli"], pa.list_(pa.int64())
                ),
                "decode_error": pa.array(out["decode_error"]),
            },
            schema=AUDIO_SCHEMA,
        )


def audio_features(docs_ds, concurrency=(2, 4)):
    """documents -> synthetic media -> actor-pool WAV parse/features;
    non-audio rows surface flagged, never dropped."""
    media = docs_ds.map_batches(
        synthesize_media_batch, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
    )
    return media.map_batches(
        WavFeatureExtractor,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# frame sampling (video demux genuinely needs ffmpeg — stays a fake)

FRAMES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("frame_idx", pa.int32()),
        ("ts_ms", pa.int64()),
        ("frame", pa.large_binary()),
        ("decode_error", pa.string()),
    ]
)


class FrameSampler:
    """Actor-pool frame-sampling stage for video payloads: one input
    row fans out to N frame rows (the row-expansion plumbing a real
    ffmpeg `-vf fps=` stage needs — output rows outnumber input rows,
    so batches must stay SMALL to bound the expanded block).

    ``_sample`` is the one remaining deterministic fake (MP4 demuxing
    needs ffmpeg): each "frame" is a deterministic slice of the
    payload so the byte path and the exploded-row layout are exercised
    end to end.  Non-video payloads emit a single diagnostic row
    (decode_error set) rather than being silently dropped."""

    def __init__(self, n_frames: int = 4, frame_interval_ms: int = 1000):
        self.n_frames = n_frames
        self.interval = frame_interval_ms

    def _sample(self, payload: bytes):
        # NOTE real impl: ffmpeg/pyav keyframe extraction
        n = max(1, len(payload) // self.n_frames)
        return [payload[i * n : (i + 1) * n] for i in range(self.n_frames)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in FRAMES_SCHEMA.names}
        for mid, payload, mtype in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("media_type").to_pylist(),
        ):
            if not mtype.startswith("video/"):
                out["media_id"].append(mid)
                out["frame_idx"].append(-1)
                out["ts_ms"].append(0)
                out["frame"].append(b"")
                out["decode_error"].append("not a video: %s" % mtype)
                continue
            for i, frame in enumerate(self._sample(payload)):
                out["media_id"].append(mid)
                out["frame_idx"].append(i)
                out["ts_ms"].append(i * self.interval)
                out["frame"].append(frame)
                out["decode_error"].append("")
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "ts_ms": pa.array(out["ts_ms"], pa.int64()),
                "frame": pa.array(out["frame"], pa.large_binary()),
                "decode_error": pa.array(out["decode_error"]),
            },
            schema=FRAMES_SCHEMA,
        )


FakeFrameSampler = FrameSampler  # back-compat alias


def frame_samples(docs_ds, n_frames: int = 4, concurrency=(2, 4)):
    """documents -> synthetic media -> video rows exploded into frames;
    non-video media emit one diagnostic row each (frame_idx = -1,
    decode_error set) so upstream mis-typing is observable rather than
    silently dropped — the sampler's diag branch IS the filter."""
    media = docs_ds.map_batches(
        synthesize_media_batch, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
    )
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# resize / transcode stage (real nearest-neighbor for PPM)

RESIZED_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.large_binary()),
        ("media_type", pa.string()),
        ("n_bytes", pa.int64()),
        ("target_px", pa.int32()),
        ("decode_error", pa.string()),
    ]
)


class ImageResizer:
    """Actor-pool resize/transcode stage: binary in -> binary out.
    PPM resizes FOR REAL — decode, nearest-neighbor downsample so the
    long edge is ``target_px`` (never upscales), re-encode P6.
    Compressed codecs and non-images pass through UNCHANGED with
    ``decode_error`` set — a resize stage must never corrupt media it
    cannot parse; malformed PPM likewise passes through flagged."""

    def __init__(self, target_px: int = 256):
        self.target_px = target_px  # codec init stand-in

    def _resize(self, payload: bytes) -> bytes:
        arr = decode_ppm(payload)  # ValueError on malformed
        h, w = arr.shape[:2]
        long_edge = max(h, w)
        if long_edge <= self.target_px:
            return payload  # never upscale
        new_h = max(1, h * self.target_px // long_edge)
        new_w = max(1, w * self.target_px // long_edge)
        rows = (np.arange(new_h) * h) // new_h
        cols = (np.arange(new_w) * w) // new_w
        return encode_ppm(arr[rows][:, cols])

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in (
            "media_id", "payload", "media_type", "n_bytes", "target_px",
            "decode_error")}
        for mid, payload, mtype in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("media_type").to_pylist(),
        ):
            if mtype == PPM_TYPE:
                try:
                    body, err = self._resize(payload), ""
                except ValueError as e:
                    body, err = payload, str(e)[:80]
            elif mtype.startswith("image/"):
                body, err = payload, (
                    "unsupported codec %s (no codec library in container)"
                    % mtype
                )
            else:
                body, err = payload, "not an image: %s" % mtype
            out["media_id"].append(mid)
            out["payload"].append(body)
            out["media_type"].append(mtype)
            out["n_bytes"].append(len(body))
            out["target_px"].append(self.target_px)
            out["decode_error"].append(err)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "payload": pa.array(out["payload"], pa.large_binary()),
                "media_type": pa.array(out["media_type"]),
                "n_bytes": pa.array(out["n_bytes"], pa.int64()),
                "target_px": pa.array(out["target_px"], pa.int32()),
                "decode_error": pa.array(out["decode_error"]),
            },
            schema=RESIZED_SCHEMA,
        )


FakeImageResizer = ImageResizer  # back-compat alias


def resized_media(docs_ds, target_px: int = 256, concurrency=(2, 4)):
    """documents -> synthetic media -> actor-pool resize; PPM rows
    shrink for real, unparseable/unsupported rows pass through
    flagged."""
    media = docs_ds.map_batches(
        synthesize_media_batch, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
    )
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target_px": target_px},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )
