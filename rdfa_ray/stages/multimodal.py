"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded / feature-extracted in an actor-pool stage.

The image/audio decode libraries are NOT in this container, so the
decode step is a clearly-marked deterministic fake behind the real
Ray-side plumbing (schema, small batches for wide binary rows, actor
signature, output layout) — swap ``FakeImageDecoder._decode`` for a
PIL/ffmpeg call in a real deployment.  See the task brief: "STUB the
decode step ... make the Ray-side plumbing real and tested".
"""

from __future__ import annotations

import hashlib
import zlib

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

# Binary payloads are wide: keep batches small so batch x concurrency
# fits the worker heap (per the memory-aware sizing rule).
MEDIA_BATCH_SIZE = 64


def synthesize_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic fake media source: derives an opaque binary payload
    from the documents table (stand-in for read_binary_files)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    payloads, types, sizes = [], [], []
    for doc_id, text in zip(doc_ids, texts):
        seed = hashlib.md5(("media:%d" % doc_id).encode()).digest()
        body = (seed + (text or "").encode())[:4096]
        payloads.append(body)
        types.append(("image/png", "audio/wav", "video/mp4")[doc_id % 3])
        sizes.append(len(body))
    return pa.Table.from_pydict(
        {
            "media_id": pa.array(doc_ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "media_type": pa.array(types),
            "n_bytes": pa.array(sizes, pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


class FakeImageDecoder:
    """Actor-pool decode/feature stage.

    Real deployment: __init__ loads the codec/model ONCE per actor;
    __call__ decodes each payload and emits features.  Here _decode is
    a deterministic fake (no PIL/ffmpeg in the container) that still
    touches every payload byte so the data path is exercised.
    """

    def __init__(self, target_size: int = 224):
        self.target_size = target_size  # stand-in for model/codec init

    def _decode(self, payload: bytes, media_type: str):
        if media_type.startswith("image/"):
            h = zlib.crc32(payload)
            width = 64 + h % 1024
            height = 64 + (h >> 10) % 1024
            # NOTE: real impl -> PIL.Image.open(io.BytesIO(payload)).resize(...)
            arr = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
            feature = arr.astype(np.float32).reshape(16, 16).mean(axis=1)
            return width, height, feature
        raise NotImplementedError(
            "decode for %s requires codec libraries not present in this container"
            % media_type
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        out = {
            "media_id": [], "width": [], "height": [], "feature": [], "decode_error": [],
        }
        for mid, payload, mtype in zip(ids, payloads, types):
            try:
                w, h, feat = self._decode(payload, mtype)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat.tolist())
                out["decode_error"].append("")
            except NotImplementedError as e:
                out["media_id"].append(mid)
                out["width"].append(0)
                out["height"].append(0)
                out["feature"].append([0.0] * 16)
                out["decode_error"].append(str(e)[:80])
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
                "feature": pa.array(out["feature"], pa.list_(pa.float32())),
                "decode_error": pa.array(out["decode_error"]),
            }
        )


def media_features(docs_ds, concurrency=(2, 4)):
    """documents -> synthetic media -> actor-pool decode/features."""
    media = docs_ds.map_batches(
        synthesize_media_batch, batch_format="pyarrow", batch_size=512
    )
    return media.map_batches(
        FakeImageDecoder,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


FRAMES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("frame_idx", pa.int32()),
        ("ts_ms", pa.int64()),
        ("frame", pa.large_binary()),
        ("decode_error", pa.string()),
    ]
)


class FakeFrameSampler:
    """Actor-pool frame-sampling stage for video payloads: one input
    row fans out to N frame rows (the row-expansion plumbing a real
    ffmpeg `-vf fps=` stage needs — output rows outnumber input rows,
    so batches must stay SMALL to bound the expanded block).

    ``_sample`` is the deterministic fake: a real deployment seeks the
    container and decodes keyframes; here each "frame" is a
    deterministic slice of the payload so the byte path and the
    exploded-row layout are exercised end to end.  Non-video payloads
    emit a single diagnostic row (decode_error set) rather than being
    silently dropped.
    """

    def __init__(self, n_frames: int = 4, frame_interval_ms: int = 1000):
        # stand-in for codec init (once per actor)
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


def frame_samples(docs_ds, n_frames: int = 4, concurrency=(2, 4)):
    """documents -> synthetic media -> video rows exploded into frames;
    non-video media emit one diagnostic row each (frame_idx = -1,
    decode_error set) so upstream mis-typing is observable rather than
    silently dropped — the sampler's diag branch IS the filter."""
    media = docs_ds.map_batches(
        synthesize_media_batch, batch_format="pyarrow", batch_size=512
    )
    return media.map_batches(
        FakeFrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


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


class FakeImageResizer:
    """Actor-pool resize/transcode stage: binary in -> binary out, the
    remaining member of the decode / feature / resize / frame-sample
    quartet.  A real deployment decodes, resizes to ``target_px`` on
    the long edge, and re-encodes (PIL `thumbnail` + `save`); the fake
    derives a deterministic smaller payload (content-addressed header +
    proportional byte slice) so the binary-in/binary-out path, the
    payload-size contraction, and the error branch are all exercised.
    Non-image payloads pass through UNCHANGED with decode_error set —
    a resize stage must never corrupt media it cannot parse.
    """

    def __init__(self, target_px: int = 256):
        # stand-in for codec init (once per actor)
        self.target_px = target_px

    def _resize(self, payload: bytes) -> bytes:
        # NOTE real impl: PIL Image.open(...).thumbnail((t, t)); save
        header = hashlib.md5(b"resized:" + payload[:32]).digest()
        keep = max(1, len(payload) * self.target_px // 1024)
        return header + payload[:keep]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in (
            "media_id", "payload", "media_type", "n_bytes", "target_px",
            "decode_error")}
        for mid, payload, mtype in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("media_type").to_pylist(),
        ):
            if not mtype.startswith("image/"):
                body, err = payload, "not an image: %s" % mtype
            else:
                body, err = self._resize(payload), ""
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


def resized_media(docs_ds, target_px: int = 256, concurrency=(2, 4)):
    """documents -> synthetic media -> actor-pool resize; image rows
    shrink, non-image rows pass through flagged."""
    media = docs_ds.map_batches(
        synthesize_media_batch, batch_format="pyarrow", batch_size=512
    )
    return media.map_batches(
        FakeImageResizer,
        fn_constructor_kwargs={"target_px": target_px},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )
