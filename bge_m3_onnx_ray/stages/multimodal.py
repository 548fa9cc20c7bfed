"""Multimodal column plumbing: opaque ``binary`` payload columns with
typed metadata, decoded / feature-extracted by actor-pool stages.

The decode kernels themselves are STUBBED (this container has no image/
audio libraries — see the module-level ``HAVE_PIL`` gate): the Ray-side
contract — schema, small batch sizes for wide binary rows, actor
signature, output layout — is real and tested with deterministic fake
payloads. Swap ``_decode_image_stub`` for a real decoder where PIL/ffmpeg
exist; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

try:  # pragma: no cover - not present in this container
    import PIL  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # "image" | "audio" | "video"
    ("payload", pa.binary()),        # opaque encoded bytes
    ("width", pa.int32()),           # typed metadata travels beside payload
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def make_fake_media(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake payloads for plumbing tests (seeded bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(100, 5000, n)]
    kinds = np.array(["image", "audio", "video"], object)[rng.integers(0, 3, n)]
    return pa.table({
        "media_id": pa.array(np.arange(n), pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(rng.integers(16, 4096, n).astype(np.int32), pa.int32()),
        "height": pa.array(rng.integers(16, 4096, n).astype(np.int32), pa.int32()),
        "duration_ms": pa.array(rng.integers(0, 60000, n).astype(np.int32), pa.int32()),
    })


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: 8x8x3 uint8 'thumbnail' derived from a
    sha256 of the payload. Replace with PIL.Image.open when available."""
    if HAVE_PIL:  # pragma: no cover
        raise NotImplementedError("real decode path requires PIL wiring")
    h = hashlib.sha256(payload).digest()
    return np.frombuffer((h * 6)[:192], np.uint8).reshape(8, 8, 3).copy()


class DecodeFeatures:
    """Actor-pool decode + featurize stage. Small batch_size is load-
    bearing: payload rows are wide, so batch x concurrency must fit the
    worker heap (the guide's memory-aware rule)."""

    def __init__(self):
        self.decode = _decode_image_stub  # per-actor setup point

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, means = [], []
        for payload in batch.column("payload").to_pylist():
            img = self.decode(payload)
            feats.append(img.astype(np.float32).ravel() / 255.0)
            means.append(float(img.mean()))
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
            "mean_intensity_q6": pa.array(
                np.floor(np.array(means) * 1e6).astype(np.int64), pa.int64()),
            "payload_bytes": pa.array(
                [len(p) for p in batch.column("payload").to_pylist()], pa.int64()),
        })


def decode_features(ds: rd.Dataset, concurrency=(1, 4),
                    batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(DecodeFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


class FrameSample:
    """Video frame-sampling plumbing: emits one row per sampled frame
    index, vectorized (repeat/arange explode — no per-media Python loop;
    the decode itself is stubbed; a real impl would seek the container)."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vid = batch.filter(pc.equal(batch.column("kind"), "video"))
        mids = vid.column("media_id").to_numpy()
        durs = np.maximum(vid.column("duration_ms").to_numpy()
                          .astype(np.int64), 1)
        counts = (durs + self.every_ms - 1) // self.every_ms
        total = int(counts.sum())
        cum = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=cum[1:])
        frame_idx = np.arange(total) - np.repeat(cum, counts)
        return pa.table({
            "media_id": pa.array(np.repeat(mids, counts), pa.int64()),
            "frame_idx": pa.array(frame_idx.astype(np.int32), pa.int32()),
            "ts_ms": pa.array((frame_idx * self.every_ms).astype(np.int32),
                              pa.int32())})


def frame_sample(ds: rd.Dataset, every_ms: int = 1000) -> rd.Dataset:
    from bge_m3_onnx_ray.stages._pool import task_stage
    return ds.map_batches(task_stage(FrameSample, every_ms=every_ms),
                          batch_format="pyarrow", batch_size=64)
