"""Multimodal column plumbing: opaque ``binary`` payload columns with
typed metadata, decoded / feature-extracted by actor-pool stages.

Decode support is tiered: binary PPM (P6) payloads are REALLY decoded
(pure numpy header parse + raw RGB view — no image library needed) and
area-average-resized to the 8x8 feature grid; other formats (JPEG/PNG/
audio/video containers) need PIL/ffmpeg, absent in this container, so
they fall back to a deterministic sha-derived stub thumbnail — the
module-level ``HAVE_PIL`` gate marks where a real decoder plugs in.
The Ray-side contract — schema, small batch sizes for wide binary
rows, actor signature, output layout — is identical on both paths.
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


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6) bytes."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def make_fake_media(n: int, seed: int = 5) -> pa.Table:
    """Deterministic media payloads for plumbing tests: "image" rows are
    REAL binary PPMs (seeded pixels, so decode output is checkable
    against the generator), audio/video rows are seeded opaque bytes."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], object)[rng.integers(0, 3, n)]
    widths = rng.integers(16, 4096, n).astype(np.int32)
    heights = rng.integers(16, 4096, n).astype(np.int32)
    payloads = []
    for i in range(n):
        if kinds[i] == "image":
            w = int(rng.integers(8, 33))
            h = int(rng.integers(8, 33))
            widths[i], heights[i] = w, h
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            payloads.append(encode_ppm(px))
        elif kinds[i] == "audio":
            # REAL PCM16 WAV payloads (stdlib wave): seeded noise, so
            # decode output is checkable against the generator
            ns = int(rng.integers(200, 4000))
            s = rng.integers(-20000, 20000, ns, dtype=np.int16)
            payloads.append(encode_wav(s, rate=8000))
        else:
            # REAL Y4M (YUV4MPEG2, Cmono) video payloads: seeded luma
            # frames at 4 fps, so frame sampling + luma features are
            # checkable against the generator
            w = int(rng.integers(8, 25))
            h = int(rng.integers(8, 25))
            widths[i], heights[i] = w, h
            nf = int(rng.integers(1, 25))
            frames = rng.integers(0, 256, (nf, h, w), dtype=np.uint8)
            payloads.append(encode_y4m(frames, fps=4))
    durs = rng.integers(0, 60000, n).astype(np.int32)
    # keep duration metadata consistent with the real video payloads
    for i in range(n):
        if kinds[i] == "video":
            nf = decode_y4m(payloads[i])[0].shape[0]
            durs[i] = nf * 250          # 4 fps -> 250 ms per frame
    return pa.table({
        "media_id": pa.array(np.arange(n), pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
        "duration_ms": pa.array(durs, pa.int32()),
    })


def encode_y4m(frames: np.ndarray, fps: int = 4) -> bytes:
    """(n, h, w) uint8 luma → YUV4MPEG2 Cmono bytes (the uncompressed
    video container: text header + FRAME-delimited raw planes)."""
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()
    return head + b"".join(b"FRAME\n" + frames[i].tobytes()
                           for i in range(n))


def decode_y4m(payload: bytes) -> "tuple[np.ndarray, int] | None":
    """Real decode for YUV4MPEG2 Cmono: returns ((n, h, w) uint8 luma
    frames, fps) or None when the payload isn't y4m (caller falls back
    to metadata-only plumbing)."""
    if not payload.startswith(b"YUV4MPEG2"):
        return None
    try:
        nl = payload.find(b"\n")
        if nl < 0:
            return None
        w = h = fps = None
        for tok in payload[:nl].split()[1:]:
            if tok[:1] == b"W":
                w = int(tok[1:])
            elif tok[:1] == b"H":
                h = int(tok[1:])
            elif tok[:1] == b"F":
                num, den = tok[1:].split(b":")
                fps = max(1, int(num) // max(1, int(den)))
            elif tok[:1] == b"C" and tok != b"Cmono":
                return None              # only mono planes supported
        if not (w and h and fps):
            return None
        fsize = w * h
        body = payload[nl + 1:]
        marker = b"FRAME"
        frames = []
        pos = 0
        while pos < len(body):
            if body[pos:pos + 5] != marker:
                return None
            fnl = body.find(b"\n", pos)
            if fnl < 0 or fnl + 1 + fsize > len(body):
                return None
            frames.append(np.frombuffer(
                body, np.uint8, fsize, fnl + 1).reshape(h, w))
            pos = fnl + 1 + fsize
        if not frames:
            return None
        return np.stack(frames), fps
    except Exception:  # noqa: BLE001 — malformed payload: not y4m
        return None


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """Real decode for binary PPM (P6): header parse + zero-copy RGB
    view. Returns None when the payload isn't PPM (caller falls back)."""
    if not payload.startswith(b"P6"):
        return None
    # belt-and-braces: a random binary payload that happens to start with
    # b'P6' must return None (fall back to the stub), never raise — a
    # single malformed row would otherwise kill the whole decode batch
    try:
        parts: list[int] = []
        pos = 2
        while len(parts) < 3:
            # skip whitespace/comments, read one ASCII integer
            while pos < len(payload) and payload[pos:pos + 1].isspace():
                pos += 1
            if payload[pos:pos + 1] == b"#":
                nl = payload.find(b"\n", pos)
                if nl < 0:          # comment with no newline: not a PPM
                    return None
                pos = nl + 1
                continue
            end = pos
            while end < len(payload) and payload[end:end + 1].isdigit():
                end += 1
            if end == pos:
                return None
            parts.append(int(payload[pos:end]))
            pos = end
        pos += 1  # single whitespace after maxval
        w, h, maxval = parts
        if maxval != 255 or w <= 0 or h <= 0 \
                or len(payload) - pos < w * h * 3:
            return None
        return np.frombuffer(payload, np.uint8, count=w * h * 3,
                             offset=pos).reshape(h, w, 3)
    except Exception:
        return None


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAV bytes via the stdlib ``wave``
    module (no external audio library needed)."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.ascontiguousarray(samples, np.int16).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Real decode for PCM16 WAV payloads (stdlib ``wave`` + one
    frombuffer): returns (float64 samples in [-1, 1], rate), or None
    for anything that isn't parseable 16-bit PCM — the caller falls
    back to the stub, never raises (same contract as decode_ppm)."""
    import io
    import wave
    if not payload.startswith(b"RIFF"):
        return None
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch = w.getnchannels()
            if w.getsampwidth() != 2 or nch < 1:
                return None
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
        s = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
        if nch > 1:
            s = s.reshape(-1, nch).mean(axis=1)
        return s, rate
    except Exception:
        return None


def envelope(samples: np.ndarray, n_bins: int = 64) -> np.ndarray:
    """Per-bin RMS energy envelope over ``n_bins`` equal segments —
    the audio analogue of the 8x8 thumbnail (one reduceat pass)."""
    n = len(samples)
    if n == 0:
        return np.zeros(n_bins)
    edges = (np.arange(n_bins) * n) // n_bins
    acc = np.add.reduceat(samples * samples, edges)
    cnt = np.diff(np.concatenate([edges, [n]])).astype(np.float64)
    return np.sqrt(acc / np.maximum(cnt, 1.0))


def resize_area(img: np.ndarray, out_h: int = 8, out_w: int = 8) -> np.ndarray:
    """Area-average resize to (out_h, out_w, 3) — the classic thumbnail
    kernel, vectorized with add.reduceat over row/column bin edges."""
    h, w, _ = img.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    acc = np.add.reduceat(img.astype(np.float64), ys, axis=0)
    acc = np.add.reduceat(acc, xs, axis=1)
    ny = np.diff(np.concatenate([ys, [h]])).astype(np.float64)
    nx = np.diff(np.concatenate([xs, [w]])).astype(np.float64)
    return acc / (ny[:, None, None] * nx[None, :, None])


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """Deterministic fallback for formats needing PIL (absent here):
    8x8x3 uint8 'thumbnail' derived from a sha256 of the payload."""
    if HAVE_PIL:  # pragma: no cover
        raise NotImplementedError("real decode path requires PIL wiring")
    h = hashlib.sha256(payload).digest()
    return np.frombuffer((h * 6)[:192], np.uint8).reshape(8, 8, 3).copy()


class DecodeFeatures:
    """Actor-pool decode + featurize stage. Small batch_size is load-
    bearing: payload rows are wide, so batch x concurrency must fit the
    worker heap (the guide's memory-aware rule)."""

    def __init__(self):
        self.fallback = _decode_image_stub  # per-actor setup point

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, means, real = [], [], []
        payloads = batch.column("payload").to_pylist()
        for payload in payloads:
            img = decode_ppm(payload)
            if img is not None:
                real.append(True)
                thumb = resize_area(img)      # real decode + real resize
                feats.append((thumb.ravel() / 255.0).astype(np.float32))
                means.append(float(img.mean()))   # FULL decoded pixels
                continue
            wav = decode_wav(payload)
            if wav is not None:               # real PCM16 audio decode
                s, _rate = wav
                real.append(True)
                feats.append(envelope(s, 64).astype(np.float32))
                # rms in [0,1] scaled to the image intensity range so
                # one quantized column serves both modalities
                means.append(float(np.sqrt(np.mean(s * s)) * 255.0))
                continue
            real.append(False)
            img = self.fallback(payload)
            thumb = img.astype(np.float64)
            feats.append((thumb.ravel() / 255.0).astype(np.float32))
            means.append(float(img.mean()))
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
            "mean_intensity_q6": pa.array(
                np.floor(np.array(means) * 1e6).astype(np.int64), pa.int64()),
            "decoded": pa.array(real, pa.bool_()),
            "payload_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        })


def decode_features(ds: rd.Dataset, concurrency=(1, 4),
                    batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(DecodeFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


class FrameSample:
    """Video frame sampling: emits one row per sampled frame index.
    Y4M (YUV4MPEG2 Cmono) payloads are REALLY decoded — the sampled
    frame's mean luma ships as a feature (``luma_q6``, floor(mean*1e6)
    over exact integer sums) and the sample grid comes from the actual
    frame count/fps; other containers (mp4/webm — no codecs in this
    sandbox) keep the metadata-only plumbing path (``luma_q6`` null).
    The index explode stays vectorized; the per-payload decode is
    inherently per-item and batch-bounded."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vid = batch.filter(pc.equal(batch.column("kind"), "video"))
        mids = vid.column("media_id").to_numpy()
        durs = np.maximum(vid.column("duration_ms").to_numpy()
                          .astype(np.int64), 1)
        payloads = vid.column("payload").to_pylist()
        counts = np.empty(len(mids), np.int64)
        decoded: list = []
        for i, p in enumerate(payloads):
            got = decode_y4m(p) if p else None
            decoded.append(got)
            if got is None:
                counts[i] = (durs[i] + self.every_ms - 1) // self.every_ms
            else:
                frames, fps = got
                step = max(1, (self.every_ms * fps) // 1000)
                counts[i] = (frames.shape[0] + step - 1) // step
        total = int(counts.sum())
        cum = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=cum[1:])
        sample_idx = np.arange(total) - np.repeat(cum, counts)
        frame_idx = np.empty(total, np.int64)
        ts_ms = np.empty(total, np.int64)
        luma = np.full(total, np.nan)
        for i, got in enumerate(decoded):
            sl = slice(int(cum[i]), int(cum[i] + counts[i]))
            si = sample_idx[sl]
            if got is None:
                frame_idx[sl] = si
                ts_ms[sl] = si * self.every_ms
                continue
            frames, fps = got
            step = max(1, (self.every_ms * fps) // 1000)
            fi = si * step
            frame_idx[sl] = fi
            ts_ms[sl] = fi * 1000 // fps
            f = frames[fi].reshape(len(fi), -1)
            luma[sl] = f.sum(axis=1, dtype=np.int64) / f.shape[1]
        luma_q6 = pa.array(
            [None if np.isnan(v) else int(np.floor(v * 1e6))
             for v in luma], pa.int64())
        return pa.table({
            "media_id": pa.array(np.repeat(mids, counts), pa.int64()),
            "frame_idx": pa.array(frame_idx.astype(np.int32), pa.int32()),
            "ts_ms": pa.array(ts_ms.astype(np.int32), pa.int32()),
            "luma_q6": luma_q6})


def frame_sample(ds: rd.Dataset, every_ms: int = 1000) -> rd.Dataset:
    from bge_m3_onnx_ray.stages._pool import task_stage
    return ds.map_batches(task_stage(FrameSample, every_ms=every_ms),
                          batch_format="pyarrow", batch_size=64)
