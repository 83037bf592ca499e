"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
small typed header; decode / feature-extract / resize / frame-sample run
as Arrow-batched mapInPandas operators. The actual codec step is STUBBED
(this container has no image/audio libraries): real libraries plug in
behind the `_HAVE_PIL` import-try, and until then a deterministic fake
container format ("FAKEIMG1/FAKEAUD1/FAKEVID1") exercises the REAL
Spark-side plumbing — binary schema, Arrow batch shape, partition-local
decode, metadata structs — end to end.

Fake container layout (big-endian):
    magic   8 bytes   b"FAKEIMG1" | b"FAKEAUD1" | b"FAKEVID1"
    w, h    2 x int32 (images/video; sample_rate+n_samples for audio)
    frames  int32     (video only)
    payload w*h bytes (deterministic from the id)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

try:  # real decoder, if ever available
    import PIL.Image  # noqa: F401  # pragma: no cover

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_A, _B, _M = 2654435761, 1013904223, 2**31

IMG_MAGIC, AUD_MAGIC, VID_MAGIC = b"FAKEIMG1", b"FAKEAUD1", b"FAKEVID1"


def _payload(seed: int, n: int) -> bytes:
    out = bytearray(n)
    h = (_A * seed + _B) % _M
    for i in range(n):
        h = (_A * h + _B) % _M
        out[i] = h & 0xFF
    return bytes(out)


def fake_image(seed: int) -> bytes:
    w, h = 16 + seed % 48, 16 + (seed * 7) % 48
    return IMG_MAGIC + struct.pack(">ii", w, h) + _payload(seed, w * h)


def fake_video(seed: int, frames: int | None = None) -> bytes:
    w, h = 8 + seed % 24, 8 + (seed * 3) % 24
    fr = frames if frames is not None else 4 + seed % 12
    return VID_MAGIC + struct.pack(">iii", w, h, fr) + _payload(seed, w * h * fr)


def attach_fake_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary image column for tests/benchmarks (mapInPandas
    so generation is partition-local, like a real blob fetch would be)."""
    cols = df.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["image"] = pdf[id_col].map(lambda i: fake_image(int(i)))
            yield pdf

    schema = df.schema.simpleString()[7:-1] + ", image binary"
    return df.mapInPandas(gen, schema=schema)


def image_metadata(df: DataFrame, bin_col: str = "image") -> DataFrame:
    """(…, width int, height int, format string) parsed from the binary
    header — Arrow-batched; this is the shape a real EXIF/codec probe
    takes at scale (decode headers only, never the full payload)."""
    id_cols = [c for c in df.columns if c != bin_col]

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, hh, fmt = [], [], []
            for b in pdf[bin_col]:
                raw = bytes(b)
                if raw[:8] == IMG_MAGIC:
                    a, c = struct.unpack(">ii", raw[8:16])
                    w.append(a); hh.append(c); fmt.append("fakeimg")
                elif raw[:8] == VID_MAGIC:
                    a, c, _fr = struct.unpack(">iii", raw[8:20])
                    w.append(a); hh.append(c); fmt.append("fakevid")
                else:
                    w.append(None); hh.append(None); fmt.append("unknown")
            out = pdf[id_cols].copy()
            out["width"], out["height"], out["format"] = w, hh, fmt
            yield out

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name != bin_col)
    return df.mapInPandas(probe, schema=base + ", width int, height int, format string")


def image_features(df: DataFrame, bin_col: str = "image") -> DataFrame:
    """Decode + feature-extract. With a real codec this would produce
    embeddings; the stub computes deterministic payload statistics
    (mean/min/max byte) so the full pipeline — including downstream
    similarity joins — is exercised. Raises NotImplementedError for real
    image formats until a codec library is present."""
    id_cols = [c for c in df.columns if c != bin_col]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            mean, mn, mx = [], [], []
            for b in pdf[bin_col]:
                raw = bytes(b)
                if raw[:8] == IMG_MAGIC:
                    arr = np.frombuffer(raw[16:], dtype=np.uint8)
                elif _HAVE_PIL:  # pragma: no cover
                    raise NotImplementedError("real codec path not wired")
                else:
                    raise NotImplementedError(
                        "real image decode needs PIL/ffmpeg — not in this "
                        "container; only the FAKEIMG1 container is supported"
                    )
                mean.append(float(arr.mean()) if arr.size else 0.0)
                mn.append(int(arr.min()) if arr.size else 0)
                mx.append(int(arr.max()) if arr.size else 0)
            out = pdf[id_cols].copy()
            out["px_mean"], out["px_min"], out["px_max"] = mean, mn, mx
            yield out

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name != bin_col)
    return df.mapInPandas(
        feats, schema=base + ", px_mean double, px_min int, px_max int"
    )


def fake_audio(seed: int) -> bytes:
    rate = 8000 + 4000 * (seed % 3)
    n = 256 + (seed * 13) % 512
    return AUD_MAGIC + struct.pack(">ii", rate, n) + _payload(seed, n)


def attach_fake_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary audio column (FAKEAUD1: sample_rate,
    n_samples, u8 samples) — same mapInPandas batch shape a real
    WARC/audio payload loader would use."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["audio"] = [fake_audio(int(i)) for i in pdf[id_col]]
            yield out

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields)
    return df.mapInPandas(gen, schema=base + ", audio binary")


def audio_features(df: DataFrame, bin_col: str = "audio") -> DataFrame:
    """Decode + per-clip features: sample rate, duration, RMS level.
    Stub decode over FAKEAUD1 (real formats raise NotImplementedError
    until an audio library is present)."""
    id_cols = [c for c in df.columns if c != bin_col]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rate, dur, rms = [], [], []
            for b in pdf[bin_col]:
                raw = bytes(b)
                if raw[:8] != AUD_MAGIC:
                    raise NotImplementedError(
                        "real audio decode needs an audio library — not "
                        "in this container; only FAKEAUD1 is supported"
                    )
                r, n = struct.unpack(">ii", raw[8:16])
                arr = np.frombuffer(raw[16:16 + n], dtype=np.uint8).astype("float64")
                rate.append(r)
                dur.append(n / r)
                rms.append(float(np.sqrt((arr ** 2).mean())) if n else 0.0)
            out = pdf[id_cols].copy()
            out["sample_rate"], out["duration_sec"], out["rms"] = rate, dur, rms
            yield out

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name != bin_col)
    return df.mapInPandas(
        feats, schema=base + ", sample_rate int, duration_sec double, rms double"
    )


def image_resize(
    df: DataFrame, width: int, height: int, bin_col: str = "image"
) -> DataFrame:
    """Resize to (width, height) — nearest-neighbor sampling over the
    FAKEIMG1 container (deterministic, so the Spark-side plumbing,
    schema, and batch shape are fully tested); real formats raise
    NotImplementedError until a codec library is present. Output keeps
    the container format, so resized images feed back into
    image_metadata/image_features."""
    id_cols = [c for c in df.columns if c != bin_col]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_bytes = []
            for b in pdf[bin_col]:
                raw = bytes(b)
                if raw[:8] != IMG_MAGIC:
                    raise NotImplementedError(
                        "real image decode needs PIL/ffmpeg — not in this "
                        "container; only the FAKEIMG1 container is supported"
                    )
                w, h = struct.unpack(">ii", raw[8:16])
                arr = np.frombuffer(raw[16:16 + w * h], dtype=np.uint8)
                arr = arr.reshape(h, w)
                ys = (np.arange(height) * h // height).clip(0, h - 1)
                xs = (np.arange(width) * w // width).clip(0, w - 1)
                resized = arr[np.ix_(ys, xs)]
                out_bytes.append(
                    IMG_MAGIC
                    + struct.pack(">ii", width, height)
                    + resized.tobytes()
                )
            out = pdf[id_cols].copy()
            out[bin_col] = out_bytes
            yield out

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name != bin_col)
    return df.mapInPandas(resize, schema=base + f", {bin_col} binary")


def frame_sample(df: DataFrame, bin_col: str = "video", every_n: int = 2) -> DataFrame:
    """Explode a video binary into sampled frame rows (one binary per
    kept frame) — the fan-out shape of real frame extraction; partitions
    stay balanced because the explode happens inside the Arrow batch."""
    id_cols = [c for c in df.columns if c != bin_col]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in id_cols}
            rows.update({"frame_idx": [], "frame": []})
            for _, r in pdf.iterrows():
                raw = bytes(r[bin_col])
                if raw[:8] != VID_MAGIC:
                    raise NotImplementedError("real video decode not available")
                w, h, fr = struct.unpack(">iii", raw[8:20])
                fsz = w * h
                for k in range(0, fr, every_n):
                    for c in id_cols:
                        rows[c].append(r[c])
                    rows["frame_idx"].append(k)
                    rows["frame"].append(raw[20 + k * fsz:20 + (k + 1) * fsz])
            yield pd.DataFrame(rows)

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name != bin_col)
    return df.mapInPandas(
        sample, schema=base + ", frame_idx int, frame binary"
    )
