"""Multimodal (binary) column plumbing.

Images/audio/video travel as opaque BinaryType payloads plus a typed
metadata struct; decode/feature steps are Arrow-batched mapInPandas
functions. Codec strategy (capabilities() reports what's active):

* images — PIL is attempted at import; when present, real decode
  (dimensions + 8x8 average-hash), otherwise a deterministic
  byte-statistics fake behind the SAME signature and plumbing, so the
  Spark side (schema, batching, partitioning) is identical either way.
* audio — WAV/PCM decodes FOR REAL via the stdlib ``wave`` module
  (sample rate, duration, per-channel RMS; no external dependency);
  non-WAV payloads yield null fields (or librosa when installed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_std", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def attach_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Wrap raw binary rows into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


try:  # optional dependency: real image decoding when PIL is installed
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False

try:  # optional dependency: non-WAV audio when librosa is installed
    import librosa as _librosa  # type: ignore

    HAS_LIBROSA = True
except ImportError:
    _librosa = None
    HAS_LIBROSA = False


def capabilities() -> dict[str, bool]:
    """Which decode paths are REAL in this environment. WAV audio is
    always real (stdlib); images need PIL; non-WAV audio needs librosa."""
    return {"image_pil": HAS_PIL, "audio_wav": True, "audio_librosa": HAS_LIBROSA}


def _fake_decode(payload: bytes) -> tuple[float, float, int]:
    """Deterministic stand-in for image decoding: byte statistics and a
    64-bit 'perceptual hash' from the byte histogram. Used when PIL is
    absent — same signature, same plumbing as the real path."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0.0, 0.0, 0
    mean = float(arr.mean())
    std = float(arr.std())
    hist = np.histogram(arr, bins=64, range=(0, 256))[0]
    bits = (hist > np.median(hist)).astype(np.uint64)
    phash = int(np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64)))
    # wrap to signed 64-bit for LongType
    if phash >= 2**63:
        phash -= 2**64
    return mean, std, phash


def _pil_decode(payload: bytes) -> tuple[float, float, int]:
    """Real image decode (PIL): pixel mean/std + 8x8 average-hash — the
    standard near-duplicate perceptual hash."""
    import io

    import numpy as np

    with _PILImage.open(io.BytesIO(payload)) as im:
        gray = im.convert("L")
        px = np.asarray(gray, dtype=np.float64)
        small = np.asarray(gray.resize((8, 8)), dtype=np.float64)
    bits = (small > small.mean()).flatten().astype(np.uint64)
    phash = int(np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64)))
    if phash >= 2**63:
        phash -= 2**64
    return float(px.mean()), float(px.std()), phash


def decode_image_payload(payload: bytes) -> tuple[float, float, int]:
    """PIL when available (falling back per payload if PIL can't parse
    it), byte-statistics fake otherwise."""
    if HAS_PIL:
        try:
            return _pil_decode(payload)
        except Exception:
            pass
    return _fake_decode(payload)


def image_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over media batches (Arrow transfer,
    one python worker per partition — the only sanctioned python hot path)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                mean, std, phash = decode_image_payload(b)
                rows.append((mid, len(b), mean, std, phash))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "byte_mean", "byte_std", "phash"],
            )

    return df.select("media_id", "payload").mapInPandas(
        extract, schema=IMAGE_FEATURES_SCHEMA
    )


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_video_frames(
    df: DataFrame, frame_size: int, stride: int = 1, max_frames: int | None = None
) -> DataFrame:
    """Frame sampling over raw-frame video payloads (one binary blob =
    n fixed-size frames back to back, the uncompressed/YUV-style
    layout): emit every ``stride``-th frame as its own row, capped at
    ``max_frames`` per payload. The fan-out happens INSIDE mapInPandas
    (Arrow-batched), so a 1-row-per-video input becomes
    frames-per-video rows without any driver involvement — downstream
    per-frame feature extraction (image_features on the frame column)
    parallelizes across the exploded rows after a repartition.
    Container formats (mp4 etc.) need an ffmpeg/av binding — absent
    here, same capability gating as audio; the sampling/fan-out
    plumbing is identical either way."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "frame_idx", "n_frames", "frame"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n = len(b) // frame_size
                taken = 0
                for i in range(0, n, stride):
                    if max_frames is not None and taken >= max_frames:
                        break
                    rows.append(
                        (mid, i, n, b[i * frame_size : (i + 1) * frame_size])
                    )
                    taken += 1
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", "payload").mapInPandas(
        sample, schema=VIDEO_FRAMES_SCHEMA
    )


RESIZED_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def resize_frames(
    df: DataFrame,
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
    frame_col: str = "frame",
) -> DataFrame:
    """REAL nearest-neighbor resize of raw 8-bit grayscale frames
    (numpy index sampling — no codec library involved). Input rows are
    (media_id, frame_idx, <frame binary of src_w*src_h bytes>), e.g.
    sample_video_frames output; frames with the wrong byte count yield
    null (corrupt-frame tolerance, same drop semantics as the other
    decoders). For JPEG/PNG payloads the PIL path in
    decode_image_payload applies instead — this operator is the
    post-decode tensor-prep step a training pipeline runs at scale."""
    import numpy as np

    ys = (np.arange(dst_h) * src_h // dst_h).astype(np.int64)
    xs = (np.arange(dst_w) * src_w // dst_w).astype(np.int64)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "frame_idx", "width", "height", "frame"]
        for pdf in batches:
            rows = []
            for mid, idx, frame in zip(
                pdf["media_id"], pdf["frame_idx"], pdf[frame_col]
            ):
                b = bytes(frame) if frame is not None else b""
                if len(b) != src_w * src_h:
                    rows.append((mid, idx, dst_w, dst_h, None))
                    continue
                arr = np.frombuffer(b, dtype=np.uint8).reshape(src_h, src_w)
                out = arr[ys][:, xs]
                rows.append((mid, idx, dst_w, dst_h, out.tobytes()))
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", "frame_idx", frame_col).mapInPandas(
        resize, schema=RESIZED_FRAMES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)

_WAV_WIDTH_DTYPE = {1: "uint8", 2: "<i2", 4: "<i4"}


def decode_wav_payload(payload: bytes):
    """Real WAV/PCM decode with the stdlib ``wave`` module: returns
    (sample_rate, n_channels, duration_s, rms) or None if not WAV."""
    import io
    import wave as _wave

    import numpy as np

    try:
        with _wave.open(io.BytesIO(payload), "rb") as w:
            sr = w.getframerate()
            nch = w.getnchannels()
            nframes = w.getnframes()
            width = w.getsampwidth()
            raw = w.readframes(nframes)
    except Exception:
        return None
    dtype = _WAV_WIDTH_DTYPE.get(width)
    if dtype is None or sr <= 0:
        return None
    samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = samples - 128.0
    scale = float(2 ** (8 * width - 1)) if width > 1 else 128.0
    norm = samples / scale
    rms = float(np.sqrt(np.mean(norm * norm))) if norm.size else 0.0
    return sr, nch, nframes / float(sr), rms


def decode_audio(df: DataFrame) -> DataFrame:
    """Audio feature extraction (sample rate, channels, duration, RMS
    loudness), mapInPandas like the image path. WAV/PCM payloads decode
    with zero external dependencies; other containers decode via
    librosa when installed, else yield null features (capability
    surfaced by capabilities())."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "sample_rate", "n_channels", "duration_s", "rms"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                got = decode_wav_payload(b)
                if got is None and HAS_LIBROSA:
                    try:
                        import io

                        import numpy as np

                        y, sr = _librosa.load(io.BytesIO(b), sr=None, mono=False)
                        nch = 1 if y.ndim == 1 else y.shape[0]
                        dur = y.shape[-1] / float(sr)
                        rms = float(np.sqrt(np.mean(np.square(y))))
                        got = (int(sr), nch, dur, rms)
                    except Exception:
                        got = None
                if got is None:
                    rows.append((mid, None, None, None, None))
                else:
                    rows.append((mid, *got))
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", "payload").mapInPandas(
        extract, schema=AUDIO_FEATURES_SCHEMA
    )
