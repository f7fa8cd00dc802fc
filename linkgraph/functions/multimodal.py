"""Multimodal (image/audio/video) columns as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The reference (a pure-Python graph library) has no media surface; this
module is the training-data-pipeline extension mandated by the build
brief: large corpora carry media payloads next to text, and the engine
must move them through Spark without ever row-looping in Python.

Design for 100 TB:

* payloads stay an opaque ``BINARY`` column end-to-end — Spark never
  decodes them JVM-side; Parquet stores them as byte arrays with page
  compression, and column pruning means scans that don't touch
  ``payload`` never read those pages;
* every transform is ``mapInPandas`` (Arrow record batches, zero-copy
  into pandas) — NOT a per-row Python UDF; batch size is governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
  multi-MB blobs streams through bounded memory;
* decode is REAL for the uncompressed formats — PPM (P6) images,
  RIFF/WAVE 16-bit PCM audio, YUV4MPEG2 (C444) video — implemented in
  pure numpy (:func:`ppm_decode`, :func:`wav_features`,
  :func:`decode_y4m_frames`): actual pixels/samples/frames drive the
  features, resampling, and frame sampling — plus baseline AND
  progressive JPEG (pure-numpy T.81 incl. Annex G successive
  approximation, functions/jpeg.py) and PNG at every legal
  depth/color-type incl. Adam7 interlace and 16-bit samples (stdlib
  zlib + numpy, functions/png.py). Formats still codec-bound
  (hierarchical/arithmetic JPEG, Ogg, MP4) fall back to a
  deterministic sha-derived stub (:func:`fake_decode`) behind the
  ``set_decoder`` seam — the same magic-byte dispatch a production
  pipeline uses.

Media table shape (Iceberg-compatible, like the pages table):

    media(media_id BIGINT, kind STRING, payload BINARY,
          meta MAP<STRING,STRING>)
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _u32(digest: bytes, i: int) -> int:
    return int.from_bytes(digest[4 * i : 4 * i + 4], "big")


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder (no PIL in this
    container). Pure function of the bytes: dimensions and a 16-dim
    "embedding" derived from sha256. A real decoder returns the same
    dict shape from actual pixel data."""
    d = hashlib.sha256(payload or b"").digest()
    return {
        "width": 16 + _u32(d, 0) % 4096,
        "height": 16 + _u32(d, 1) % 4096,
        "channels": 1 + _u32(d, 2) % 4,
        "sha256": d.hex(),
        "embedding": [((_u32(d, i % 8) >> (i // 8)) % 1000) / 1000.0 for i in range(16)],
    }


_DECODER: Callable[[bytes], dict] | None = None  # None -> auto_decode


def set_decoder(fn: Callable[[bytes], dict]) -> None:
    """Swap in a real decoder (e.g. PIL-backed) without touching the
    Spark plumbing. Must be called before the transform is *executed*
    (the callable is captured into the UDF closure at call time)."""
    global _DECODER
    _DECODER = fn


def real_decode(payload: bytes) -> dict:
    """Library-grade decoder seam. Real in-container coverage:
    PPM (P6) via :func:`ppm_decode`, baseline JPEG via the pure-numpy
    T.81 decoder (functions/jpeg.py — SOF0, 4:4:4/4:2:0/4:2:2, restart
    intervals), and PNG via the stdlib-zlib + numpy decoder
    (functions/png.py — 8-bit gray/RGB/palette/RGBA, all five
    scanline filters; Adam7/16-bit raise). Formats outside that scope
    raise — swap a PIL-backed callable in through ``set_decoder`` on
    a real cluster."""
    if payload[:2] == b"\xff\xd8":
        from .jpeg import jpeg_decode

        return jpeg_decode(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import png_decode

        return png_decode(payload)
    if payload[:2] == b"P6":
        return ppm_decode(payload)
    raise NotImplementedError(
        "no in-container codec for this format (PPM/JPEG/PNG decode for "
        "real); use set_decoder() with a library-backed implementation "
        "on a real cluster"
    )


# ---------------------------------------------------------------- PPM (P6)
# A REAL image codec with zero dependencies: binary PPM is a plain
# header + raw RGB bytes, so decode/resize/feature-extraction run on
# actual pixels here, exactly as they would on a cluster with PIL for
# JPEG. numpy only.


def encode_ppm(pixels) -> bytes:
    """H×W×3 uint8 array -> binary PPM (P6) bytes."""
    import numpy as np

    a = np.asarray(pixels, dtype="uint8")
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_ppm expects an H x W x 3 uint8 array")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm_pixels(payload: bytes):
    """P6 bytes -> (H, W, 3) uint8 numpy array. Handles comment lines
    per the PPM spec; raises ValueError on non-P6 input."""
    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval — whitespace separated,
    # '#' comments allowed between tokens
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    pos += 1  # single whitespace after maxval
    raw = payload[pos : pos + w * h * 3]
    if len(raw) != w * h * 3:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(raw, dtype="uint8").reshape(h, w, 3)


def ppm_decode(payload: bytes) -> dict:
    """REAL decode for P6 payloads in the decoder-contract shape:
    dimensions from the actual header, 16-dim embedding from actual
    pixels (per-channel mean/std + a 10-bin luma histogram, all in
    [0, 1])."""
    import numpy as np

    px = decode_ppm_pixels(payload).astype("float64")
    h, w = px.shape[:2]
    means = px.mean(axis=(0, 1)) / 255.0
    stds = px.std(axis=(0, 1)) / 255.0
    luma = px @ [0.299, 0.587, 0.114]
    hist, _ = np.histogram(luma, bins=10, range=(0.0, 255.0))
    hist = hist / luma.size
    emb = [float(x) for x in (*means, *stds, *hist)]
    return {
        "width": int(w),
        "height": int(h),
        "channels": 3,
        "sha256": hashlib.sha256(payload).hexdigest(),
        "embedding": emb,
    }


def ppm_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample for P6 payloads, re-encoded as
    P6 — pure numpy fancy indexing."""
    import numpy as np

    px = decode_ppm_pixels(payload)
    h, w = px.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return encode_ppm(px[rows][:, cols])


def auto_decode(payload: bytes) -> dict:
    """Dispatch on magic bytes: P6, baseline + progressive JPEG, and
    PNG decode for REAL (zero-dependency codecs), anything else falls
    back to the deterministic stub (the honest boundary — a cluster
    image pipeline dispatches on format exactly like this; arithmetic/
    hierarchical JPEG raises inside the codec and lands on the stub
    too)."""
    if payload and payload.startswith(b"P6"):
        try:
            return ppm_decode(payload)
        except ValueError:  # P6-looking but malformed: stub, don't die
            return fake_decode(payload)
    if payload and payload.startswith(b"\xff\xd8"):
        try:
            from .jpeg import jpeg_decode

            return jpeg_decode(payload)
        except ValueError:  # progressive/arithmetic/corrupt: stub
            return fake_decode(payload)
    if payload and payload.startswith(b"\x89PNG\r\n\x1a\n"):
        try:
            from .png import png_decode

            return png_decode(payload)
        except (ValueError, zlib.error):  # interlaced/16-bit/corrupt
            return fake_decode(payload)
    return fake_decode(payload)


def image_features(media: DataFrame) -> DataFrame:
    """payload BINARY -> typed feature rows, one Arrow batch at a time.

    The iterator-of-batches form means one in-flight pandas frame per
    task regardless of partition size — blobs never accumulate."""
    decoder = _DECODER or auto_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decoder(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "channels": [f["channels"] for f in feats],
                    "sha256": [f["sha256"] for f in feats],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "embedding": [f["embedding"] for f in feats],
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        batches, schema=IMAGE_FEATURE_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    MEDIA_SCHEMA.fields[:3]
    + [
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize transform: payload -> payload', meta gains resized_w/h.

    P6 payloads are resampled for REAL (:func:`ppm_resize`,
    nearest-neighbor numpy); codec-bound formats fall back to the
    deterministic stub (sha256-seeded bytes of length width*height)
    until a library resampler is swapped in on a cluster."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                if p is not None and bytes(p).startswith(b"P6"):
                    try:
                        out_payloads.append(ppm_resize(bytes(p), width, height))
                        m = dict(m or {})
                        m["resized_w"], m["resized_h"] = str(width), str(height)
                        metas.append(m)
                        continue
                    except ValueError:
                        pass
                d = hashlib.sha256((p or b"") + b"|resize").digest()
                reps = (width * height) // len(d) + 1
                out_payloads.append((d * reps)[: width * height])
                m = dict(m or {})
                m["resized_w"], m["resized_h"] = str(width), str(height)
                metas.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "payload": out_payloads,
                    "meta": metas,
                    "target_w": width,
                    "target_h": height,
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (a 1->N
    mapInPandas, the UDTF shape). Duration comes from typed metadata
    (``meta['duration_ms']``); frame extraction is the deterministic
    stub (hash of payload+index) — the row explosion, schema, and
    batch shape are the real pipeline."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, shas = [], [], [], []
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                dur = int((m or {}).get("duration_ms", "0"))
                n = max(1, dur // every_ms)
                for i in range(n):
                    ids.append(int(mid))
                    idxs.append(i)
                    tss.append(i * every_ms)
                    shas.append(
                        hashlib.sha256((p or b"") + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "ts_ms": pd.Series(tss, dtype="int64"),
                 "frame_sha256": shas}
            )

    return media.where(F.col("kind") == "video").mapInPandas(batches, schema=FRAME_SCHEMA)


def synthetic_media(
    spark, n: int = 64, partitions: int = 4, jpeg_every: int = 0,
    png_every: int = 0,
) -> DataFrame:
    """Deterministic fixture table in MEDIA_SCHEMA (no external data):
    payload bytes are a pure function of media_id. ``jpeg_every=k``
    re-encodes every k-th image as baseline JPEG (alternating
    4:4:4 / 4:2:0); ``png_every=k`` likewise as PNG (rotating through
    the five scanline filters; PNG wins ties) — the mixed-container
    shape a real crawl produces; 0/0 keeps the all-PPM fixture."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                seed = hashlib.sha256(str(i).encode()).digest()
                if kind == "image":
                    # REAL P6 payload: deterministic gradient pattern
                    import numpy as np

                    w, h = 8 + i % 5, 6 + i % 4
                    yy, xx = np.mgrid[0:h, 0:w]
                    px = np.stack(
                        [
                            (xx * 31 + i) % 256,
                            (yy * 17 + seed[0]) % 256,
                            (xx + yy + seed[1]) % 256,
                        ],
                        axis=2,
                    ).astype("uint8")
                    if png_every and (i // 3) % png_every == 0:
                        from .png import encode_png

                        payload = encode_png(px, filter_type=(i // 3) % 5)
                    elif jpeg_every and (i // 3) % jpeg_every == 0:
                        from .jpeg import encode_jpeg

                        payload = encode_jpeg(
                            px,
                            quality=90,
                            subsampling="420" if (i // 3) % 2 else "444",
                        )
                    else:
                        payload = encode_ppm(px)
                elif kind == "video":
                    # REAL Y4M C444 clip: moving gradient frames
                    import numpy as np

                    w, h, nf = 6 + i % 3, 4 + i % 3, 6 + i % 5
                    frames = []
                    for k in range(nf):
                        yy, xx = np.mgrid[0:h, 0:w]
                        frames.append(
                            np.stack(
                                [
                                    (xx * 13 + k * 7 + i) % 256,
                                    (yy * 11 + k) % 256,
                                    (xx + yy + k + seed[2]) % 256,
                                ],
                                axis=2,
                            ).astype("uint8")
                        )
                    payload = encode_y4m(frames, fps=25)
                elif kind == "audio":
                    # REAL 16-bit PCM WAV: two-tone sine mixture
                    import numpy as np

                    rate = 8000
                    t = np.arange(rate // 10 + 40 * (i % 5)) / rate
                    f1, f2 = 200 + 50 * (i % 7), 900 + 30 * (i % 11)
                    x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.25 * np.sin(
                        2 * np.pi * f2 * t
                    )
                    payload = encode_wav(x, sample_rate=rate)
                else:
                    payload = seed * (1 + i % 7)
                meta = {"source": f"synth/{i}"}
                if kind == "video":
                    meta["duration_ms"] = str(500 * (1 + i % 8))
                rows.append((i, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n).repartition(partitions).mapInPandas(batches, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------- WAV (PCM)
# The audio twin of the PPM codec: RIFF/WAVE with 16-bit PCM is a
# fixed 44-byte header + raw samples — real decode, real features
# (RMS, zero-crossings, spectral bands via numpy rfft), no librosa.


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """1-D float array in [-1, 1] -> 16-bit PCM mono WAV bytes."""
    import numpy as np

    x = np.asarray(samples, dtype="float64")
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    n = len(data)
    hdr = (
        b"RIFF"
        + (36 + n).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")          # PCM
        + (1).to_bytes(2, "little")          # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
        + b"data"
        + n.to_bytes(4, "little")
    )
    return hdr + data


def decode_wav_samples(payload: bytes):
    """WAV bytes -> (samples float64 in [-1, 1], sample_rate). 16-bit
    PCM mono only; raises ValueError otherwise."""
    import numpy as np

    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt " or len(payload) < 44:
        raise ValueError("unsupported WAV layout")
    audio_fmt = int.from_bytes(payload[20:22], "little")
    channels = int.from_bytes(payload[22:24], "little")
    rate = int.from_bytes(payload[24:28], "little")
    bits = int.from_bytes(payload[34:36], "little")
    if (audio_fmt, channels, bits) != (1, 1, 16):
        raise ValueError("only 16-bit PCM mono supported")
    if payload[36:40] != b"data":
        raise ValueError("unsupported WAV chunk layout")
    n = int.from_bytes(payload[40:44], "little")
    raw = payload[44 : 44 + n]
    if len(raw) != n:
        raise ValueError("truncated WAV payload")
    return np.frombuffer(raw, dtype="<i2").astype("float64") / 32767.0, rate


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("spectrum", T.ArrayType(T.FloatType())),
    ]
)


def wav_features(payload: bytes) -> dict:
    """REAL audio features from PCM samples: RMS, zero-crossing rate,
    and an 8-band normalized magnitude spectrum (numpy rfft)."""
    import numpy as np

    x, rate = decode_wav_samples(payload)
    n = len(x)
    rms = float(np.sqrt((x**2).mean())) if n else 0.0
    zcr = float((np.diff(np.signbit(x)) != 0).mean()) if n > 1 else 0.0
    if n:
        mag = np.abs(np.fft.rfft(x))
        bands = np.array_split(mag, 8)
        spec = np.array([b.mean() for b in bands])
        tot = spec.sum()
        spec = spec / tot if tot > 0 else spec
    else:
        spec = np.zeros(8)
    return {
        "sample_rate": int(rate),
        "n_samples": int(n),
        "duration_ms": int(n * 1000 // rate) if rate else 0,
        "rms": rms,
        "zero_crossing_rate": zcr,
        "spectrum": [float(v) for v in spec],
    }


def audio_features(media: DataFrame) -> DataFrame:
    """kind='audio' rows -> typed feature rows; RIFF payloads decode
    for real, anything else gets deterministic sha-derived stand-ins
    (same honest boundary as image auto_decode)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_cols = [f.name for f in AUDIO_FEATURE_SCHEMA.fields]
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                try:
                    f = wav_features(p)
                except ValueError:
                    d = hashlib.sha256(p).digest()
                    f = {
                        "sample_rate": 8000 + _u32(d, 0) % 40000,
                        "n_samples": _u32(d, 1) % 100000,
                        "duration_ms": _u32(d, 2) % 60000,
                        "rms": (_u32(d, 3) % 1000) / 1000.0,
                        "zero_crossing_rate": (_u32(d, 4) % 1000) / 1000.0,
                        "spectrum": [((_u32(d, i % 8)) % 1000) / 1000.0 for i in range(8)],
                    }
                rows.append((int(mid), f["sample_rate"], f["n_samples"],
                             f["duration_ms"], f["rms"],
                             f["zero_crossing_rate"], f["spectrum"]))
            yield pd.DataFrame(rows, columns=out_cols)

    return media.where(F.col("kind") == "audio").mapInPandas(
        batches, schema=AUDIO_FEATURE_SCHEMA
    )


# ------------------------------------------------------------- Y4M (video)
# The video member of the uncompressed-codec family: YUV4MPEG2 is a
# plain text header + "FRAME\n"-delimited raw planes, so frame
# counting/sampling/statistics run on actual frame bytes (C444 =
# full-resolution Y,U,V planes; no chroma subsampling math needed).


def encode_y4m(frames, fps: int = 25) -> bytes:
    """list of H×W×3 uint8 (Y,U,V channel-last) -> Y4M C444 bytes."""
    import numpy as np

    fs = [np.asarray(f, dtype="uint8") for f in frames]
    if not fs or any(f.ndim != 3 or f.shape[2] != 3 for f in fs):
        raise ValueError("encode_y4m expects a non-empty list of H x W x 3 arrays")
    h, w = fs[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in fs):
        raise ValueError("all frames must share dimensions")
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for f in fs:
        out.append(b"FRAME\n")
        for c in range(3):  # planar: all Y, all U, all V
            out.append(f[:, :, c].tobytes())
    return b"".join(out)


def decode_y4m_frames(payload: bytes):
    """Y4M C444 bytes -> (frames list of H×W×3 uint8, fps int)."""
    import numpy as np

    if not payload or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "replace").split()
    w = h = fps = None
    c444 = False
    for tok in header[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("F"):
            fps = int(tok[1:].split(":")[0])
        elif tok.startswith("C"):
            c444 = tok[1:] == "444"
    if not (w and h and fps) or not c444:
        raise ValueError("only C444 Y4M with W/H/F headers supported")
    frame_bytes = w * h * 3
    pos, frames = nl + 1, []
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed FRAME marker")
        start = fnl + 1
        raw = payload[start : start + frame_bytes]
        if len(raw) != frame_bytes:
            raise ValueError("truncated Y4M frame")
        planes = np.frombuffer(raw, dtype="uint8").reshape(3, h, w)
        frames.append(np.moveaxis(planes, 0, 2))
        pos = start + frame_bytes
    return frames, fps


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def sample_video_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """REAL frame sampling for Y4M payloads: every ``every_n``-th
    actual frame becomes one output row with its own bytes' sha256 and
    mean luma (Y plane). Non-Y4M payloads fall back to the metadata-
    driven stub rows of :func:`sample_frames` semantics (duration_ms
    at 1000 ms cadence). Same 1->N mapInPandas (UDTF) shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, shas, lumas = [], [], [], [], []
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                p = bytes(p) if p is not None else b""
                try:
                    frames, fps = decode_y4m_frames(p)
                except ValueError:
                    dur = int((m or {}).get("duration_ms", "0"))
                    for i in range(max(1, dur // 1000)):
                        ids.append(int(mid))
                        idxs.append(i)
                        tss.append(i * 1000)
                        shas.append(
                            hashlib.sha256(p + i.to_bytes(4, "big")).hexdigest()
                        )
                        lumas.append(-1.0)
                    continue
                for i in range(0, len(frames), every_n):
                    f = frames[i]
                    ids.append(int(mid))
                    idxs.append(i)
                    tss.append(i * 1000 // fps)
                    shas.append(hashlib.sha256(f.tobytes()).hexdigest())
                    lumas.append(float(f[:, :, 0].mean()))
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "ts_ms": pd.Series(tss, dtype="int64"),
                 "frame_sha256": shas,
                 "mean_luma": pd.Series(lumas, dtype="float64")}
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        batches, schema=VIDEO_FRAME_SCHEMA
    )


def ppm_dhash(payload: bytes) -> int:
    """64-bit difference hash (dHash) from REAL pixels: nearest-
    neighbor downsample the luma plane to 9×8 and emit one bit per
    horizontal gradient — the standard perceptual-hash recipe
    (Krawetz). Signed int64 (BIGINT-compatible; bit 63 may set the
    sign). Despite the name it accepts baseline JPEG and PNG too
    (same zero-dependency dispatch as auto_decode)."""
    import numpy as np

    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_pixels

        px = decode_jpeg_pixels(payload).astype("float64")
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png_pixels

        px = decode_png_pixels(payload).astype("float64")
        if px.ndim == 3:
            px = px[:, :, :3]  # RGBA -> color channels
    else:
        px = decode_ppm_pixels(payload).astype("float64")
    if px.ndim == 2:
        px = np.stack([px, px, px], axis=2)
    luma = px @ [0.299, 0.587, 0.114]
    h, w = luma.shape
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(9) * w) // 9
    g = luma[rows][:, cols]
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


IMAGE_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def image_dhash_table(media: DataFrame) -> DataFrame:
    """(media_id, dhash BIGINT) for image rows — real dHash for P6
    payloads, sha-derived fallback otherwise. Feed into
    ``dedup.hash64_near_pairs`` for perceptual near-duplicate image
    pairs with the same quadrant-blocked equi-join as text simhash
    (never a cross join), then ``connected_components`` + min-id
    survivor exactly like every other dedup lane."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                try:
                    hv = ppm_dhash(p)
                except ValueError:
                    d = hashlib.sha256(p).digest()
                    hv = int.from_bytes(d[:8], "big", signed=True)
                out.append((int(mid), hv))
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return media.where(F.col("kind") == "image").mapInPandas(
        batches, schema=IMAGE_DHASH_SCHEMA
    )
