"""Multimodal (image/audio/video) column plumbing.

No counterpart in the reference engine (its only binary-ish path is
RDF literal typing, ``semantics/extension/RDFEndpoint.java:566-586``).
This is the scale extension for multimodal training data: media
travel as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extraction / resize run as Arrow-batched
``mapInPandas`` stages.

Codec status (r9, no ambiguity): **PNG pixel decode is REAL**
(``decode_png`` inflates IDAT with stdlib ``zlib`` and unfilters all
five PNG filter types, no PIL needed) and **WAV/PCM sample decode is
REAL** (``decode_wav`` parses RIFF chunks and decodes PCM 8/16/24/32
-bit and float32/64 samples with numpy — uncompressed audio needs no
codec library). The container/metadata probe
(``probe_media_headers``) is REAL header parsing for PNG/JPEG/GIF/
WAV. JPEG/compressed-audio/video PIXEL decode stays PERMANENTLY
gated in this environment (entropy decoding needs a codec library;
there is no stdlib path) — ``decode_media`` raises
``NotImplementedError`` unless ``stub=True``, which runs a
deterministic fake featurizer through the identical mapInPandas
plumbing.

Scale notes: binary payloads dominate row size, so feature
extraction runs ``mapInPandas`` with Arrow batches sized by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it low, e.g.
64-256, for multi-MB media); the metadata struct stays queryable
without touching bytes (column pruning skips the blob entirely when
a query only reads metadata).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_HIST_BUCKETS = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("byte_hist", ArrayType(LongType())),
    ]
)


def attach_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic fake media table from the documents fixture:
    content = UTF-8 bytes of the text, metadata derived from length.
    Stands in for ``spark.read.format('binaryFile')`` /  a blob-store
    scan; downstream operators only see the column contract:
    (media_id, modality, content: binary, meta: struct)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            (F.length(F.col(text_col)) % 64 + 1).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 48 + 1).cast("int").alias("height"),
            F.lit(3).cast("int").alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, stub: bool = False) -> DataFrame:
    """Decode + featurize media content via Arrow-batched
    ``mapInPandas``: (media_id, n_bytes, first_byte, byte_hist[16]).

    The real path (PIL/soundfile decode) is not available in this
    container — it raises ``NotImplementedError`` so the gap is
    explicit. ``stub=True`` runs the deterministic fake featurizer
    through the identical mapInPandas plumbing.
    """
    if not stub:
        raise NotImplementedError(
            "generic media codecs (PIL/opencv/ffmpeg) are not installed "
            "in this environment (permanent gate — no stdlib path for "
            "JPEG/compressed-audio/video entropy decoding). PNG pixel "
            "decode IS available (decode_png), and WAV/PCM sample "
            "decode IS available (decode_wav). Pass stub=True here for "
            "the deterministic fake featurizer."
        )

    def featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                # NULL blobs emit an audit row (the sibling decoders'
                # per-blob contract) instead of TypeError-ing the task
                if content is None:
                    rows.append(
                        {
                            "media_id": int(mid),
                            "n_bytes": 0,
                            "first_byte": -1,
                            "byte_hist": [0] * N_HIST_BUCKETS,
                        }
                    )
                    continue
                b = bytes(content)
                hist = [0] * N_HIST_BUCKETS
                for byte in b:
                    hist[byte % N_HIST_BUCKETS] += 1
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(b),
                        "first_byte": b[0] if b else -1,
                        "byte_hist": hist,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select("media_id", "content").mapInPandas(featurize, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL PNG pixel decode — pure stdlib (zlib inflate + PNG unfilter)
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (palette expands to RGB after decode)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

PNG_PIXELS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("channel_means", ArrayType(DoubleType())),
    ]
)


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytes:
    """Reverse the five PNG scanline filters (spec §9): each scanline
    is one filter-type byte + ``stride`` filtered bytes."""
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ft == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                line[x] = (
                    line[x] + (a if pa <= pb and pa <= pc else b if pb <= pc else cc)
                ) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG: unknown filter type {ft}")
        out += line
        prev = line
    return bytes(out)


def png_decode(bs: bytes) -> tuple:
    """Decode one PNG -> (width, height, channels, pixels: bytes).

    Pure stdlib: chunk walk + ``zlib.decompress`` of the concatenated
    IDAT stream + scanline unfilter. Supports bit depth 8, color
    types 0/2/3/4/6 (palette images expand to RGB), non-interlaced.
    Raises ``ValueError`` with the exact unsupported feature
    otherwise — never silently mis-decodes."""
    import struct
    import zlib

    bs = bytes(bs)
    if bs[:8] != _PNG_MAGIC:
        raise ValueError("PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(bs):
        (length,) = struct.unpack(">I", bs[pos : pos + 4])
        ctype = bs[pos + 4 : pos + 8]
        data = bs[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG: unsupported bit depth {bit_depth} (only 8)")
    if interlace:
        raise ValueError("PNG: Adam7 interlacing not supported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"PNG: unknown color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG: IDAT size does not match dimensions")
    pixels = _png_unfilter(raw, height, stride, ch)
    if color_type == 3:  # palette -> RGB
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        pixels = b"".join(palette[3 * p : 3 * p + 3] for p in pixels)
        ch = 3
    return width, height, ch, pixels


def decode_png(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """REAL pixel decode for PNG blobs via Arrow-batched
    ``mapInPandas``: (media_id, width, height, channels, n_pixels,
    channel_means). Non-PNG or unsupported-variant blobs surface as
    NULL dimensions (the id row is kept so coverage is auditable
    downstream: ``WHERE width IS NULL`` = the undecodable set)."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    w, h, ch, px = png_decode(content)
                    arr = np.frombuffer(px, dtype=np.uint8).reshape(-1, ch)
                    means = [float(m) for m in arr.mean(axis=0)]
                    out.append((int(mid), w, h, ch, w * h, means))
                except Exception:
                    out.append((int(mid), None, None, None, None, None))
            yield pd.DataFrame(
                out, columns=[f.name for f in PNG_PIXELS_SCHEMA.fields]
            )

    return df.select(id_col, content_col).mapInPandas(run, PNG_PIXELS_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' over the binary payload: slice the blob at a
    fixed stride (stand-in for video frame extraction — same plumbing:
    one input row → N frame rows). JVM-side (substring on binary),
    no Python; output explodes to (media_id, frame_idx, frame:
    binary). Empty and NULL blobs yield NO frame rows: the frame
    count is guarded before sequence() — Spark's sequence(0, -1)
    COUNTS DOWN (step defaults to -1 when start > stop, the pitfall
    winnow._seq1 documents), which would fabricate frame rows -1 and
    0 for a 0-byte blob, and least() SKIPS a NULL length, which would
    explode max_frames all-NULL frames per NULL blob."""
    n_frames = F.least(
        (F.floor((F.length("content") - 1) / every_n_bytes) + 1).cast("int"),
        F.lit(max_frames),
    )
    frames = F.when(
        F.col("content").isNotNull() & (n_frames > 0),
        F.sequence(F.lit(0), n_frames - 1),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(
            "media_id",
            "content",
            F.explode(frames).alias("frame_idx"),
        )
        .withColumn(
            "frame",
            F.expr(f"substring(content, frame_idx * {every_n_bytes} + 1, {every_n_bytes})"),
        )
        .select("media_id", F.col("frame_idx").cast("int"), "frame")
    )


MEDIA_PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

# JPEG start-of-frame markers that carry dimensions (C4=DHT, C8=JPG,
# CC=DAC are NOT frames)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _probe_one(bs: bytes):
    """(format, width, height, channels, sample_rate) from container
    headers alone — pure struct parsing, no codec library."""
    import struct

    if bs is None:
        return ("unknown", None, None, None, None)
    bs = bytes(bs)
    if bs[:8] == b"\x89PNG\r\n\x1a\n" and len(bs) >= 24:
        w, h = struct.unpack(">II", bs[16:24])
        return ("png", w, h, None, None)
    if bs[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(bs) and bs[i] == 0xFF:
            marker = bs[i + 1]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", bs[i + 5:i + 9])
                return ("jpeg", w, h, int(bs[i + 9]), None)
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # no payload
                i += 2
                continue
            seglen = struct.unpack(">H", bs[i + 2:i + 4])[0]
            i += 2 + seglen
        return ("jpeg", None, None, None, None)
    if bs[:6] in (b"GIF87a", b"GIF89a") and len(bs) >= 10:
        w, h = struct.unpack("<HH", bs[6:10])
        return ("gif", w, h, None, None)
    if bs[:4] == b"RIFF" and bs[8:12] == b"WAVE":
        i = 12
        while i + 8 <= len(bs):
            cid = bs[i:i + 4]
            sz = struct.unpack("<I", bs[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 16 <= len(bs):
                ch = struct.unpack("<H", bs[i + 10:i + 12])[0]
                sr = struct.unpack("<I", bs[i + 12:i + 16])[0]
                return ("wav", None, None, ch, sr)
            i += 8 + sz + (sz & 1)
        return ("wav", None, None, None, None)
    return ("unknown", None, None, None, None)


def probe_media_headers(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """REAL (non-stubbed) metadata extraction: container-format
    sniffing + dimensions/channels/sample-rate from PNG IHDR, JPEG
    SOF segments, GIF logical screen descriptors, and WAV fmt chunks
    — pure header parsing, so it needs no codec library and reads
    only the first bytes of each blob. Same Arrow-batched
    ``mapInPandas`` shape as ``decode_media``; at scale, run it on
    `binaryFile` scans to build the queryable metadata struct without
    ever decoding payloads."""
    import pandas as pd

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [_probe_one(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "format": [r[0] for r in rows],
                    "width": pd.array([r[1] for r in rows], dtype="Int32"),
                    "height": pd.array([r[2] for r in rows], dtype="Int32"),
                    "channels": pd.array([r[3] for r in rows], dtype="Int32"),
                    "sample_rate": pd.array([r[4] for r in rows], dtype="Int32"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(probe, MEDIA_PROBE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL WAV/PCM sample decode — pure stdlib struct + numpy
# ---------------------------------------------------------------------------

WAV_SAMPLES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("channel_rms", ArrayType(DoubleType())),
        StructField("peak", DoubleType()),
    ]
)


def wav_decode(bs: bytes):
    """(channels, sample_rate, samples float64 ndarray [frames, ch])
    from a RIFF/WAVE blob. Uncompressed formats only: PCM integer
    8 (unsigned) / 16 / 24 / 32 bit (format tag 1) and IEEE float
    32 / 64 (tag 3), incl. the WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    wrapper around either. Raises ValueError on anything else —
    compressed audio (MP3/AAC/ADPCM) needs a codec library."""
    import struct

    import numpy as np

    bs = bytes(bs)
    if bs[:4] != b"RIFF" or bs[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(bs):
        cid = bs[i : i + 4]
        sz = struct.unpack("<I", bs[i + 4 : i + 8])[0]
        body = bs[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or len(fmt) < 16:
        raise ValueError("WAV: missing fmt chunk")
    if data is None:
        raise ValueError("WAV: missing data chunk")
    tag, ch, sr = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if tag == 0xFFFE and len(fmt) >= 26:  # EXTENSIBLE: real tag in GUID
        tag = struct.unpack("<H", fmt[24:26])[0]
    if ch < 1 or sr < 1:
        raise ValueError("WAV: bad fmt values")
    if tag == 1:  # integer PCM
        if bits == 8:
            a = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            a = (a - 128.0) / 128.0
        elif bits == 16:
            a = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data[: len(data) - len(data) % 3], dtype=np.uint8)
            raw = raw.reshape(-1, 3)
            v = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            a = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            a = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise ValueError(f"WAV: unsupported PCM bit depth {bits}")
    elif tag == 3:  # IEEE float
        if bits == 32:
            a = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            a = np.frombuffer(data, dtype="<f8")
        else:
            raise ValueError(f"WAV: unsupported float bit depth {bits}")
    else:
        raise ValueError(f"WAV: compressed format tag {tag} needs a codec")
    frames = len(a) // ch
    return ch, sr, a[: frames * ch].reshape(frames, ch)


def decode_wav(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """REAL sample decode for WAV/PCM blobs via Arrow-batched
    ``mapInPandas``: (media_id, channels, sample_rate, n_frames,
    duration_s, channel_rms, peak). Non-WAV or compressed blobs
    surface as NULL columns (row kept — ``WHERE channels IS NULL`` is
    the undecodable set, same audit contract as ``decode_png``).

    Scale shape: one narrow Python stage over (id, blob); numpy does
    the per-blob sample math (vectorized, no per-sample Python), and
    the output is fixed-width per row — safe to run over a
    ``binaryFile`` scan of a 100 TB audio corpus with small Arrow
    batches."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    ch, sr, a = wav_decode(content)
                    rms = [
                        float(r) for r in np.sqrt((a * a).mean(axis=0))
                    ] if len(a) else [0.0] * ch
                    peak = float(np.abs(a).max()) if len(a) else 0.0
                    out.append(
                        (int(mid), ch, sr, len(a), len(a) / sr, rms, peak)
                    )
                except Exception:
                    out.append((int(mid), None, None, None, None, None, None))
            yield pd.DataFrame(
                out, columns=[f.name for f in WAV_SAMPLES_SCHEMA.fields]
            )

    return df.select(id_col, content_col).mapInPandas(run, WAV_SAMPLES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", BinaryType()),
        StructField("channel_means", ArrayType(DoubleType())),
    ]
)


def resize_png(
    df: DataFrame,
    out_width: int,
    out_height: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """REAL image resize for PNG blobs: decode (stdlib zlib path),
    nearest-neighbor resample to (out_width, out_height) with
    center-aligned sample points (the classic NN grid:
    src = floor((i + 0.5) * src_dim / out_dim)), emit the resized
    row-major pixel bytes + per-channel means — the
    thumbnail/vision-encoder-input normalization step. Undecodable
    blobs keep their id row with NULLs (the decode_png convention).

    Scale shape: one Arrow-batched mapInPandas stage; output rows are
    out_width x out_height x channels bytes regardless of input
    size, so the stage SHRINKS data (cap Arrow batch size for
    multi-MB inputs, see module docstring); no shuffle."""
    if out_width < 1 or out_height < 1:
        raise ValueError("output dimensions must be >= 1")
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    w, h, ch, px = png_decode(content)
                    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
                    ys = np.minimum(
                        ((np.arange(out_height) + 0.5) * h / out_height)
                        .astype(np.int64),
                        h - 1,
                    )
                    xs = np.minimum(
                        ((np.arange(out_width) + 0.5) * w / out_width)
                        .astype(np.int64),
                        w - 1,
                    )
                    rs = arr[ys][:, xs]
                    means = [float(m) for m in rs.reshape(-1, ch).mean(axis=0)]
                    out.append(
                        (int(mid), out_width, out_height, ch,
                         rs.tobytes(), means)
                    )
                except Exception:
                    out.append((int(mid), None, None, None, None, None))
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return df.select(id_col, content_col).mapInPandas(run, RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("channel", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossing_rate", DoubleType()),
        StructField("spectral_centroid_hz", DoubleType()),
    ]
)


def audio_features(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """REAL audio feature extraction for WAV/PCM blobs: per channel,
    RMS energy, zero-crossing rate (crossings per frame — a 440 Hz
    tone at 8 kHz gives 2*440/8000) and spectral centroid in Hz
    (magnitude-weighted mean rFFT bin frequency, DC excluded) — the
    speech/music/silence triage features a training pipeline filters
    on before expensive transcription. numpy only (rFFT); no codec
    library. Undecodable blobs keep one NULL-feature row per id.

    Scale shape: one Arrow-batched mapInPandas stage emitting
    channels-per-blob rows; FFT cost is O(n log n) per blob,
    embarrassingly parallel, no shuffle."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    ch, sr, a = wav_decode(content)
                    n = a.shape[0]
                    for c in range(ch):
                        x = a[:, c]
                        rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                        zcr = (
                            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                            if n > 1
                            else 0.0
                        )
                        # rfft of a zero-length signal RAISES — a
                        # valid 0-sample WAV should feature as silence,
                        # not fall into the malformed-blob audit path
                        mag = (
                            np.abs(np.fft.rfft(x)) if n else np.zeros(1)
                        )
                        freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                        msum = float(mag[1:].sum())
                        cen = (
                            float((mag[1:] * freqs[1:]).sum() / msum)
                            if msum > 0
                            else 0.0
                        )
                        out.append((int(mid), c, sr, n, rms, zcr, cen))
                except Exception:
                    out.append((int(mid), None, None, None, None, None, None))
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, content_col).mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )
