"""Multimodal column operators (SURVEY.md §2 B55 + binary plumbing).

Model: image/audio/video payloads are opaque `binary` columns with
typed metadata travelling alongside. The image path uses a REAL
vendored pure-python BMP codec and the audio path a REAL stdlib
`wave` RIFF/PCM round trip (the container ships no image/audio libs,
the video path a REAL YUV4MPEG2 mux/demux (the container ships no
image/audio libs, so heavier codecs — JPEG, mp4 — would swap into the
same mapInPandas bodies). Oracles recompute the expected decode
output arithmetically from the payload bytes, so codec bugs fail the
hash.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.registry import register

_B55_ORACLE = """
SELECT d.doc_id, d.source, d.n_chars,
       CAST(e.vec_id IS NOT NULL AS BOOLEAN) AS has_embedding,
       COALESCE(e.label, -1) AS label,
       COALESCE(len(e.embedding), 0) AS dim
FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
"""


@register("b_llm_multimodal", oracle=_B55_ORACLE, tags=("pipeline", "multimodal"))
def b_llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ embedding modality join (left: docs without a vector
    survive with sentinel metadata — required at sf0.1 where
    documents=5000 vs embeddings=2000)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id, "left").select(
        "doc_id",
        "source",
        "n_chars",
        F.col("vec_id").isNotNull().alias("has_embedding"),
        F.coalesce(F.col("label"), F.lit(-1)).alias("label"),
        F.coalesce(F.size("embedding"), F.lit(0)).alias("dim"),
    )


# Synthetic binary payload: 16 md5 bytes of the text stand in for an
# encoded image. Deterministic, so metadata extraction is hash-checkable.
_BINMETA_ORACLE = """
SELECT doc_id,
       octet_length(from_hex(md5(text))) AS n_bytes,
       CAST(concat('0x', substring(md5(text), 1, 2)) AS INT) AS first_byte,
       md5(text) AS payload_hex
FROM documents
"""


@register("b_mm_binary_meta", oracle=_BINMETA_ORACLE, tags=("pipeline", "multimodal", "binary"))
def b_mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: materialize an opaque binary payload and
    extract typed metadata JVM-side (length, magic byte, hex)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.unhex(F.md5("text"))
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("int").alias("first_byte"),
        F.md5("text").alias("payload_hex"),
    )


# --- real image codec: pure-python 24bpp BMP -------------------------
#
# The container ships no image libraries, so the codec is vendored:
# a from-scratch BMP writer/parser (file header + BITMAPINFOHEADER +
# bottom-up padded pixel rows — the standard layout). The decode step
# genuinely parses the binary payload; swapping in PIL/libvips for
# JPEG/PNG changes only _bmp_decode, not the Spark plumbing.

_BMP_HDR = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def _bmp_encode_rows(width: int, height: int, px_rows: list[bytes]) -> bytes:
    """Minimal 24bpp BMP from raw BGR pixel rows (real, openable
    image bytes; rows pad to 4-byte boundaries)."""
    import struct

    row = (3 * width + 3) // 4 * 4
    size = _BMP_HDR + row * height
    file_hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, _BMP_HDR)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, row * height, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (row - 3 * width)
    return file_hdr + info_hdr + b"".join(r + pad for r in px_rows)


def _bmp_encode(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal 24bpp solid-color BMP (real, openable image bytes)."""
    px_row = bytes((rgb[2], rgb[1], rgb[0])) * width
    return _bmp_encode_rows(width, height, [px_row] * height)


def _bmp_decode(data: bytes) -> tuple[int, int, int, int, int]:
    """Parse BMP headers + pixel array: (width, height, mean_r, g, b).

    Executors parse this from an untrusted binary column, so every
    header field is validated BEFORE it sizes a loop or an index: a
    hostile width/height pair must cost O(header) to reject, never an
    unbounded pixel walk, a ZeroDivisionError, or an IndexError deep
    inside the scan (r8 adversarial gate, tests/test_round8.py)."""
    import struct

    if len(data) < _BMP_HDR:
        raise ValueError("truncated BMP header")
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    if width <= 0 or height <= 0:
        raise ValueError(f"non-positive dimensions {width}x{height}")
    row = (3 * width + 3) // 4 * 4
    if off < _BMP_HDR or off + row * height > len(data):
        raise ValueError("pixel array exceeds payload (truncated or oversized header)")
    tot_b = tot_g = tot_r = 0
    for y in range(height):
        base = off + y * row
        for x in range(width):
            i = base + 3 * x
            tot_b += data[i]
            tot_g += data[i + 1]
            tot_r += data[i + 2]
    n = width * height
    return width, height, tot_r // n, tot_g // n, tot_b // n


ENCODE_SCHEMA = "doc_id bigint, img binary"
DECODE_SCHEMA = "doc_id bigint, n_bytes int, width int, height int, mean_r int, mean_g int, mean_b int"


def encode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched image ENCODE: deterministic per-doc dimensions and
    color from the md5 payload bytes → real BMP binary."""
    for pdf in batches:
        imgs = [
            _bmp_encode(1 + p[0] % 16, 1 + p[1] % 16, (p[2], p[3], p[4]))
            for p in pdf["payload"]
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "img": imgs})


# Quarantine sentinel for malformed payloads: dimensions/means of -1
# keep the row (and its doc_id + byte count) in the output so hostile
# inputs are COUNTABLE downstream, instead of one bad file killing the
# whole executor task — the decode contract a 100 TB ingest needs.
_BMP_QUARANTINE = (-1, -1, -1, -1, -1)


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched image DECODE: parse the BMP binary into typed
    metadata + pixel statistics; malformed payloads become
    deterministic quarantine rows (never executor exceptions)."""
    for pdf in batches:
        decoded = []
        for img in pdf["img"]:
            try:
                decoded.append(_bmp_decode(img))
            except (ValueError, IndexError, TypeError):
                decoded.append(_BMP_QUARANTINE)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(img) for img in pdf["img"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "mean_r": [d[2] for d in decoded],
                "mean_g": [d[3] for d in decoded],
                "mean_b": [d[4] for d in decoded],
            }
        )


# The oracle never sees the binary: it recomputes what a correct
# encode→decode round trip MUST produce, arithmetically from the md5
# bytes (dimensions, solid color, and the exact padded BMP file size).
_DECODE_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(text), 1, 2)) AS INT) AS b0,
         CAST(concat('0x', substring(md5(text), 3, 2)) AS INT) AS b1,
         CAST(concat('0x', substring(md5(text), 5, 2)) AS INT) AS b2,
         CAST(concat('0x', substring(md5(text), 7, 2)) AS INT) AS b3,
         CAST(concat('0x', substring(md5(text), 9, 2)) AS INT) AS b4
  FROM documents
)
SELECT doc_id,
       CAST(54 + ((3 * (1 + b0 % 16) + 3) // 4) * 4 * (1 + b1 % 16) AS INT) AS n_bytes,
       1 + b0 % 16 AS width,
       1 + b1 % 16 AS height,
       b2 AS mean_r,
       b3 AS mean_g,
       b4 AS mean_b
FROM m
"""


@register("b_mm_decode_bmp", oracle=_DECODE_ORACLE, tags=("pipeline", "multimodal", "codec"))
def b_mm_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over binary columns: encode a deterministic
    BMP per document (vendored pure-python codec), ship the binary
    through Arrow, then parse headers + pixel array back into typed
    metadata. The oracle recomputes the expected decode output
    arithmetically, so a wrong header offset, row padding, or BGR/RGB
    swap in either codec half fails the hash."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    images = with_payload.mapInPandas(encode_image_batch, schema=ENCODE_SCHEMA)
    return images.mapInPandas(decode_image_batch, schema=DECODE_SCHEMA)


FRAME_STRIDE = 4
_VW, _VH = 2, 2  # tiny but real video frames (C444: W*H*3 bytes each)


def _y4m_encode(frames: list[bytes], w: int = _VW, h: int = _VH) -> bytes:
    """Minimal REAL YUV4MPEG2 container: stream header + FRAME-marked
    raw 4:4:4 planes (mplayer/ffmpeg-readable layout)."""
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()]
    for fr in frames:
        assert len(fr) == w * h * 3
        out.append(b"FRAME\n" + fr)
    return b"".join(out)


def _y4m_decode(data: bytes) -> tuple[int, int, list[bytes]]:
    """Parse the Y4M stream header + demux frames: (w, h, frames).

    Untrusted-input hardening (r8 adversarial gate): dimensions must
    be positive and small enough that one frame fits the payload, a
    short tail is a detected truncation (not a silently short frame),
    and every malformed shape raises ValueError in O(header) time."""
    nl = data.find(b"\n", 0, 512)
    if nl < 0:
        raise ValueError("missing or oversized Y4M header")
    header = data[:nl].decode("ascii", errors="replace")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    params = dict((tok[0], tok[1:]) for tok in header.split()[1:] if tok)
    try:
        w, h = int(params["W"]), int(params["H"])
    except (KeyError, ValueError) as e:
        raise ValueError(f"bad Y4M dimensions: {e}") from None
    if params.get("C", "420jpeg") != "444":
        raise ValueError("unsupported chroma subsampling")
    fsize = w * h * 3
    if w <= 0 or h <= 0 or fsize + 6 > len(data):
        raise ValueError(f"implausible dimensions {w}x{h} for {len(data)} bytes")
    frames, pos = [], nl + 1
    while pos < len(data):
        if data[pos : pos + 6] != b"FRAME\n":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos += 6
        if pos + fsize > len(data):
            raise ValueError("truncated frame")
        frames.append(data[pos : pos + fsize])
        pos += fsize
    return w, h, frames


def _fake_frames(payload: bytes) -> list[bytes]:
    """Deterministic per-doc frame content: frame k's bytes tile the
    md5 payload starting at offset k (the oracle recomputes this)."""
    n_frames = 8 + payload[2] % 56
    fsize = _VW * _VH * 3
    return [
        bytes(payload[(k + i) % 16] for i in range(fsize)) for k in range(n_frames)
    ]


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched video frame sampling: mux a REAL Y4M stream per
    doc, demux it back, keep every FRAME_STRIDE-th frame, and emit its
    mean luma — one-row-in → many-rows-out (flatMap shape). A mp4/webm
    demuxer would replace only the _y4m_* pair."""
    for pdf in batches:
        out_ids, out_idx, out_y = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, frames = _y4m_decode(_y4m_encode(_fake_frames(payload)))
            for i in range(0, len(frames), FRAME_STRIDE):
                luma = frames[i][: w * h]  # Y plane leads in planar layout
                out_ids.append(doc_id)
                out_idx.append(i)
                out_y.append(sum(luma) / (w * h))
        yield pd.DataFrame(
            {"doc_id": out_ids, "frame_idx": out_idx, "mean_y": out_y}
        )


# Recomputes frame count, sampled indices, and each sampled frame's
# mean luma (md5 bytes tiled from offset k) arithmetically — a demuxer
# framing or plane-layout bug fails the hash.
_FRAME_ORACLE = f"""
WITH m AS (
  SELECT doc_id, md5(text) AS h,
         8 + (CAST(concat('0x', substring(md5(text), 5, 2)) AS INT) % 56) AS n_frames
  FROM documents
),
sampled AS (
  SELECT doc_id, h, t.k AS frame_idx
  FROM m, UNNEST(range(n_frames)) AS t(k)
  WHERE t.k % {FRAME_STRIDE} = 0
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       (CAST(concat('0x', substring(h, 2 * ((frame_idx + 0) % 16) + 1, 2)) AS INT)
      + CAST(concat('0x', substring(h, 2 * ((frame_idx + 1) % 16) + 1, 2)) AS INT)
      + CAST(concat('0x', substring(h, 2 * ((frame_idx + 2) % 16) + 1, 2)) AS INT)
      + CAST(concat('0x', substring(h, 2 * ((frame_idx + 3) % 16) + 1, 2)) AS INT)) / 4.0 AS mean_y
FROM sampled
"""

FRAME_SCHEMA = "doc_id bigint, frame_idx int, mean_y double"


@register("b_mm_frame_sample", oracle=_FRAME_ORACLE, tags=("pipeline", "multimodal", "codec"))
def b_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container frame sampling: mux deterministic frames
    into a YUV4MPEG2 stream (vendored pure-python muxer), demux it
    back, and emit every FRAME_STRIDE-th frame's mean luma. The oracle
    recomputes the demuxer's expected output arithmetically from the
    payload bytes."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    return with_payload.mapInPandas(sample_frames_batch, schema=FRAME_SCHEMA)


# --- real audio codec: stdlib WAV (RIFF/PCM) -------------------------
#
# Encode: deterministic int16 PCM samples (md5 byte pairs, tiled) into
# a REAL mono 16-bit WAV via the stdlib `wave` module. Decode: `wave`
# parses the RIFF container back; per-window RMS energy is the
# feature. An FFT/mel frontend would replace only the energy line.

CHUNK_SCHEMA = "doc_id bigint, chunk_idx int, n_samples int, rms double"
CHUNK_SAMPLES = 16
_SR = 8000


def _pcm_samples(payload: bytes) -> list[int]:
    """Deterministic signed-int16 samples: md5 byte pairs, tiled to a
    payload-dependent even length (the oracle recomputes these)."""
    base = []
    for j in range(8):
        v = payload[2 * j] | (payload[2 * j + 1] << 8)
        base.append(v - 65536 if v >= 32768 else v)
    n = 32 + (payload[5] % 32) * 2
    return [base[i % 8] for i in range(n)]


def _wav_encode(samples: list[int]) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(_SR)
        w.writeframes(struct.pack("<" + "h" * len(samples), *samples))
    return buf.getvalue()


def _wav_decode(data: bytes) -> list[int]:
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getnchannels() != 1 or w.getsampwidth() != 2:
                raise ValueError("expected mono 16-bit PCM")
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        # stdlib wave raises its own error type on hostile RIFF
        # containers; normalize to ValueError so callers have ONE
        # malformed-payload signal (r8 adversarial gate).
        raise ValueError(f"bad RIFF/WAV container: {e}") from None
    return list(struct.unpack("<" + "h" * (len(raw) // 2), raw))


def audio_chunk_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched audio ENCODE→DECODE→feature pass: build a real WAV
    per doc, parse it back, window the PCM stream, emit per-window RMS.
    One-row-in → many-rows-out (flatMap shape)."""
    import math

    for pdf in batches:
        ids, idxs, sizes, energies = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = _wav_decode(_wav_encode(_pcm_samples(payload)))
            for i in range(0, len(samples), CHUNK_SAMPLES):
                chunk = samples[i : i + CHUNK_SAMPLES]
                ids.append(doc_id)
                idxs.append(i // CHUNK_SAMPLES)
                sizes.append(len(chunk))
                energies.append(
                    round(math.sqrt(sum(s * s for s in chunk) / len(chunk)), 6)
                )
        yield pd.DataFrame(
            {"doc_id": ids, "chunk_idx": idxs, "n_samples": sizes, "rms": energies}
        )


# Recomputes the samples (md5 byte pairs, little-endian int16, tiled)
# and windowed RMS arithmetically — a byte-order or framing bug in the
# WAV round trip fails the hash.
_AUDIO_ORACLE = f"""
WITH m AS (
  SELECT doc_id, md5(text) AS h,
         32 + (CAST(concat('0x', substring(md5(text), 11, 2)) AS INT) % 32) * 2 AS n
  FROM documents
),
samples AS (
  SELECT doc_id, i,
         CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
  FROM (
    SELECT doc_id, t.i,
           CAST(concat('0x',
                       substring(h, 4 * (t.i % 8) + 3, 2),
                       substring(h, 4 * (t.i % 8) + 1, 2)) AS INT) AS v
    FROM m, UNNEST(range(n)) AS t(i)
  )
)
SELECT doc_id,
       CAST(i // {CHUNK_SAMPLES} AS INT) AS chunk_idx,
       CAST(COUNT(*) AS INT) AS n_samples,
       ROUND(SQRT(SUM(CAST(s AS DOUBLE) * s) / COUNT(*)), 6) AS rms
FROM samples
GROUP BY doc_id, chunk_idx
"""


@register("b_mm_audio_chunks", oracle=_AUDIO_ORACLE, tags=("pipeline", "multimodal", "codec"))
def b_mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio pipeline over binary columns: deterministic PCM →
    stdlib-`wave` RIFF encode → parse back → fixed-window RMS features,
    all inside one Arrow-batched mapInPandas flatMap."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    return with_payload.mapInPandas(audio_chunk_batch, schema=CHUNK_SCHEMA)


# --- image resize (nearest-neighbor) ---------------------------------

RESIZE_W, RESIZE_H = 4, 4  # fixed thumbnail grid


def _bmp_encode_gradient(width: int, height: int, base: tuple[int, int, int]) -> bytes:
    """24bpp BMP whose channels are linear gradients of the pixel
    coordinate (x = column, y = file-row index):
    r=(r0+7x+13y)%256, g=(g0+11x+3y)%256, b=(b0+5x+17y)%256 — so a
    resample that picks the wrong source pixel changes the checksum."""
    r0, g0, b0 = base
    rows = [
        bytes(
            v
            for x in range(width)
            for v in (
                (b0 + 5 * x + 17 * y) % 256,
                (g0 + 11 * x + 3 * y) % 256,
                (r0 + 7 * x + 13 * y) % 256,
            )
        )
        for y in range(height)
    ]
    return _bmp_encode_rows(width, height, rows)


def _bmp_resize_nn(data: bytes, out_w: int = RESIZE_W, out_h: int = RESIZE_H):
    """Parse a 24bpp BMP and nearest-neighbor-resample it to
    (out_w, out_h): source pixel (dx·W//out_w, dy·H//out_h) for each
    destination cell. Returns (W, H, sum_r, sum_g, sum_b) over the
    resampled grid."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    width, height = struct.unpack_from("<ii", data, 18)
    row = (3 * width + 3) // 4 * 4
    sum_b = sum_g = sum_r = 0
    for dy in range(out_h):
        sy = dy * height // out_h
        for dx in range(out_w):
            sx = dx * width // out_w
            i = off + sy * row + 3 * sx
            sum_b += data[i]
            sum_g += data[i + 1]
            sum_r += data[i + 2]
    return width, height, sum_r, sum_g, sum_b


RESIZE_SCHEMA = "doc_id bigint, src_w int, src_h int, sum_r bigint, sum_g bigint, sum_b bigint"


def resize_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched encode → decode → nearest-neighbor resize: the
    full image-preprocessing hop a multimodal training pipeline runs
    (decode, resample to the model's input grid, re-featurize)."""
    for pdf in batches:
        rows = []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            img = _bmp_encode_gradient(4 + p[0] % 13, 4 + p[1] % 13, (p[2], p[3], p[4]))
            rows.append((int(doc_id), *_bmp_resize_nn(img)))
        yield pd.DataFrame(
            rows, columns=["doc_id", "src_w", "src_h", "sum_r", "sum_g", "sum_b"]
        )


# The oracle recomputes the resampled-grid channel sums arithmetically
# from the md5 bytes: wrong row padding, BGR/RGB swap, or an off-by-one
# in the nearest-neighbor index mapping all change the sums.
_RESIZE_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(text), 1, 2)) AS INT) AS b0,
         CAST(concat('0x', substring(md5(text), 3, 2)) AS INT) AS b1,
         CAST(concat('0x', substring(md5(text), 5, 2)) AS INT) AS b2,
         CAST(concat('0x', substring(md5(text), 7, 2)) AS INT) AS b3,
         CAST(concat('0x', substring(md5(text), 9, 2)) AS INT) AS b4
  FROM documents
),
dims AS (SELECT doc_id, 4 + b0 % 13 AS w, 4 + b1 % 13 AS h, b2, b3, b4 FROM m),
cells AS (
  SELECT doc_id, w, h, b2, b3, b4,
         dx.i * w // {RESIZE_W} AS sx, dy.i * h // {RESIZE_H} AS sy
  FROM dims, unnest(range(0, {RESIZE_W})) dx(i), unnest(range(0, {RESIZE_H})) dy(i)
)
SELECT doc_id, CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
       CAST(SUM((b2 + 7 * sx + 13 * sy) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((b3 + 11 * sx + 3 * sy) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((b4 + 5 * sx + 17 * sy) % 256) AS BIGINT) AS sum_b
FROM cells
GROUP BY doc_id, w, h
"""


@register("b_mm_image_resize", oracle=_RESIZE_ORACLE, tags=("pipeline", "multimodal", "codec"))
def b_mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize over binary columns: encode a deterministic
    gradient BMP per document, parse it back, nearest-neighbor
    resample to a fixed 4x4 grid, and emit integer channel checksums
    of the resampled pixels — one Arrow-batched mapInPandas hop, the
    same plumbing a JPEG + bilinear pipeline would use (only the two
    pure-python codec calls swap out)."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    return with_payload.mapInPandas(resize_image_batch, schema=RESIZE_SCHEMA)


# --- scene-cut detection over the video container --------------------
#
# C89: the shot-boundary primitive every video-curation pipeline runs
# before captioning/sampling: adjacent-frame luma delta above a
# threshold = a cut. Detection runs on EXACT integer luma sums
# (0..1020 for the 2x2 Y plane) so the decision — and therefore the
# hash — has no float tolerance anywhere.

SCENE_CUT_THRESHOLD = 200
SCENE_SCHEMA = "doc_id bigint, n_frames int, n_cuts int, first_cut int"


def scene_cut_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched shot-boundary detection: demux the REAL Y4M
    stream, walk adjacent frames' integer Y-plane sums, flag
    |Δ| ≥ threshold. One row out per doc (aggregate shape, unlike
    sample_frames_batch's flatMap shape)."""
    for pdf in batches:
        ids, nf, nc, fc = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, frames = _y4m_decode(_y4m_encode(_fake_frames(payload)))
            sums = [sum(f[: w * h]) for f in frames]
            cuts = [
                k
                for k in range(1, len(sums))
                if abs(sums[k] - sums[k - 1]) >= SCENE_CUT_THRESHOLD
            ]
            ids.append(doc_id)
            nf.append(len(frames))
            nc.append(len(cuts))
            fc.append(cuts[0] if cuts else -1)
        yield pd.DataFrame(
            {"doc_id": ids, "n_frames": nf, "n_cuts": nc, "first_cut": fc}
        )


_SCENE_ORACLE = f"""
WITH m AS (
  SELECT doc_id, md5(text) AS h,
         8 + (CAST(concat('0x', substring(md5(text), 5, 2)) AS INT) % 56) AS n_frames
  FROM documents
),
frames AS (
  SELECT doc_id, n_frames, t.k,
         (CAST(concat('0x', substring(h, 2 * ((t.k + 0) % 16) + 1, 2)) AS INT)
        + CAST(concat('0x', substring(h, 2 * ((t.k + 1) % 16) + 1, 2)) AS INT)
        + CAST(concat('0x', substring(h, 2 * ((t.k + 2) % 16) + 1, 2)) AS INT)
        + CAST(concat('0x', substring(h, 2 * ((t.k + 3) % 16) + 1, 2)) AS INT)) AS s
  FROM m, UNNEST(range(n_frames)) AS t(k)
),
deltas AS (
  SELECT doc_id, n_frames, k,
         ABS(s - LAG(s) OVER (PARTITION BY doc_id ORDER BY k)) AS d
  FROM frames
)
SELECT doc_id,
       CAST(MAX(n_frames) AS INT) AS n_frames,
       CAST(COUNT(*) FILTER (WHERE d >= {SCENE_CUT_THRESHOLD}) AS INT) AS n_cuts,
       CAST(COALESCE(MIN(k) FILTER (WHERE d >= {SCENE_CUT_THRESHOLD}), -1) AS INT) AS first_cut
FROM deltas
GROUP BY doc_id
"""


@register("b_mm_scene_cut", oracle=_SCENE_ORACLE, tags=("pipeline", "multimodal", "codec", "video"))
def b_mm_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C89: shot-boundary (scene-cut) detection over binary video
    columns — Y4M demux → adjacent-frame integer luma deltas →
    per-doc cut census. The oracle recomputes every frame sum and
    delta arithmetically from the payload bytes; a framing,
    plane-layout, or off-by-one-frame bug fails the hash."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    return with_payload.mapInPandas(scene_cut_batch, schema=SCENE_SCHEMA)


# --- real image codec #2: pure-python PNG (C195) -----------------------
#
# Vendored from the public PNG spec (RFC 2083 / ISO 15948): 8-byte
# signature, length-type-data-CRC chunks, IHDR geometry, zlib IDAT,
# and the five scanline filters.  stdlib zlib supplies inflate and
# crc32 — no image library needed.  The encoder writes filter-0
# truecolor scanlines; the DECODER implements all five filters (the
# adversarial gate feeds it shapes the encoder never emits).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_MAX_DIM = 4096  # refuse absurd IHDR geometry before allocating


def _png_encode(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal truecolor (color type 2, 8-bit) PNG: IHDR + one zlib
    IDAT of filter-0 scanlines + IEND.  Real, viewer-openable bytes."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = (b"\x00" + bytes(rgb) * width) * height  # filter 0 per scanline
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse the five PNG scanline filters (None/Sub/Up/Average/
    Paeth) into raw RGB bytes.  Raises ValueError on any malformed
    shape — never IndexErrors its way through hostile input."""
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size does not match geometry")
    out = bytearray(stride * height)
    prev_off = -stride
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        off = y * stride
        if ftype == 0:
            out[off : off + stride] = line
        elif ftype == 1:  # Sub
            for i, b in enumerate(line):
                left = out[off + i - bpp] if i >= bpp else 0
                out[off + i] = (b + left) & 0xFF
        elif ftype == 2:  # Up
            for i, b in enumerate(line):
                up = out[prev_off + off + i] if y > 0 else 0
                out[off + i] = (b + up) & 0xFF
        elif ftype == 3:  # Average
            for i, b in enumerate(line):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[prev_off + off + i] if y > 0 else 0
                out[off + i] = (b + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i, b in enumerate(line):
                a = out[off + i - bpp] if i >= bpp else 0
                c_up = out[prev_off + off + i] if y > 0 else 0
                c_ul = out[prev_off + off + i - bpp] if (y > 0 and i >= bpp) else 0
                p = a + c_up - c_ul
                pa, pb, pc = abs(p - a), abs(p - c_up), abs(p - c_ul)
                pred = a if (pa <= pb and pa <= pc) else (c_up if pb <= pc else c_ul)
                out[off + i] = (b + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def _png_decode(data: bytes) -> tuple[int, int, int, int]:
    """Parse + CRC-verify the chunk stream, inflate IDAT, unfilter,
    and return (width, height plus mean r,g,b folded below).  Returns
    (w, h, mean_r, mean_g, mean_b) for 8-bit truecolor; raises
    ValueError on any malformed input in O(input) time."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if pos + 12 + ln > len(data):
            raise ValueError("truncated chunk")
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + ln
    if ihdr is None or not seen_end:
        raise ValueError("missing IHDR or IEND")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if not (0 < w <= _PNG_MAX_DIM and 0 < h <= _PNG_MAX_DIM):
        raise ValueError("refused IHDR geometry")
    if (depth, ctype_n, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError("unsupported PNG variant")
    # inflate with an output cap: a zlib bomb cannot oversize-allocate
    cap = (3 * w + 1) * h
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), cap)
    if d.decompress(b"", 1):
        raise ValueError("IDAT inflates past the declared geometry")
    px = _png_unfilter(raw, w, h, 3)
    n = w * h
    return (
        w,
        h,
        sum(px[0::3]) // n,
        sum(px[1::3]) // n,
        sum(px[2::3]) // n,
    )


_PNG_QUARANTINE = (-1, -1, -1, -1, -1)

_PNG_SCHEMA = (
    "doc_id long, width int, height int, mean_r int, mean_g int, mean_b int, crc_ok boolean"
)


def _png_roundtrip_batch(batches):
    """Arrow-batched PNG encode→decode round trip (same shape as the
    BMP pipeline: encode from md5 bytes, decode the real binary,
    quarantine malformed payloads as -1 rows)."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            w, h = 1 + p[0] % 16, 1 + p[1] % 16
            img = _png_encode(w, h, (p[2], p[3], p[4]))
            try:
                dec = _png_decode(img)
                rows.append((int(doc_id), *dec, True))
            except ValueError:
                rows.append((int(doc_id), *_PNG_QUARANTINE, False))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "crc_ok"],
        )


_PNG_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(text), 1, 2)) AS INT) AS b0,
         CAST(concat('0x', substring(md5(text), 3, 2)) AS INT) AS b1,
         CAST(concat('0x', substring(md5(text), 5, 2)) AS INT) AS b2,
         CAST(concat('0x', substring(md5(text), 7, 2)) AS INT) AS b3,
         CAST(concat('0x', substring(md5(text), 9, 2)) AS INT) AS b4
  FROM documents
)
SELECT doc_id,
       1 + b0 % 16 AS width,
       1 + b1 % 16 AS height,
       b2 AS mean_r, b3 AS mean_g, b4 AS mean_b,
       TRUE AS crc_ok
FROM m
"""


@register("b_mm_decode_png", oracle=_PNG_ORACLE, tags=("pipeline", "multimodal", "codec"))
def b_mm_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C195: REAL PNG decode over binary columns — chunk walk with
    CRC-32 verification, capped zlib inflate, and all five scanline
    filters (the BMP twin b_mm_decode_bmp covers uncompressed
    containers; PNG adds the checksum + compression layers a real
    ingest meets).  The oracle predicts the decode output
    arithmetically from the md5 bytes, so a wrong filter
    reconstruction, CRC scope (type+data, not data), or geometry
    check fails the hash.

    Scale shape: pure mapInPandas — no shuffle; per-row work is
    bounded by the decoded geometry (and hostile geometry is refused
    BEFORE allocation, the adversarial-gate contract)."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    return with_payload.mapInPandas(_png_roundtrip_batch, schema=_PNG_SCHEMA)


# --- Perceptual image hash (average hash) + collision groups (C218) -------------

# The standard cheap image near-dup detector: threshold each pixel
# against the image mean, pack the bits.  The existing BMP keys use
# solid-color images (degenerate for a perceptual hash — every bit
# ties), so this key encodes a GRADIENT image: 5x3 grayscale whose
# pixel(x, y) is md5-payload byte [y*5 + x].  5 wide is deliberate:
# 15 bytes/row forces 1 pad byte per BMP row, and 3 rows force the
# bottom-up row flip — the two classic BMP decode bugs — so a decoder
# that mishandles either scrambles the pixel order and the hash.
# Strict-above-EXACT-mean thresholding (15*p > sum) keeps the bit
# rule pure-integer in decoder and oracle alike.
_AHASH_W, _AHASH_H = 5, 3
_AHASH_SCHEMA = "doc_id bigint, width int, height int, ahash bigint"


def _gradient_encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched gradient-image ENCODE: 15 md5 payload bytes become
    a 5x3 grayscale BMP (top row first in image space; the file stores
    rows bottom-up per the BMP spec, which this writer honors)."""
    for pdf in batches:
        imgs = []
        for p in pdf["payload"]:
            rows_topdown = [
                b"".join(
                    bytes((p[y * _AHASH_W + x],) * 3) for x in range(_AHASH_W)
                )
                for y in range(_AHASH_H)
            ]
            imgs.append(
                _bmp_encode_rows(_AHASH_W, _AHASH_H, list(reversed(rows_topdown)))
            )
        yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "img": imgs})


def _ahash_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched average-hash: parse the BMP (header offsets, row
    padding, bottom-up order), grayscale each pixel, set bit i of the
    hash iff pixel_i is strictly above the exact image mean
    (n*p > sum).  Malformed payloads quarantine as ahash = -1."""
    import struct

    for pdf in batches:
        out_w, out_h, out_hash = [], [], []
        for img in pdf["img"]:
            try:
                if img[:2] != b"BM":
                    raise ValueError("not a BMP")
                off = struct.unpack_from("<I", img, 10)[0]
                w, h = struct.unpack_from("<ii", img, 18)
                if w <= 0 or h <= 0 or w * h > 1 << 20:
                    raise ValueError("bad dimensions")
                row = (3 * w + 3) // 4 * 4
                if off + row * h > len(img):
                    raise ValueError("truncated pixel array")
                px = []
                for y in range(h):  # image top row = last stored row
                    base = off + (h - 1 - y) * row
                    for x in range(w):
                        b, g, r = img[base + 3 * x : base + 3 * x + 3]
                        px.append((r + g + b) // 3)
                n, s = len(px), sum(px)
                ah = 0
                for i, p in enumerate(px):
                    if n * p > s:
                        ah |= 1 << i
                out_w.append(w)
                out_h.append(h)
                out_hash.append(ah)
            except (ValueError, IndexError, TypeError, struct.error):
                out_w.append(-1)
                out_h.append(-1)
                out_hash.append(-1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": pd.Series(out_w, dtype="int32"),
                "height": pd.Series(out_h, dtype="int32"),
                "ahash": pd.Series(out_hash, dtype="int64"),
            }
        )


# Oracle never sees the binary: it predicts the 15-bit hash straight
# from the md5 hex (pixel i = byte i, bit iff 15*p > sum of bytes).
_AHASH_ORACLE = """
WITH m AS (SELECT doc_id, md5(text) AS hx FROM documents),
px AS (
  SELECT doc_id, i,
         CAST(concat('0x', substring(hx, 2 * i + 1, 2)) AS INT) AS p
  FROM m, unnest(range(0, 15)) AS t(i)
),
agg AS (SELECT doc_id, SUM(p) AS sp FROM px GROUP BY doc_id),
hashes AS (
  SELECT px.doc_id,
         CAST(SUM(CASE WHEN 15 * p > sp THEN CAST(1 AS BIGINT) << i
                       ELSE 0 END) AS BIGINT) AS ahash
  FROM px JOIN agg ON px.doc_id = agg.doc_id
  GROUP BY px.doc_id
)
SELECT doc_id, CAST(5 AS INT) AS width, CAST(3 AS INT) AS height, ahash,
       CAST(COUNT(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_same
FROM hashes
"""


@register("b_mm_image_ahash", oracle=_AHASH_ORACLE, tags=("pipeline", "multimodal", "ahash"))
def b_mm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C218: perceptual image dedup via average hash — encode a REAL
    gradient BMP per document (15 payload bytes as a 5x3 grayscale
    image; the width forces row padding and the height forces the
    bottom-up flip), decode it back, threshold each pixel against the
    exact image mean (15*p > sum — pure integers), pack 15 bits, and
    count hash collisions (the near-dup candidate groups).  The
    oracle predicts every bit arithmetically from the md5 hex, so a
    padding, BGR, or row-order bug in either codec half flips bits
    and fails the hash.

    Scale shape: encode and hash are Arrow-batched map-only passes;
    the only shuffle is the 15-bit-hash collision count — at 100 TB
    the 2-byte hash column shuffles, never the images (the
    b_llm_dedup_exact discipline applied to pixels)."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    images = with_payload.mapInPandas(_gradient_encode_batch, schema=ENCODE_SCHEMA)
    hashes = images.mapInPandas(_ahash_decode_batch, schema=_AHASH_SCHEMA)
    from pyspark.sql import Window

    return hashes.select(
        "doc_id",
        "width",
        "height",
        "ahash",
        F.count("*").over(Window.partitionBy("ahash")).cast("bigint").alias("n_same"),
    )


# --- Audio silence trim (C236) ------------------------------------------------------------

# Endpoint detection, the first stage of every speech pipeline: trim
# leading/trailing samples whose |amplitude| is below the gate
# (8192 = 25% full scale) and report what survived.  Runs through the
# REAL WAV round trip (encode → stdlib-wave parse → trim), so a
# byte-order or framing bug shifts the kept window and fails the
# hash; the oracle recomputes the expected endpoints from the md5
# byte-pair samples arithmetically.
_TRIM_GATE = 8192
_TRIM_SCHEMA = (
    "doc_id bigint, n_samples int, first_keep int, last_keep int, n_kept int"
)


def _audio_trim_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "n_samples", "first_keep", "last_keep", "n_kept")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = _wav_decode(_wav_encode(_pcm_samples(payload)))
            keep = [i for i, s in enumerate(samples) if abs(s) >= _TRIM_GATE]
            out["doc_id"].append(doc_id)
            out["n_samples"].append(len(samples))
            out["first_keep"].append(keep[0] if keep else -1)
            out["last_keep"].append(keep[-1] if keep else -1)
            out["n_kept"].append(keep[-1] - keep[0] + 1 if keep else 0)
        yield pd.DataFrame(out).astype(
            {"n_samples": "int32", "first_keep": "int32",
             "last_keep": "int32", "n_kept": "int32"}
        )


_TRIM_ORACLE = f"""
WITH m AS (
  SELECT doc_id, md5(text) AS h,
         32 + (CAST(concat('0x', substring(md5(text), 11, 2)) AS INT) % 32) * 2 AS n
  FROM documents
),
samples AS (
  SELECT doc_id, n, i,
         CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
  FROM (
    SELECT doc_id, n, t.i,
           CAST(concat('0x',
                       substring(h, 4 * (t.i % 8) + 3, 2),
                       substring(h, 4 * (t.i % 8) + 1, 2)) AS INT) AS v
    FROM m, UNNEST(range(n)) AS t(i)
  )
)
SELECT doc_id,
       CAST(MAX(n) AS INT) AS n_samples,
       CAST(COALESCE(MIN(CASE WHEN abs(s) >= {_TRIM_GATE} THEN i END), -1) AS INT)
           AS first_keep,
       CAST(COALESCE(MAX(CASE WHEN abs(s) >= {_TRIM_GATE} THEN i END), -1) AS INT)
           AS last_keep,
       CAST(COALESCE(MAX(CASE WHEN abs(s) >= {_TRIM_GATE} THEN i END)
                     - MIN(CASE WHEN abs(s) >= {_TRIM_GATE} THEN i END) + 1, 0) AS INT)
           AS n_kept
FROM samples GROUP BY doc_id
"""


@register("b_mm_audio_trim", oracle=_TRIM_ORACLE, tags=("pipeline", "multimodal", "audio"))
def b_mm_audio_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C236: audio endpoint detection — trim leading/trailing samples
    below the 25%-full-scale gate after a REAL WAV round trip
    (deterministic PCM → stdlib-wave RIFF → parse → trim), report the
    kept window per document.  A framing or byte-order bug in either
    codec half shifts the endpoints and fails the hash; the oracle
    predicts them arithmetically from the md5 byte pairs.

    Scale shape: Arrow-batched map-only (the b_mm_audio_chunks
    plumbing with a different feature head); no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    return with_payload.mapInPandas(_audio_trim_batch, schema=_TRIM_SCHEMA)


# --- Binary format sniffer over a mixed lake (C239) -----------------------------------------

# Ingest classification: a real multimodal lake lands MIXED binaries
# and the first pipeline stage sniffs magic bytes to route them.
# Each doc gets a REAL container chosen by doc_id % 4 (BMP / WAV /
# Y4M / raw bytes) built by the vendored codecs; the sniff itself is
# ENGINE-NATIVE (substring+hex on the binary column — no Python in
# the classify path), and the oracle predicts both the routing and
# the exact container sizes arithmetically (BMP 54+rowpad·h,
# WAV 44+2n, Y4M 35+18/frame).
_SNIFF_SCHEMA = "doc_id bigint, blob binary"


def _mixed_encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        blobs = []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            k = doc_id % 4
            if k == 0:
                blobs.append(_bmp_encode(1 + p[0] % 16, 1 + p[1] % 16, (p[2], p[3], p[4])))
            elif k == 1:
                blobs.append(_wav_encode(_pcm_samples(p)))
            elif k == 2:
                blobs.append(_y4m_encode([bytes(p[0:12]), bytes(p[4:16])]))
            else:
                blobs.append(bytes(p))
        yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "blob": blobs})


_SNIFF_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(text), 1, 2)) AS INT) AS b0,
         CAST(concat('0x', substring(md5(text), 3, 2)) AS INT) AS b1,
         CAST(concat('0x', substring(md5(text), 11, 2)) AS INT) AS b5
  FROM documents
),
sized AS (
  SELECT doc_id,
         CASE doc_id % 4 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav'
                         WHEN 2 THEN 'y4m' ELSE 'unknown' END AS kind,
         CASE doc_id % 4
           WHEN 0 THEN 54 + ((3 * (1 + b0 % 16) + 3) // 4) * 4 * (1 + b1 % 16)
           WHEN 1 THEN 44 + 2 * (32 + (b5 % 32) * 2)
           WHEN 2 THEN 71
           ELSE 16 END AS n_bytes
  FROM m
)
SELECT kind, COUNT(*) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
FROM sized GROUP BY kind ORDER BY kind
"""


@register("b_mm_format_sniffer", oracle=_SNIFF_ORACLE, tags=("pipeline", "multimodal", "sniffer"))
def b_mm_format_sniffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C239: binary format sniffer — route a MIXED binary lake (real
    BMP/WAV/Y4M containers + raw bytes, one per doc by doc_id % 4) by
    magic bytes.  The classify path is engine-native column
    expressions over the binary (substring→hex compare: 'BM', 'RIFF',
    'YUV4MPEG2'), so at 100 TB the routing is a map-only JVM pass —
    Python appears only in the encode fixture.  The oracle predicts
    routing AND exact container sizes from the md5 arithmetic, so a
    header-size or magic drift in any vendored codec fails the hash.

    Scale shape: Arrow encode pass, JVM-native sniff, 4-row rollup
    with map-side partials."""
    d = load_table(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.unhex(F.md5("text")).alias("payload")).mapInPandas(
        _mixed_encode_batch, schema=_SNIFF_SCHEMA
    )
    magic2 = F.hex(F.substring(F.col("blob"), 1, 2))
    magic4 = F.hex(F.substring(F.col("blob"), 1, 4))
    magic9 = F.hex(F.substring(F.col("blob"), 1, 9))
    kind = (
        F.when(magic2 == F.lit("424D"), "bmp")
        .when(magic4 == F.lit("52494646"), "wav")
        .when(magic9 == F.lit("595556344D50454732"), "y4m")
        .otherwise("unknown")
    )
    return (
        blobs.select(kind.alias("kind"), F.length("blob").alias("n_bytes"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.min("n_bytes").cast("bigint").alias("min_bytes"),
            F.max("n_bytes").cast("bigint").alias("max_bytes"),
        )
    )


# --- Audio resample: box-filtered 2:1 downsample (C262) ----------------------

# The brief's multimodal list names resample as a first-class op; this
# is the exact-integer form of it: after the REAL WAV round trip, each
# output sample is the SUM of an adjacent input pair (a 2-tap box
# filter at ratio 2:1 — the anti-aliased decimation kernel, kept as
# the undivided pair sum so both engines' integer arithmetic is
# trivially identical; dividing by 2 would need a floor-vs-trunc
# convention on negative sums).  A trailing odd sample is dropped —
# n_out = n_in div 2 by contract.  The checksum is ORDER-WEIGHTED
# (Σ (i+1)·out[i]) so a one-sample framing shift from a codec bug
# fails the hash, not just a reordering.  The oracle predicts
# everything arithmetically from the md5 byte pairs, exactly like
# the trim key.
_RESAMPLE_SCHEMA = (
    "doc_id bigint, n_in int, n_out int, "
    "checksum bigint, out_min int, out_max int"
)


def _audio_resample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "n_in", "n_out", "checksum", "out_min", "out_max")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = _wav_decode(_wav_encode(_pcm_samples(payload)))
            pairs = [
                samples[2 * i] + samples[2 * i + 1]
                for i in range(len(samples) // 2)
            ]
            out["doc_id"].append(doc_id)
            out["n_in"].append(len(samples))
            out["n_out"].append(len(pairs))
            out["checksum"].append(sum((i + 1) * v for i, v in enumerate(pairs)))
            out["out_min"].append(min(pairs))
            out["out_max"].append(max(pairs))
        yield pd.DataFrame(out).astype(
            {"n_in": "int32", "n_out": "int32", "checksum": "int64",
             "out_min": "int32", "out_max": "int32"}
        )


_RESAMPLE_ORACLE = """
WITH m AS (
  SELECT doc_id, md5(text) AS h,
         32 + (CAST(concat('0x', substring(md5(text), 11, 2)) AS INT) % 32) * 2 AS n
  FROM documents
),
samples AS (
  SELECT doc_id, n, i,
         CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
  FROM (
    SELECT doc_id, n, t.i,
           CAST(concat('0x',
                       substring(h, 4 * (t.i % 8) + 3, 2),
                       substring(h, 4 * (t.i % 8) + 1, 2)) AS INT) AS v
    FROM m, UNNEST(range(n)) AS t(i)
  )
),
pairs AS (
  SELECT a.doc_id, a.n, a.i // 2 AS j, a.s + b.s AS o
  FROM samples a JOIN samples b
    ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE a.i % 2 = 0
)
SELECT doc_id,
       CAST(MAX(n) AS INT) AS n_in,
       CAST(COUNT(*) AS INT) AS n_out,
       CAST(SUM((j + 1) * o) AS BIGINT) AS checksum,
       CAST(MIN(o) AS INT) AS out_min,
       CAST(MAX(o) AS INT) AS out_max
FROM pairs GROUP BY doc_id
"""


@register(
    "b_mm_audio_resample",
    oracle=_RESAMPLE_ORACLE,
    tags=("pipeline", "multimodal", "audio"),
)
def b_mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C262: box-filtered 2:1 audio downsample after a REAL WAV round
    trip — see the block comment above.  Scale shape: Arrow-batched
    map-only (the b_mm_audio_trim plumbing with a resample head); no
    shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    return with_payload.mapInPandas(_audio_resample_batch, schema=_RESAMPLE_SCHEMA)
