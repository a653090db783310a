"""Multimodal column operators (SURVEY.md §2 B55 + binary plumbing).

Model: image/audio/video payloads are opaque `binary` columns with
typed metadata travelling alongside. The decode step is STUBBED (the
container has no image/audio libs — see ``decode_image_batch``), but
the Spark-side plumbing is real and tested: schema, Arrow batch shape
through ``mapInPandas``, partitioning, and the metadata join.
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


DECODE_SCHEMA = "doc_id bigint, n_bytes int, width int, height int, fake_decode boolean"


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'image decode' over binary payloads.

    Real decode is stubbed: the container ships no image libraries, so
    a deterministic fake derives dimensions from the payload bytes.
    Swapping in a real decoder (PIL/libvips) changes ONLY the body of
    ``_decode_one`` — batch shape, schema, and partitioning all hold.
    """

    def _decode_one(payload: bytes) -> tuple[int, int, bool]:
        try:
            raise NotImplementedError("no image codec in this environment")
        except NotImplementedError:
            # deterministic fake: dimensions from the first two bytes
            return 16 * (1 + payload[0] % 64), 16 * (1 + payload[1] % 64), True

    for pdf in batches:
        decoded = [_decode_one(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "fake_decode": [d[2] for d in decoded],
            }
        )


@register("b_mm_decode_stub", oracle=None, tags=("pipeline", "multimodal", "stub"))
def b_mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pipeline over binary payloads via
    mapInPandas (stubbed codec, real plumbing; rows-only check)."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    return with_payload.mapInPandas(decode_image_batch, schema=DECODE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_crc bigint"
FRAME_STRIDE = 4


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'video frame sampling': emit every FRAME_STRIDE-th
    frame index. Frame decode is stubbed (deterministic frame count and
    checksum derived from payload bytes); a real implementation swaps
    the two marked lines for a container demuxer, keeping the
    one-row-in → many-rows-out batch shape that makes this a flatMap,
    not a map."""
    import zlib

    for pdf in batches:
        out_ids, out_idx, out_crc = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = 8 + payload[2] % 56  # stub: demuxer frame count
            for i in range(0, n_frames, FRAME_STRIDE):
                out_ids.append(doc_id)
                out_idx.append(i)
                out_crc.append(zlib.crc32(payload + i.to_bytes(4, "big")))  # stub: frame bytes
        yield pd.DataFrame(
            {"doc_id": out_ids, "frame_idx": out_idx, "frame_crc": out_crc}
        )


@register("b_mm_frame_sample", oracle=None, tags=("pipeline", "multimodal", "stub"))
def b_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-Nth-frame sampling over binary 'video' payloads via
    mapInPandas (stubbed demuxer, real flatMap plumbing; rows-only)."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    return with_payload.mapInPandas(sample_frames_batch, schema=FRAME_SCHEMA)


CHUNK_SCHEMA = "doc_id bigint, chunk_idx int, n_bytes int, energy double"
CHUNK_BYTES = 4


def audio_chunk_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'audio feature extraction': split each binary
    payload into fixed-size chunks (stand-in for PCM windows) and emit
    per-chunk mean byte energy. A real implementation swaps the energy
    line for an FFT/mel filterbank over decoded samples; the chunking,
    schema, and flatMap batch shape are the production plumbing."""
    for pdf in batches:
        ids, idxs, sizes, energies = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for i in range(0, len(payload), CHUNK_BYTES):
                chunk = payload[i : i + CHUNK_BYTES]
                ids.append(doc_id)
                idxs.append(i // CHUNK_BYTES)
                sizes.append(len(chunk))
                energies.append(sum(chunk) / len(chunk))  # stub: feature
        yield pd.DataFrame(
            {"doc_id": ids, "chunk_idx": idxs, "n_bytes": sizes, "energy": energies}
        )


@register("b_mm_audio_chunks", oracle=None, tags=("pipeline", "multimodal", "stub"))
def b_mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking + per-chunk features over binary 'audio'
    payloads via mapInPandas (stubbed DSP, real plumbing; rows-only)."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    return with_payload.mapInPandas(audio_chunk_batch, schema=CHUNK_SCHEMA)
