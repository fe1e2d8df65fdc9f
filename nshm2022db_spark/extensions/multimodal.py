"""Multimodal column plumbing: opaque binary media + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
two ways (per the build contract):
  * ``decode_image_real`` raises NotImplementedError behind an import-try
    of PIL — the real hook, clearly marked;
  * the registered queries use a DETERMINISTIC FAKE decode so the whole
    Spark-side pipeline — binary column schema, Arrow batch transfer
    through mapInPandas, per-type metadata struct, partitioning — is real
    and oracle-checked end-to-end.

Media rows are synthesized from documents (text → utf-8 bytes) so every
scale factor has a binary corpus without touching /root/testdata.

Scale notes: mapInPandas streams Arrow batches — no per-row pickling; at
100 TB the decode stage is map-only (no shuffle) and binary columns stay
off the driver. Frame sampling is pure column math (codegen, no Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nshm2022db_spark.registry import register
from nshm2022db_spark.sources import read_table

try:  # the real decoder hook — absent in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_image_real(data: bytes) -> tuple[int, int, str]:
    """Real image decode (width, height, format). STUB: PIL is not in the
    runtime image; the Spark-side plumbing around it is exercised with the
    deterministic fake below."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL, which is not available in this "
            "container; use the deterministic fake decode path"
        )
    raise NotImplementedError("wire PIL here when the codec image is available")


def media_table(spark: SparkSession, sf: str) -> DataFrame:
    """documents → (media_id, media binary, media_type) with a cycling
    fake modality. Binary stays opaque until the decode stage."""
    return read_table(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


_DECODE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, header_byte int, "
    "width int, height int, n_frames int, duration_s double"
)


def _fake_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decode over Arrow batches. Formulas are pure
    functions of the byte payload so the DuckDB oracle can mirror them."""
    for pdf in batches:
        n_bytes = pdf["media"].map(len)
        header = pdf["media"].map(lambda b: b[0] if len(b) else 0)
        out = pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n_bytes,
                "header_byte": header,
                "width": (64 + n_bytes % 1024).astype("int32"),
                "height": (64 + (header * 7) % 512).astype("int32"),
                "n_frames": (n_bytes // 256 + 1).astype("int32"),
                # no rounding here: pandas .round is half-even, Spark/DuckDB
                # ROUND is half-up — the query rounds JVM-side after the UDF
                "duration_s": n_bytes / 16000.0,
            }
        )
        yield out


@register(
    "multimodal_decode_meta",
    """SELECT doc_id AS media_id,
              CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
                  AS media_type,
              octet_length(encode(text)) AS n_bytes,
              ord(substr(text, 1, 1)) AS header_byte,
              (64 + octet_length(encode(text)) % 1024)::INTEGER AS width,
              (64 + (ord(substr(text, 1, 1)) * 7) % 512)::INTEGER AS height,
              (octet_length(encode(text)) // 256 + 1)::INTEGER AS n_frames,
              ROUND(octet_length(encode(text)) / 16000.0, 6) AS duration_s
       FROM documents""",
)
def multimodal_decode_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Binary decode / feature-extract stage: media table → mapInPandas
    (Arrow-batched) → typed metadata. The decode itself is the
    deterministic fake; the batch shape, schema, and binary transfer are
    the real thing."""
    decoded = media_table(spark, sf).mapInPandas(_fake_decode_batches, _DECODE_SCHEMA)
    return decoded.withColumn("duration_s", F.round(F.col("duration_s"), 6))


@register(
    "multimodal_frame_sample",
    """SELECT doc_id AS media_id,
              array_to_string(list_transform(range(1, length(text) + 1, 16),
                                             i -> ord(substr(text, i, 1))::VARCHAR), '-')
                  AS frame_sig,
              len(range(1, length(text) + 1, 16)) AS n_samples
       FROM documents""",
)
def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling: every 16th byte of the payload as a signature —
    pure column math (no Python), the shape of a stride-decimation pass
    over video bytes."""
    return read_table(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.expr(
            "concat_ws('-', transform(sequence(1, length(text), 16), "
            "i -> CAST(ascii(substr(text, i, 1)) AS STRING)))"
        ).alias("frame_sig"),
        F.expr("size(sequence(1, length(text), 16))").cast("long").alias("n_samples"),
    )


SAMPLE_RATE = 16_000  # fake PCM16 mono
CHUNK_S, HOP_S = 1, 1  # 1-second tumbling chunks (whisper-style windows)


@register(
    "multimodal_audio_chunks",
    f"""WITH audio AS (
            SELECT doc_id AS media_id,
                   octet_length(encode(text)) // 2 AS n_samples
            FROM documents WHERE doc_id % 3 = 1),
        chunks AS (
            SELECT media_id, n_samples,
                   unnest(range(0, greatest((n_samples + {SAMPLE_RATE * CHUNK_S} - 1)
                                            // {SAMPLE_RATE * CHUNK_S}, 1))) AS chunk_idx
            FROM audio)
        SELECT media_id,
               CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(chunk_idx * {SAMPLE_RATE * HOP_S} AS BIGINT) AS start_sample,
               CAST(least((chunk_idx + 1) * {SAMPLE_RATE * CHUNK_S}, n_samples)
                    AS BIGINT) AS end_sample,
               ROUND((least((chunk_idx + 1) * {SAMPLE_RATE * CHUNK_S}, n_samples)
                      - chunk_idx * {SAMPLE_RATE * HOP_S}) / {SAMPLE_RATE}.0, 6)
                   AS chunk_s
        FROM chunks""",
)
def multimodal_audio_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Audio chunking: split each (fake PCM16) audio payload into
    1-second sample windows — the segmentation step every ASR/audio-
    embedding pipeline runs before batching clips through a model. The
    byte payload is treated as 16-bit mono at 16 kHz, so sample count is
    pure integer math on octet_length; chunk boundaries come from a
    sequence+explode INSIDE the scan stage (map-only, no shuffle, no
    Python), and every clip gets at least one chunk (short-clip guard).
    The real decoder would replace the length arithmetic with a codec
    call inside the same mapInPandas hook multimodal_decode_meta uses;
    the chunk bookkeeping — the Spark-side plumbing — is identical."""
    n_chunks = f"greatest((n_samples + {SAMPLE_RATE * CHUNK_S - 1}) div {SAMPLE_RATE * CHUNK_S}, 1)"
    audio = (
        read_table(spark, sf, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select(
            F.col("doc_id").alias("media_id"),
            F.expr("octet_length(encode(text, 'utf-8')) div 2").alias("n_samples"),
        )
    )
    chunks = audio.select(
        "media_id",
        "n_samples",
        F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias("chunk_idx"),
    )
    end = F.least(
        (F.col("chunk_idx") + 1) * SAMPLE_RATE * CHUNK_S, F.col("n_samples")
    )
    start = F.col("chunk_idx") * SAMPLE_RATE * HOP_S
    return chunks.select(
        "media_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_sample"),
        end.cast("long").alias("end_sample"),
        F.round((end - start) / float(SAMPLE_RATE), 6).alias("chunk_s"),
    )
