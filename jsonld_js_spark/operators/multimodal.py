"""Multimodal-column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, decoded/feature-extracted inside
Arrow-batched mapInPandas.

The container has no image/audio libraries, so the actual
decode step is STUBBED (`_try_real_decode` raises NotImplementedError
and the pipeline falls back to a deterministic header-parse fake) —
but everything Spark-side is real and tested: the binary column
synthesis, the BinaryType schema, Arrow transfer of bytes into pandas,
batch-shaped decode UDF, and the partitioning story (payloads stay in
the executor; only small typed metadata rows shuffle).

The synthetic payload is header(4B magic) + md5(text) + md5(text||'2')
(36 bytes), so the DuckDB oracle can re-derive every extracted value
from hex strings without any binary support.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

MAGICS = {0: ("89504E47", "image/png"), 1: ("FFD8FFE0", "image/jpeg"),
          2: ("52494646", "audio/wav")}


def media_df(spark, sf_dir):
    """documents → (doc_id, payload binary, declared_type): the opaque
    multimodal column, synthesized deterministically."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    magic = (F.when(F.col("doc_id") % 3 == 0, MAGICS[0][0])
             .when(F.col("doc_id") % 3 == 1, MAGICS[1][0])
             .otherwise(MAGICS[2][0]))
    declared = (F.when(F.col("doc_id") % 3 == 0, MAGICS[0][1])
                .when(F.col("doc_id") % 3 == 1, MAGICS[1][1])
                .otherwise(MAGICS[2][1]))
    payload_hex = F.concat(magic, F.md5("text"),
                           F.md5(F.concat("text", F.lit("2"))))
    return d.select("doc_id", F.unhex(payload_hex).alias("payload"),
                    declared.alias("declared_type"))


DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("magic_hex", StringType()),
    StructField("media_type", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("checksum", LongType()),
])

_MAGIC_TO_TYPE = {hexs: mt for hexs, mt in MAGICS.values()}


def _try_real_decode(payload: bytes, media_type: str):
    """Real decode would go here (PIL / soundfile / av). Those libs are
    not in this container — keep the stub explicit."""
    raise NotImplementedError("media decode libraries not available")


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            magic = b[:4].hex().upper()
            media_type = _MAGIC_TO_TYPE.get(magic, "application/octet-stream")
            try:
                meta = _try_real_decode(b, media_type)  # pragma: no cover
            except NotImplementedError:
                # deterministic fake: dims from header-adjacent bytes,
                # checksum = sum of payload bytes
                meta = (16 + b[4], 16 + b[5], sum(b))
            out.append((doc_id, len(b), magic, media_type) + meta)
        yield pd.DataFrame(out, columns=DECODE_SCHEMA.fieldNames())


def q_multimodal_decode(spark, sf_dir):
    """binary payload → typed metadata via Arrow-batched mapInPandas."""
    return (media_df(spark, sf_dir)
            .mapInPandas(_decode_batch, schema=DECODE_SCHEMA)
            .orderBy("doc_id"))


def _byte_sql(pos: int) -> str:  # 1-based byte position in hex string
    return f"cast(('0x' || substr(payload_hex, {2*pos-1}, 2)) as int)"


_PAYLOAD_HEX_SQL = """
SELECT doc_id,
       (case when doc_id % 3 = 0 then '89504E47'
             when doc_id % 3 = 1 then 'FFD8FFE0'
             else '52494646' end) || md5(text) || md5(text || '2')
         AS payload_hex
FROM documents"""

_BYTESUM_SQL = ("list_sum(list_transform(range(1, 37), "
                "i -> cast(('0x' || substr(payload_hex, i*2-1, 2)) as int)))")

ORACLE_MULTIMODAL_DECODE = f"""
WITH p AS ({_PAYLOAD_HEX_SQL})
SELECT doc_id,
       cast(length(payload_hex) / 2 as int) AS n_bytes,
       upper(substr(payload_hex, 1, 8)) AS magic_hex,
       case when doc_id % 3 = 0 then 'image/png'
            when doc_id % 3 = 1 then 'image/jpeg'
            else 'audio/wav' end AS media_type,
       cast(16 + {_byte_sql(5)} as int) AS width,
       cast(16 + {_byte_sql(6)} as int) AS height,
       cast({_BYTESUM_SQL} as bigint) AS checksum
FROM p ORDER BY doc_id
"""


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("byte_offset", IntegerType()),
    StructField("frame_value", IntegerType()),
])
FRAME_STRIDE = 8


def q_multimodal_frame_sample(spark, sf_dir):
    """'Video' frame sampling: one sample every FRAME_STRIDE bytes of
    the payload (stand-in for decode+frame-extract at stride). Same
    mapInPandas shape a real ffmpeg-backed extractor would use."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for k, off in enumerate(range(0, len(b), FRAME_STRIDE)):
                    out.append((doc_id, k, off, b[off]))
            yield pd.DataFrame(out, columns=FRAME_SCHEMA.fieldNames())

    return (media_df(spark, sf_dir)
            .mapInPandas(sample, schema=FRAME_SCHEMA)
            .orderBy("doc_id", "frame_idx"))


ORACLE_MULTIMODAL_FRAMES = f"""
WITH p AS ({_PAYLOAD_HEX_SQL})
SELECT doc_id,
       cast(k as int) AS frame_idx,
       cast(k * {FRAME_STRIDE} as int) AS byte_offset,
       cast(('0x' || substr(payload_hex, k * {FRAME_STRIDE} * 2 + 1, 2))
            as int) AS frame_value
FROM p, (SELECT unnest(range(0, 5)) AS k)
WHERE k * {FRAME_STRIDE} < length(payload_hex) / 2
ORDER BY doc_id, frame_idx
"""


def payload_dedup(media):
    """Exact content dedup over the opaque media column: one row per
    DISTINCT payload with its copy count and the canonical (min)
    doc_id — the survivor map an asset store ships before spending
    decode/re-encode cycles on duplicates. The key is the portable
    content fingerprint md5(hex(payload)) — hex-encode-then-hash keeps
    the DuckDB oracle binary-free (its md5 is VARCHAR-only), and the
    scale property is the same as hashing raw bytes: only the 16-byte
    fingerprint shuffles; payload bytes never leave their scan
    partition. One groupBy on a uniform hash key with map-side partial
    agg — the dedup_exact plan shape over binary instead of text."""
    return (media.groupBy(F.md5(F.hex("payload")).alias("content_fp"))
            .agg(F.count("*").alias("n_copies"),
                 F.min("doc_id").alias("keep_doc_id"))
            .orderBy("content_fp"))


def q_multimodal_dedup(spark, sf_dir):
    return payload_dedup(media_df(spark, sf_dir))


ORACLE_MULTIMODAL_DEDUP = f"""
WITH p AS ({_PAYLOAD_HEX_SQL})
SELECT md5(upper(payload_hex)) AS content_fp,
       cast(count(*) as bigint) AS n_copies,
       cast(min(doc_id) as bigint) AS keep_doc_id
FROM p GROUP BY 1 ORDER BY content_fp
"""


QUERIES = {
    "multimodal_decode": q_multimodal_decode,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_dedup": q_multimodal_dedup,
}
ORACLES = {
    "multimodal_decode": ORACLE_MULTIMODAL_DECODE,
    "multimodal_frame_sample": ORACLE_MULTIMODAL_FRAMES,
    "multimodal_dedup": ORACLE_MULTIMODAL_DEDUP,
}
