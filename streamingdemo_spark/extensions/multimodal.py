"""Multimodal-column operators (SURVEY §2.F, BASELINE.json).

Media is modeled the way a 100 TB lakehouse stores it: an opaque
``binary`` payload column plus typed metadata columns, processed by
Arrow-batched ``mapInPandas`` stages. The container image has no
image/audio codecs, so the decode step is a clearly-marked
deterministic stub (``_fake_decode``) — the Spark-side plumbing
(schemas, binary handling, batch iteration, partitioning) is real and
is what these keys test.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import query

_MAGIC = b"FAKEIMG1"


@query(
    "ext_multimodal_struct",
    oracle="""
    SELECT d.doc_id, d.lang AS meta_lang, d.n_chars AS meta_chars,
           e.label AS media_label,
           ROUND(CAST(e.embedding[1] AS DOUBLE), 3) + 0.0 AS feat_0,
           ROUND(CAST(e.embedding[2] AS DOUBLE), 3) + 0.0 AS feat_1
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def ext_multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested multimodal record: struct(text meta) + embedding feature
    ref, built then flattened — the schema shape of a joined
    text+media training record."""
    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    rec = (
        t["documents"]
        .join(t["embeddings"], F.col("doc_id") == F.col("vec_id"))
        .select(
            "doc_id",
            F.struct(
                F.col("lang").alias("lang"), F.col("n_chars").alias("chars")
            ).alias("meta"),
            F.struct(
                F.col("label").alias("label"), F.col("embedding").alias("emb")
            ).alias("media"),
        )
    )
    return rec.select(
        "doc_id",
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.chars").alias("meta_chars"),
        F.col("media.label").alias("media_label"),
        # + 0.0 normalizes IEEE negative zero: ROUND(-0.0004, 3) gives
        # -0.0 in one engine and 0.0 in the other — equal as values but
        # not as canonicalized strings
        (F.round(F.element_at("media.emb", 1).cast("double"), 3) + 0.0).alias("feat_0"),
        (F.round(F.element_at("media.emb", 2).cast("double"), 3) + 0.0).alias("feat_1"),
    )


def _encode_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic binary payloads derived from the fixture: a fake
    image header (magic, width, height) followed by the utf-8 text
    bytes. Stands in for real media blobs with the same schema:
    (doc_id, payload binary, media_type string)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    width = (F.col("n_chars") % 64 + 1).cast("int")
    height = (F.col("n_chars") % 48 + 1).cast("int")
    header = F.concat(
        F.lit(_MAGIC),
        F.encode(F.lpad(width.cast("string"), 6, "0"), "utf-8"),
        F.encode(F.lpad(height.cast("string"), 6, "0"), "utf-8"),
    )
    return d.select(
        "doc_id",
        F.concat(header, F.encode("text", "utf-8")).alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _pil_available() -> bool:
    """Capability check: PIL is not in this container image, but the
    decode path must use it when a deployment installs it."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_one(raw: bytes) -> dict:
    """Decode one payload to (width, height, n_bytes, mean_byte).

    Dispatch order: the deterministic fake header decodes everywhere
    (it's the fixture format); real image bytes decode via PIL when the
    library is installed; otherwise the honest stub raises — no silent
    wrong answers for real media in a codec-less environment.
    """
    if raw.startswith(_MAGIC):
        width = int(raw[8:14])
        height = int(raw[14:20])
        body = raw[20:]
        return {
            "width": width,
            "height": height,
            "n_bytes": len(body),
            # raw mean — rounding happens Spark-side (F.round), which is
            # the engine-portable convention; Python's round() is
            # half-even and diverges from SQL ROUND on dyadic ties
            "mean_byte": sum(body) / max(len(body), 1),
        }
    if _pil_available():
        import io as _io

        import numpy as np
        from PIL import Image

        img = Image.open(_io.BytesIO(raw))
        arr = np.asarray(img.convert("L"))
        return {
            "width": img.width,
            "height": img.height,
            "n_bytes": len(raw),
            "mean_byte": float(arr.mean()),
        }
    raise NotImplementedError(
        "real media decode needs PIL, which is not installed"
    )


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode stage: fake-header payloads always decode;
    real images decode when PIL is installed (capability-gated). The
    signature, schema, and batch flow are exactly what production uses.
    """
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rec = _decode_one(bytes(payload))
            rec["doc_id"] = int(doc_id)
            out.append(rec)
        yield pd.DataFrame(out)[
            ["doc_id", "width", "height", "n_bytes", "mean_byte"]
        ]


@query(
    "ext_multimodal_decode",
    # the corpus is ASCII (asserted by the oracle diff itself: byte
    # length == char length), so byte sums are ascii() sums
    oracle="""
    SELECT doc_id,
           CAST(n_chars % 64 + 1 AS INT) AS width,
           CAST(n_chars % 48 + 1 AS INT) AS height,
           CAST(length(text) AS BIGINT) AS n_bytes,
           ROUND(CAST(list_aggregate(list_transform(string_split(text, ''),
                        c -> ascii(c)), 'sum') AS DOUBLE)
                 / greatest(length(text), 1), 4) AS mean_byte
    FROM documents
    """,
)
def ext_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline: encode (JVM) → decode/feature-extract via
    ``mapInPandas`` (Arrow-batched binary columns) → typed metadata.

    The decode itself is the capability-gated stub (no codecs in this
    image), but its output is a pure function of the payload bytes, so
    the DuckDB oracle replays it from the source text — the Arrow
    plumbing gets a hash-match signal, not just a row count.

    100 TB notes: payloads stream through Python in Arrow batches (no
    per-row pickling); repartition before the decode stage to spread
    large blobs evenly; never collect payloads.
    """
    payloads = _encode_payload(spark, sf_dir).repartition(8, "doc_id")
    decoded = payloads.mapInPandas(
        _fake_decode,
        schema="doc_id long, width int, height int, n_bytes long, mean_byte double",
    )
    return decoded.withColumn("mean_byte", F.round("mean_byte", 4))


@query(
    "ext_multimodal_framesample",
    oracle="""
    SELECT doc_id,
           CAST(f.frame_no AS INT) AS frame_no,
           CAST(least(256, length(text) - f.frame_no * 256) AS INT)
             AS frame_bytes,
           CAST(list_aggregate(list_transform(
                  string_split(substr(text, f.frame_no * 256 + 1, 256), ''),
                  c -> ascii(c)), 'sum') % 65536 AS INT) AS checksum
    FROM documents,
         UNNEST(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT), 4))
           AS f(frame_no)
    """,
)
def ext_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: each payload
    expands to ceil(n_bytes/256)-frame metadata rows, sampled every 4th
    frame — the 1-to-many mapInPandas shape of real frame extraction
    (decode itself stubbed as byte-slicing)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)[20:]
                n_frames = (len(raw) + 255) // 256
                for frame_no in range(0, n_frames, 4):
                    chunk = raw[frame_no * 256 : (frame_no + 1) * 256]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_no": frame_no,
                            "frame_bytes": len(chunk),
                            "checksum": sum(chunk) % 65536,
                        }
                    )
            yield pd.DataFrame(rows)

    payloads = _encode_payload(spark, sf_dir)
    return payloads.mapInPandas(
        sample, schema="doc_id long, frame_no int, frame_bytes int, checksum int"
    )
