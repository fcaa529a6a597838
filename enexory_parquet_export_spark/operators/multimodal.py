"""Multimodal binary-column operators — Spark plumbing for image /
audio / video payloads in a training-data pipeline.

Media rows are (id, kind, payload BINARY, meta STRUCT) — the payload
is opaque to Spark; all byte-level work happens in Arrow-batched
``mapInPandas`` stages so decode libraries (PIL/ffmpeg/torchcodec)
plug in at the marked seam without touching the distributed shape.

THE DECODERS HERE ARE STUBS: this container has no image/audio codecs,
so ``_decode_stub`` derives deterministic pseudo-pixels from the md5
of the payload (clearly marked; swap ``DECODER`` for a real one in
production).  What IS real and tested: the schemas, the Arrow batch
iteration, partition-preserving execution, and the batch-size-bounded
memory profile — the parts that must be right at 100 TB.

Scale notes:
- ``mapInPandas`` streams Arrow record batches; peak executor memory
  is O(batch) not O(partition) — set
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound it when
  payloads are large;
- decode / resize / frame-sample are embarrassingly parallel: no
  shuffle anywhere in this module;
- feature vectors come back as ``array<float>`` ready for
  operators.similarity (ANN) — the decode→embed→dedup pipeline
  composes entirely inside one stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-table schema (payload stays opaque BINARY)
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image|audio|video
    StructField("payload", BinaryType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("byte_len", LongType(), False),
    StructField("content_md5", StringType(), False),
    StructField("features", ArrayType(FloatType(), False), False),
])

FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame_md5", StringType(), False),
])


def _decode_stub(payload: bytes) -> list[float]:
    """STUB decoder — deterministic pseudo-features from payload bytes.

    A real deployment replaces this with PIL/torchvision decode +
    model forward; the Spark-side contract (bytes in, fixed-dim
    float vector out, pure function) is identical.
    """
    if payload is None:
        raise NotImplementedError("null payload reached the decoder")
    dig = hashlib.md5(bytes(payload)).digest()
    return [dig[i] / 255.0 for i in range(FEATURE_DIM)]


#: default decoder — tests and production pass their own to
#: :func:`extract_features`
DECODER: Callable[[bytes], list[float]] = _decode_stub


def extract_features(media: DataFrame,
                     decoder: Callable[[bytes], list[float]] | None = None
                     ) -> DataFrame:
    """payload → fixed-dim feature vector, Arrow-batched.

    One ``mapInPandas`` stage; no shuffle, partitioning preserved.

    ``decoder`` is the decode seam: a pure ``bytes → list[float]``
    callable (PIL/torchvision decode + model forward in production).
    It is passed as a PARAMETER, not read from a module global, so
    cloudpickle captures the callable by value inside the task closure
    — swapping it works on real executors, where a driver-side global
    reassignment would not propagate (workers re-import the module).
    """
    fn = decoder if decoder is not None else DECODER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "byte_len": payloads.map(len).astype("int64"),
                "content_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "features": payloads.map(fn),
            })

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


#: output contract of :func:`resize_media`
RESIZE_SCHEMA = ("media_id bigint, kind string, width int, height int, "
                 "payload binary")


def resize_media(media: DataFrame, *, width: int, height: int,
                 resizer: Callable[[bytes, int, int], bytes] | None = None
                 ) -> DataFrame:
    """payload → payload resized to (width, height), Arrow-batched.

    Same seam contract as :func:`extract_features`: ``resizer`` is a
    pure ``(bytes, w, h) → bytes`` callable (PIL ``resize`` + re-encode
    in production), passed by value into the task closure.  The STUB
    derives a deterministic payload of ``w*h`` pseudo-pixel bytes from
    the source md5 — wrong pixels, right plumbing: schema, typed dims,
    Arrow batch shape, and partition preservation are all real.
    """
    def _stub(payload: bytes, w: int, h: int) -> bytes:
        seed = hashlib.md5(payload).digest()
        reps = (w * h) // len(seed) + 1
        return (seed * reps)[: w * h]

    fn = resizer if resizer is not None else _stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": width,
                "height": height,
                "payload": pdf["payload"].map(
                    lambda b: fn(bytes(b), width, height)),
            })

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    STUB frame extraction (md5 of payload+index stands in for the
    decoded frame); the row-explosion shape — one input row yielding
    ``duration_ms // every_ms`` output rows inside the same task — is
    the real contract a codec-backed version keeps.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for row in pdf.itertuples(index=False):
                if row.kind != "video" or not row.duration_ms:
                    continue
                n = max(1, int(row.duration_ms) // every_ms)
                base = bytes(row.payload)
                for i in range(n):
                    out.append((row.media_id, i,
                                hashlib.md5(base + i.to_bytes(4, "big"))
                                .hexdigest()))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx",
                                             "frame_md5"])

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as opaque payloads so
    the multimodal plumbing is exercisable on the synthetic corpus."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("video"))
         .when(F.col("doc_id") % 3 == 1, F.lit("image"))
         .otherwise(F.lit("audio")).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.length("text").cast("bigint") * 100).alias("duration_ms"),
    )
