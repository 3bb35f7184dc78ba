"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Reference analogue: the accelon3 image handler accepts jpeg/png/svg blobs
and stores them as Buffers in the KDB tree (accelon3handler/img.js:1-41,
kdbw.js:128-134 blob writer). Here media is a first-class column family:

    media(doc_id long, kind string, payload binary,
          meta struct<fmt:string, width:int, height:int, n_bytes:int>)

The Spark-side plumbing (schema, Arrow batch shape, mapInPandas signature,
partitioning) is real and tested; the pixel-level decode is STUBBED: this
container has no image/audio libraries, so `decode_meta` parses our own
deterministic container header, and `decode_pixels` raises
NotImplementedError unless PIL is importable. Swapping in a real decoder
changes only the innermost numpy call, not the Spark plan.

Header layout (deterministic fake, big-endian):
    bytes 0..3   magic b"KSIM"
    bytes 4..7   width  (uint32)
    bytes 8..11  height (uint32)
    bytes 12..   payload (width*height bytes, xor-pattern)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"KSIM"

MEDIA_SCHEMA = ("doc_id long, kind string, payload binary")
META_SCHEMA = ("doc_id long, kind string, fmt string, width int, height int, "
               "n_bytes int")
FEAT_SCHEMA = "doc_id long, feat array<double>"


def synth_media(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic media table derived from doc ids: the binary
    payload is generated in a pandas UDF (numpy, no per-row Python) with
    width = 16 + id % 64, height = 16 + id % 48."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            payloads = []
            for i in ids:  # header pack is per-row; body is vectorized numpy
                w = 16 + int(i) % 64
                h = 16 + int(i) % 48
                body = (np.arange(w * h, dtype=np.uint64) ^ np.uint64(i)) \
                    .astype(np.uint8).tobytes()
                payloads.append(MAGIC + struct.pack(">II", w, h) + body)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": np.where(ids % 3 == 0, "image",
                                 np.where(ids % 3 == 1, "audio", "video")),
                "payload": payloads,
            })

    return documents.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_meta(media: DataFrame) -> DataFrame:
    """binary -> typed metadata struct. Vectorized batch decode; the header
    parse is bytes-slicing only (the STUB decode boundary)."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, ns = [], [], [], []
            for b in pdf["payload"]:
                if b[:4] == MAGIC:
                    w, h = struct.unpack(">II", b[4:12])
                    fmts.append("ksim")
                else:  # unknown container: report, don't crash the batch
                    w = h = 0
                    fmts.append("unknown")
                ws.append(w)
                hs.append(h)
                ns.append(len(b))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "kind": pdf["kind"], "fmt": fmts,
                "width": ws, "height": hs, "n_bytes": ns,
            })

    return media.mapInPandas(dec, schema=META_SCHEMA)


def decode_pixels(media: DataFrame):  # pragma: no cover - stub
    """Real pixel decode — requires an image library not in this container."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "pixel decode needs PIL/opencv; container ships neither. "
            "The plumbing path is decode_meta/byte_histogram.") from e
    raise NotImplementedError("wire PIL decode here")


def byte_histogram(media: DataFrame, bins: int = 16) -> DataFrame:
    """Binary payload -> normalized byte-histogram feature vector
    (array<double>[bins]) — the stand-in for an image-embedding kernel.
    numpy bincount per payload, Arrow batch in/out."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                body = np.frombuffer(b, dtype=np.uint8, offset=12)
                hist = np.bincount(body >> 4, minlength=bins).astype(np.float64)
                feats.append(hist / max(1.0, float(body.size)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feat": feats})

    return media.mapInPandas(feat, schema=FEAT_SCHEMA)


def media_meta_query(spark, sf: str) -> DataFrame:
    """Oracle-checked round-trip: synthesize binary -> decode metadata.
    The oracle recomputes width/height arithmetically from doc_id — the
    Spark path must reproduce it THROUGH the binary encode/decode."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    meta = decode_meta(synth_media(docs))
    return meta.select(
        "doc_id", "kind", "fmt",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_bytes").cast("long").alias("n_bytes"))


MEDIA_META_SQL = """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
  'ksim' AS fmt,
  (16 + doc_id % 64)::BIGINT AS width,
  (16 + doc_id % 48)::BIGINT AS height,
  (12 + (16 + doc_id % 64) * (16 + doc_id % 48))::BIGINT AS n_bytes
FROM documents
"""


FRAME_SCHEMA = "doc_id long, frame_idx int, byte_offset int, frame_bytes int"


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame with its
    byte extent inside the container. A real decoder replaces the
    byte-slicing with codec frame boundaries; the Spark shape (binary in,
    exploded frame rows out via mapInPandas) is the production one.

    Frame model for the synthetic container: each frame is `width` bytes
    of the body; every `every`-th frame is sampled.
    """
    import struct as _struct

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, sizes = [], [], [], []
            for doc_id, kind, b in zip(pdf["doc_id"], pdf["kind"],
                                       pdf["payload"]):
                if kind != "video" or b[:4] != MAGIC:
                    continue
                w, h = _struct.unpack(">II", b[4:12])
                n_frames = h  # one frame per row of the synthetic body
                for i in range(0, n_frames, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(12 + i * w)
                    sizes.append(w)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "byte_offset": offs, "frame_bytes": sizes})

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)


MEDIA_FRAMES_SQL = """
WITH v AS (
  SELECT doc_id, (16 + doc_id % 64)::BIGINT AS w, (16 + doc_id % 48)::BIGINT AS h
  FROM documents WHERE doc_id % 3 = 2)
SELECT doc_id, i::INT AS frame_idx, (12 + i * w)::INT AS byte_offset,
       w::INT AS frame_bytes
FROM v, unnest(range(0, h, 4)) AS u(i)
"""
