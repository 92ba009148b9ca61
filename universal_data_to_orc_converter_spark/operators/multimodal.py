"""Multimodal columns — SURVEY.md §2.I (EXT).

Posture: image/audio/video payloads are opaque ``binary`` columns with
typed metadata travelling beside them. The Spark-side plumbing —
BinaryType schema, Arrow batch shape through ``mapInPandas``, sinking
binary to ORC — is real and tested; the actual media decode is stubbed
(no image/audio libraries in this environment) behind a deterministic
fake, exactly as a production pipeline stubs decoders in unit tests.

The fixtures carry no binary column, so the payload is derived
(UTF-8-encoded document text) — the plumbing is identical to real media
bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "op_multimodal_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
               sha256(text) AS payload_sha256
        FROM documents
    """,
    tags=("multimodal",),
)
def op_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: byte length + content digest over a
    BinaryType payload. At scale this is the dedup/integrity layer for
    media blobs — the bytes never leave the executor."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("payload_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


@query(
    "op_multimodal_decode",
    oracle="""
        SELECT doc_id,
               CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 960 + 64
                   AS width,
               CAST(('0x' || substr(sha256(text), 5, 4)) AS BIGINT) % 960 + 64
                   AS height,
               CASE CAST(('0x' || substr(sha256(text), 9, 2)) AS BIGINT) % 3
                 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp'
               END AS format
        FROM documents WHERE text IS NOT NULL
    """,
    notes="Decode step is a STUB (no media libs in this container): a "
    "deterministic fake derives width/height/format from the payload "
    "digest inside an Arrow-batched mapInPandas — the batch shape, "
    "schema, and partitioning are the real plumbing. The oracle "
    "replicates the fake's arithmetic, so even the stub is "
    "hash-checked.",
    tags=("multimodal", "udf"),
)
def op_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Decode' binary payloads to image metadata via mapInPandas.

    A real deployment swaps the body of ``fake_decode`` for PIL/ffmpeg
    calls; signature, schema, and batching are unchanged. Raises
    NotImplementedError only if asked for real pixel output."""
    import hashlib

    import pandas as pd

    par = spark.sparkContext.defaultParallelism
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(par, "doc_id")
    )

    def fake_decode(batches):
        for pdf in batches:
            # NULL text = absent media: no payload, no decode row
            # (dirty-corpus audit, r11-restart)
            pdf = pdf[pdf["text"].notna()]
            payloads = [t.encode("utf-8") for t in pdf["text"]]
            digests = [hashlib.sha256(p).hexdigest() for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": [int(h[0:4], 16) % 960 + 64 for h in digests],
                    "height": [int(h[4:8], 16) % 960 + 64 for h in digests],
                    "format": [
                        ("png", "jpeg", "webp")[int(h[8:10], 16) % 3]
                        for h in digests
                    ],
                }
            )

    return d.mapInPandas(
        fake_decode, "doc_id long, width long, height long, format string"
    )


def decode_image(payload: bytes) -> "bytes":
    """Real media decode — requires PIL/opencv, absent in this
    environment by design."""
    raise NotImplementedError(
        "media decoding libraries are not available in this container; "
        "op_multimodal_decode uses the deterministic stub instead"
    )


@query(
    "op_multimodal_frames",
    oracle="""
        SELECT doc_id,
               CAST(u.frame_idx AS INT) AS frame_idx,
               sha256(text || ':' || CAST(u.frame_idx AS VARCHAR))
                   AS frame_sha256
        FROM (
          SELECT doc_id, text,
                 CAST(octet_length(encode(text)) % 5 + 1 AS INT) AS n_frames
          FROM documents
        ),
        LATERAL (SELECT unnest(generate_series(0, n_frames - 1)) AS frame_idx) u
    """,
    notes="Frame-sampling plumbing for video-like payloads: a "
    "deterministic per-payload frame count fans each row out to one "
    "row per frame (posexplode over a sequence), with per-frame "
    "content digests. The fan-out shape, schema, and digests are the "
    "real pipeline; only the frame decode itself is stubbed (see "
    "op_multimodal_decode). Fully oracle-checked.",
    tags=("multimodal",),
)
def op_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per sampled frame per payload — the explode pattern that
    turns media blobs into per-frame training rows. At 100 TB the
    fan-out multiplies rows, never payload bytes (frames reference
    offsets into the blob; here digests stand in for pixels)."""
    d = load(spark, sf_dir, "documents")
    n_frames = (
        F.octet_length(F.encode("text", "UTF-8")) % 5 + 1
    ).cast("int")
    frames = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.sha2(
            F.concat(F.col("text"), F.lit(":"), F.col("frame_idx").cast("string")),
            256,
        ).alias("frame_sha256"),
    )


@query(
    "op_multimodal_audio",
    oracle="""
        WITH base AS (
          SELECT doc_id, text,
                 CAST(octet_length(encode(text)) % 4 + 2 AS INT) AS n_win
          FROM documents WHERE text IS NOT NULL
        ),
        win AS (
          SELECT doc_id, CAST(u.w AS INT) AS window_idx,
                 sha256(text || ':w' || CAST(u.w AS VARCHAR)) AS d
          FROM base,
               LATERAL (SELECT unnest(generate_series(0, n_win - 1)) AS w) u
        ),
        byt AS (
          SELECT doc_id, window_idx,
                 list_transform(range(1, 33),
                     i -> CAST('0x' || substr(d, 2*i - 1, 2) AS BIGINT)) AS b
          FROM win
        )
        SELECT doc_id, window_idx,
               CAST(list_sum(list_transform(b, x -> x * x)) AS BIGINT)
                   AS energy,
               CAST(list_max(b) AS BIGINT) AS peak,
               CAST(len(list_filter(range(1, 32),
                    i -> (b[i] - 128) * (b[i + 1] - 128) < 0)) AS BIGINT)
                   AS zero_crossings
        FROM byt
    """,
    notes="Audio-window feature extraction plumbing: each payload fans "
    "out to 2-5 fixed-size windows; per window, integer features "
    "(energy = sum of squared samples, peak, zero-crossing count) over "
    "the window's sample bytes. The 'samples' are a deterministic fake "
    "(the window digest's 32 bytes — no audio libs in this container); "
    "the oracle replicates the arithmetic byte-for-byte, so the whole "
    "fan-out + feature pipeline is hash-checked. A real deployment "
    "swaps the digest for PCM frames; schema, batching, and the "
    "integer feature math are unchanged.",
    tags=("multimodal", "udf"),
)
def op_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio features via Arrow-batched mapInPandas: one row
    per (payload, window) with exact integer features, vectorized in
    numpy per window. At 100 TB this is the map stage that turns audio
    blobs into model-ready frame features — rows multiply, payload
    bytes never shuffle."""
    import hashlib

    import numpy as np
    import pandas as pd

    par = spark.sparkContext.defaultParallelism
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(par, "doc_id")
    )

    def audio_features(batches):
        for pdf in batches:
            out = {
                "doc_id": [],
                "window_idx": [],
                "energy": [],
                "peak": [],
                "zero_crossings": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    # NULL text = absent media: no windows
                    # (dirty-corpus audit, r11-restart)
                    continue
                payload = text.encode("utf-8")
                n_win = len(payload) % 4 + 2
                for w in range(n_win):
                    dig = hashlib.sha256(
                        (text + f":w{w}").encode("utf-8")
                    ).digest()
                    b = np.frombuffer(dig, dtype=np.uint8).astype(np.int64)
                    s = b - 128
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(w)
                    out["energy"].append(int((b * b).sum()))
                    out["peak"].append(int(b.max()))
                    out["zero_crossings"].append(int(((s[:-1] * s[1:]) < 0).sum()))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        audio_features,
        "doc_id long, window_idx int, energy long, peak long, "
        "zero_crossings long",
    )
