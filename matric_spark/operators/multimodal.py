"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched `mapInPandas` pipelines.

The decode step itself is STUBBED (no media libs in this container):
`decoder="fake"` produces a deterministic ndarray from the payload hash
(so every downstream op is fully testable), `decoder="pillow"`/"ffmpeg"
raise NotImplementedError at the exact point a real decoder plugs in.
Everything Spark-side is real and load-bearing:

- schema: MEDIA_SCHEMA below; payload stays binary end-to-end, metadata
  is a typed struct (no JSON blobs — filters on meta.* push down).
- batching: mapInPandas iterates Arrow record batches; decoded pixels
  exist only inside one batch (bounded executor memory — the reason this
  is mapInPandas and not collect-and-loop).
- partitioning: media rows are large; repartition by media_id before
  heavy ops so AQE balances bytes not row counts.

Reference lineage: none (matric is tabular-only, SURVEY §2.13) — this is
the Spark-native extension required for multimodal training pipelines.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, "
    "duration_ms:int, codec:string>"
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, width: int, height: int):
    """Deterministic pixels from the payload bytes (stand-in decoder)."""
    import numpy as np

    seed = np.frombuffer(
        __import__("hashlib").md5(payload or b"").digest(), dtype=np.uint64
    )
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def _require_real_decoder(name: str) -> None:
    raise NotImplementedError(
        f"real decoder {name!r} is not available in this environment; "
        "use decoder='fake' (deterministic stub) or plug a codec library "
        "in at this call site"
    )


def image_features(
    media: DataFrame, decoder: str = "fake", dim: int = FEATURE_DIM
) -> DataFrame:
    """DataFrame[media_id, features array<float>]: decode each image and
    emit a histogram feature vector. One numpy pass per Arrow batch."""
    import numpy as np
    import pandas as pd

    if decoder != "fake":
        _require_real_decoder(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                px = _fake_decode(payload, meta["width"], meta["height"])
                hist, _ = np.histogram(px, bins=dim, range=(0, 256))
                feats.append((hist / px.size).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, "media_id long, features array<float>"
    )


def resize_images(
    media: DataFrame, width: int, height: int, decoder: str = "fake"
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (stub: raw bytes).
    Output schema == input schema with updated meta (pipeline-closed)."""
    import numpy as np
    import pandas as pd

    if decoder != "fake":
        _require_real_decoder(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                px = _fake_decode(payload, meta["width"], meta["height"])
                yi = (np.arange(height) * meta["height"] // height).clip(0, meta["height"] - 1)
                xi = (np.arange(width) * meta["width"] // width).clip(0, meta["width"] - 1)
                small = px[np.ix_(yi, xi)]
                out_payload.append(small.tobytes())
                out_meta.append(
                    {**{k: meta[k] for k in meta.keys()}, "width": width, "height": height}
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decoder: str = "fake"
) -> DataFrame:
    """Video → one row per sampled frame (media_id, frame_idx, ts_ms,
    payload). Fan-out happens inside the Arrow batch, so a long video
    never materializes as a Python list on the driver."""
    import pandas as pd

    if decoder != "fake":
        _require_real_decoder(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                for i, ts in enumerate(range(0, meta["duration_ms"], every_ms)):
                    px = _fake_decode(
                        (payload or b"") + ts.to_bytes(4, "little"),
                        meta["width"],
                        meta["height"],
                    )
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(ts)
                    payloads.append(px.tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "payload": payloads}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, "media_id long, frame_idx int, ts_ms int, payload binary"
    )


def audio_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Audio → (media_id, rms double, n_samples long) from the stub
    waveform (payload bytes as int8 samples)."""
    import numpy as np
    import pandas as pd

    if decoder != "fake":
        _require_real_decoder(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rms, ns = [], []
            for payload in pdf["payload"]:
                wave = np.frombuffer(payload or b"\x00", dtype=np.int8).astype(np.float64)
                rms.append(float(np.sqrt((wave**2).mean())))
                ns.append(len(wave))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "rms": rms, "n_samples": ns}
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, "media_id long, rms double, n_samples long"
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the `documents` table with
    built-in column ops only (no UDF, no external data): payload is the
    UTF-8 bytes of `text`, kind round-robins image/audio/video on
    doc_id, and the meta struct is a closed-form function of doc_id.

    This is the gate harness for the multimodal path: because every
    field is a pure SQL expression of (doc_id, text), a DuckDB oracle
    can reproduce the *outputs* of the Arrow pipelines exactly —
    `sample_frames` fan-out (frame count/timestamps from
    meta.duration_ms, decoded frame bytes = width*height) — turning the
    mapInPandas plumbing from pytest-only into a value-hash-gated
    surface. Mapping (mirrored in __spark_entry__.oracle_sql):
    kind = [image,audio,video][doc_id % 3]; width = 8 + (doc_id % 4)*4;
    height = 8 + (doc_id % 3)*4; duration_ms = 3000 + (doc_id % 5)*1000.
    """
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + F.lit(1)).cast("int"),
    )
    meta = F.struct(
        (F.lit(8) + F.pmod(F.col("doc_id"), F.lit(4)) * 4)
        .cast("int")
        .alias("width"),
        (F.lit(8) + F.pmod(F.col("doc_id"), F.lit(3)) * 4)
        .cast("int")
        .alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.lit(3000) + F.pmod(F.col("doc_id"), F.lit(5)) * 1000)
        .cast("int")
        .alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )
    return docs.filter(F.col("doc_id").isNotNull()).select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias(
            "payload"
        ),
        meta.alias("meta"),
    )


def synthetic_media(spark, n: int = 60) -> DataFrame:
    """Deterministic media table for tests (no external data): payloads
    derived from the row id; kinds round-robin image/audio/video."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes((i * 31 + j) % 256 for j in range(64))
        meta = {
            "width": 8 + (i % 4) * 4,
            "height": 8 + (i % 3) * 4,
            "sample_rate": 16000,
            "duration_ms": 3000 + (i % 5) * 1000,
            "codec": "fake",
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
