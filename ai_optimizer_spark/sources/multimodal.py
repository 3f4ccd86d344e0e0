"""Multimodal columns — opaque binary payloads with typed metadata
(BASELINE.json north star: image/audio/video as first-class pipeline data).

Design: media are `binary` columns + a metadata struct; decode/feature
steps run as Arrow-batched `mapInPandas` so bytes never cross the
Python boundary row-at-a-time. The actual codecs (PIL/librosa/ffmpeg) are
NOT in this container, so the decode kernel is stubbed behind
`DECODERS` — the Spark-side plumbing (schema, batch shape, partitioning,
UDF signature) is real and tested; swapping in a real decoder is a
one-function change.

At 100 TB: binary payloads dominate bytes — repartition by size so Arrow
batches stay ~64 MB, keep metadata-only branches on the pruned (no-content)
scan, and push filters on typed metadata before any decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id string, kind string, byte_len long, sha256 string, "
    "feature array<float>, decode_status string"
)


def _stub_decode(kind: str, payload: bytes) -> list[float]:
    """Deterministic fake feature vector (the decode stub): 8 floats from
    the payload digest. A real image/audio decoder replaces this function
    only — schema and plumbing stay identical."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


DECODERS: dict[str, Callable[[str, bytes], list[float]]] = {
    "image": _stub_decode,
    "audio": _stub_decode,
    "video": _stub_decode,
}


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch of (id, kind,
    payload) in, one batch of typed features out. Unknown kinds pass
    through with decode_status='unsupported' instead of failing the job."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, status = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                decoder = DECODERS.get(kind)
                if decoder is None:
                    feats.append(None)
                    status.append("unsupported")
                else:
                    feats.append(decoder(kind, bytes(payload or b"")))
                    status.append("stub_decoded")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": [len(bytes(p or b"")) for p in pdf["payload"]],
                    "sha256": [
                        hashlib.sha256(bytes(p or b"")).hexdigest() for p in pdf["payload"]
                    ],
                    "feature": feats,
                    "decode_status": status,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the media
    path is exercisable on the driver corpus (utf-8 encode ≙ the opaque
    blob; kind rotates deterministically by doc_id)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("m_"), F.col("doc_id")).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
