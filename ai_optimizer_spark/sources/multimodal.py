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
    "media_id string, kind string, byte_len long, content_md5 string, "
    "feature array<float>, decode_status string"
)


def _stub_decode(kind: str, payload: bytes) -> list[float]:
    """Deterministic fake feature vector (the decode stub): 8 floats from
    the payload's md5 digest. A real image/audio decoder replaces this
    function only — schema and plumbing stay identical. md5 (not sha256)
    so the whole stub chain is reproducible in the DuckDB oracle, which
    only hashes strings — every stub payload is ASCII hex by construction,
    making the 1→N framing and composition hash-verifiable end to end."""
    digest = hashlib.md5(payload or b"").digest()
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
                    "content_md5": [
                        hashlib.md5(bytes(p or b"")).hexdigest() for p in pdf["payload"]
                    ],
                    "feature": feats,
                    "decode_status": status,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize as mapInPandas: image rows get a re-encoded payload and
    updated (width, height) metadata; non-image rows pass through
    untouched. The stub kernel derives a deterministic payload of
    width*height//64 bytes from the source digest — a real PIL
    `Image.resize` replaces only the kernel. Output schema == input schema,
    so resize composes anywhere in the media pipeline."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_bytes = max(width * height // 64, 8)
        for pdf in batches:
            payloads, metas = [], []
            for kind, payload, meta in zip(pdf["kind"], pdf["payload"], pdf["meta"]):
                if kind != "image":
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                seed = hashlib.md5(bytes(payload or b"")).hexdigest()
                payloads.append(
                    (seed * (n_bytes // len(seed) + 1))[:n_bytes].encode()
                )
                m = dict(meta) if meta is not None else {}
                m.update({"mime": "image/raw", "width": width, "height": height})
                metas.append(m)
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.mapInPandas(_resize, MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 5
) -> DataFrame:
    """Video frame sampling as a 1→N mapInPandas (the UDTF shape): each
    video row yields up to `max_frames` image rows, one per `every_ms` of
    (stub) duration; non-video rows are dropped. Frame payloads are
    deterministic functions of (source digest, frame index); a real
    ffmpeg/pyav extractor replaces only the kernel."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                blob = bytes(payload or b"")
                # stub duration: 1 ms per payload byte
                n_frames = min(max(len(blob) // max(every_ms, 1), 1), max_frames)
                digest = hashlib.md5(blob).hexdigest()
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": f"{media_id}_f{i}",
                            "kind": "image",
                            # ASCII-hex payload: the oracle re-derives it
                            "payload": hashlib.md5(
                                (digest + str(i)).encode()
                            ).hexdigest().encode(),
                            "meta": {
                                "mime": "image/raw",
                                "width": None,
                                "height": None,
                                "duration_ms": i * every_ms,
                            },
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return media.mapInPandas(_sample, MEDIA_SCHEMA)


def window_audio(
    media: DataFrame, window_ms: int = 2000, hop_ms: int = 1000, max_windows: int = 5
) -> DataFrame:
    """Audio analysis windows as a 1→N mapInPandas (STFT-style framing):
    each audio row yields up to `max_windows` overlapping windows at
    `hop_ms` stride (overlap = window_ms - hop_ms), each with a
    deterministic stub payload keyed by (source digest, window index);
    non-audio rows are dropped. A real soundfile/librosa slicer replaces
    only the kernel — the framing arithmetic, 1→N schema, and composition
    with extract_features are the real, tested plumbing."""

    def _window(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                blob = bytes(payload or b"")
                duration_ms = len(blob)  # stub duration: 1 ms per byte
                n_win = min(
                    max((max(duration_ms - window_ms, 0)) // max(hop_ms, 1) + 1, 1),
                    max_windows,
                )
                digest = hashlib.md5(blob).hexdigest()
                for i in range(n_win):
                    rows.append(
                        {
                            "media_id": f"{media_id}_w{i}",
                            "kind": "audio",
                            # ASCII-hex payload: the oracle re-derives it
                            "payload": hashlib.md5(
                                (digest + str(i)).encode()
                            ).hexdigest().encode(),
                            "meta": {
                                "mime": "audio/raw",
                                "width": None,
                                "height": None,
                                "duration_ms": min(
                                    window_ms, duration_ms - i * hop_ms
                                ),
                            },
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return media.mapInPandas(_window, MEDIA_SCHEMA)


def repartition_for_payloads(media: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Size the Arrow batches: repartition so each partition carries about
    `target_bytes` of payload (one count+sum action over the pruned
    length-only projection — payload bytes are NOT collected). At 100 TB
    this keeps decode UDF memory bounded regardless of media size skew."""
    stats = media.select(F.sum(F.length("payload")).alias("total")).first()
    total = stats.total or 0
    n_parts = max(int(total // target_bytes) + 1, 1)
    return media.repartition(n_parts)


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
