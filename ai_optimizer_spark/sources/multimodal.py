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


# ---------------------------------------------------------------------------
# REAL stdlib codecs (verdict r9 task 4): PCM WAV via `wave` + `struct`,
# PNG via `zlib` + `struct` — no external deps. These are genuine
# container parsers (RIFF chunks / PNG chunk+CRC+inflate+unfilter), not
# stubs; PIL/librosa remain optional richer tiers behind the same
# DECODERS seam. Payloads that aren't valid containers fall back to the
# md5 stub, which keeps the mm2/mm3 hash-chain oracles byte-identical
# (their synthetic payloads are ASCII hex and never carry RIFF/PNG magic).
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> dict:
    """Parse a PCM WAV (RIFF) payload with the stdlib `wave` reader and
    return real sample statistics: {n_samples, framerate, duration_ms,
    mean_sample, max_abs, rms}. 16-bit mono little-endian (the synth
    writer's format); raises on anything `wave` can't parse."""
    import io
    import math
    import struct
    import wave as _wave

    with _wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        rate = w.getframerate()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width != 2 or channels != 1:
        raise ValueError(f"unsupported WAV layout: width={width} ch={channels}")
    samples = struct.unpack(f"<{n}h", raw)
    mean = sum(samples) / n if n else 0.0
    rms = math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
    return {
        "n_samples": n,
        "framerate": rate,
        "duration_ms": n * 1000 // rate,
        "mean_sample": mean,
        "max_abs": max((abs(s) for s in samples), default=0),
        "rms": rms,
    }


def decode_png(payload: bytes) -> dict:
    """Parse a PNG payload with stdlib zlib/struct: validate the
    signature, walk chunks (verifying each CRC), inflate the IDAT
    stream, reverse the per-row filters (all five standard types), and
    return {width, height, mean_px, min_px, max_px} over the grayscale
    pixels. 8-bit grayscale only (color type 0 — the synth writer's
    format); raises on anything else."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, width, height, idat = 8, None, None, b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color = struct.unpack(">IIBB", data[:10])
            if bit_depth != 8 or color != 0:
                raise ValueError(f"unsupported PNG: depth={bit_depth} color={color}")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(idat)
    stride = width + 1
    pixels: list[int] = []
    prev = [0] * width
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        ftype, cur = row[0], list(row[1:])
        for x in range(width):
            a = cur[x - 1] if x else 0  # left (already reconstructed)
            b = prev[x]  # up
            c = prev[x - 1] if x else 0  # upper-left
            if ftype == 0:
                v = cur[x]
            elif ftype == 1:
                v = (cur[x] + a) & 0xFF
            elif ftype == 2:
                v = (cur[x] + b) & 0xFF
            elif ftype == 3:
                v = (cur[x] + (a + b) // 2) & 0xFF
            elif ftype == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                v = (cur[x] + pred) & 0xFF
            else:
                raise ValueError(f"unknown PNG filter {ftype}")
            cur[x] = v
        pixels.extend(cur)
        prev = cur
    return {
        "width": width,
        "height": height,
        "mean_px": sum(pixels) / len(pixels) if pixels else 0.0,
        "min_px": min(pixels, default=0),
        "max_px": max(pixels, default=0),
    }


def encode_wav(samples: list[int], framerate: int = 16000) -> bytes:
    """Write a real 16-bit mono PCM WAV container (stdlib `wave`)."""
    import io
    import struct
    import wave as _wave

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def encode_png_gray(pixels: list[int], width: int, height: int) -> bytes:
    """Write a real 8-bit grayscale PNG (stdlib zlib/struct): filter
    type 0 rows, one zlib-deflated IDAT, CRC-stamped chunks."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00" + bytes(pixels[y * width : (y + 1) * width])
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _audio_decode_tiered(kind: str, payload: bytes) -> list[float]:
    """Audio feature tier: REAL WAV stats when the payload is a RIFF
    container, md5 stub otherwise (hash-chain payloads stay on the
    oracle-reproducible path). Feature layout: [n_samples, framerate,
    duration_ms, mean, max_abs, rms, 0, 0] — fixed 8 wide like the stub."""
    if payload[:4] == b"RIFF":
        s = decode_wav(payload)
        return [
            float(s["n_samples"]),
            float(s["framerate"]),
            float(s["duration_ms"]),
            float(s["mean_sample"]),
            float(s["max_abs"]),
            float(s["rms"]),
            0.0,
            0.0,
        ]
    return _stub_decode(kind, payload)


def _image_decode_tiered(kind: str, payload: bytes) -> list[float]:
    """Image feature tier: REAL PNG stats for PNG payloads, md5 stub
    otherwise. Layout: [width, height, mean, min, max, 0, 0, 0]."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        s = decode_png(payload)
        return [
            float(s["width"]),
            float(s["height"]),
            float(s["mean_px"]),
            float(s["min_px"]),
            float(s["max_px"]),
            0.0,
            0.0,
            0.0,
        ]
    return _stub_decode(kind, payload)


DECODERS: dict[str, Callable[[str, bytes], list[float]]] = {
    "image": _image_decode_tiered,
    "audio": _audio_decode_tiered,
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
                blob = bytes(payload or b"")
                if decoder is None:
                    feats.append(None)
                    status.append("unsupported")
                else:
                    feats.append(decoder(kind, blob))
                    # status reflects the tier that actually ran: real
                    # container parses report 'decoded'; everything else
                    # stays on the stub path (mm2/mm3's oracle contract)
                    real = blob[:4] == b"RIFF" or blob[:8] == b"\x89PNG\r\n\x1a\n"
                    status.append("decoded" if real else "stub_decoded")
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


WAV_STATS_SCHEMA = (
    "media_id string, n_samples long, framerate long, duration_ms long, "
    "mean_sample double, max_abs long, rms double"
)

PNG_STATS_SCHEMA = (
    "media_id string, width long, height long, mean_px double, "
    "min_px long, max_px long"
)


def synth_wav_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL WAV payloads, one per document: doc_id derives
    (n_samples, seed) and the waveform samples[i] = ((seed + i*7919)
    % 65536) - 32768, written through the genuine stdlib `wave` encoder
    (RIFF header, fmt/data chunks). The waveform is closed-form, so the
    DECODED statistics are SQL-reproducible — the container encode→parse
    round trip is the part under test, and it is real."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 64 + int(doc_id) % 129
                seed = int(doc_id) % 9973
                samples = [((seed + i * 7919) % 65536) - 32768 for i in range(n)]
                payloads.append(encode_wav(samples))
            yield pd.DataFrame(
                {
                    "media_id": ["m_" + str(d) for d in pdf["doc_id"]],
                    "kind": "audio",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(
        _synth, "media_id string, kind string, payload binary"
    )


def wav_stats(media: DataFrame) -> DataFrame:
    """REAL WAV decode as mapInPandas: stdlib `wave` parses each RIFF
    payload and the stats come from the decoded int16 samples (exact
    integer sums → ONE IEEE division/sqrt each, bit-identical across
    engines with no rounding step at all)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                s = decode_wav(bytes(payload))
                rows.append(
                    {
                        "media_id": media_id,
                        "n_samples": s["n_samples"],
                        "framerate": s["framerate"],
                        "duration_ms": s["duration_ms"],
                        "mean_sample": float(s["mean_sample"]),
                        "max_abs": s["max_abs"],
                        "rms": float(s["rms"]),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "framerate", "duration_ms",
                    "mean_sample", "max_abs", "rms",
                ],
            )

    return media.mapInPandas(_stats, WAV_STATS_SCHEMA)


def synth_png_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL PNG payloads: doc_id derives (width, height,
    seed) and pixel[i] = (seed + 3*i) % 256, written through the stdlib
    zlib/CRC PNG encoder. Same design as synth_wav_media: real
    container, closed-form content."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w = 16 + int(doc_id) % 17
                h = 8 + int(doc_id) % 13
                seed = int(doc_id) % 251
                pixels = [(seed + 3 * i) % 256 for i in range(w * h)]
                payloads.append(encode_png_gray(pixels, w, h))
            yield pd.DataFrame(
                {
                    "media_id": ["m_" + str(d) for d in pdf["doc_id"]],
                    "kind": "image",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(
        _synth, "media_id string, kind string, payload binary"
    )


def png_stats(media: DataFrame) -> DataFrame:
    """REAL PNG decode as mapInPandas: signature + chunk CRCs verified,
    IDAT inflated, filters reversed, stats over the actual pixels."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                s = decode_png(bytes(payload))
                rows.append(
                    {
                        "media_id": media_id,
                        "width": s["width"],
                        "height": s["height"],
                        "mean_px": float(s["mean_px"]),
                        "min_px": s["min_px"],
                        "max_px": s["max_px"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "mean_px", "min_px", "max_px"],
            )

    return media.mapInPandas(_stats, PNG_STATS_SCHEMA)


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
