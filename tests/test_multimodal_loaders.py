"""Multimodal plumbing + document-loader dispatch tests."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ai_optimizer_spark.sources.documents import load_documents
from ai_optimizer_spark.sources.multimodal import (
    documents_as_media,
    extract_features,
)
from ai_optimizer_spark.tables import load_tables


def test_media_feature_extraction(spark, sf_small):
    docs = load_tables(spark, sf_small)["documents"].limit(20)
    media = documents_as_media(docs)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    r0 = next(r for r in rows if r.media_id == "m_0")
    doc0 = docs.filter(F.col("doc_id") == 0).collect()[0]
    payload = doc0.text.encode("utf-8")
    assert r0.byte_len == len(payload)
    assert r0.content_md5 == hashlib.md5(payload).hexdigest()
    assert len(r0.feature) == 8 and r0.decode_status == "stub_decoded"
    # deterministic: same payload → same stub feature
    digest = hashlib.md5(payload).digest()
    assert [round(x, 6) for x in r0.feature] == [round(b / 255.0, 6) for b in digest[:8]]


def test_unknown_kind_survives(spark):
    media = spark.createDataFrame(
        [("m1", "hologram", b"xyz", None)],
        "media_id string, kind string, payload binary, meta struct<mime:string, width:int, height:int, duration_ms:int>",
    )
    row = extract_features(media).collect()[0]
    assert row.decode_status == "unsupported" and row.feature is None


def test_loader_dispatch(spark, tmp_path):
    (tmp_path / "a.txt").write_text("plain text body")
    (tmp_path / "b.md").write_text("# heading")
    (tmp_path / "weird.xyz").write_text("???")
    # a fake pdf: pypdf is absent in this container → loader_unavailable
    (tmp_path / "c.pdf").write_bytes(b"%PDF-1.4 fake")
    files = spark.read.format("binaryFile").load(str(tmp_path))
    out = {r.filename: r for r in load_documents(files).collect()}
    assert out["a.txt"].status == "ok" and out["a.txt"].page_content == "plain text body"
    assert out["b.md"].status == "ok"
    assert out["weird.xyz"].status == "unsupported:xyz"
    assert out["c.pdf"].status in ("loader_unavailable:pdf", "error:PdfReadError")


def test_resize_updates_images_only(spark, sf_small):
    from pyspark.sql import functions as F

    from ai_optimizer_spark.sources.multimodal import documents_as_media, resize_images
    from ai_optimizer_spark.tables import load_tables

    media = documents_as_media(load_tables(spark, sf_small)["documents"].limit(30))
    out = resize_images(media, width=64, height=64)
    assert out.schema.simpleString() == media.schema.simpleString()  # schema-stable
    imgs = out.filter(F.col("kind") == "image")
    assert imgs.count() > 0
    assert imgs.filter(F.col("meta.width") != 64).count() == 0
    assert imgs.filter(F.length("payload") != 64 * 64 // 64).count() == 0
    # non-images untouched: payload still decodes to the original text
    audio_in = {r.media_id: bytes(r.payload) for r in media.filter(F.col("kind") == "audio").collect()}
    audio_out = {r.media_id: bytes(r.payload) for r in out.filter(F.col("kind") == "audio").collect()}
    assert audio_in == audio_out


def test_frame_sampling_is_one_to_n_and_deterministic(spark, sf_small):
    from pyspark.sql import functions as F

    from ai_optimizer_spark.sources.multimodal import documents_as_media, sample_frames
    from ai_optimizer_spark.tables import load_tables

    media = documents_as_media(load_tables(spark, sf_small)["documents"].limit(30))
    n_videos = media.filter(F.col("kind") == "video").count()
    frames = sample_frames(media, every_ms=100, max_frames=3)
    assert n_videos > 0
    assert frames.count() > n_videos  # 1→N expansion happened
    assert frames.filter(F.col("kind") != "image").count() == 0
    # deterministic: same input → same frame payload digests
    a = {r.media_id: bytes(r.payload) for r in frames.collect()}
    b = {r.media_id: bytes(r.payload) for r in sample_frames(media, 100, 3).collect()}
    assert a == b


def test_repartition_for_payloads(spark, sf_small):
    from ai_optimizer_spark.sources.multimodal import (
        documents_as_media,
        repartition_for_payloads,
    )
    from ai_optimizer_spark.tables import load_tables

    media = documents_as_media(load_tables(spark, sf_small)["documents"])
    sized = repartition_for_payloads(media, target_bytes=10_000)
    assert sized.rdd.getNumPartitions() >= 2
    assert sized.count() == media.count()


def test_audio_windowing_is_one_to_n_and_composes(spark, sf_small):
    """Framing arithmetic: n_windows = clamp((dur - win)//hop + 1, 1, max);
    only audio rows window; windows feed extract_features unchanged."""
    from ai_optimizer_spark.sources.multimodal import (
        documents_as_media,
        extract_features,
        window_audio,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    media = documents_as_media(docs)
    windows = window_audio(media, window_ms=100, hop_ms=50, max_windows=4)
    rows = windows.collect()
    assert rows and all(r.kind == "audio" for r in rows)
    n_audio = media.filter("kind = 'audio'").count()
    per_src = {}
    for r in rows:
        src = r.media_id.rsplit("_w", 1)[0]
        per_src[src] = per_src.get(src, 0) + 1
    assert len(per_src) == n_audio
    assert all(1 <= n <= 4 for n in per_src.values())
    # re-run → identical payloads (deterministic stub kernels)
    again = {r.media_id: bytes(r.payload) for r in windows.collect()}
    assert again == {r.media_id: bytes(r.payload) for r in rows}
    feats = extract_features(windows)
    assert feats.filter("decode_status = 'stub_decoded'").count() == len(rows)


def test_deep_parse_stub_tier_and_table_placeholder(spark, tmp_path):
    """Docling is absent in this container → the converter tier resolves to
    the stub double; deep mode output is markdown with the table-structure
    placeholder block."""
    from ai_optimizer_spark.sources.deep_parse import deep_parse_documents

    (tmp_path / "a.txt").write_text("body text here")
    files = spark.read.format("binaryFile").load(str(tmp_path))
    row = deep_parse_documents(files, parsing_mode="deep").collect()[0]
    assert row.status == "ok" and row.parser == "stub"
    assert row.page_content.startswith("# a.txt")
    assert "body text here" in row.page_content
    assert "| table | structure |" in row.page_content


def test_deep_parse_fast_mode_dispatch(spark, tmp_path):
    """fast mode: txt goes through the fast loader (no markdown wrapping);
    a broken pdf falls back to the converter tier instead of failing the
    file (reference document.py:201-209 fallback)."""
    from ai_optimizer_spark.sources.deep_parse import deep_parse_documents

    (tmp_path / "a.txt").write_text("plain body")
    (tmp_path / "c.pdf").write_bytes(b"%PDF-1.4 fake")
    files = spark.read.format("binaryFile").load(str(tmp_path))
    out = {r.filename: r for r in
           deep_parse_documents(files, parsing_mode="fast").collect()}
    assert out["a.txt"].parser == "fast:txt"
    assert out["a.txt"].page_content == "plain body"
    # pypdf raises LoaderUnavailable here → converter fallback, file survives
    assert out["c.pdf"].status == "ok" and out["c.pdf"].parser == "stub"
    # fast mode stub fallback has no deep table block
    assert "| table |" not in out["c.pdf"].page_content


def test_deep_parse_loader_unavailable_path():
    """The docling entry itself raises LoaderUnavailable when the library is
    absent, and the resolver skips past it to the stub."""
    import pytest

    from ai_optimizer_spark.sources.deep_parse import (
        PARSERS,
        _resolve_converter,
    )
    from ai_optimizer_spark.sources.documents import LoaderUnavailable

    with pytest.raises(LoaderUnavailable):
        PARSERS["docling"]("x.pdf", b"", True)
    tier, fn = _resolve_converter()
    assert tier == "stub"
    assert fn("x.txt", b"hello", False).endswith("hello")


def test_real_wav_decode_roundtrip_and_tier(spark):
    """mm4's path: a genuine RIFF/WAV payload round-trips through the
    stdlib encoder and the engine's REAL parser; extract_features routes
    it to the real tier (decode_status='decoded', stats features) while
    non-container payloads stay on the md5 stub (mm2/mm3 contract)."""
    import math

    from ai_optimizer_spark.sources.multimodal import (
        decode_wav,
        encode_wav,
        extract_features,
    )

    samples = [((7 + i * 7919) % 65536) - 32768 for i in range(100)]
    s = decode_wav(encode_wav(samples))
    assert s["n_samples"] == 100 and s["framerate"] == 16000
    assert s["mean_sample"] == sum(samples) / 100
    assert s["rms"] == math.sqrt(sum(x * x for x in samples) / 100)

    media = spark.createDataFrame(
        [
            ("real", "audio", encode_wav(samples), None),
            ("stub", "audio", b"deadbeef" * 4, None),
        ],
        "media_id string, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert rows["real"].decode_status == "decoded"
    assert rows["real"].feature[0] == 100.0  # n_samples leads the layout
    assert rows["stub"].decode_status == "stub_decoded"


def test_real_png_decode_all_filters(spark):
    """decode_png reconstructs every standard filter type (0-4) and
    verifies chunk CRCs; a corrupted CRC is rejected loudly."""
    import struct
    import zlib

    import pytest

    from ai_optimizer_spark.sources.multimodal import decode_png, encode_png_gray

    w, h = 6, 5
    px = [(11 + 3 * i) % 256 for i in range(w * h)]
    d = decode_png(encode_png_gray(px, w, h))
    assert (d["width"], d["height"]) == (w, h)
    assert d["mean_px"] == sum(px) / len(px)

    # hand-filtered variant: one row per filter type, same pixel truth
    rows = [px[y * w : (y + 1) * w] for y in range(h)]

    def filt(ft, cur, prev):
        out = [ft]
        for x in range(w):
            a = cur[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            pred = {
                0: 0,
                1: a,
                2: b,
                3: (a + b) // 2,
            }.get(ft)
            if pred is None:  # Paeth
                p0 = a + b - c
                pa, pb, pc = abs(p0 - a), abs(p0 - b), abs(p0 - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((cur[x] - pred) & 0xFF)
        return bytes(out)

    raw, prev = b"", [0] * w
    for y, r in enumerate(rows):
        raw += filt(y % 5, r, prev)
        prev = r

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    d2 = decode_png(png)
    assert d2["mean_px"] == sum(px) / len(px)
    assert d2["min_px"] == min(px) and d2["max_px"] == max(px)

    bad = bytearray(png)
    bad[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
