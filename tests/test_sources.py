"""Sources layer tests: listing, extension filter, JSON/CSV round-trips,
ZIP staging caps, web sectioning."""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

from ai_optimizer_spark.sources.files import (
    SUPPORTED_EXTENSIONS,
    filter_supported,
    list_objects,
    read_chunks_json,
    read_csv,
    write_chunks_json,
    write_csv,
)
from ai_optimizer_spark.sources.staging import (
    MAX_FILES,
    ZipIngestError,
    extract_zip,
)
from ai_optimizer_spark.sources.webscrape import (
    extract_sections,
    sections_to_df,
    slugify,
)


def test_list_objects_and_extension_filter(spark, tmp_path):
    for name in ("a.txt", "b.pdf", "c.exe", "d.MD"):
        (tmp_path / name).write_text("x" * 10)
    listing = list_objects(spark, str(tmp_path))
    rows = {r.name: r for r in listing.collect()}
    assert set(rows) == {"a.txt", "b.pdf", "c.exe", "d.MD"}
    assert rows["a.txt"].size == 10
    kept = {r.name for r in filter_supported(listing).collect()}
    assert kept == {"a.txt", "b.pdf", "d.MD"}  # extension match is case-folded


def test_chunk_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("c1", "hello", {"source": "s1", "start_index": "0"})],
        "id string, page_content string, metadata map<string,string>",
    )
    path = str(tmp_path / "chunks")
    write_chunks_json(df, path)
    back = read_chunks_json(spark, path)
    row = back.collect()[0]
    assert (row.id, row.page_content, dict(row.metadata)) == (
        "c1",
        "hello",
        {"source": "s1", "start_index": "0"},
    )


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    path = str(tmp_path / "out_csv")
    write_csv(df, path)
    back = read_csv(spark, path, "k int, v string")
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_zip_extract_and_caps(tmp_path):
    zp = tmp_path / "ok.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("docs/x.txt", "hello")
        zf.writestr("y.md", "world")
    dest = str(tmp_path / "corpus")
    names = extract_zip(str(zp), dest)
    assert names == ["docs/x.txt", "y.md"]
    assert open(os.path.join(dest, "y.md")).read() == "world"

    nested = tmp_path / "nested.zip"
    with zipfile.ZipFile(nested, "w") as zf:
        zf.writestr("inner.zip", "zzz")
    with pytest.raises(ZipIngestError, match="nested"):
        extract_zip(str(nested), str(tmp_path / "c2"))

    traversal = tmp_path / "trav.zip"
    with zipfile.ZipFile(traversal, "w") as zf:
        zf.writestr("../evil.txt", "zzz")
    with pytest.raises(ZipIngestError, match="traversal"):
        extract_zip(str(traversal), str(tmp_path / "c3"))

    crowded = tmp_path / "crowd.zip"
    with zipfile.ZipFile(crowded, "w") as zf:
        for i in range(MAX_FILES + 1):
            zf.writestr(f"f{i}.txt", "x")
    with pytest.raises(ZipIngestError, match="cap"):
        extract_zip(str(crowded), str(tmp_path / "c4"))


HTML = """
<html><head><script>junk()</script><style>.x{}</style></head>
<body><nav>menu menu</nav>
<p>intro text here</p>
<h2>Getting Started</h2><p>first   steps</p>
<section><p>standalone section body</p></section>
<h3>Énçödîng Títle!</h3><p>accented section</p>
<footer>footer junk</footer></body></html>
"""


def test_extract_sections_and_slugs(spark):
    secs = extract_sections(HTML)
    slugs = [s["slug"] for s in secs]
    assert slugs == ["intro", "getting-started", "section", "encoding-title"]
    texts = {s["slug"]: s["text"] for s in secs}
    assert texts["intro"] == "intro text here"
    assert texts["getting-started"] == "first steps"  # whitespace collapsed
    assert "menu" not in " ".join(texts.values())  # nav stripped
    df = sections_to_df(spark, "http://example.test/page", HTML)
    assert df.count() == 4 and df.columns == ["url", "slug", "title", "text"]


def test_slugify_edge_cases():
    assert slugify("Hello, World!") == "hello-world"
    assert slugify("   ") == "section"
    assert slugify("x" * 100) == "x" * 60
