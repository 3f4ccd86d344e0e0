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


# ---------------------------------------------------------------------------
# stdlib fallback parsers: real docx/pptx/xlsx/pdf payloads, no third-party
# libs required (the OOXML formats are zipped XML; simple PDFs are
# FlateDecode text streams)
# ---------------------------------------------------------------------------

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def _mk_docx() -> bytes:
    import io
    import zipfile

    doc = (
        f'<w:document xmlns:w="{W_NS}"><w:body>'
        "<w:p><w:r><w:t>first paragraph</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>second </w:t></w:r><w:r><w:t>joined</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


def _mk_pptx() -> bytes:
    import io
    import zipfile

    def slide(txt):
        return f'<p:sld xmlns:a="{A_NS}" xmlns:p="x"><a:t>{txt}</a:t></p:sld>'

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/slides/slide1.xml", slide("slide one"))
        zf.writestr("ppt/slides/slide2.xml", slide("slide two"))
    return buf.getvalue()


def _mk_xlsx() -> bytes:
    import io
    import zipfile

    shared = (
        f'<sst xmlns="{S_NS}"><si><t>alpha</t></si><si><t>beta</t></si></sst>'
    )
    sheet = (
        f'<worksheet xmlns="{S_NS}"><sheetData>'
        '<row><c t="s"><v>0</v></c><c><v>42</v></c></row>'
        '<row><c t="s"><v>1</v></c><c><v>7</v></c></row>'
        "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def _mk_pdf() -> bytes:
    import zlib

    content = b"BT /F1 12 Tf (Hello graft) Tj (paren \\(ok\\)) Tj ET"
    deflated = zlib.compress(content)
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(deflated)).encode()
        + b" >>\nstream\n"
        + deflated
        + b"endstream\nendobj\n%%EOF"
    )


def test_stdlib_docx_paragraphs():
    from ai_optimizer_spark.sources.documents import _load_docx

    out = _load_docx("a.docx", _mk_docx())
    assert out == "first paragraph\nsecond joined"


def test_stdlib_pptx_slides_in_order():
    from ai_optimizer_spark.sources.documents import _load_pptx

    assert _load_pptx("a.pptx", _mk_pptx()) == "slide one\nslide two"


def test_stdlib_xlsx_tsv_shape():
    from ai_optimizer_spark.sources.documents import _load_xlsx

    assert _load_xlsx("a.xlsx", _mk_xlsx()) == "alpha\t42\nbeta\t7"


def test_stdlib_pdf_text_layer():
    from ai_optimizer_spark.sources.documents import _load_pdf

    out = _load_pdf("a.pdf", _mk_pdf())
    assert "Hello graft" in out and "paren (ok)" in out


def test_pdf_without_text_layer_is_unavailable():
    import pytest

    from ai_optimizer_spark.sources.documents import (
        LoaderUnavailable,
        _load_pdf,
    )

    with pytest.raises(LoaderUnavailable):
        _load_pdf("img.pdf", b"%PDF-1.4 no streams here %%EOF")


def test_loader_dispatch_integrates_stdlib_tier(spark, tmp_path):
    """End-to-end through load_documents: real OOXML payloads parse OK via
    the stdlib tier (no third-party libs in this container)."""
    from ai_optimizer_spark.sources.documents import load_documents

    (tmp_path / "d.docx").write_bytes(_mk_docx())
    (tmp_path / "p.pptx").write_bytes(_mk_pptx())
    (tmp_path / "x.xlsx").write_bytes(_mk_xlsx())
    (tmp_path / "f.pdf").write_bytes(_mk_pdf())
    files = spark.read.format("binaryFile").load(str(tmp_path))
    out = {r.filename: r for r in load_documents(files).collect()}
    assert out["d.docx"].status == "ok" and "first paragraph" in out["d.docx"].page_content
    assert out["p.pptx"].status == "ok" and "slide two" in out["p.pptx"].page_content
    assert out["x.xlsx"].status == "ok" and "alpha\t42" in out["x.xlsx"].page_content
    assert out["f.pdf"].status == "ok" and "Hello graft" in out["f.pdf"].page_content
