"""S5 deep parse — the Docling-tier document converter (OCR + table
structure) as an Arrow-batched mapInPandas stage.

Reference semantics (embed/document.py:192-222 `_load_docling_document` +
:36-51 `_get_docling_converter`):
  * parsing_mode="fast"  → try the lightweight per-extension loader first
    (pypdf/python-docx/…), fall back to the converter tier on any failure;
  * parsing_mode="deep"  → always the converter tier, with OCR and
    table-structure analysis enabled;
  * converter output is a markdown export of the parsed document;
  * the converter is heavyweight and constructed once, then cached
    (document.py:36-51 LRU) — here: resolved once per partition.

Docling is not in this container, so the converter tier is a `PARSERS`
registry like multimodal's `DECODERS`: `docling` (import-gated, raises
`LoaderUnavailable` when absent) and `stub` — a deterministic double that
emits markdown-ish text (heading + body) plus a table-structure placeholder
block, so the Spark-side plumbing (dispatch order, 1-file→1-chunk schema,
per-partition converter init, Arrow batching) is real and tested end to end.
Swapping in real Docling is a one-entry registry change.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .documents import LOADERS, LoaderUnavailable

DEEP_OUT_SCHEMA = (
    "path string, filename string, page_content string, "
    "parser string, status string"
)

# Extensions the fast tier attempts in fast mode (reference _FAST_LOADERS,
# document.py:183-189 — binary office formats only; txt/md never needed a
# converter in the reference and keep their plain fast load here too).
FAST_EXTENSIONS = {"pdf", "docx", "pptx", "xlsx", "txt", "md", "csv", "json"}


def _docling_markdown(name: str, payload: bytes, deep: bool) -> str:
    """Real Docling converter tier (import-gated): convert and export
    markdown, OCR/table-structure on when `deep`."""
    try:
        from docling.document_converter import DocumentConverter  # type: ignore
    except ImportError as exc:
        raise LoaderUnavailable("docling not installed") from exc
    import tempfile

    # Docling converts from a source path; spool the payload.
    with tempfile.NamedTemporaryFile(suffix=os.path.splitext(name)[1]) as tmp:
        tmp.write(payload)
        tmp.flush()
        converter = DocumentConverter()
        result = converter.convert(source=tmp.name)
        doc = result.document
        try:
            return str(doc.export_to_markdown())
        except Exception:
            return str(doc.export_to_text())


def _stub_markdown(name: str, payload: bytes, deep: bool) -> str:
    """Deterministic converter double: markdown-ish export — a title
    heading, the decoded body, and (in deep mode) a table-structure
    placeholder block keyed by the payload digest, standing in for Docling's
    table-structure analysis output."""
    body = (payload or b"").decode("utf-8", errors="replace").strip()
    digest = hashlib.md5(payload or b"").hexdigest()
    parts = [f"# {os.path.basename(name)}", "", body]
    if deep:
        parts += [
            "",
            "| table | structure |",
            "| --- | --- |",
            f"| placeholder | {digest[:12]} |",
        ]
    return "\n".join(parts)


# Converter-tier registry, preference-ordered: first resolvable entry wins.
PARSERS: dict[str, Callable[[str, bytes, bool], str]] = {
    "docling": _docling_markdown,
    "stub": _stub_markdown,
}


def _resolve_converter() -> tuple[str, Callable[[str, bytes, bool], str]]:
    """Pick the first converter whose import succeeds — the once-per-
    partition analog of the reference's cached converter construction.
    Probes with empty input; `LoaderUnavailable` moves to the next entry."""
    last_exc: Exception | None = None
    for tier, fn in PARSERS.items():
        try:
            fn("probe.txt", b"", False)
            return tier, fn
        except LoaderUnavailable as exc:
            last_exc = exc
    raise LoaderUnavailable("no converter tier available") from last_exc


def deep_parse_documents(
    binary_files: DataFrame, parsing_mode: str = "deep"
) -> DataFrame:
    """S5: (path, content) binary rows → parsed markdown chunks.

    fast mode: per-extension fast loader first, converter on failure
    (reference dispatch, document.py:201-209). deep mode: converter always,
    OCR + table structure on. status ∈ {ok, error:<type>}; `parser` records
    which tier produced the text (`fast:<ext>`, `docling`, `stub`)."""
    deep = parsing_mode == "deep"

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tier, convert = _resolve_converter()  # once per partition
        for pdf in batches:
            out = {"path": [], "filename": [], "page_content": [], "parser": [], "status": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                filename = os.path.basename(path)
                ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
                payload = bytes(content or b"")
                text, parser, status = "", tier, "ok"
                fast = LOADERS.get(ext) if not deep and ext in FAST_EXTENSIONS else None
                try:
                    if fast is not None:
                        try:
                            text = fast(filename, payload)
                            parser = f"fast:{ext}"
                        except Exception:
                            # reference: fast-loader failure falls back to
                            # the converter, it never fails the file
                            text = convert(filename, payload, deep)
                    else:
                        text = convert(filename, payload, deep)
                except Exception as exc:  # controlled failure, job survives
                    status = f"error:{type(exc).__name__}"
                out["path"].append(path)
                out["filename"].append(filename)
                out["page_content"].append(text)
                out["parser"].append(parser)
                out["status"].append(status)
            yield pd.DataFrame(out)

    return binary_files.select("path", "content").mapInPandas(_parse, DEEP_OUT_SCHEMA)
