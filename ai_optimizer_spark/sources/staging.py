"""ZIP ingest staging — SURVEY.md §2.1 S10.

Port of the reference's capped, atomic ZIP extraction
(embed/staging.py:119-241): per-archive caps (file count / total bytes /
per-file bytes), nested-archive rejection, extraction into a private
staging dir that is promoted atomically so a failed extract never leaves a
half-ingested corpus. This runs driver-side before the distributed
`binaryFile` scan — unzip is inherently sequential per archive; the
parallelism belongs to the scan that follows.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile

MAX_FILES = 500
MAX_TOTAL_BYTES = 500 * 1024 * 1024
MAX_FILE_BYTES = 100 * 1024 * 1024


class ZipIngestError(ValueError):
    pass


def extract_zip(zip_path: str, dest_dir: str) -> list[str]:
    """Validate caps, extract to a temp staging dir, atomically promote.
    Returns the extracted file names (relative)."""
    with zipfile.ZipFile(zip_path) as zf:
        infos = [i for i in zf.infolist() if not i.is_dir()]
        if len(infos) > MAX_FILES:
            raise ZipIngestError(f"zip has {len(infos)} files > cap {MAX_FILES}")
        total = sum(i.file_size for i in infos)
        if total > MAX_TOTAL_BYTES:
            raise ZipIngestError(f"zip expands to {total} bytes > cap {MAX_TOTAL_BYTES}")
        for i in infos:
            if i.file_size > MAX_FILE_BYTES:
                raise ZipIngestError(f"{i.filename} is {i.file_size} bytes > cap {MAX_FILE_BYTES}")
            if i.filename.lower().endswith((".zip", ".jar", ".tar", ".gz", ".7z")):
                raise ZipIngestError(f"nested archive blocked: {i.filename}")
            name = os.path.normpath(i.filename)
            if name.startswith("..") or os.path.isabs(name):
                raise ZipIngestError(f"path traversal blocked: {i.filename}")

        staging = tempfile.mkdtemp(prefix=".staging_", dir=os.path.dirname(dest_dir) or ".")
        try:
            for i in infos:
                zf.extract(i, staging)
            if os.path.exists(dest_dir):
                shutil.rmtree(dest_dir)
            os.rename(staging, dest_dir)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
    return sorted(
        os.path.relpath(os.path.join(r, f), dest_dir)
        for r, _, fs in os.walk(dest_dir)
        for f in fs
    )
