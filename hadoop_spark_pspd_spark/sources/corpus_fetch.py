"""S7: HTTP corpus fetch -> landed text files -> S1 recursive scan.

Mirrors the reference's Gutenberg downloader semantics
(cluster/shared/download_gutenberg_corpus.sh:36-87): per book id, try a
candidate URL list in order (plain .txt variants first, then zip
archives which are extracted), land the winner as
``gutenberg-<id>.txt`` in the data dir, skip existing files unless
``overwrite``, and report per-id failures without aborting the batch.

This is deliberately an out-of-engine ingestion utility (the engine-side
entry point is the S1 recursive text scan over the landed directory, see
``sources/readers.py``): corpus acquisition is a driver-side, low-volume
step — at 100 TB the corpus arrives via bulk transfer, not HTTP loops —
so there is no Spark dependency here, just stdlib HTTP.
"""

from __future__ import annotations

import io
import urllib.error
import urllib.request
import zipfile
from pathlib import Path

GUTENBERG_BASES = (
    "https://www.gutenberg.org/cache/epub",
    "https://www.gutenberg.org/files",
)
DEFAULT_BOOK_IDS = (
    11, 84, 98, 1342, 1400, 158, 345, 4300, 1661, 2554, 2701, 5200,
)


def candidate_urls(
    book_id: int, cache_base: str, files_base: str
) -> list[str]:
    """The reference's candidate list, in its order of likelihood
    (download_gutenberg_corpus.sh:50-60)."""
    return [
        f"{cache_base}/{book_id}/pg{book_id}.txt",
        f"{cache_base}/{book_id}/pg{book_id}.txt.utf8",
        f"{files_base}/{book_id}/{book_id}-0.txt",
        f"{files_base}/{book_id}/{book_id}.txt",
        f"{files_base}/{book_id}/{book_id}-8.txt",
        f"{files_base}/{book_id}/{book_id}-0.txt.utf8",
        f"{files_base}/{book_id}/{book_id}.txt.utf8",
        f"{files_base}/{book_id}/{book_id}.zip",
        f"{files_base}/{book_id}/{book_id}-0.zip",
    ]


def _get(url: str, timeout: float) -> bytes | None:
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            if resp.status != 200:
                return None
            return resp.read()
    except (urllib.error.URLError, OSError):
        return None


def _extract_zip(payload: bytes) -> bytes | None:
    """unzip -p analog: concatenate the archive's file contents."""
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            names = [n for n in zf.namelist() if not n.endswith("/")]
            if not names:
                return None
            return b"".join(zf.read(n) for n in names)
    except zipfile.BadZipFile:
        return None


def fetch_book(
    book_id: int,
    data_dir: str | Path,
    cache_base: str = GUTENBERG_BASES[0],
    files_base: str = GUTENBERG_BASES[1],
    overwrite: bool = False,
    timeout: float = 30.0,
) -> Path | None:
    """Land one book as ``gutenberg-<id>.txt``; None if every URL failed."""
    data_dir = Path(data_dir)
    data_dir.mkdir(parents=True, exist_ok=True)
    dest = data_dir / f"gutenberg-{book_id}.txt"
    if dest.exists() and not overwrite:
        return dest
    for url in candidate_urls(book_id, cache_base, files_base):
        payload = _get(url, timeout)
        if payload is None:
            continue
        if url.endswith(".zip"):
            extracted = _extract_zip(payload)
            if extracted is None:
                continue
            payload = extracted
        dest.write_bytes(payload)
        return dest
    return None


def fetch_corpus(
    book_ids=DEFAULT_BOOK_IDS,
    data_dir: str | Path = "/tmp/pspd_gutenberg",
    cache_base: str = GUTENBERG_BASES[0],
    files_base: str = GUTENBERG_BASES[1],
    overwrite: bool = False,
    timeout: float = 30.0,
) -> tuple[list[Path], list[int]]:
    """Fetch the id list; -> (landed paths, failed ids). Failures don't
    abort the batch (download_gutenberg_corpus.sh:92-99)."""
    landed: list[Path] = []
    failed: list[int] = []
    for book_id in book_ids:
        path = fetch_book(
            book_id, data_dir, cache_base, files_base, overwrite, timeout
        )
        if path is None:
            failed.append(book_id)
        else:
            landed.append(path)
    return landed, failed
