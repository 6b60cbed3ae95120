"""S7: HTTP corpus fetch against a local HTTP server, then S1 scan."""

from __future__ import annotations

import http.server
import io
import threading
import zipfile

import pytest

from hadoop_spark_pspd_spark.operators.wordcount import wordcount_text_dir
from hadoop_spark_pspd_spark.sources.corpus_fetch import (
    candidate_urls,
    fetch_book,
    fetch_corpus,
)

BOOK_7 = b"pride and prejudice and spark\n"
BOOK_9 = b"moby dick dick\n"


class _Handler(http.server.BaseHTTPRequestHandler):
    """Serves: /cache/epub/7/pg7.txt (first candidate hit), and for id 9
    only the zip fallback /files/9/9.zip — everything else 404s."""

    def do_GET(self):  # noqa: N802 - BaseHTTPRequestHandler API
        if self.path == "/cache/epub/7/pg7.txt":
            body = BOOK_7
        elif self.path == "/files/9/9.zip":
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as zf:
                zf.writestr("9.txt", BOOK_9)
            body = buf.getvalue()
        else:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture()
def corpus_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address
    yield f"http://{host}:{port}"
    srv.shutdown()
    srv.server_close()


def test_candidate_order_matches_reference():
    urls = candidate_urls(11, "C", "F")
    assert urls[0] == "C/11/pg11.txt"
    assert urls[-2:] == ["F/11/11.zip", "F/11/11-0.zip"]
    assert len(urls) == 9


def test_fetch_first_candidate_and_zip_fallback(corpus_server, tmp_path):
    base_c = f"{corpus_server}/cache/epub"
    base_f = f"{corpus_server}/files"
    landed, failed = fetch_corpus(
        [7, 9, 999], tmp_path, base_c, base_f, timeout=5
    )
    assert failed == [999]  # failures don't abort the batch
    assert [p.name for p in landed] == ["gutenberg-7.txt", "gutenberg-9.txt"]
    assert landed[0].read_bytes() == BOOK_7
    assert landed[1].read_bytes() == BOOK_9  # extracted from the zip

    # idempotent skip: second fetch must not re-download (server gone)
    marker = b"locally modified\n"
    landed[0].write_bytes(marker)
    again = fetch_book(7, tmp_path, "http://127.0.0.1:1", "http://127.0.0.1:1")
    assert again is not None and again.read_bytes() == marker
    # overwrite=1 analog re-downloads
    re_fetched = fetch_book(7, tmp_path, base_c, base_f, overwrite=True)
    assert re_fetched.read_bytes() == BOOK_7


def test_landed_corpus_feeds_s1_wordcount(spark, corpus_server, tmp_path):
    fetch_corpus(
        [7, 9],
        tmp_path,
        f"{corpus_server}/cache/epub",
        f"{corpus_server}/files",
        timeout=5,
    )
    counts = {
        r["word"]: r["cnt"]
        for r in wordcount_text_dir(spark, str(tmp_path)).collect()
    }
    assert counts["and"] == 2
    assert counts["dick"] == 2
    assert counts["spark"] == 1
