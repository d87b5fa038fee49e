"""S7 remote fetch against a local http.server fixture (reference parity:
io_utils.py:15-41 fetch semantics, io_utils.py:44-60 bounded thread pool)."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def http_root(tmp_path_factory):
    import http.server
    import socketserver

    root = tmp_path_factory.mktemp("http")
    (root / "a.bin").write_bytes(b"payload-a" * 100)
    (root / "b.bin").write_bytes(b"payload-b")

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, directory=str(root), **kwargs)

        def log_message(self, *args):  # quiet
            pass

    with socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}"
        srv.shutdown()


def test_fetch_urls_content_and_errors(spark, http_root):
    from jigsaw_spark.sources.http_fetch import fetch_urls

    urls = spark.createDataFrame(
        [
            ("a", f"{http_root}/a.bin"),
            ("b", f"{http_root}/b.bin"),
            ("missing", f"{http_root}/nope.bin"),
        ],
        "image_id string, url string",
    )
    out = {r["image_id"]: r for r in fetch_urls(urls, num_threads=4).collect()}
    assert bytes(out["a"]["content"]) == b"payload-a" * 100
    assert out["a"]["status"] == 200 and out["a"]["error"] is None
    assert bytes(out["b"]["content"]) == b"payload-b"
    assert out["missing"]["content"] is None
    assert out["missing"]["status"] == 404
    assert "404" in out["missing"]["error"]


def test_fetch_connection_refused_is_row_error(spark):
    from jigsaw_spark.sources.http_fetch import fetch_urls

    urls = spark.createDataFrame(
        [("dead", "http://127.0.0.1:9/none")], "image_id string, url string"
    )
    row = fetch_urls(urls, num_threads=2, timeout=1.0, max_retries=0).collect()[0]
    assert row["content"] is None and row["status"] is None
    assert row["error"]


def test_fetch_composes_with_decode_meta(spark):
    """fetch → decode_image_meta: the reference's load_remote_image shape."""
    import http.server
    import socketserver

    import numpy as np

    from jigsaw_spark.multimodal.binary_ops import decode_image_meta
    from jigsaw_spark.multimodal.png_codec import encode_png
    from jigsaw_spark.sources.http_fetch import fetch_urls

    arr = np.zeros((5, 7, 3), dtype=np.uint8)
    arr[1:3, 2:4] = (9, 8, 7)
    png = encode_png(arr)

    class OneFile(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(png)

        def log_message(self, *args):
            pass

    with socketserver.ThreadingTCPServer(("127.0.0.1", 0), OneFile) as srv:
        port = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        urls = spark.createDataFrame(
            [("p", f"http://127.0.0.1:{port}/img.png")],
            "image_id string, url string",
        )
        fetched = fetch_urls(urls).select(
            "image_id",
            F.lit("image").alias("kind"),
            F.col("url").alias("path"),
            F.length("content").cast("long").alias("length"),
            "content",
        )
        meta = decode_image_meta(fetched).collect()[0]
        srv.shutdown()
    assert meta["format"] == "png"
    assert (meta["width"], meta["height"]) == (7, 5)
