"""HttpFetcher semantics against an in-process localhost HTTP server
(no external network needed): retry on 5xx, no retry on 4xx, timeout ->
bounded retries -> status 0, redirect following, and the map_batches
integration (one output row per input row, input order)."""

import threading
import time
from collections import Counter
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from lulu_crawler_ray.pipelines.steps import HttpFetcher

HITS: Counter = Counter()


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        HITS[self.path] += 1
        if self.path == "/ok":
            body = b"<html>ok</html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/flaky":
            if HITS[self.path] < 2:  # first attempt 503, then 200
                self.send_response(503)
                self.send_header("Content-Length", "0")
                self.end_headers()
            else:
                body = b"recovered"
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
        elif self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/ok")
            self.send_header("Content-Length", "0")
            self.end_headers()
        elif self.path == "/slow":
            time.sleep(1.5)
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()
        else:
            body = b"gone"
            self.send_response(404)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_ok_and_redirect(server):
    f = HttpFetcher(timeout_s=2.0, max_retries=2, backoff_s=0.01)
    s, ct, body = f._fetch(f"{server}/ok")
    assert (s, body) == (200, b"<html>ok</html>")
    assert ct.startswith("text/html")
    s, _, body = f._fetch(f"{server}/redirect")
    assert (s, body) == (200, b"<html>ok</html>")  # followed to /ok


def test_retry_on_503_then_success(server):
    HITS.clear()
    f = HttpFetcher(timeout_s=2.0, max_retries=2, backoff_s=0.01)
    s, _, body = f._fetch(f"{server}/flaky")
    assert (s, body) == (200, b"recovered")
    assert HITS["/flaky"] == 2  # exactly one retry


def test_no_retry_on_404(server):
    HITS.clear()
    f = HttpFetcher(timeout_s=2.0, max_retries=3, backoff_s=0.01)
    s, _, body = f._fetch(f"{server}/missing")
    assert (s, body) == (404, b"gone")
    assert HITS["/missing"] == 1  # 4xx recorded once, never retried


def test_timeout_exhausts_retries_to_status_zero(server):
    HITS.clear()
    f = HttpFetcher(timeout_s=0.3, max_retries=2, backoff_s=0.01)
    s, _, body = f._fetch(f"{server}/slow")
    assert (s, body) == (0, b"")
    assert HITS["/slow"] == 3  # initial + 2 retries, all timed out


def test_connection_refused_status_zero():
    f = HttpFetcher(timeout_s=0.3, max_retries=1, backoff_s=0.01)
    s, _, body = f._fetch("http://127.0.0.1:9/never")  # discard port
    assert (s, body) == (0, b"")


def test_map_batches_integration(server, ray_session):
    import ray.data

    t = pa.table(
        {"url": pa.array([f"{server}/ok", f"{server}/missing", f"{server}/redirect"])}
    )
    ds = ray.data.from_arrow(t)
    out = (
        ds.map_batches(
            HttpFetcher, fn_constructor_kwargs={"timeout_s": 2.0}, batch_format="pyarrow",
            concurrency=1, batch_size=None,
        )
        .to_pandas()
    )
    assert list(out["status"]) == [200, 404, 200]  # input order preserved
    assert out["body"][0] == b"<html>ok</html>"
