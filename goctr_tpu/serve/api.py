"""HTTP scoring API + dashboard endpoints.

Endpoint/schema parity with the reference gin server
(/root/reference/recommend/api.go):
  POST {api_path}            {"userId": N, "itemIdList": [..]} →
                             {"itemScoreList": [{"itemId","score"}...]}
  GET  /service/useritems    ?page=&size= → users feature overview
  GET  /service/items        ?page=&size= → items feature overview
  GET  /service/overview     dashboard counts
  GET  /service/featuredist  ?kind=items|users → per-feature histograms
  GET  /                     embedded dashboard page

stdlib http.server (no FastAPI in this image); ThreadingHTTPServer gives
concurrent request handling — scoring itself batches through the jitted
predict, so the GIL is released during device execution.
"""
from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

from goctr_tpu.recommend.rcmd import Context, Predictor, Rank

log = logging.getLogger(__name__)

_DASHBOARD_HTML = (Path(__file__).parent / "dashboard.html")


class RecApiServer:

    def __init__(self, predictor: Predictor,
                 api_path: str = "/api/v1/recommend",
                 host: str = "0.0.0.0", port: int = 8080):
        self.predictor = predictor
        self.api_path = api_path
        self.host = host
        self.port = port
        self._httpd: ThreadingHTTPServer | None = None

    # ------------------------------------------------------------ handlers --
    def _rank(self, body: dict) -> tuple[int, dict]:
        user_id = body.get("userId")
        item_ids = body.get("itemIdList") or []
        if not isinstance(user_id, int):
            return 400, {"error": "userId must be an integer"}
        if not item_ids:
            return 400, {"error": "itemIdList is empty"}   # api.go:116
        if hasattr(self.predictor, "rank_direct"):
            # TPU-first path (serve/scorer.py): device-resident table +
            # params; the request ships only ids, and concurrent requests
            # micro-batch into one dispatch
            pairs = self.predictor.rank_direct(
                user_id, [int(i) for i in item_ids])
            return 200, {"itemScoreList": [
                {"itemId": i, "score": s} for i, s in pairs]}
        scores = Rank(Context(), self.predictor, user_id,
                      [int(i) for i in item_ids])
        return 200, {"itemScoreList": [
            {"itemId": s.item_id, "score": s.score} for s in scores]}

    def _overview(self, which: str, offset: int, size: int,
                  opts: dict) -> tuple[int, object]:
        rs = self.predictor.rec_sys
        ctx = Context()
        if which == "useritems":
            if not hasattr(rs, "get_users_feature_overview"):
                return 200, "do not support feature overview"
            return 200, rs.get_users_feature_overview(ctx, offset, size, opts)
        if which == "items":
            if not hasattr(rs, "get_items_feature_overview"):
                return 200, "do not support item overview"
            return 200, rs.get_items_feature_overview(ctx, offset, size, opts)
        if which == "featuredist":
            if not hasattr(rs, "get_feature_distributions"):
                return 200, "do not support feature distributions"
            kind = (opts.get("kind") or ["items"])[0]
            return 200, rs.get_feature_distributions(ctx, kind=kind)
        if not hasattr(rs, "get_dashboard_overview"):
            return 200, "do not support overview"
        return 200, rs.get_dashboard_overview(ctx)

    # -------------------------------------------------------------- server --
    def _make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                log.debug("http: " + fmt, *args)

            def _send(self, code: int, payload):
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _send_html(self, html: str):
                data = html.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                url = urlparse(self.path)
                q = {k: v for k, v in parse_qs(url.query).items()}
                size = int(q.get("size", ["0"])[0] or 0)
                page = int(q.get("page", ["0"])[0] or 0)
                offset = (page - 1) * size if size > 0 and page > 0 else 0
                if url.path.startswith("/service/"):
                    which = url.path.rsplit("/", 1)[-1]
                    try:
                        code, payload = server_self._overview(
                            which, offset, size, q)
                    except Exception as e:
                        code, payload = 500, {"error": str(e)}
                    self._send(code, payload)
                elif url.path in ("/", "/index.html"):
                    try:
                        self._send_html(_DASHBOARD_HTML.read_text())
                    except OSError:
                        self._send_html("<html><body>goctr_tpu</body></html>")
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                url = urlparse(self.path)
                if url.path != server_self.api_path:
                    self._send(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError) as e:
                    self._send(400, {"error": f"bad request: {e}"})
                    return
                try:
                    code, payload = server_self._rank(body)
                except Exception as e:
                    log.exception("rank failed")
                    code, payload = 500, {"error": str(e)}
                self._send(code, payload)

        return Handler

    def start(self, background: bool = False) -> "RecApiServer":
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._make_handler())
        self.port = self._httpd.server_address[1]   # resolve port 0
        if background:
            threading.Thread(target=self._httpd.serve_forever,
                             daemon=True).start()
        else:
            log.info("serving on %s:%d", self.host, self.port)
            self._httpd.serve_forever()
        return self

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None


def start_http_api(predictor: Predictor, path: str = "/api/v1/recommend",
                   addr: str = ":8080") -> None:
    """Blocking serve (StartHttpApi parity, api.go:27)."""
    host, _, port = addr.rpartition(":")
    server = RecApiServer(predictor, api_path=path, host=host or "0.0.0.0",
                          port=int(port))
    server.start(background=False)
