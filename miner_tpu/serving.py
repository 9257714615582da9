"""HTTP scoring server over the news-embedding cache.

``python -m miner_tpu serve @config.txt --saved_model_path ... --port 8400``
starts a threaded stdlib HTTP server that ranks candidate news for a click
history with ZERO PLM calls per request: the corpus is encoded once into the
news-embedding cache at startup (Trainer.serving_context) and every request
runs only the cached tail — candidate gather + poly-attention interests +
fused lookup+score kernel on TPU (trainer.serve_scores).

No reference counterpart: the reference's closest workflow is manual
notebook scoring (reference: helper_val.ipynb); it re-encodes every news
item on every impression and has no serving entry point at all.

API (JSON):
  GET  /healthz            -> {"status": "ok", "num_news": N}
  POST /score              {"history": [news_id, ...],       # oldest first
                            "candidates": [news_id, ...] | null,  # null=corpus
                            "topk": int | null}
                           -> {"results": [[news_id, score], ...]}  # ranked

Candidate counts are bucketed (next power of two, min 16) so the jitted
scoring program compiles once per bucket instead of once per distinct slate
size; bucket-padding rows reuse the pad news (row 0) and are dropped before
ranking.
"""
from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence, Tuple

import numpy as np


def candidate_bucket(n: int, minimum: int = 16) -> int:
    """Next power of two >= max(n, minimum) — bounds the number of compiled
    scoring-program shapes at log2(corpus)."""
    b = minimum
    while b < n:
        b *= 2
    return b


class ScoringService:
    """Request scoring around a ``Trainer.serving_context()``."""

    def __init__(self, trainer):
        self.trainer = trainer
        self.ctx = trainer.serving_context()
        self._row_to_id = {v: k for k, v in self.ctx.store.id_to_row.items()}
        self.his_length = trainer.args.his_length

    @property
    def num_news(self) -> int:
        return self.ctx.store.num_news

    def _idx_of(self, nid: str) -> int:
        row = self.ctx.store.id_to_row.get(nid)
        if row is None:
            raise KeyError(f"unknown news id {nid!r}")
        return row

    def score(
        self,
        history: Sequence[str],
        candidates: Optional[Sequence[str]] = None,
        topk: Optional[int] = None,
    ) -> List[Tuple[str, float]]:
        """Ranked (news_id, score) for one request."""
        his = [self._idx_of(n) for n in history]
        if candidates is not None:
            cand = [self._idx_of(n) for n in candidates]
            cand_ids = list(candidates)
        else:
            cand = list(range(1, self.num_news))  # skip the pad row 0
            cand_ids = [self._row_to_id.get(i, str(i)) for i in cand]
        if not cand:
            return []

        H = min(len(his), self.his_length)
        his_idx = np.zeros((1, self.his_length), np.int32)
        his_idx[0, self.his_length - H:] = his[len(his) - H:]

        C = len(cand)
        C_pad = candidate_bucket(C)
        cand_idx = np.zeros((1, C_pad), np.int32)  # pad slots -> pad news 0
        cand_idx[0, :C] = cand

        ctx = self.ctx
        scores = self.trainer.serve_scores(
            ctx.model, ctx.kind, ctx.params, ctx.cache, cand_idx, his_idx
        )[0, :C]
        order = np.argsort(-scores)
        if topk is not None:
            order = order[:topk]
        return [(cand_ids[i], float(scores[i])) for i in order]


def make_http_server(service: ScoringService, host: str,
                     port: int) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "num_news": service.num_news})
            else:
                self._reply(404, {"error": f"unknown path {self.path!r}"})

        def do_POST(self):
            if self.path != "/score":
                self._reply(404, {"error": f"unknown path {self.path!r}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                history = req.get("history") or []
                if not isinstance(history, list):
                    raise ValueError("'history' must be a list of news ids")
                candidates = req.get("candidates")
                if candidates is not None and not isinstance(candidates, list):
                    raise ValueError("'candidates' must be a list or null")
                topk = req.get("topk")
                if topk is not None and (not isinstance(topk, int)
                                         or isinstance(topk, bool)):
                    raise ValueError("'topk' must be an integer or null")
                results = service.score(history, candidates, topk)
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
                return
            self._reply(200, {"results": results})

        def log_message(self, fmt, *args):  # quiet; the CLI logs startup
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve(trainer, host: str, port: int) -> None:
    """Build the service (corpus encode happens here) and serve forever."""
    service = ScoringService(trainer)
    server = make_http_server(service, host, port)
    print(f"serving {service.num_news} news on http://{host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
