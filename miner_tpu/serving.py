"""HTTP scoring server over the news-embedding cache.

``python -m miner_tpu serve @config.txt --saved_model_path ... --port 8400``
starts a threaded stdlib HTTP server that ranks candidate news for a click
history with ZERO PLM calls per request: the corpus is encoded once into the
news-embedding cache at startup (Trainer.serving_context) and every request
runs only the cached tail — candidate gather + poly-attention interests +
fused lookup+score kernel on TPU (trainer.serve_scores).

The unbert cross-encoder serves as a RERANKER through the same server:
each (candidate, history) pair packs into one 300-token row (C++ packer)
and the slate runs the PLM in one jitted program
(trainer.serve_scores_unbert). No corpus cache exists for a cross-encoder,
so whole-corpus requests (``candidates: null``) are refused with a 400.

No reference counterpart: the reference's closest workflow is manual
notebook scoring (reference: helper_val.ipynb); it re-encodes every news
item on every impression and has no serving entry point at all.

Concurrent requests coalesce through a :class:`MicroBatcher` into ONE
jitted device call per drain window (``--serve_max_batch``,
``--serve_batch_wait_ms``) — the scoring program is batched over users, so
N in-flight requests cost one program launch instead of N.

API (JSON):
  GET  /healthz            -> {"status": "ok", "num_news": N,
                               "requests": R, "device_batches": D}
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
import queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from miner_tpu.utils import candidate_bucket  # noqa: F401  (canonical home)


class _Pending:
    """One enqueued scoring request (internal to MicroBatcher)."""

    __slots__ = ("cand", "his", "k", "done", "scores", "error", "t0")

    def __init__(self, cand: Optional[np.ndarray], his: np.ndarray,
                 k: Optional[int] = None):
        self.cand = cand  # (C,) candidate rows, C <= some bucket (slate req)
        self.his = his  # (H,) history rows, fixed H
        self.k = k  # corpus top-k request when not None (cand is None)
        self.done = threading.Event()
        self.scores = None  # (C,) scores | (vals (k,), rows (k,)) for top-k
        self.error: Optional[BaseException] = None
        self.t0 = time.monotonic()  # enqueue time, for latency stats


class MicroBatcher:
    """Coalesces concurrent scoring requests into one device program.

    The scoring path is a single jitted program over ``(B, C)`` index
    arrays (``Trainer.serve_scores``); a lone request is ``B=1`` and leaves
    the MXU nearly idle — the measured cached-serving throughput at B=256
    is ~100x the B=1 rate per request.  Requests from the server's handler
    threads enqueue here; a worker thread drains up to ``max_batch`` of
    them (waiting at most ``max_wait_ms`` after the first arrival so an
    idle server adds negligible latency), pads them into one
    ``(B_bucket, C_bucket)`` batch (power-of-two buckets keep the number of
    compiled shapes at ``log2(max_batch) * log2(corpus)``), runs ONE device
    call, and distributes the per-request score rows.

    ``score_fn(cand_idx (B, C), his_idx (B, H)) -> (B, C) scores``; padding
    rows use index 0 (the pad news) and are dropped before results are
    returned.  No reference counterpart (the reference has no serving
    path at all).
    """

    def __init__(self, score_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
                 his_length: int, max_batch: int = 32,
                 max_wait_ms: float = 2.0,
                 topk_fn: Optional[Callable[[np.ndarray, int],
                                            Tuple[np.ndarray, np.ndarray]]] = None):
        self.score_fn = score_fn
        # (his_idx (B, H), k) -> (vals (B, k), rows (B, k)): whole-corpus
        # top-k requests coalesce through the same worker when provided
        self.topk_fn = topk_fn
        self.his_length = int(his_length)
        self.max_batch = max(1, int(max_batch))
        self.max_wait_s = max(0.0, float(max_wait_ms)) / 1e3
        self.requests = 0  # total requests scored (observability)
        self.device_batches = 0  # total device calls issued
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._lock = threading.Lock()  # guards counters
        self._submit_lock = threading.Lock()  # orders submits vs close()
        self._closed = False
        # rolling request latencies (seconds, enqueue -> scores ready) for
        # /healthz percentiles; bounded so a long-lived server stays O(1)
        self._latencies: deque = deque(maxlen=2048)
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="miner-tpu-microbatcher")
        self._worker.start()

    def submit(self, cand: Sequence[int], his: np.ndarray) -> np.ndarray:
        """Blocking: returns the (len(cand),) scores for one request."""
        item = _Pending(np.asarray(cand, np.int32), np.asarray(his, np.int32))
        return self._wait(item)

    def submit_topk(self, his: np.ndarray,
                    k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Blocking: (scores (k,), news rows (k,)) over the whole corpus.
        Concurrent top-k requests with the same k bucket coalesce into one
        batched ``topk_fn`` call."""
        if self.topk_fn is None:
            raise RuntimeError("MicroBatcher built without a topk_fn")
        item = _Pending(None, np.asarray(his, np.int32), k=int(k))
        return self._wait(item)

    def _wait(self, item: _Pending):
        # the submit lock orders every enqueue before close()'s shutdown
        # sentinel — a submit racing close() either lands ahead of the
        # sentinel (worker drains it) or raises, never hangs
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._q.put(item)
        item.done.wait()
        if item.error is not None:
            raise item.error
        with self._lock:
            self._latencies.append(time.monotonic() - item.t0)
        return item.scores

    def stats(self) -> Dict:
        """Observability snapshot: request/batch counters, coalescing
        ratio, and rolling end-to-end latency percentiles (ms)."""
        with self._lock:
            req, dev = self.requests, self.device_batches
            lat = sorted(self._latencies)
        out: Dict = {"requests": req, "device_batches": dev,
                     "mean_batch": round(req / dev, 2) if dev else None}
        if lat:
            pick = lambda q: round(lat[min(len(lat) - 1,
                                           int(q * len(lat)))] * 1e3, 2)
            out["latency_ms_p50"] = pick(0.50)
            out["latency_ms_p99"] = pick(0.99)
        return out

    def close(self):
        with self._submit_lock:
            self._closed = True
            self._q.put(None)
        self._worker.join(timeout=5)

    # ------------------------------------------------------------- worker
    def _drain(self, first: _Pending) -> List[_Pending]:
        group = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(group) < self.max_batch:
            remaining = deadline - time.monotonic()
            try:
                # past the deadline, still sweep whatever is ALREADY queued
                # (free coalescing); only stop waiting for new arrivals
                if remaining <= 0:
                    nxt = self._q.get_nowait()
                else:
                    nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:  # shutdown: process what we have first
                self._q.put(None)
                break
            group.append(nxt)
        return group

    def _score_group(self, group: List[_Pending]):
        """One padded device call for a same-candidate-bucket group. Every
        exception — including batch allocation — propagates to the callers
        instead of killing the worker thread (which would deadlock every
        queued and future submit)."""
        try:
            B = len(group)
            # power-of-two batch buckets: the compiled-shape count stays at
            # log2(max_batch) and a warmup can enumerate them exactly
            B_pad = 1 if B == 1 else candidate_bucket(B, minimum=2)
            C_pad = max(candidate_bucket(len(it.cand)) for it in group)
            cand_idx = np.zeros((B_pad, C_pad), np.int32)
            his_idx = np.zeros((B_pad, self.his_length), np.int32)
            for i, it in enumerate(group):
                cand_idx[i, : len(it.cand)] = it.cand
                his_idx[i] = it.his
            scores = np.asarray(self.score_fn(cand_idx, his_idx))
            for i, it in enumerate(group):
                it.scores = scores[i, : len(it.cand)]
        except BaseException as e:  # propagate to every caller
            for it in group:
                it.error = e
        else:
            with self._lock:
                self.requests += B
                self.device_batches += 1
        finally:
            for it in group:
                it.done.set()

    def _topk_group(self, group: List[_Pending], k_bucket: int):
        """One batched whole-corpus top-k call for same-k-bucket requests;
        each caller gets its own (vals[:k], rows[:k])."""
        try:
            B = len(group)
            B_pad = 1 if B == 1 else candidate_bucket(B, minimum=2)
            his_idx = np.zeros((B_pad, self.his_length), np.int32)
            for i, it in enumerate(group):
                his_idx[i] = it.his
            vals, rows = self.topk_fn(his_idx, k_bucket)
            # topk_fn may clamp k_bucket to the corpus size
            avail = vals.shape[1]
            for i, it in enumerate(group):
                k = min(it.k, avail)
                it.scores = (vals[i, :k], rows[i, :k])
        except BaseException as e:  # propagate to every caller
            for it in group:
                it.error = e
        else:
            with self._lock:
                self.requests += B
                self.device_batches += 1
        finally:
            for it in group:
                it.done.set()

    def _run(self):
        while True:
            first = self._q.get()
            if first is None:
                return
            group = self._drain(first)
            # Partition by (kind, bucket): one full-corpus request must not
            # drag every coalesced small slate up to a (B, corpus) program
            # (compute x corpus/slate and a fresh XLA compile for the whole
            # group), and top-k requests run a different program entirely.
            by_bucket: dict = {}
            for it in group:
                key = (("topk", candidate_bucket(it.k)) if it.k is not None
                       else ("slate", candidate_bucket(len(it.cand))))
                by_bucket.setdefault(key, []).append(it)
            for (kind, bucket), sub in sorted(by_bucket.items()):
                if kind == "topk":
                    self._topk_group(sub, bucket)
                else:
                    self._score_group(sub)


class ScoringService:
    """Request scoring around a ``Trainer.serving_context()``.

    Concurrent requests (the HTTP server is threaded) coalesce through a
    :class:`MicroBatcher` into one jitted device call per drain —
    ``max_batch``/``batch_wait_ms`` come from ``--serve_max_batch`` /
    ``--serve_batch_wait_ms`` when built from the CLI."""

    def __init__(self, trainer, max_batch: Optional[int] = None,
                 batch_wait_ms: Optional[float] = None):
        self.trainer = trainer
        self.ctx = trainer.serving_context()
        self._row_to_id = {v: k for k, v in self.ctx.store.id_to_row.items()}
        self.his_length = trainer.args.his_length
        a = trainer.args
        self.batcher = MicroBatcher(
            self._score_batch, his_length=self.his_length,
            max_batch=getattr(a, "serve_max_batch", 32)
            if max_batch is None else max_batch,
            max_wait_ms=getattr(a, "serve_batch_wait_ms", 2.0)
            if batch_wait_ms is None else batch_wait_ms,
            # a cross-encoder has no corpus cache to rank: slates only
            topk_fn=None if self.ctx.kind == "unbert" else self._topk_batch,
        )

    def _score_batch(self, cand_idx: np.ndarray,
                     his_idx: np.ndarray) -> np.ndarray:
        ctx = self.ctx
        if ctx.kind == "unbert":
            return self.trainer.serve_scores_unbert(
                ctx.model, ctx.params, ctx.packer, cand_idx, his_idx
            )
        return self.trainer.serve_scores(
            ctx.model, ctx.kind, ctx.params, ctx.cache, cand_idx, his_idx
        )

    def _topk_batch(self, his_idx: np.ndarray, k: int):
        ctx = self.ctx
        # num_news: a table-sharded cache pads the corpus with all-zero rows
        # that must not enter the ranking
        return self.trainer.serve_topk(
            ctx.model, ctx.kind, ctx.params, ctx.cache, his_idx, k,
            num_news=ctx.store.num_news,
        )

    def _his_row(self, his: Sequence[int]) -> np.ndarray:
        """(his_length,) history rows: clicks in chronological order, pad
        news appended (the BehaviorsLog default layout), or pads prepended
        when the model was trained under --legacy_history_layout (the
        reference's layout, src/reader.py:154).  Deliberate deviation from
        training-time truncation: an over-long request history keeps the
        most RECENT his_length clicks (training/eval keep the earliest,
        the reference's quirk) — recency is the right production signal for
        live requests (documented in PARITY.md)."""
        H = min(len(his), self.his_length)
        row = np.zeros((self.his_length,), np.int32)
        if getattr(self.trainer, "_legacy_layout", False):
            row[self.his_length - H:] = his[len(his) - H:]
        else:
            row[:H] = his[len(his) - H:]
        return row

    def warmup(self, slate_sizes: Sequence[int], topk: Optional[int] = None,
               max_b: Optional[int] = None) -> int:
        """Pre-compile the scoring programs live traffic will hit: every
        (B_bucket, C_bucket) shape for the given slate sizes up to the
        micro-batcher's max batch, plus the corpus top-k programs over the
        same batch buckets. Returns the number of programs executed (first
        executions compile; later server starts ride the persistent XLA
        compilation cache)."""
        cap = self.batcher.max_batch if max_b is None else max_b

        def b_buckets():
            b = 1
            while True:
                yield b
                if b >= cap:
                    return
                b = 2 if b == 1 else b * 2

        n = 0
        for slate in slate_sizes:
            c_pad = candidate_bucket(slate)
            for b in b_buckets():
                self._score_batch(np.zeros((b, c_pad), np.int32),
                                  np.zeros((b, self.his_length), np.int32))
                n += 1
        if topk is not None and self.batcher.topk_fn is not None:
            k_pad = candidate_bucket(min(topk, self.num_news - 1))
            for b in b_buckets():
                self._topk_batch(np.zeros((b, self.his_length), np.int32),
                                 k_pad)
                n += 1
        return n

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
        if self.ctx.kind == "unbert":
            if candidates is None:
                raise ValueError(
                    "whole-corpus scoring is not supported for the unbert "
                    "cross-encoder (every candidate costs a full PLM pass) "
                    "— pass 'candidates'")
            max_slate = int(getattr(self.trainer.args, "serve_max_slate",
                                    512) or 512)
            if len(candidates) > max_slate:
                raise ValueError(
                    f"slate of {len(candidates)} exceeds --serve_max_slate="
                    f"{max_slate} for the unbert cross-encoder (each "
                    "candidate costs a full PLM pass)")
        his_row = self._his_row([self._idx_of(n) for n in history])

        if candidates is None and topk is not None:
            # whole-corpus + topk: rank on device, move only k scores off
            # chip; concurrent top-k requests coalesce through the
            # micro-batcher (k bucketed so distinct topk values share
            # compiled programs)
            k = min(topk, self.num_news - 1)
            vals, rows = self.batcher.submit_topk(his_row, k)
            return [(self._row_to_id.get(int(r), str(int(r))), float(v))
                    for v, r in zip(vals, rows)]

        if candidates is not None:
            cand = [self._idx_of(n) for n in candidates]
            cand_ids = list(candidates)
        else:
            cand = list(range(1, self.num_news))  # skip the pad row 0
            cand_ids = [self._row_to_id.get(i, str(i)) for i in cand]
        if not cand:
            return []

        scores = self.batcher.submit(cand, his_row)
        order = np.argsort(-scores)
        if topk is not None:
            order = order[:topk]
        return [(cand_ids[i], float(scores[i])) for i in order]


def make_http_server(service: ScoringService, host: str,
                     port: int) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: without it every request pays a TCP
        # handshake + a fresh handler thread, which measured ~4x below the
        # micro-batcher's coalesced capacity (BENCH_r03 http_rps 132 vs
        # concurrent_rps 549); _reply always sets Content-Length so
        # persistent connections are safe
        protocol_version = "HTTP/1.1"
        # small request/response pairs interact badly with Nagle + delayed
        # ACK (up to ~40ms added per round trip); scoring replies are tiny
        disable_nagle_algorithm = True

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
                                  "num_news": service.num_news,
                                  **service.batcher.stats()})
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
                                         or isinstance(topk, bool)
                                         or topk < 1):
                    raise ValueError("'topk' must be a positive integer "
                                     "or null")
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
    a = trainer.args
    slates = getattr(a, "serve_warmup_slates", None) or []
    # warm the corpus top-k programs for this k bucket (0 disables); the
    # default covers every request with topk <= 16 (the common slate depth)
    topk = int(getattr(a, "serve_warmup_topk", 16) or 0)
    if slates or topk:
        n = service.warmup(slates, topk=topk or None)
        print(f"warmed {n} scoring programs "
              f"(slates {slates}, topk {topk or 'off'})")
    server = make_http_server(service, host, port)
    print(f"serving {service.num_news} news on http://{host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
