"""Serving-path throughput bench: sequential vs micro-batched request rates.

Measures the production scoring service (miner_tpu/serving.py) on synthetic
requests against a trained checkpoint + corpus:

  * ``sequential``  — one in-flight request at a time (B=1 device programs);
  * ``concurrent``  — ``--clients`` threads keep requests in flight, so the
    MicroBatcher coalesces them into batched device programs;
  * ``http``        — same concurrency over the wire against a live
    ``ThreadingHTTPServer`` (adds JSON + socket overhead; on a single-core
    host the client threads also steal CPU from the server, so treat this
    leg as a lower bound).

Prints one JSON line. No reference counterpart to compare against — the
reference has no serving path; the reference-anchored serving numbers live
in bench.py (cached_serving_candidates_per_sec) and tools/bench_cached_eval.

Usage:
  python tools/bench_serving.py @config.txt --saved_model_path ... \
      [--clients 16] [--requests 200] [--slate 20] [--http]
"""
from __future__ import annotations

import json
import sys
import threading
import time

sys.path.insert(0, ".")
from tools import _env  # noqa: E402  (honor JAX_PLATFORMS before backend init)

_env.honor_env_platform()

import numpy as np  # noqa: E402


def _requests(service, n, slate, seed=0):
    """Synthetic request stream: random histories + candidate slates drawn
    from the real corpus ids (never the pad row)."""
    rng = np.random.default_rng(seed)
    ids = [nid for nid, row in service.ctx.store.id_to_row.items() if row != 0]
    out = []
    for _ in range(n):
        his = list(rng.choice(ids, size=min(8, len(ids)), replace=False))
        cand = list(rng.choice(ids, size=min(slate, len(ids)), replace=False))
        out.append((his, cand))
    return out


def bench_sequential(service, reqs):
    """True B=1 baseline: raw (1, C_bucket) device calls, bypassing the
    MicroBatcher so the drain-window wait doesn't deflate the baseline."""
    from miner_tpu.serving import candidate_bucket

    def one(his, cand):
        c_pad = candidate_bucket(len(cand))
        cand_idx = np.zeros((1, c_pad), np.int32)
        cand_idx[0, : len(cand)] = [service._idx_of(n) for n in cand]
        his_idx = service._his_row([service._idx_of(n) for n in his])[None]
        return service._score_batch(cand_idx, his_idx)

    one(*reqs[0])  # compile
    t0 = time.perf_counter()
    for his, cand in reqs:
        one(his, cand)
    return len(reqs) / (time.perf_counter() - t0)


def bench_concurrent(service, reqs, clients):
    # compile every (B_bucket, C_bucket) program the drain can produce so
    # the timed window measures steady-state serving, not XLA compiles
    service.warmup([len(reqs[0][1])],
                   max_b=min(service.batcher.max_batch, max(clients, 1)))
    b0 = service.batcher.device_batches
    it = iter(reqs)
    lock = threading.Lock()
    errors = []

    def worker():
        while True:
            with lock:
                nxt = next(it, None)
            if nxt is None:
                return
            try:
                service.score(*nxt)
            except Exception as e:  # pragma: no cover - surfaced in output
                errors.append(e)
                return

    threads = [threading.Thread(target=worker) for _ in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    if errors:
        raise errors[0]
    return len(reqs) / dt, service.batcher.device_batches - b0


def bench_http(service, reqs, clients, host="127.0.0.1"):
    import http.client

    from miner_tpu.serving import make_http_server

    server = make_http_server(service, host, 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]

    latencies = []

    def post(conn, his, cand):
        t0 = time.perf_counter()
        conn.request(
            "POST", "/score",
            body=json.dumps({"history": his, "candidates": cand}).encode(),
            headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        r.read()
        return time.perf_counter() - t0

    warm = http.client.HTTPConnection(host, port)
    post(warm, *reqs[0])
    warm.close()
    it = iter(reqs)
    lock = threading.Lock()

    def worker():
        # one persistent keep-alive connection per client (the server
        # speaks HTTP/1.1) — a realistic load generator does the same
        conn = http.client.HTTPConnection(host, port)
        try:
            while True:
                with lock:
                    nxt = next(it, None)
                if nxt is None:
                    return
                dt = post(conn, *nxt)
                with lock:
                    latencies.append(dt)
        finally:
            conn.close()

    threads = [threading.Thread(target=worker) for _ in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    server.shutdown()
    lat = sorted(latencies)
    pick = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] * 1e3
    return len(reqs) / dt, pick(0.50), pick(0.99)


def main(argv=None):
    from miner_tpu.config import make_parser
    from miner_tpu.serving import ScoringService
    from miner_tpu.training.trainer import Trainer

    argv = list(sys.argv[1:] if argv is None else argv)
    bench_args = {"--clients": 16, "--requests": 200, "--slate": 20}
    http = "--http" in argv
    if http:
        argv.remove("--http")
    for key in list(bench_args):
        if key in argv:
            i = argv.index(key)
            bench_args[key] = int(argv[i + 1])
            del argv[i:i + 2]
    args = make_parser().parse_args(["serve", *argv])
    service = ScoringService(Trainer(args))
    reqs = _requests(service, bench_args["--requests"], bench_args["--slate"])

    seq_rps = bench_sequential(service, reqs)
    conc_rps, batches = bench_concurrent(service, reqs,
                                         bench_args["--clients"])
    out = {
        "slate": bench_args["--slate"],
        "clients": bench_args["--clients"],
        "sequential_requests_per_sec": round(seq_rps, 1),
        "concurrent_requests_per_sec": round(conc_rps, 1),
        "speedup": round(conc_rps / seq_rps, 2),
        "requests": len(reqs),
        "device_batches": batches,
    }
    if http:
        rps, p50, p99 = bench_http(service, reqs, bench_args["--clients"])
        out["http_requests_per_sec"] = round(rps, 1)
        out["http_latency_p50_ms"] = round(p50, 2)
        out["http_latency_p99_ms"] = round(p99, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
