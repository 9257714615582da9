"""HTTP scoring server: rank candidates over the wire with zero PLM calls
per request (miner_tpu/serving.py; `serve` subcommand).  The server's
results must match the `recommend` subcommand for the same request."""
import glob
import json
import os
import threading
import urllib.request

import jax
import numpy as np
import pytest

from miner_tpu.config import make_parser
from miner_tpu.serving import ScoringService, candidate_bucket, make_http_server
from miner_tpu.training.trainer import Trainer
from tests.fixture_data import make_fixture
from tests.test_e2e import _train_args


def test_candidate_bucket():
    assert candidate_bucket(1) == 16
    assert candidate_bucket(16) == 16
    assert candidate_bucket(17) == 32
    assert candidate_bucket(100) == 128


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """Train a tiny model, start the HTTP server on a free port."""
    fixture = make_fixture(str(tmp_path_factory.mktemp("mind_serve")),
                           num_lines=40)
    out = str(tmp_path_factory.mktemp("serve_out"))
    args_t = _train_args(fixture, out)
    args_t.num_train_epochs = 1
    Trainer(args_t).train()
    rd = glob.glob(os.path.join(out, "train", "*"))[0]

    base = [
        "--model_name", "Miner",
        "--pretrained_tokenizer", "hash:1000",
        "--user2id_path", os.path.join(fixture, "user2id.json"),
        "--category2id_path", os.path.join(fixture, "category2id.json"),
        "--eval_news_path", os.path.join(fixture, "news.tsv"),
        "--saved_model_path", os.path.join(rd, "ckpt", "finalModel"),
        "--max_title_length", "16",
        "--max_sapo_length", "24",
        "--his_length", "5",
        "--plm_preset", "tiny",
        "--apply_reduce_dim", "--use_sapo", "--use_category_bias",
        "--word_embed_dim", "32",
        "--category_embed_dim", "8",
        "--num_context_codes", "4",
        "--context_code_dim", "16",
        "--compute_dtype", "float32",
        "--metrics", "auc",
    ]
    args_s = make_parser().parse_args(
        ["serve", *base, "--host", "127.0.0.1", "--port", "0"])
    service = ScoringService(Trainer(args_s))
    server = make_http_server(service, args_s.host, args_s.port)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, service, base, rd
    server.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/score", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(served):
    url, service, _, _ = served
    # at least one request so latency percentiles are populated
    _post(url, {"history": ["N1"], "candidates": ["N7"]})
    with urllib.request.urlopen(url + "/healthz") as r:
        body = json.loads(r.read())
    assert r.status == 200
    assert body["status"] == "ok"
    assert body["num_news"] == service.num_news
    assert body["device_batches"] <= body["requests"]
    assert body["mean_batch"] >= 1
    assert 0 < body["latency_ms_p50"] <= body["latency_ms_p99"]


def test_score_matches_recommend(served):
    url, _, base, _ = served
    status, body = _post(url, {"history": ["N1", "N3"],
                               "candidates": ["N7", "N8", "N2"]})
    assert status == 200
    got = body["results"]
    assert [len(r) for r in got] == [2, 2, 2]
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True)
    assert np.isfinite(scores).all()

    # the `recommend` subcommand over the same request ranks identically
    args_r = make_parser().parse_args(
        ["recommend", *base, "--user_history", "N1", "N3",
         "--candidates", "N7", "N8", "N2", "--topk", "3"])
    want = Trainer(args_r).recommend()
    assert [nid for nid, _ in got] == [nid for nid, _ in want]
    # bucket padding changes the compiled shape (C=16 vs C=3): XLA may tile
    # the einsums differently, so scores agree only to fp32 reduction noise
    np.testing.assert_allclose(scores, [s for _, s in want], rtol=5e-4,
                               atol=1e-5)


def test_score_whole_corpus_topk(served):
    url, service, _, _ = served
    status, body = _post(url, {"history": ["N1"], "topk": 3})
    assert status == 200
    assert len(body["results"]) == 3
    # padded bucket slots (pad news row 0) never leak into the ranking
    ids = [nid for nid, _ in body["results"]]
    assert all(i.startswith("N") for i in ids)


def test_corpus_topk_matches_full_scoring(served):
    """candidates=null + topk ranks on device (Trainer.serve_topk, O(k)
    transfer) and must agree with the full-corpus host-sorted path."""
    _, service, _, _ = served
    full = service.score(["N1", "N3"], None, None)
    top = service.score(["N1", "N3"], None, 4)
    assert [nid for nid, _ in top] == [nid for nid, _ in full[:4]]
    np.testing.assert_allclose([s for _, s in top],
                               [s for _, s in full[:4]],
                               rtol=5e-4, atol=1e-5)
    assert len(service.trainer._serve_topk_fns) == 1


def test_score_errors(served):
    url, _, _, _ = served
    status, body = _post(url, {"history": ["NOPE"], "candidates": ["N7"]})
    assert status == 400 and "NOPE" in body["error"]
    status, body = _post(url, {"history": "N1"})
    assert status == 400 and "history" in body["error"]
    status, body = _post(url, {"history": ["N1"], "topk": "three"})
    assert status == 400 and "topk" in body["error"]
    status, body = _post(url, {"history": ["N1"], "topk": -2})
    assert status == 400 and "topk" in body["error"]
    req = urllib.request.Request(url + "/nope", data=b"{}")
    try:
        urllib.request.urlopen(req)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_microbatcher_coalesces():
    """Requests arriving while a device call is in flight are drained into
    ONE batched call, each getting its own padded row back."""
    from miner_tpu.serving import MicroBatcher

    calls = []
    release = threading.Event()

    def score_fn(cand_idx, his_idx):
        calls.append(cand_idx.copy())
        if len(calls) == 1:
            assert release.wait(10)
        return cand_idx * 2.0 + his_idx.sum(axis=1, keepdims=True)

    mb = MicroBatcher(score_fn, his_length=4, max_batch=8, max_wait_ms=50)
    results = {}

    def submit(i, n_cand):
        cand = list(range(10 * i + 1, 10 * i + 1 + n_cand))
        his = np.full((4,), i, np.int32)
        results[i] = (cand, his, mb.submit(cand, his))

    t0 = threading.Thread(target=submit, args=(0, 3))
    t0.start()
    while not calls:  # worker is now blocked inside the first device call
        pass
    rest = [threading.Thread(target=submit, args=(i, 2 + i)) for i in
            range(1, 6)]
    for t in rest:
        t.start()
    while mb._q.qsize() < 5:  # all five enqueued behind the blocked call
        pass
    release.set()
    t0.join(10)
    for t in rest:
        t.join(10)

    assert len(calls) == 2, "queued requests must coalesce into one call"
    assert calls[1].shape[0] >= 5  # one batched program for all five
    for i, (cand, his, got) in results.items():
        want = np.asarray(cand) * 2.0 + his.sum()
        np.testing.assert_array_equal(got, want)
    assert mb.requests == 6 and mb.device_batches == 2
    mb.close()


def test_microbatcher_propagates_errors_and_survives():
    from miner_tpu.serving import MicroBatcher

    calls = {"n": 0}

    def boom_once(cand_idx, his_idx):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("kaboom")
        return cand_idx.astype(np.float64)

    mb = MicroBatcher(boom_once, his_length=2, max_batch=4, max_wait_ms=0)
    with pytest.raises(RuntimeError, match="kaboom"):
        mb.submit([1, 2], np.zeros((2,), np.int32))
    # the worker thread survives the failed batch: later submits still work
    out = mb.submit([3], np.zeros((2,), np.int32))
    np.testing.assert_array_equal(out, [3.0])
    mb.close()


def test_microbatcher_groups_by_candidate_bucket():
    """A huge (corpus-sized) slate in the drain window must not drag the
    small slates up to its padded width — the drain splits per bucket."""
    from miner_tpu.serving import MicroBatcher

    shapes = []
    release = threading.Event()

    def score_fn(cand_idx, his_idx):
        shapes.append(cand_idx.shape)
        if len(shapes) == 1:
            assert release.wait(10)
        return cand_idx.astype(np.float64)

    mb = MicroBatcher(score_fn, his_length=2, max_batch=8, max_wait_ms=50)
    results = []

    def submit(n_cand):
        results.append(mb.submit(list(range(1, n_cand + 1)),
                                 np.zeros((2,), np.int32)))

    t0 = threading.Thread(target=submit, args=(2,))
    t0.start()
    while not shapes:
        pass
    rest = [threading.Thread(target=submit, args=(n,)) for n in (3, 5, 200)]
    for t in rest:
        t.start()
    while mb._q.qsize() < 3:
        pass
    release.set()
    for t in [t0, *rest]:
        t.join(10)
    # first lone call, then one (2, 16) call for the two small slates and a
    # separate (1, 256) call for the corpus-sized one
    assert sorted(shapes[1:]) == [(1, 256), (2, 16)]
    assert mb.device_batches == 3
    mb.close()


def test_microbatcher_saturation_caps_group_at_max_batch():
    """Queue saturation: with far more queued requests than
    ``serve_max_batch``, every drained device group is capped at max_batch,
    nothing is dropped, and every request still gets its own correct row
    back (the backlog drains across successive device batches)."""
    from miner_tpu.serving import MicroBatcher

    MAX_B, TOTAL = 4, 25
    group_sizes = []
    release = threading.Event()

    def score_fn(cand_idx, his_idx):
        group_sizes.append(cand_idx.shape[0])
        if len(group_sizes) == 1:
            assert release.wait(10)
        return cand_idx * 3.0 + his_idx.sum(axis=1, keepdims=True)

    mb = MicroBatcher(score_fn, his_length=4, max_batch=MAX_B, max_wait_ms=50)
    results = {}

    def submit(i):
        cand = [100 * i + 1, 100 * i + 2]
        his = np.full((4,), i, np.int32)
        results[i] = (cand, his, mb.submit(cand, his))

    t0 = threading.Thread(target=submit, args=(0,))
    t0.start()
    while not group_sizes:  # worker blocked inside the first device call
        pass
    rest = [threading.Thread(target=submit, args=(i,))
            for i in range(1, TOTAL)]
    for t in rest:
        t.start()
    while mb._q.qsize() < TOTAL - 1:  # the whole backlog is queued
        pass
    release.set()
    for t in [t0, *rest]:
        t.join(10)

    assert max(group_sizes) <= MAX_B, group_sizes
    assert sum(group_sizes) == TOTAL  # nothing dropped, nothing duplicated
    # 1 blocked single + ceil(24/4) full drains is the floor
    assert mb.device_batches >= 1 + (TOTAL - 1) // MAX_B
    assert mb.requests == TOTAL
    for i, (cand, his, got) in results.items():
        np.testing.assert_array_equal(got, np.asarray(cand) * 3.0 + his.sum())
    mb.close()


def test_concurrent_requests_match_sequential(served):
    """Concurrent HTTP requests (which may coalesce into batched device
    calls) return the same scores as isolated B=1 scoring."""
    url, service, _, _ = served
    slates = [["N7", "N8", "N2"], ["N2", "N5"], ["N8", "N1", "N4", "N6"],
              ["N3"], ["N6", "N7"], ["N5", "N4", "N3"]]
    sequential = {i: service.score(["N1", "N3"], s)
                  for i, s in enumerate(slates)}
    out = {}

    def hit(i):
        out[i] = _post(url, {"history": ["N1", "N3"], "candidates": slates[i]})

    threads = [threading.Thread(target=hit, args=(i,)) for i in
               range(len(slates))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    for i, s in enumerate(slates):
        status, body = out[i]
        assert status == 200
        got = dict(body["results"])
        want = dict(sequential[i])
        assert set(got) == set(want)
        # batched (B>1) and lone (B=1) programs tile differently: fp noise
        for nid in want:
            np.testing.assert_allclose(got[nid], want[nid], rtol=5e-4,
                                       atol=1e-5)


def test_sharded_cache_serving_matches(served):
    """Serving over a row-sharded news cache (table axis 4) must reproduce
    the table=1 service on both the slate path and the corpus top-k path
    (which falls back to the XLA reference scorer under a sharded cache)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    _, service, base, _ = served
    args_s = make_parser().parse_args(
        ["serve", *base, "--mesh_data", "2", "--mesh_table", "4"])
    sharded = ScoringService(Trainer(args_s))
    assert sharded.ctx.cache.mesh is not None
    # the sharded cache really carries zero padding rows beyond the corpus
    assert sharded.ctx.cache.num_rows > sharded.num_news
    try:
        for cands in (["N7", "N8", "N2"], None):
            a = service.score(["N1", "N3"], cands, 3)
            b = sharded.score(["N1", "N3"], cands, 3)
            assert [n for n, _ in a] == [n for n, _ in b]
            np.testing.assert_allclose([s for _, s in a], [s for _, s in b],
                                       rtol=5e-4, atol=1e-5)
        # full-depth corpus top-k: the cache's shard-padding rows (all-zero
        # embeddings, score 0) must never enter the ranking, even past any
        # genuinely negative-scored real candidates
        k = sharded.num_news - 1
        deep = sharded.score(["N1", "N3"], None, k)
        assert len(deep) == k
        assert all(nid.startswith("N") for nid, _ in deep)
        full = service.score(["N1", "N3"], None, k)
        assert [n for n, _ in deep] == [n for n, _ in full]
    finally:
        sharded.batcher.close()


def test_warmup_compiles_serving_programs(served):
    """warmup() pre-executes every (B_bucket, C_bucket) program for the
    given slates plus the corpus top-k programs, and traffic still works."""
    _, service, _, _ = served
    n = service.warmup([3], topk=4, max_b=4)
    assert n == 6  # B in {1, 2, 4} at C_bucket 16, + top-k at B {1, 2, 4}
    r = service.score(["N1"], ["N7", "N8", "N2"])
    assert len(r) == 3


def test_concurrent_topk_requests_coalesce_and_match(served):
    """Concurrent whole-corpus top-k requests coalesce into one batched
    serve_topk call and return the same ranking as isolated requests."""
    _, service, _, _ = served
    hists = [["N1"], ["N3"], ["N1", "N3"], ["N5"]]
    sequential = [service.score(h, None, 3) for h in hists]
    before = service.batcher.device_batches

    out = {}
    barrier = threading.Barrier(len(hists))

    def hit(i):
        barrier.wait()
        out[i] = service.score(hists[i], None, 3)

    threads = [threading.Thread(target=hit, args=(i,)) for i in
               range(len(hists))]
    old_wait = service.batcher.max_wait_s
    service.batcher.max_wait_s = 0.2  # generous drain window: determinism
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(30)
    finally:
        service.batcher.max_wait_s = old_wait
    for i, want in enumerate(sequential):
        assert [n for n, _ in out[i]] == [n for n, _ in want]
        np.testing.assert_allclose([s for _, s in out[i]],
                                   [s for _, s in want],
                                   rtol=5e-4, atol=1e-5)
    # fewer device calls than requests => at least one batched top-k group
    assert service.batcher.device_batches - before < len(hists)


def test_microbatcher_topk_requires_topk_fn():
    from miner_tpu.serving import MicroBatcher

    mb = MicroBatcher(lambda c, h: c.astype(np.float64), his_length=2)
    with pytest.raises(RuntimeError, match="topk_fn"):
        mb.submit_topk(np.zeros((2,), np.int32), 4)
    mb.close()


def test_bucketed_slates_share_compiled_program(served):
    """Different candidate counts inside one bucket reuse one jitted shape;
    the trainer-level program cache stays at one entry per (model, kind)."""
    _, service, _, _ = served
    r3 = service.score(["N1"], ["N7", "N8", "N2"])
    r2 = service.score(["N1"], ["N7", "N8"])
    assert len(r3) == 3 and len(r2) == 2
    fns = service.trainer._serve_score_fns
    assert len(fns) == 1


def test_serve_cache_persistence(served, tmp_path):
    """--serve_cache_path: the first service build persists the corpus
    cache; a restart loads it WITHOUT re-encoding the corpus and serves
    identical scores; any checkpoint change invalidates the fingerprint."""
    _, service, base, rd = served
    cache_file = str(tmp_path / "corpus.cache.npz")
    argv = ["serve", *base, "--serve_cache_path", cache_file]

    t1 = Trainer(make_parser().parse_args(argv))
    s1 = ScoringService(t1)
    assert os.path.exists(cache_file)
    want = s1.score(["N1", "N3"], ["N7", "N8", "N2"])
    s1.batcher.close()

    t2 = Trainer(make_parser().parse_args(argv))
    orig = Trainer._build_eval_cache
    Trainer._build_eval_cache = (
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("corpus re-encoded despite a valid cache file")))
    try:
        s2 = ScoringService(t2)
        got = s2.score(["N1", "N3"], ["N7", "N8", "N2"])
    finally:
        Trainer._build_eval_cache = orig
    assert [n for n, _ in got] == [n for n, _ in want]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in want],
                               rtol=1e-6, atol=0)
    s2.batcher.close()

    # touching any checkpoint file invalidates the fingerprint
    from miner_tpu.parallel.news_cache import load_cache
    t3 = Trainer(make_parser().parse_args(argv))
    assert load_cache(cache_file, t3._serving_cache_fingerprint()) is not None
    ckpt_file = next(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(t3.args.saved_model_path) for f in fs)
    st = os.stat(ckpt_file)
    os.utime(ckpt_file, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    assert load_cache(cache_file, t3._serving_cache_fingerprint()) is None


def test_microbatcher_submit_after_close_raises():
    """A submit racing or following close() must raise, never hang."""
    from miner_tpu.serving import MicroBatcher

    mb = MicroBatcher(lambda c, h: c.astype(np.float64), his_length=2,
                      topk_fn=lambda h, k: (np.zeros((h.shape[0], k)),
                                            np.ones((h.shape[0], k), np.int32)))
    out = mb.submit([1], np.zeros((2,), np.int32))
    np.testing.assert_array_equal(out, [1.0])
    mb.close()
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit([2], np.zeros((2,), np.int32))
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit_topk(np.zeros((2,), np.int32), 4)


def test_microbatcher_sweeps_backlog_past_deadline():
    """With a zero drain window, requests already sitting in the queue
    still coalesce into one call (the deadline only stops WAITING for new
    arrivals, not sweeping the backlog)."""
    from miner_tpu.serving import MicroBatcher

    calls = []
    release = threading.Event()

    def score_fn(cand_idx, his_idx):
        calls.append(cand_idx.shape)
        if len(calls) == 1:
            assert release.wait(10)
        return cand_idx.astype(np.float64)

    mb = MicroBatcher(score_fn, his_length=2, max_batch=8, max_wait_ms=0)
    threads = [threading.Thread(target=mb.submit,
                                args=([i + 1], np.zeros((2,), np.int32)))
               for i in range(6)]
    threads[0].start()
    while not calls:  # worker blocked inside the first device call
        pass
    for t in threads[1:]:
        t.start()
    while mb._q.qsize() < 5:
        pass
    release.set()
    for t in threads:
        t.join(10)
    assert len(calls) == 2, "backlog must coalesce despite max_wait_ms=0"
    assert calls[1][0] >= 5
    mb.close()


@pytest.fixture(scope="module")
def unbert_served(tmp_path_factory):
    """Train a tiny UnBERT, build the reranker scoring service."""
    fixture = make_fixture(str(tmp_path_factory.mktemp("mind_userve")),
                           num_lines=30)
    out = str(tmp_path_factory.mktemp("userve_out"))
    argv_train = [
        "train_fastformer",
        "--model_name", "unbert",
        "--pretrained_tokenizer", "hash:1000",
        "--user2id_path", os.path.join(fixture, "user2id.json"),
        "--category2id_path", os.path.join(fixture, "category2id.json"),
        "--train_behaviors_path", os.path.join(fixture, "behaviors.tsv"),
        "--train_news_path", os.path.join(fixture, "news.tsv"),
        "--eval_behaviors_path", os.path.join(fixture, "behaviors.tsv"),
        "--eval_news_path", os.path.join(fixture, "news.tsv"),
        "--max_title_length", "16", "--max_sapo_length", "24",
        "--his_length", "5", "--seed", "3", "--plm_preset", "tiny",
        "--npratio", "3", "--train_batch_size", "16",
        "--eval_batch_size", "32", "--num_train_epochs", "1",
        "--learning_rate", "1e-3", "--compute_dtype", "float32",
        "--metrics", "auc", "--train_path", os.path.join(out, "train"),
    ]
    Trainer(make_parser().parse_args(argv_train)).train()
    rd = glob.glob(os.path.join(out, "train", "*"))[0]
    argv_serve = [
        "serve",
        "--model_name", "unbert",
        "--pretrained_tokenizer", "hash:1000",
        "--user2id_path", os.path.join(fixture, "user2id.json"),
        "--category2id_path", os.path.join(fixture, "category2id.json"),
        "--eval_news_path", os.path.join(fixture, "news.tsv"),
        "--saved_model_path", os.path.join(rd, "ckpt", "finalModel"),
        "--max_title_length", "16", "--max_sapo_length", "24",
        "--his_length", "5", "--plm_preset", "tiny",
        "--compute_dtype", "float32", "--metrics", "auc",
    ]
    service = ScoringService(Trainer(make_parser().parse_args(argv_serve)))
    yield service
    service.batcher.close()


def test_unbert_reranker_serving(unbert_served):
    """The cross-encoder serves slate requests: ranked, deterministic, and
    equal to a direct pack+apply of the same rows."""
    import jax.numpy as jnp

    from miner_tpu.data.unbert_packing import pack_rows

    service = unbert_served
    got = service.score(["N1", "N3"], ["N7", "N8", "N2"])
    assert len(got) == 3
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True)
    assert np.isfinite(scores).all()
    again = service.score(["N1", "N3"], ["N7", "N8", "N2"])
    assert got == again

    # reference computation: pack the same (candidate, history) rows by
    # hand and run the model directly
    ctx = service.ctx
    store = ctx.store
    his = service._his_row([store.id_to_row[n] for n in ["N1", "N3"]])
    cand = np.asarray([store.id_to_row[n] for n in ["N7", "N8", "N2"]],
                      np.int32)
    feat = pack_rows(ctx.packer, cand, np.repeat(his[None], 3, axis=0))
    feat = {k: jnp.asarray(feat[k]) for k in (
        "input_ids", "input_mask", "segment_ids",
        "news_segment_ids", "sentence_ids", "sentence_mask")}
    logits = np.asarray(ctx.model.apply({"params": ctx.params}, feat,
                                        deterministic=True))
    want = dict(zip(["N7", "N8", "N2"], logits.tolist()))
    for nid, sc in got:
        np.testing.assert_allclose(sc, want[nid], rtol=5e-4, atol=1e-5)


def test_unbert_serving_refuses_corpus_requests(unbert_served):
    service = unbert_served
    with pytest.raises(ValueError, match="cross-encoder"):
        service.score(["N1"], None, 5)
    with pytest.raises(ValueError, match="cross-encoder"):
        service.score(["N1"], None, None)
    # oversize slates are rejected (each candidate is a full PLM pass)
    service.trainer.args.serve_max_slate = 4
    try:
        with pytest.raises(ValueError, match="serve_max_slate"):
            service.score(["N1"], ["N2", "N3", "N4", "N5", "N6"])
    finally:
        service.trainer.args.serve_max_slate = 512
    # warmup skips the (nonexistent) top-k program but warms slates
    n = service.warmup([3], topk=4, max_b=2)
    assert n == 2  # B in {1, 2} at C_bucket 16; no top-k leg


def test_int8_cache_serving_matches(served):
    """--serve_cache_int8 serving (quantized corpus cache, scales applied to
    the einsum output) reproduces the fp32 service's rankings on both the
    slate path and the corpus top-k path, with scores within quantization
    tolerance."""
    _, service, base, _ = served
    args_q = make_parser().parse_args(["serve", *base, "--serve_cache_int8"])
    quant = ScoringService(Trainer(args_q))
    assert quant.ctx.cache.quantized
    try:
        for cands in (["N7", "N8", "N2"], None):
            a = service.score(["N1", "N3"], cands, 3)
            b = quant.score(["N1", "N3"], cands, 3)
            names_a = [n for n, _ in a]
            names_b = [n for n, _ in b]
            if cands is not None:
                assert names_a == names_b
            else:
                # corpus top-k: allow adjacent swaps from quantization noise
                assert len(set(names_a) & set(names_b)) >= 2
            np.testing.assert_allclose(
                [s for _, s in a], [s for _, s in b], rtol=0.05, atol=0.05)
    finally:
        quant.batcher.close()


def test_int8_cache_persists_and_reloads(served, tmp_path):
    """A persisted int8 cache reloads (skipping the corpus encode) and the
    fingerprint keeps fp32/int8 cache files from satisfying each other."""
    _, service, base, _ = served
    path = str(tmp_path / "corpus_cache.npz")
    args_q = make_parser().parse_args(
        ["serve", *base, "--serve_cache_int8", "--serve_cache_path", path])
    first = ScoringService(Trainer(args_q))
    first.batcher.close()
    assert os.path.exists(path)
    reloaded = ScoringService(Trainer(args_q))
    try:
        assert reloaded.ctx.cache.quantized
        a = service.score(["N1", "N3"], ["N7", "N8", "N2"], 3)
        b = reloaded.score(["N1", "N3"], ["N7", "N8", "N2"], 3)
        assert [n for n, _ in a] == [n for n, _ in b]
    finally:
        reloaded.batcher.close()
    # the same path must NOT satisfy a non-int8 service (fingerprint gate):
    # it rebuilds an fp32 cache rather than loading the int8 file
    args_f = make_parser().parse_args(
        ["serve", *base, "--serve_cache_path", path])
    plain = ScoringService(Trainer(args_f))
    try:
        assert not plain.ctx.cache.quantized
    finally:
        plain.batcher.close()


def test_adaptive_drain_window_tracks_call_duration():
    """Default (max_wait_ms=None) drain window = ~10% of the rolling
    device-call duration, capped at 20ms: ~zero on a fast backend, batch-
    restoring through a high-latency tunnel (where a zero wait measured a
    2x coalescing/throughput loss)."""
    import numpy as np

    from miner_tpu.serving import MicroBatcher

    mb = MicroBatcher(lambda c, h: c.astype(np.float64), his_length=2)
    try:
        assert mb.max_wait_s is None
        assert mb._wait_budget() == 0.0  # no calls yet: don't wait
        mb._call_ema_s = 0.030  # tunnel-like 30ms calls
        assert abs(mb._wait_budget() - 0.003) < 1e-9
        mb._call_ema_s = 1.0  # pathological: capped
        assert mb._wait_budget() == 0.020
        # explicit value wins verbatim, including zero
        mb2 = MicroBatcher(lambda c, h: c.astype(np.float64), his_length=2,
                           max_wait_ms=0)
        mb2._call_ema_s = 0.030
        assert mb2._wait_budget() == 0.0
        mb2.close()
        # the EMA actually updates from real calls
        mb.submit([1, 2], np.zeros(2, np.int32))
        assert mb._call_ema_s > 0.0
    finally:
        mb.close()


def test_threaded_fallback_matches_async(served):
    """--serve_http_impl threaded: the stdlib ThreadingHTTPServer fallback
    serves the same API with the same results as the default asyncio
    front-end (which `served` runs)."""
    from miner_tpu.serving import make_http_server

    url, service, _, _ = served
    expect_status, expect_body = _post(
        url, {"history": ["N1"], "candidates": ["N7", "N2"]})
    assert expect_status == 200

    server = make_http_server(service, "127.0.0.1", 0, impl="threaded")
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        turl = f"http://127.0.0.1:{server.server_address[1]}"
        status, body = _post(turl,
                             {"history": ["N1"], "candidates": ["N7", "N2"]})
        assert status == 200
        assert body == expect_body
        status, body = _post(turl, {"history": ["NOPE"], "candidates": ["N7"]})
        assert status == 400
    finally:
        server.shutdown()


def test_http_keepalive_persistent_connection(served):
    """The server speaks HTTP/1.1 with Content-Length on every reply, so one
    client connection carries many requests (error replies included) without
    being closed — the transport behavior the serving throughput depends on."""
    import http.client

    url, _, _, _ = served
    host, port = url.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port))
    try:
        for i in range(3):
            conn.request(
                "POST", "/score",
                body=json.dumps({"history": ["N1"],
                                 "candidates": ["N7", "N2"]}).encode(),
                headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            assert r.version == 11  # HTTP/1.1
            assert r.status == 200
            body = json.loads(r.read())
            assert len(body["results"]) == 2
        # an error reply must not wedge or close the connection either
        conn.request("POST", "/score",
                     body=json.dumps({"history": ["NOPE"],
                                      "candidates": ["N7"]}).encode(),
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["status"] == "ok"
    finally:
        conn.close()
