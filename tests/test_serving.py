"""HTTP scoring server: rank candidates over the wire with zero PLM calls
per request (miner_tpu/serving.py; `serve` subcommand).  The server's
results must match the `recommend` subcommand for the same request."""
import glob
import json
import os
import threading
import urllib.request

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
    with urllib.request.urlopen(url + "/healthz") as r:
        body = json.loads(r.read())
    assert r.status == 200
    assert body == {"status": "ok", "num_news": service.num_news}


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


def test_score_errors(served):
    url, _, _, _ = served
    status, body = _post(url, {"history": ["NOPE"], "candidates": ["N7"]})
    assert status == 400 and "NOPE" in body["error"]
    status, body = _post(url, {"history": "N1"})
    assert status == 400 and "history" in body["error"]
    status, body = _post(url, {"history": ["N1"], "topk": "three"})
    assert status == 400 and "topk" in body["error"]
    req = urllib.request.Request(url + "/nope", data=b"{}")
    try:
        urllib.request.urlopen(req)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_bucketed_slates_share_compiled_program(served):
    """Different candidate counts inside one bucket reuse one jitted shape;
    the trainer-level program cache stays at one entry per (model, kind)."""
    _, service, _, _ = served
    r3 = service.score(["N1"], ["N7", "N8", "N2"])
    r2 = service.score(["N1"], ["N7", "N8"])
    assert len(r3) == 3 and len(r2) == 2
    fns = service.trainer._serve_score_fns
    assert len(fns) == 1
