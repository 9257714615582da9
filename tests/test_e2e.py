"""End-to-end smoke tests: full train/eval runs on the tiny fixture via the CLI
argument surface, on the 8-device virtual CPU mesh."""
import glob
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from miner_tpu.config import make_parser
from miner_tpu.training.trainer import Trainer
from tests.fixture_data import make_fixture


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    return make_fixture(str(tmp_path_factory.mktemp("mind_e2e")), num_lines=40)


def _train_args(fixture_dir, out_dir, extra=()):
    argv = [
        "train",
        "--model_name", "Miner",
        "--pretrained_tokenizer", "hash:1000",
        "--user2id_path", os.path.join(fixture_dir, "user2id.json"),
        "--category2id_path", os.path.join(fixture_dir, "category2id.json"),
        "--train_behaviors_path", os.path.join(fixture_dir, "behaviors.tsv"),
        "--train_news_path", os.path.join(fixture_dir, "news.tsv"),
        "--eval_behaviors_path", os.path.join(fixture_dir, "behaviors.tsv"),
        "--eval_news_path", os.path.join(fixture_dir, "news.tsv"),
        "--max_title_length", "16",
        "--max_sapo_length", "24",
        "--his_length", "5",
        "--seed", "7",
        "--plm_preset", "tiny",
        "--apply_reduce_dim",
        "--use_sapo",
        "--use_category_bias",
        "--word_embed_dim", "32",
        "--category_embed_dim", "8",
        "--num_context_codes", "4",
        "--context_code_dim", "16",
        "--score_type", "weighted",
        "--npratio", "3",
        "--train_batch_size", "8",
        "--eval_batch_size", "16",
        "--num_train_epochs", "2",
        "--learning_rate", "1e-3",
        "--logging_steps", "2",
        "--compute_dtype", "float32",
        "--metrics", "auc", "group_auc", "mrr", "ndcg@5",
        "--train_path", os.path.join(out_dir, "train"),
        *extra,
    ]
    return make_parser().parse_args(argv)


@pytest.mark.smoke
def test_miner_train_e2e(fixture_dir, tmp_path):
    args = _train_args(fixture_dir, str(tmp_path))
    trainer = Trainer(args)
    state = trainer.train()
    assert int(state.step) > 0
    run_dirs = glob.glob(os.path.join(str(tmp_path), "train", "*"))
    assert len(run_dirs) == 1
    rd = run_dirs[0]
    assert os.path.exists(os.path.join(rd, "args.json"))
    assert os.path.exists(os.path.join(rd, "loss.csv"))
    assert os.path.exists(os.path.join(rd, "eval.csv"))
    assert os.path.exists(os.path.join(rd, "epoch.csv"))
    assert os.path.isdir(os.path.join(rd, "ckpt", "finalModel"))
    # TB scalars under <run_dir>/<--tensorboard_path> ('runs' by default,
    # matching the reference's SummaryWriter dir, src/base_trainer.py:77-78)
    if os.path.isdir(os.path.join(rd, "runs")) is False:
        import importlib.util

        assert importlib.util.find_spec("torch.utils.tensorboard") is None
    # eval.csv has metric columns and finite values
    lines = open(os.path.join(rd, "eval.csv")).read().splitlines()
    assert "auc" in lines[0]
    assert len(lines) >= 2


def test_param_dtype_non_fp32_refused(fixture_dir, tmp_path):
    """--param_dtype only supports fp32 master weights; anything else must
    error loudly instead of being silently ignored."""
    args = _train_args(fixture_dir, str(tmp_path),
                       extra=["--param_dtype", "bfloat16"])
    with pytest.raises(NotImplementedError, match="param_dtype"):
        Trainer(args)


def test_miner_train_learns_signal(fixture_dir, tmp_path):
    """Loss must decrease over epochs on the tiny fixture (learnable signal)."""
    args = _train_args(
        fixture_dir, str(tmp_path),
        extra=["--num_train_epochs", "4", "--learning_rate", "3e-3"],
    )
    Trainer(args).train()
    rd = glob.glob(os.path.join(str(tmp_path), "train", "*"))[0]
    import csv

    rows = list(csv.DictReader(open(os.path.join(rd, "epoch.csv"))))
    first, last = float(rows[0]["train_loss"]), float(rows[-1]["train_loss"])
    assert last < first, f"loss did not decrease: {first} -> {last}"


@pytest.mark.smoke
def test_fastformer_train_e2e(fixture_dir, tmp_path):
    args = _train_args(fixture_dir, str(tmp_path))
    args.model_name = "fastformer"
    args.num_train_epochs = 1
    trainer = Trainer(args)
    state = trainer.train()
    assert int(state.step) > 0


@pytest.mark.smoke
def test_unisrec_train_e2e(fixture_dir, tmp_path):
    args = _train_args(fixture_dir, str(tmp_path))
    args.model_name = "unisrec"
    args.combine_type = "pre-concat"
    args.num_train_epochs = 1
    trainer = Trainer(args)
    state = trainer.train()
    assert int(state.step) > 0


def _unisrec_args(fixture_dir, out_dir):
    args = _train_args(fixture_dir, out_dir)
    args.model_name = "unisrec"
    args.combine_type = "pre-concat"
    args.num_train_epochs = 1
    return args


def _unisrec_init_flat(trainer, args):
    """Re-initialize UniSRec params with the trainer's seed and return them
    flattened as {keystr: leaf} — the baseline the freeze/unfreeze tests
    compare trained params against."""
    import jax

    store = trainer._load_store(args.train_news_path)
    trainer._num_augs = 0
    model, kind = trainer.build_model(store)
    from miner_tpu.data.batcher import Batcher
    from miner_tpu.data.behaviors import BehaviorsLog
    from miner_tpu.data.samplers import OfflineSampler

    log = BehaviorsLog.from_tsv(args.train_behaviors_path, store,
                                trainer.user2id, args.his_length)
    sampler = OfflineSampler(log, store, args.npratio, seed=args.seed)
    example = next(Batcher(8, drop_last=True).batches(sampler.sample_epoch(0)))
    example = {k: jnp.asarray(v) for k, v in example.items() if k != "valid"}
    init_params = trainer._init_params_for_kind(
        model, kind, trainer._make_table(store), example
    )
    return {jax.tree_util.keystr(p): l
            for p, l in jax.tree_util.tree_leaves_with_path(init_params)}


def test_unisrec_freezes_non_moe(fixture_dir, tmp_path):
    """Only MoE adaptor params may change during UniSRec training."""
    import jax

    args = _unisrec_args(fixture_dir, str(tmp_path))
    trainer = Trainer(args)
    state = trainer.train()
    # the PLM subtree must be untouched by training: re-init and compare
    init_flat = _unisrec_init_flat(trainer, args)
    changed_moe = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        key = jax.tree_util.keystr(path)
        same = np.allclose(np.asarray(leaf), np.asarray(init_flat[key]))
        if "moe" in key.lower():
            changed_moe += 0 if same else 1
        else:
            assert same, f"non-MoE param {key} changed during UniSRec training"
    assert changed_moe > 0, "no MoE params changed — training had no effect"


def test_unisrec_train_all_unfreezes(fixture_dir, tmp_path):
    """--unisrec_train_all trains beyond the MoE adaptor (opt-in deviation
    for from-scratch runs with no pretrained state dict)."""
    import jax

    args = _unisrec_args(fixture_dir, str(tmp_path))
    args.unisrec_train_all = True
    trainer = Trainer(args)
    state = trainer.train()
    init_flat = _unisrec_init_flat(trainer, args)
    changed_nonmoe = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        key = jax.tree_util.keystr(path)
        if "moe" not in key.lower():
            if not np.allclose(np.asarray(leaf), np.asarray(init_flat[key])):
                changed_nonmoe += 1
    assert changed_nonmoe > 0, \
        "--unisrec_train_all did not unfreeze non-MoE params"


def test_unisrec_train_all_respects_freeze_transformer(fixture_dir, tmp_path):
    """--unisrec_train_all lifts the MoE-only freeze but must NOT override
    an explicit --freeze_transformer: the PLM stays frozen."""
    args = _unisrec_args(fixture_dir, str(tmp_path))
    args.unisrec_train_all = True
    args.freeze_transformer = True
    pred = Trainer(args)._trainable_pred()
    assert pred is not None
    assert not pred("encoder/plm/layers_0/attn/qkv/kernel")
    assert pred("user_encoder/transformer/layers_0/ffn/kernel")
    # and without freeze_transformer everything trains
    args.freeze_transformer = False
    assert Trainer(args)._trainable_pred() is None


def test_legacy_layout_train_e2e(fixture_dir, tmp_path):
    """--legacy_history_layout threads end-to-end: training + eval run on
    the reference's pads-first history rows."""
    args = _train_args(fixture_dir, str(tmp_path),
                       extra=("--legacy_history_layout",))
    args.num_train_epochs = 1
    trainer = Trainer(args)
    assert trainer._legacy_layout
    state = trainer.train()
    assert int(state.step) > 0
    rd = glob.glob(os.path.join(str(tmp_path), "train", "*"))[0]
    lines = open(os.path.join(rd, "eval.csv")).read().splitlines()
    assert len(lines) >= 2


@pytest.mark.smoke
def test_pretrain_e2e(fixture_dir, tmp_path):
    """Pretraining runs its own eval loop: periodic contrastive eval loss
    over the eval behaviors with best-loss checkpointing (reference:
    src/pretrainer.py:163-190 — the reference pretrainer evaluates the same
    objective it trains)."""
    args = _train_args(fixture_dir, str(tmp_path))
    args.model_name = "pretrain"
    args.augmentations = ["enhanced_text"]
    args.online = 1
    args.num_train_epochs = 1
    args.evaluation_info = ["loss"]
    args.eval_steps = 3
    trainer = Trainer(args)
    state = trainer.train()
    assert int(state.step) > 0
    rd = glob.glob(os.path.join(str(tmp_path), "train", "*"))[0]
    # the pretrain eval loss lands in eval.csv and selects bestLossModel
    lines = open(os.path.join(rd, "eval.csv")).read().splitlines()
    assert lines[0].split(",")[:3] == ["epoch", "step", "loss"]
    assert len(lines) >= 2
    loss_vals = [float(l.split(",")[2]) for l in lines[1:]]
    assert all(np.isfinite(v) for v in loss_vals)
    assert os.path.isdir(os.path.join(rd, "ckpt", "bestLossModel"))
    assert not os.path.isdir(os.path.join(rd, "ckpt", "bestAucModel"))


def test_pretrain_then_finetune_grafts_encoder(fixture_dir, tmp_path):
    """--pretrained_model_path with a pretrain-kind checkpoint grafts the
    contrastively pretrained NewsEncoder into the Miner tower — the
    reference's pretrain->finetune flow (src/trainer.py:101-102 loads the
    flag as the news encoder; src/trainer_continued.py:106 is the separate
    full-model continued-training flow, also via this flag)."""
    from flax.traverse_util import flatten_dict

    from miner_tpu.training.checkpoint import CheckpointManager

    args = _train_args(fixture_dir, os.path.join(str(tmp_path), "pre"))
    args.model_name = "pretrain"
    args.augmentations = ["enhanced_text"]
    args.online = 1
    args.num_train_epochs = 1
    Trainer(args).train()
    pre_rd = glob.glob(os.path.join(str(tmp_path), "pre", "train", "*"))[0]
    pre_ckpt = os.path.join(pre_rd, "ckpt", "finalModel")
    pre_params = CheckpointManager(os.path.dirname(pre_ckpt)).restore(
        "finalModel")["params"]

    # lr=0 finetune: the finalModel's tower must equal the pretrain
    # checkpoint bit-for-bit (AdamW updates and decay all scale by lr)
    args_ft = _train_args(
        fixture_dir, os.path.join(str(tmp_path), "ft"),
        extra=("--pretrained_model_path", pre_ckpt,
               "--learning_rate", "0.0"))
    args_ft.num_train_epochs = 1
    state = Trainer(args_ft).train()
    assert int(state.step) > 0
    ft_rd = glob.glob(os.path.join(str(tmp_path), "ft", "train", "*"))[0]
    ft_params = CheckpointManager(
        os.path.join(ft_rd, "ckpt")).restore("finalModel")["params"]
    got = flatten_dict(ft_params["news_encoder"])
    want = flatten_dict(pre_params)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg="/".join(k))

    # continued training (full-model checkpoint through the same flag,
    # reference: src/trainer_continued.py:106): lr=0 round-trips ALL params
    ft_ckpt = os.path.join(ft_rd, "ckpt", "finalModel")
    args_ct = _train_args(
        fixture_dir, os.path.join(str(tmp_path), "ct"),
        extra=("--pretrained_model_path", ft_ckpt,
               "--learning_rate", "0.0"))
    args_ct.num_train_epochs = 1
    Trainer(args_ct).train()
    ct_rd = glob.glob(os.path.join(str(tmp_path), "ct", "train", "*"))[0]
    ct_params = CheckpointManager(
        os.path.join(ct_rd, "ckpt")).restore("finalModel")["params"]
    got_full, want_full = flatten_dict(ct_params), flatten_dict(ft_params)
    assert set(got_full) == set(want_full)
    for k in want_full:
        np.testing.assert_array_equal(np.asarray(got_full[k]),
                                      np.asarray(want_full[k]),
                                      err_msg="/".join(k))

    # mismatched checkpoint (neither full-model nor encoder layout) errors
    # loudly instead of half-loading
    args_bad = _train_args(
        fixture_dir, os.path.join(str(tmp_path), "bad"),
        extra=("--pretrained_model_path", pre_ckpt))
    args_bad.model_name = "unisrec"
    args_bad.combine_type = "pre-concat"
    with pytest.raises((ValueError, KeyError)):
        Trainer(args_bad).train()


def test_evaluation_info_gates_best_checkpoints(fixture_dir, tmp_path):
    """--evaluation_info metrics (the reference's train2.txt setting) keeps
    bestAucModel selection but drops bestLossModel; the eval.csv loss column
    stays empty (reference: src/trainer.py:181-206, 290-296)."""
    args = _train_args(fixture_dir, str(tmp_path))
    args.evaluation_info = ["metrics"]
    args.num_train_epochs = 1
    Trainer(args).train()
    rd = glob.glob(os.path.join(str(tmp_path), "train", "*"))[0]
    assert os.path.isdir(os.path.join(rd, "ckpt", "bestAucModel"))
    assert not os.path.isdir(os.path.join(rd, "ckpt", "bestLossModel"))
    import csv

    rows = list(csv.DictReader(open(os.path.join(rd, "eval.csv"))))
    assert rows and all(r["loss"] == "" for r in rows)
    assert all(np.isfinite(float(r["auc"])) for r in rows)


def test_eval_standalone(fixture_dir, tmp_path):
    args_t = _train_args(fixture_dir, str(tmp_path))
    trainer = Trainer(args_t)
    trainer.train()
    rd = glob.glob(os.path.join(str(tmp_path), "train", "*"))[0]

    argv = [
        "eval",
        "--model_name", "Miner",
        "--pretrained_tokenizer", "hash:1000",
        "--user2id_path", os.path.join(fixture_dir, "user2id.json"),
        "--category2id_path", os.path.join(fixture_dir, "category2id.json"),
        "--eval_behaviors_path", os.path.join(fixture_dir, "behaviors.tsv"),
        "--eval_news_path", os.path.join(fixture_dir, "news.tsv"),
        "--saved_model_path", os.path.join(rd, "ckpt", "finalModel"),
        "--max_title_length", "16",
        "--max_sapo_length", "24",
        "--his_length", "5",
        "--plm_preset", "tiny",
        "--apply_reduce_dim",
        "--use_sapo",
        "--use_category_bias",
        "--word_embed_dim", "32",
        "--category_embed_dim", "8",
        "--num_context_codes", "4",
        "--context_code_dim", "16",
        "--compute_dtype", "float32",
        "--metrics", "auc", "mrr",
        "--eval_path", os.path.join(str(tmp_path), "eval"),
        "--save_eval_result",
    ]
    args_e = make_parser().parse_args(argv)
    scores = Trainer(args_e).eval()
    assert "auc" in scores and 0 <= scores["auc"] <= 1
    ed = glob.glob(os.path.join(str(tmp_path), "eval", "*"))[0]
    assert os.path.exists(os.path.join(ed, "preds.pkl"))


def test_true_resume(fixture_dir, tmp_path):
    """--resume_from restores params+opt+step and skips completed epochs —
    the reference saved optimizer state but never restored it
    (base_trainer.py:223-235)."""
    args = _train_args(fixture_dir, str(tmp_path / "a"))
    args.num_train_epochs = 2
    state_a = Trainer(args).train()
    steps_2ep = int(state_a.step)
    rd = glob.glob(os.path.join(str(tmp_path / "a"), "train", "*"))[0]

    args_r = _train_args(fixture_dir, str(tmp_path / "b"))
    args_r.num_train_epochs = 4
    args_r.resume_from = os.path.join(rd, "ckpt", "finalModel")
    state_b = Trainer(args_r).train()
    # resumed at epoch 2, ran epochs 2..3 -> exactly twice the steps
    assert int(state_b.step) == 2 * steps_2ep

    # resuming a fully-finished run performs zero additional steps
    args_done = _train_args(fixture_dir, str(tmp_path / "c"))
    args_done.num_train_epochs = 2
    args_done.resume_from = os.path.join(rd, "ckpt", "finalModel")
    state_c = Trainer(args_done).train()
    assert int(state_c.step) == steps_2ep


def test_recommend_cli(fixture_dir, tmp_path):
    """Serving path: rank candidates for a click history from a checkpoint
    via the news-embedding cache."""
    args_t = _train_args(fixture_dir, str(tmp_path))
    args_t.num_train_epochs = 1
    Trainer(args_t).train()
    rd = glob.glob(os.path.join(str(tmp_path), "train", "*"))[0]

    argv = [
        "recommend",
        "--model_name", "Miner",
        "--pretrained_tokenizer", "hash:1000",
        "--user2id_path", os.path.join(fixture_dir, "user2id.json"),
        "--category2id_path", os.path.join(fixture_dir, "category2id.json"),
        "--eval_news_path", os.path.join(fixture_dir, "news.tsv"),
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
        "--user_history", "N1", "N3",
        "--topk", "3",
    ]
    args_r = make_parser().parse_args(argv)
    results = Trainer(args_r).recommend()
    assert len(results) == 3
    ids = [nid for nid, _ in results]
    assert len(set(ids)) == 3 and all(i.startswith("N") for i in ids)
    scores = [s for _, s in results]
    assert scores == sorted(scores, reverse=True)
    assert np.isfinite(scores).all()

    # explicit candidate slate restricts the pool
    args_r2 = make_parser().parse_args(
        argv + ["--candidates", "N7", "N8"])
    args_r2.topk = 2
    trainer2 = Trainer(args_r2)
    results2 = trainer2.recommend()
    assert {nid for nid, _ in results2} == {"N7", "N8"}
    # serve_scores caches its jitted program per (model, kind, fused-path):
    # a serving loop holding one model must not rebuild + recompile the
    # closure per request
    assert len(trainer2._serve_score_fns) == 1
    ((_, skind, _, _),) = trainer2._serve_score_fns
    store2 = trainer2._load_store(args_r2.eval_news_path)
    model2, kind2 = trainer2.build_model(store2)
    table2 = trainer2._make_table(store2)
    example = {k: jnp.asarray(v) for k, v in {
        "cand_idx": np.zeros((1, 1), np.int32),
        "his_idx": np.zeros((1, args_r2.his_length), np.int32),
        "label": np.zeros((1, 1), np.float32),
        "impression_id": np.zeros((1,), np.int32)}.items()}
    params2 = trainer2._init_params_for_kind(
        model2, kind2, trainer2._host_table(store2), example)
    cache2 = trainer2._build_eval_cache(model2, params2, table2)
    n_before = len(trainer2._serve_score_fns)
    cand = np.array([[1, 2]], np.int32)
    his = np.zeros((1, args_r2.his_length), np.int32)
    s1 = trainer2.serve_scores(model2, kind2, params2, cache2, cand, his)
    s2 = trainer2.serve_scores(model2, kind2, params2, cache2, cand, his)
    np.testing.assert_array_equal(s1, s2)
    # one new entry for the new model instance, reused across both calls
    assert len(trainer2._serve_score_fns) == n_before + 1


def test_fast_eval_mode(fixture_dir, tmp_path):
    """--fast_eval evaluates on train-format (1+npratio) rows with the
    FastEvaluator (reference: trainer.py:65-68, evaluation.py:87-110)."""
    args = _train_args(fixture_dir, str(tmp_path), extra=("--fast_eval",))
    args.num_train_epochs = 1
    trainer = Trainer(args)
    trainer.train()
    rd = glob.glob(os.path.join(str(tmp_path), "train", "*"))[0]
    lines = open(os.path.join(rd, "eval.csv")).read().splitlines()
    assert len(lines) >= 2
    header = lines[0].split(",")
    row = lines[-1].split(",")
    auc = float(row[header.index("auc")])
    assert 0.0 <= auc <= 1.0


def test_gradient_accumulation(fixture_dir, tmp_path):
    """optax.MultiSteps accumulation (replacing trainer.py:146-168's manual
    gate): with accum=K the parameters change only every K micro-steps, and
    training still learns."""
    import jax

    args = _train_args(fixture_dir, str(tmp_path),
                       extra=("--gradient_accumulation_steps", "2"))
    args.num_train_epochs = 2
    trainer = Trainer(args)
    state = trainer.train()
    assert int(state.step) > 0
    # MultiSteps keeps the inner optimizer count at steps // K
    from optax import MultiStepsState

    def find_ms(obj):
        if isinstance(obj, MultiStepsState):
            return obj
        if isinstance(obj, (tuple, list)):
            for o in obj:
                r = find_ms(o)
                if r is not None:
                    return r
        return None
    ms = find_ms(state.opt_state)
    assert ms is not None, "MultiSteps must be active with accum > 1"
    micro = int(state.step)
    opt_steps = int(ms.gradient_step)
    assert opt_steps == micro // 2


def test_recommend_fastformer(fixture_dir, tmp_path):
    """Serving path for the vanilla (single-user-vector) model kind."""
    args_t = _train_args(fixture_dir, str(tmp_path))
    args_t.model_name = "fastformer"
    args_t.num_train_epochs = 1
    Trainer(args_t).train()
    rd = glob.glob(os.path.join(str(tmp_path), "train", "*"))[0]

    argv = [
        "recommend",
        "--model_name", "fastformer",
        "--pretrained_tokenizer", "hash:1000",
        "--user2id_path", os.path.join(fixture_dir, "user2id.json"),
        "--category2id_path", os.path.join(fixture_dir, "category2id.json"),
        "--eval_news_path", os.path.join(fixture_dir, "news.tsv"),
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
        "--user_history", "N1", "N3",
        "--topk", "3",
    ]
    from miner_tpu.config import make_parser

    results = Trainer(make_parser().parse_args(argv)).recommend()
    assert len(results) == 3
    scores = [s for _, s in results]
    assert scores == sorted(scores, reverse=True)
    assert np.isfinite(scores).all()


def test_recommend_unisrec(fixture_dir, tmp_path):
    """Serving path for the UniSRec (sequential, pre-concat) model kind —
    position-sensitive: its user vector reads position 0, which must be a
    real click under the clicks-first history layout."""
    args_t = _train_args(fixture_dir, str(tmp_path))
    args_t.model_name = "unisrec"
    args_t.combine_type = "pre-concat"
    args_t.num_train_epochs = 1
    Trainer(args_t).train()
    rd = glob.glob(os.path.join(str(tmp_path), "train", "*"))[0]

    argv = [
        "recommend",
        "--model_name", "unisrec",
        "--pretrained_tokenizer", "hash:1000",
        "--user2id_path", os.path.join(fixture_dir, "user2id.json"),
        "--category2id_path", os.path.join(fixture_dir, "category2id.json"),
        "--eval_news_path", os.path.join(fixture_dir, "news.tsv"),
        "--saved_model_path", os.path.join(rd, "ckpt", "finalModel"),
        "--max_title_length", "16",
        "--max_sapo_length", "24",
        "--his_length", "5",
        "--plm_preset", "tiny",
        "--apply_reduce_dim", "--use_sapo", "--use_category_bias",
        "--combine_type", "pre-concat",
        "--word_embed_dim", "32",
        "--category_embed_dim", "8",
        "--num_context_codes", "4",
        "--context_code_dim", "16",
        "--compute_dtype", "float32",
        "--metrics", "auc",
        "--user_history", "N1", "N3",
        "--topk", "3",
    ]
    from miner_tpu.config import make_parser

    results = Trainer(make_parser().parse_args(argv)).recommend()
    assert len(results) == 3
    scores = [s for _, s in results]
    assert scores == sorted(scores, reverse=True)
    assert np.isfinite(scores).all()
    # the user vector must actually depend on the history (position-0
    # regression guard): a different click history reranks or rescores
    argv[argv.index("N1")] = "N7"
    other = Trainer(make_parser().parse_args(argv)).recommend()
    assert any(abs(a[1] - b[1]) > 1e-9 for a, b in zip(results, other))


def test_matmul_precision_flag(fixture_dir, tmp_path):
    """--matmul_precision configures jax's default matmul precision — on
    TPU, f32 matmuls otherwise run single-pass bf16, which is NOT a
    torch-fp32-comparable numeric mode (quality_run's fp32 legs rely on
    this flag)."""
    import jax

    args = _train_args(fixture_dir, str(tmp_path),
                       extra=["--matmul_precision", "float32"])
    Trainer(args)
    assert str(jax.config.jax_default_matmul_precision) == "float32"
    jax.config.update("jax_default_matmul_precision", None)


def test_warmstart_hf_roundtrip_e2e(fixture_dir, tmp_path):
    """The reference's default warm-start regime, end-to-end in-env:
    contrastive CLI pretrain -> export the tower to a transformers-format
    checkpoint dir -> Miner train consumes it via --pretrained_embedding
    (reference: src/trainer.py:92-108). At lr=0 the trained finalModel's PLM
    must equal the exported pretrain tower bit-for-bit, proving the HF
    round trip (orbax -> torch state dict -> flax graft) is lossless."""
    from flax.traverse_util import flatten_dict

    from miner_tpu.training.checkpoint import CheckpointManager
    from tools.warmstart_ab import export_hf_checkpoint

    args = _train_args(fixture_dir, os.path.join(str(tmp_path), "pre"))
    args.model_name = "pretrain"
    args.augmentations = ["enhanced_text"]
    args.online = 1
    args.num_train_epochs = 1
    Trainer(args).train()
    pre_rd = glob.glob(os.path.join(str(tmp_path), "pre", "train", "*"))[0]
    hf_dir = export_hf_checkpoint(
        os.path.join(pre_rd, "ckpt", "finalModel"),
        os.path.join(str(tmp_path), "hf_ckpt"))
    assert os.path.exists(os.path.join(hf_dir, "pytorch_model.bin"))
    pre_params = CheckpointManager(
        os.path.join(pre_rd, "ckpt")).restore("finalModel")["params"]

    args_ft = _train_args(
        fixture_dir, os.path.join(str(tmp_path), "ft"),
        extra=("--pretrained_embedding", hf_dir, "--learning_rate", "0.0"))
    args_ft.num_train_epochs = 1
    state = Trainer(args_ft).train()
    assert int(state.step) > 0
    ft_rd = glob.glob(os.path.join(str(tmp_path), "ft", "train", "*"))[0]
    ft_params = CheckpointManager(
        os.path.join(ft_rd, "ckpt")).restore("finalModel")["params"]

    want = flatten_dict(pre_params["plm"])
    got = flatten_dict(ft_params["news_encoder"]["plm"])
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=str(k))


def test_pretrain_mode_implies_pretrain_model(fixture_dir, tmp_path):
    """Direct Trainer(args) construction with the pretrain subcommand must
    build the pretrain kind (news encoder alone) without the caller setting
    --model_name, exactly like the CLI (reference main.py:28-30). A silent
    fall-through to Miner previously trained the wrong model."""
    args = _train_args(fixture_dir, str(tmp_path))
    args.mode = "pretrain"
    # NOTE: --model_name parses with default "Miner"; pretrain mode must
    # override it regardless (the reference's pretrain offers no model
    # choice, main.py:28-30)
    trainer = Trainer(args)
    assert trainer.model_name == "pretrain"
    args3 = _train_args(fixture_dir, str(tmp_path))
    assert Trainer(args3).model_name == "miner"
