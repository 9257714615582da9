"""Step-level training parity against the reference PyTorch implementation.

The reference source tree (/root/reference) and torch/transformers are
importable in this environment, so "same math" is proven directly: the
reference ``Miner`` and miner_tpu's ``Miner`` are initialized from the SAME
weights (torch state_dict -> hf_import.convert_miner_state_dict), fed the
SAME fixture batches, and trained for N steps in fp32 with the same recipe
(AdamW + linear warmup/decay + global-norm clip + the reference's
decay-group split). Loss trajectories and final logits must agree to fp32
accumulation noise. Ref: src/model/model.py:13-138, src/trainer.py:119-123,
325-332, src/loss.py:27-44.

Setup notes:
  * all dropout rates are 0 (parity of the deterministic math; dropout
    streams are framework-specific by construction);
  * ``legacy_poly_mask`` semantics (the reference's 1e-30 mask fill,
    model.py:180) are enabled on our side and a masked history prefix is
    injected identically into both models;
  * pad-news rows (all-pad token sequences) are remapped to a real news row:
    RoBERTa derives position ids from ``input_ids != pad`` (data-dependent),
    so an all-pad row is the one input where the two implementations
    legitimately differ — and its representation is meaningless by
    definition. Documented in PARITY.md.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference source tree not available",
)

N_STEPS = 20
B, C, H = 8, 4, 5
LT, LS = 16, 24
D_WORD, K, P_DIM, D_CAT = 32, 4, 16, 8
LR, WARMUP, WD, CLIP = 1e-3, 3, 0.01, 1.0


@pytest.fixture(scope="module")
def ref_mod():
    sys.path.insert(0, REF)
    import src.loss as ref_loss
    import src.model.model as ref_model

    yield ref_model, ref_loss
    sys.path.remove(REF)


def _plm_cfg(vocab):
    from miner_tpu.models.plm import PLMConfig

    # RoBERTa position ids are cumsum(ids != pad) + pad; with pad=0 and
    # contiguous token prefixes that equals arange + 1.
    return PLMConfig(
        vocab_size=vocab, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=40, type_vocab_size=1,
        layer_norm_eps=1e-5, hidden_dropout=0.0, attention_dropout=0.0,
        pad_token_id=0, position_offset=1,
    )


def _roberta_cfg(vocab):
    from transformers import RobertaConfig

    return RobertaConfig(
        vocab_size=vocab, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=40, type_vocab_size=1, layer_norm_eps=1e-5,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=0, hidden_act="gelu",
    )


def _fixture_batches(tmp_path, n_cat_holder):
    """Identical numeric batches for both frameworks, via our data stack."""
    import json

    from miner_tpu.data import BehaviorsLog, HashTokenizer, NewsStore
    from miner_tpu.data.batcher import Batcher
    from miner_tpu.data.device_table import NewsTable
    from miner_tpu.data.samplers import OfflineSampler
    from tests.fixture_data import make_fixture

    d = make_fixture(str(tmp_path / "fx"), num_lines=40)
    tok = HashTokenizer(vocab_size=1000)
    cat2id = json.load(open(os.path.join(d, "category2id.json")))
    user2id = json.load(open(os.path.join(d, "user2id.json")))
    store = NewsStore.from_tsv(os.path.join(d, "news.tsv"), tok, cat2id, LT, LS)
    log = BehaviorsLog.from_tsv(os.path.join(d, "behaviors.tsv"), store,
                                user2id, H)
    block = OfflineSampler(log, store, C - 1, seed=7).sample_epoch(0)
    # remap pad-news rows to a real row (see module docstring)
    block.cand[block.cand == 0] = 1
    block.his[block.his == 0] = 1
    table = NewsTable.from_store(store, use_sapo=True, combine_type="linear",
                                 device_put=False)
    n_cat_holder.append(int(store.flat_category().max()) + 1)
    n_cat_holder.append(store.category_pad_id)

    batches = []
    batcher = Batcher(B, drop_last=True, shuffle=True, seed=7)
    for batch in batcher.batches(block, 0):
        mb = {k: np.asarray(v)
              for k, v in table.lookup(batch["cand_idx"], batch["his_idx"]).items()}
        # exercise the legacy 1e-30 poly mask: mask the first history slot
        mb["his_mask"] = mb["his_mask"].copy()
        mb["his_mask"][:, 0] = 0
        mb["label"] = batch["label"].astype(np.float32)
        batches.append(mb)
    return batches


def _torch_step_fns(ref_mod, n_cat, cat_pad, vocab):
    """Reference model + the reference training recipe, tiny geometry."""
    import torch
    import transformers

    ref_model, ref_loss = ref_mod
    sys.modules.pop("src.model.news_encoder", None)
    from src.model.news_encoder import NewsEncoder as RefNewsEncoder

    torch.manual_seed(0)
    enc = RefNewsEncoder(
        config=_roberta_cfg(vocab), apply_reduce_dim=True, use_sapo=True,
        dropout=0.0, freeze_transformer=False, word_embed_dim=D_WORD,
        combine_type="linear",
    )
    model = ref_model.Miner(
        news_encoder=enc, use_category_bias=True, num_context_codes=K,
        context_code_dim=P_DIM, score_type="weighted", dropout=0.0,
        num_category=n_cat, category_embed_dim=D_CAT,
        category_pad_token_id=cat_pad,
    )
    model.train()
    loss_obj = ref_loss.Loss(torch.nn.CrossEntropyLoss())

    no_decay = ["bias", "LayerNorm.weight"]
    groups = [
        {"params": [p for n, p in model.named_parameters()
                    if not any(nd in n for nd in no_decay)],
         "weight_decay": WD},
        {"params": [p for n, p in model.named_parameters()
                    if any(nd in n for nd in no_decay)],
         "weight_decay": 0.0},
    ]
    opt = torch.optim.AdamW(groups, lr=LR, weight_decay=WD)
    sched = transformers.get_linear_schedule_with_warmup(
        optimizer=opt, num_warmup_steps=WARMUP, num_training_steps=N_STEPS
    )

    def to_t(mb):
        import torch

        return {
            "title": torch.tensor(mb["cand_title"].astype(np.int64)),
            "title_mask": torch.tensor(mb["cand_title_mask"].astype(np.int64)),
            "his_title": torch.tensor(mb["his_title"].astype(np.int64)),
            "his_title_mask": torch.tensor(mb["his_title_mask"].astype(np.int64)),
            "his_mask": torch.tensor(mb["his_mask"].astype(bool)),
            "sapo": torch.tensor(mb["cand_sapo"].astype(np.int64)),
            "sapo_mask": torch.tensor(mb["cand_sapo_mask"].astype(np.int64)),
            "his_sapo": torch.tensor(mb["his_sapo"].astype(np.int64)),
            "his_sapo_mask": torch.tensor(mb["his_sapo_mask"].astype(np.int64)),
            "category": torch.tensor(mb["cand_category"].astype(np.int64)),
            "his_category": torch.tensor(mb["his_category"].astype(np.int64)),
        }

    def forward(mb):
        import torch

        tb = to_t(mb)
        with torch.no_grad():
            interests, logits = model(**tb)
        return logits.numpy()

    def step(mb):
        import torch

        tb = to_t(mb)
        interests, logits = model(**tb)
        loss = loss_obj.compute(
            interests, logits, torch.tensor(mb["label"])
        )
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        sched.step()
        return float(loss.detach())

    return model, forward, step


def _jax_model(n_cat, cat_pad, vocab):
    from miner_tpu.models import Miner, NewsEncoder

    encoder = NewsEncoder(
        plm_cfg=_plm_cfg(vocab), apply_reduce_dim=True,
        word_embed_dim=D_WORD, use_sapo=True, combine_type="linear",
        dropout=0.0,
    )
    return Miner(
        news_encoder=encoder, use_category_bias=True, num_context_codes=K,
        context_code_dim=P_DIM, score_type="weighted", dropout=0.0,
        num_categories=n_cat, category_embed_dim=D_CAT,
        category_pad_id=cat_pad, legacy_mask=True, use_fused=False,
        dtype=jnp.float32,
    )


def test_step_level_training_parity(tmp_path, ref_mod):
    from miner_tpu.models.hf_import import convert_miner_state_dict
    from miner_tpu.training import losses
    from miner_tpu.training.optim import make_optimizer
    from miner_tpu.training.train_state import TrainState

    vocab = 1000
    holder = []
    batches = _fixture_batches(tmp_path, holder)
    n_cat, cat_pad = holder
    assert len(batches) >= 4
    torch_model, torch_forward, torch_step = _torch_step_fns(
        ref_mod, n_cat, cat_pad, vocab
    )

    # --- same weights: torch state_dict -> our param tree
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = convert_miner_state_dict(sd, num_layers=2)
    model = _jax_model(n_cat, cat_pad, vocab)
    init = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {k: jnp.asarray(v) for k, v in batches[0].items() if k != "label"},
    )["params"]
    init_keys = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(init)}
    conv_keys = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert init_keys == conv_keys, (
        f"missing={sorted(init_keys - conv_keys)} "
        f"extra={sorted(conv_keys - init_keys)}"
    )
    params = jax.tree_util.tree_map(
        lambda leaf: jnp.asarray(leaf, jnp.float32), params
    )

    # --- forward parity before training
    def jax_forward(p, mb):
        interests, logits = model.apply(
            {"params": p},
            {k: jnp.asarray(v) for k, v in mb.items() if k != "label"},
            deterministic=True,
        )
        return interests, logits

    fwd = jax.jit(jax_forward)
    _, logits0 = fwd(params, batches[0])
    ref_logits0 = torch_forward(batches[0])
    np.testing.assert_allclose(np.asarray(logits0), ref_logits0,
                               rtol=1e-4, atol=1e-5)

    # --- same recipe, N steps
    tx = make_optimizer(params, learning_rate=LR, total_steps=N_STEPS,
                        warmup_steps=WARMUP, weight_decay=WD,
                        max_grad_norm=CLIP)
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))

    @jax.jit
    def train_step(state, mb_arrays, label):
        def loss_fn(p):
            interests, logits = model.apply(
                {"params": p}, mb_arrays, deterministic=True
            )
            return losses.miner_loss(interests, logits, label)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    jax_losses, torch_losses = [], []
    for i in range(N_STEPS):
        mb = batches[i % len(batches)]
        arrays = {k: jnp.asarray(v) for k, v in mb.items() if k != "label"}
        state, l = train_step(state, arrays, jnp.asarray(mb["label"]))
        jax_losses.append(float(l))
        torch_losses.append(torch_step(mb))

    np.testing.assert_allclose(
        np.asarray(jax_losses), np.asarray(torch_losses),
        rtol=2e-4, atol=2e-4,
        err_msg="loss trajectories diverged between torch and JAX",
    )

    # --- final logits parity after training
    _, logits_n = fwd(state.params, batches[0])
    ref_logits_n = torch_forward(batches[0])
    np.testing.assert_allclose(np.asarray(logits_n), ref_logits_n,
                               rtol=1e-3, atol=1e-4)


def test_export_loads_into_reference_model(ref_mod):
    """A checkpoint exported by export_miner_state_dict loads into the
    reference ``Miner`` with strict=False leaving only non-trainable
    buffers missing and NO unexpected keys (shape mismatches would raise).
    Numerical equivalence follows from the exact export/convert round trip
    (tests/test_hf_import.py) plus the import-direction parity above."""
    import torch

    from miner_tpu.models import Miner, NewsEncoder
    from miner_tpu.models.hf_import import export_miner_state_dict

    ref_model, _ = ref_mod
    sys.modules.pop("src.model.news_encoder", None)
    from src.model.news_encoder import NewsEncoder as RefNewsEncoder

    vocab, n_cat, cat_pad = 1000, 7, 0
    enc = NewsEncoder(plm_cfg=_plm_cfg(vocab), apply_reduce_dim=True,
                      word_embed_dim=D_WORD, use_sapo=True,
                      combine_type="linear", dropout=0.0)
    ours = Miner(news_encoder=enc, use_category_bias=True,
                 num_context_codes=K, context_code_dim=P_DIM,
                 score_type="weighted", dropout=0.0, num_categories=n_cat,
                 category_embed_dim=D_CAT, category_pad_id=cat_pad)
    rng = np.random.default_rng(0)
    ids = lambda shape: jnp.asarray(
        rng.integers(1, vocab, size=shape).astype(np.int32))
    ones = lambda shape: jnp.ones(shape, jnp.int32)
    batch = {
        "cand_title": ids((2, C, LT)), "cand_title_mask": ones((2, C, LT)),
        "his_title": ids((2, H, LT)), "his_title_mask": ones((2, H, LT)),
        "cand_sapo": ids((2, C, LS)), "cand_sapo_mask": ones((2, C, LS)),
        "his_sapo": ids((2, H, LS)), "his_sapo_mask": ones((2, H, LS)),
        "cand_category": ids((2, C)) % n_cat, "his_category": ids((2, H)) % n_cat,
        "his_mask": ones((2, H)),
    }
    params = ours.init(jax.random.PRNGKey(0), batch)["params"]
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_miner_state_dict(params, "roberta").items()}

    torch.manual_seed(0)
    renc = RefNewsEncoder(config=_roberta_cfg(vocab), apply_reduce_dim=True,
                          use_sapo=True, dropout=0.0,
                          freeze_transformer=False, word_embed_dim=D_WORD,
                          combine_type="linear")
    rmodel = ref_model.Miner(news_encoder=renc, use_category_bias=True,
                             num_context_codes=K, context_code_dim=P_DIM,
                             score_type="weighted", dropout=0.0,
                             num_category=n_cat, category_embed_dim=D_CAT,
                             category_pad_token_id=cat_pad)
    result = rmodel.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    # only non-forward tensors may be absent: buffers (position_ids) and the
    # HF pooler head the reference never calls (it uses last_hidden_state).
    # NO blanket "embeddings" clause — a missing word_embeddings.weight must
    # fail this test.
    for k in result.missing_keys:
        assert ("position_ids" in k or ".pooler." in k), k


def _ids_batch(rng, vocab, shapes):
    """Random id/mask batch builder shared by the export-load tests."""
    out = {}
    for key, shape in shapes.items():
        if key.endswith("_mask") or key == "his_mask":
            out[key] = jnp.ones(shape, jnp.int32)
        else:
            out[key] = jnp.asarray(
                rng.integers(1, vocab, size=shape).astype(np.int32))
    return out


def test_fastformer_export_loads_into_reference_model(ref_mod):
    """export_fastformer_state_dict output loads into the reference
    ``FastFormer`` (src/model/model.py:223-341) with strict=False leaving
    NO unexpected keys; the reference hard-codes its FastformerEncoder
    BertConfig (hidden 256, 16 heads, inner 256, 2 layers, max_pos 256 —
    model.py:245-266), which our FastformerConfig defaults mirror."""
    import torch

    from miner_tpu.models import NewsEncoder
    from miner_tpu.models.fastformer import FastformerConfig, FastformerUserModel
    from miner_tpu.models.hf_import import export_fastformer_state_dict

    ref_model, _ = ref_mod
    sys.modules.pop("src.model.news_encoder", None)
    from src.model.news_encoder import NewsEncoder as RefNewsEncoder

    vocab = 1000
    enc = NewsEncoder(plm_cfg=_plm_cfg(vocab), apply_reduce_dim=True,
                      word_embed_dim=256, use_sapo=True,
                      combine_type="linear", dropout=0.0)
    ours = FastformerUserModel(news_encoder=enc, cfg=FastformerConfig())
    rng = np.random.default_rng(0)
    batch = _ids_batch(rng, vocab, {
        "cand_title": (2, C, LT), "cand_title_mask": (2, C, LT),
        "his_title": (2, H, LT), "his_title_mask": (2, H, LT),
        "cand_sapo": (2, C, LS), "cand_sapo_mask": (2, C, LS),
        "his_sapo": (2, H, LS), "his_sapo_mask": (2, H, LS),
        "his_mask": (2, H),
    })
    params = ours.init(jax.random.PRNGKey(0), batch)["params"]
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_fastformer_state_dict(params, "roberta").items()}

    torch.manual_seed(0)
    renc = RefNewsEncoder(config=_roberta_cfg(vocab), apply_reduce_dim=True,
                          use_sapo=True, dropout=0.0,
                          freeze_transformer=False, word_embed_dim=256,
                          combine_type="linear")
    rmodel = ref_model.FastFormer(news_encoder=renc, score_type="weighted",
                                  dropout=0.0)
    result = rmodel.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    for k in result.missing_keys:
        assert ("position_ids" in k or ".pooler." in k), k


def test_unbert_export_loads_into_reference_model(tmp_path, ref_mod):
    """export_unbert_state_dict output loads into the reference ``UNBERT``
    (src/model/model_unbert.py:231-289) with strict=False and NO unexpected
    keys. The reference builds from a local from_pretrained dir; a tiny
    UNBertModel checkpoint is written on the fly (no downloads)."""
    import dataclasses as dc

    import torch
    from transformers import BertConfig

    from miner_tpu.models.hf_import import export_unbert_state_dict
    from miner_tpu.models.plm import PLMConfig
    from miner_tpu.models.unbert import UNBert

    sys.modules.pop("src.model.model_unbert", None)
    sys.path.insert(0, REF)
    try:
        from src.model.model_unbert import UNBERT as RefUNBERT, UNBertModel
    finally:
        sys.path.remove(REF)

    vocab = 500
    cfg = dc.replace(PLMConfig.tiny(vocab), type_vocab_size=2,
                     max_position_embeddings=64)
    ours = UNBert(cfg=cfg, num_news_layers=cfg.num_layers, news_mode="nseg")
    B, L, S = 2, 32, 4
    rng = np.random.default_rng(0)
    feat = {
        "input_ids": jnp.asarray(
            rng.integers(1, vocab, size=(B, L)).astype(np.int32)),
        "input_mask": jnp.ones((B, L), jnp.int32),
        "segment_ids": jnp.zeros((B, L), jnp.int32),
        "news_segment_ids": jnp.zeros((B, L), jnp.int32),
        "sentence_ids": jnp.asarray(
            np.tile(np.arange(S, dtype=np.int32) * 4, (B, 1))),
        "sentence_mask": jnp.ones((B, S), jnp.int32),
    }
    params = ours.init(jax.random.PRNGKey(0), feat)["params"]
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_unbert_state_dict(params).items()}

    rcfg = BertConfig(
        vocab_size=vocab, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size, max_position_embeddings=64,
        type_vocab_size=2, pad_token_id=0)
    torch.manual_seed(0)
    ckpt_dir = str(tmp_path / "unbert_ckpt")
    UNBertModel(rcfg).save_pretrained(ckpt_dir)
    rmodel = RefUNBERT(pretrained=ckpt_dir, news_mode="nseg")
    result = rmodel.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    for k in result.missing_keys:
        assert ("position_ids" in k or ".pooler." in k), k


def test_unisrec_export_loads_into_reference_model(tmp_path, monkeypatch,
                                                   ref_mod):
    """export_unisrec_state_dict output loads into the reference ``UniSRec``
    (src/model/model_unisrec.py:369-450) with strict=False and NO unexpected
    keys. The reference hard-codes the adaptor at 768->300 (news_encoder.py:
    213-218), so the PLM hidden must be 768; its __init__ unconditionally
    torch.loads a relative RecBole .pth (model_unisrec.py:446) — an empty
    one is provided via chdir."""
    import torch
    from transformers import BertConfig

    from miner_tpu.models import UniSRec
    from miner_tpu.models.hf_import import export_unisrec_state_dict
    from miner_tpu.models.news_encoder import NewsEncoderMoe
    from miner_tpu.models.plm import PLMConfig

    for m in ("src.model.model_unisrec", "src.model.news_encoder"):
        sys.modules.pop(m, None)
    sys.path.insert(0, REF)
    try:
        from src.model.model_unisrec import UniSRec as RefUniSRec
        from src.model.news_encoder import NewsEncoderMoe as RefNewsEncoderMoe
    finally:
        sys.path.remove(REF)

    vocab = 500
    plm = PLMConfig(vocab_size=vocab, hidden_size=768, num_layers=2,
                    num_heads=4, intermediate_size=128,
                    max_position_embeddings=40, type_vocab_size=2,
                    pad_token_id=0)
    enc = NewsEncoderMoe(plm_cfg=plm, use_sapo=False,
                         combine_type="pre-concat", n_experts=8,
                         adaptor_out_dim=300)
    ours = UniSRec(news_encoder=enc, max_his_len=50)
    rng = np.random.default_rng(0)
    batch = _ids_batch(rng, vocab, {
        "cand_title": (2, C, LT), "cand_title_mask": (2, C, LT),
        "his_title": (2, H, LT), "his_title_mask": (2, H, LT),
        "his_mask": (2, H),
    })
    params = ours.init(
        {"params": jax.random.PRNGKey(0), "gating": jax.random.PRNGKey(1)},
        batch)["params"]
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_unisrec_state_dict(params, "roberta").items()}

    monkeypatch.chdir(tmp_path)
    os.makedirs("unisrec_pretrained_weights")
    torch.save({}, "unisrec_pretrained_weights/unisrec_pretained_state_dict.pth")
    rcfg = BertConfig(
        vocab_size=vocab, hidden_size=768, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=40, type_vocab_size=2, pad_token_id=0)
    torch.manual_seed(0)
    renc = RefNewsEncoderMoe(config=rcfg, apply_reduce_dim=False,
                             use_sapo=False, dropout=0.0,
                             freeze_transformer=False,
                             combine_type="pre-concat")
    rmodel = RefUniSRec(news_encoder=renc, args=None)
    result = rmodel.load_state_dict(sd, strict=False)
    # the only unexpected key is the deliberate history-layout marker tensor
    # (export_unisrec_state_dict self-describes the layout it was trained
    # under; strict=False makes it a no-op on the reference side)
    from miner_tpu.models.hf_import import HISTORY_LAYOUT_MARKER

    assert result.unexpected_keys in ([], [HISTORY_LAYOUT_MARKER]), \
        result.unexpected_keys
    for k in result.missing_keys:
        assert ("position_ids" in k or ".pooler." in k), k


def _make_optimizer_state(params, model_apply_loss):
    """Shared recipe: our AdamW + linear warmup + clip (reference:
    src/trainer.py:119-123, 325-332)."""
    from miner_tpu.training.optim import make_optimizer
    from miner_tpu.training.train_state import TrainState

    tx = make_optimizer(params, learning_rate=LR, total_steps=N_STEPS,
                        warmup_steps=WARMUP, weight_decay=WD,
                        max_grad_norm=CLIP)
    return TrainState.create(params, tx, jax.random.PRNGKey(2))


def _torch_groups_opt_sched(model):
    import torch
    import transformers

    no_decay = ["bias", "LayerNorm.weight"]
    groups = [
        {"params": [p for n, p in model.named_parameters()
                    if not any(nd in n for nd in no_decay)],
         "weight_decay": WD},
        {"params": [p for n, p in model.named_parameters()
                    if any(nd in n for nd in no_decay)],
         "weight_decay": 0.0},
    ]
    opt = torch.optim.AdamW(groups, lr=LR, weight_decay=WD)
    sched = transformers.get_linear_schedule_with_warmup(
        optimizer=opt, num_warmup_steps=WARMUP, num_training_steps=N_STEPS
    )
    return opt, sched


def test_fastformer_step_level_training_parity(tmp_path, ref_mod):
    """Shared-weight 20-step torch-vs-JAX training parity for the reference
    ``FastFormer`` (src/model/model.py:223-341: shared news tower, 2-layer
    additive-attention Fastformer user encoder, attention-pooled user
    vector, dot-product scores) with the reference's ``compute_vanilla``
    loss (src/loss.py:19-25) and training recipe. The reference hard-codes
    dropout inside its FastformerEncoder BertConfig (model.py:245-266), so
    every torch nn.Dropout is zeroed module-wise for deterministic math."""
    import torch

    from miner_tpu.models import NewsEncoder
    from miner_tpu.models.fastformer import FastformerConfig, FastformerUserModel
    from miner_tpu.models.hf_import import convert_fastformer_state_dict
    from miner_tpu.training import losses

    ref_model, ref_loss = ref_mod
    sys.modules.pop("src.model.news_encoder", None)
    from src.model.news_encoder import NewsEncoder as RefNewsEncoder

    vocab = 1000
    holder = []
    batches = _fixture_batches(tmp_path, holder)
    assert len(batches) >= 4

    torch.manual_seed(0)
    enc_t = RefNewsEncoder(config=_roberta_cfg(vocab), apply_reduce_dim=True,
                           use_sapo=True, dropout=0.0,
                           freeze_transformer=False, word_embed_dim=256,
                           combine_type="linear")
    tmodel = ref_model.FastFormer(news_encoder=enc_t, score_type="weighted",
                                  dropout=0.0)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    tmodel.train()
    loss_obj = ref_loss.Loss(torch.nn.CrossEntropyLoss())
    opt, sched = _torch_groups_opt_sched(tmodel)

    def to_t(mb):
        return {
            "title": torch.tensor(mb["cand_title"].astype(np.int64)),
            "title_mask": torch.tensor(mb["cand_title_mask"].astype(np.int64)),
            "his_title": torch.tensor(mb["his_title"].astype(np.int64)),
            "his_title_mask": torch.tensor(mb["his_title_mask"].astype(np.int64)),
            "his_mask": torch.tensor(mb["his_mask"].astype(np.float32)),
            "sapo": torch.tensor(mb["cand_sapo"].astype(np.int64)),
            "sapo_mask": torch.tensor(mb["cand_sapo_mask"].astype(np.int64)),
            "his_sapo": torch.tensor(mb["his_sapo"].astype(np.int64)),
            "his_sapo_mask": torch.tensor(mb["his_sapo_mask"].astype(np.int64)),
        }

    def torch_forward(mb):
        with torch.no_grad():
            return tmodel(**to_t(mb)).numpy()

    def torch_step(mb):
        logits = tmodel(**to_t(mb))
        loss = loss_obj.compute_vanilla(logits, torch.tensor(mb["label"]))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), CLIP)
        opt.step()
        sched.step()
        return float(loss.detach())

    # --- same weights across
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_fastformer_state_dict(sd, num_layers=2)
    enc_j = NewsEncoder(plm_cfg=_plm_cfg(vocab), apply_reduce_dim=True,
                        word_embed_dim=256, use_sapo=True,
                        combine_type="linear", dropout=0.0)
    jmodel = FastformerUserModel(
        news_encoder=enc_j,
        cfg=FastformerConfig(hidden_dropout=0.0, attention_dropout=0.0),
    )
    init = jmodel.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {k: jnp.asarray(v) for k, v in batches[0].items() if k != "label"},
    )["params"]
    init_keys = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(init)}
    conv_keys = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert init_keys == conv_keys, (
        f"missing={sorted(init_keys - conv_keys)} "
        f"extra={sorted(conv_keys - init_keys)}"
    )
    params = jax.tree_util.tree_map(
        lambda leaf: jnp.asarray(leaf, jnp.float32), params)

    fwd = jax.jit(lambda p, mb: jmodel.apply(
        {"params": p},
        {k: jnp.asarray(v) for k, v in mb.items() if k != "label"},
        deterministic=True,
    ))
    np.testing.assert_allclose(np.asarray(fwd(params, batches[0])),
                               torch_forward(batches[0]),
                               rtol=1e-4, atol=1e-5)

    state = _make_optimizer_state(params, None)

    @jax.jit
    def train_step(state, arrays, label):
        def loss_fn(p):
            logits = jmodel.apply({"params": p}, arrays, deterministic=True)
            return losses.vanilla_loss(logits, label)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    jax_losses, torch_losses = [], []
    for i in range(N_STEPS):
        mb = batches[i % len(batches)]
        arrays = {k: jnp.asarray(v) for k, v in mb.items() if k != "label"}
        state, l = train_step(state, arrays, jnp.asarray(mb["label"]))
        jax_losses.append(float(l))
        torch_losses.append(torch_step(mb))

    np.testing.assert_allclose(
        np.asarray(jax_losses), np.asarray(torch_losses),
        rtol=2e-4, atol=2e-4,
        err_msg="fastformer loss trajectories diverged",
    )
    np.testing.assert_allclose(np.asarray(fwd(state.params, batches[0])),
                               torch_forward(batches[0]),
                               rtol=1e-3, atol=1e-4)


def test_unbert_step_level_training_parity(tmp_path, ref_mod):
    """Shared-weight 20-step torch-vs-JAX training parity for the reference
    ``UNBERT`` (src/model/model_unbert.py:88-289, nseg news mode) using the
    reference's literal training objective: ``compute_vanilla(logits,
    labels)`` with a (B,) float label vector, which torch's
    ``CrossEntropyLoss`` interprets as ONE sample with B classes and
    probability targets — i.e. softmax over the whole batch,
    ``-(labels * log_softmax(logits)).sum()`` (src/loss.py:19-25,
    src/trainer_fastformer.py:288). The production trainer deliberately
    uses per-row BCE instead (PARITY.md deviations); this test reproduces
    the reference's math verbatim to prove model+optimizer parity.
    Batches come from our UnBERT packer (bit-parity-tested vs the
    reference layout in tests/test_unbert_data.py)."""
    import dataclasses as dc
    import json

    import torch
    from transformers import BertConfig

    from miner_tpu.data import BehaviorsLog, HashTokenizer, NewsStore
    from miner_tpu.data.unbert_packing import UnbertPacker, UnbertTrainSampler
    from miner_tpu.models.hf_import import convert_unbert_state_dict
    from miner_tpu.models.plm import PLMConfig
    from miner_tpu.models.unbert import UNBert
    from tests.fixture_data import make_fixture

    sys.modules.pop("src.model.model_unbert", None)
    sys.path.insert(0, REF)
    try:
        from src.model.model_unbert import UNBERT as RefUNBERT, UNBertModel
        import src.loss as ref_loss
    finally:
        sys.path.remove(REF)

    # --- packed batches from our data stack
    vocab, L, B_u = 1000, 64, 8
    d = make_fixture(str(tmp_path / "fx"), num_lines=30)
    tok = HashTokenizer(vocab_size=vocab)
    cat2id = json.load(open(os.path.join(d, "category2id.json")))
    user2id = json.load(open(os.path.join(d, "user2id.json")))
    store = NewsStore.from_tsv(os.path.join(d, "news.tsv"), tok, cat2id, 16, 24)
    log = BehaviorsLog.from_tsv(os.path.join(d, "behaviors.tsv"), store,
                                user2id, 5)
    packer = UnbertPacker(store, cls_id=tok.cls_token_id,
                          sep_id=tok.sep_token_id, pad_id=tok.pad_token_id,
                          seq_max_len=L, news_max_len=8, hist_max_len=5)
    block = UnbertTrainSampler(log, store, packer, npratio=3,
                               seed=7).sample_epoch(0).to_dict()
    n = (len(block["label"]) // B_u) * B_u
    batches = [
        {k: v[i:i + B_u] for k, v in block.items()} for i in range(0, n, B_u)
    ]
    assert len(batches) >= 4

    # --- reference model (all dropout zeroed via config)
    rcfg = BertConfig(
        vocab_size=vocab, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=L, type_vocab_size=2, pad_token_id=0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    ckpt_dir = str(tmp_path / "unbert_ckpt")
    UNBertModel(rcfg).save_pretrained(ckpt_dir)
    tmodel = RefUNBERT(pretrained=ckpt_dir, news_mode="nseg")
    tmodel.train()
    loss_obj = ref_loss.Loss(torch.nn.CrossEntropyLoss())
    opt, sched = _torch_groups_opt_sched(tmodel)

    KEYS = ("input_ids", "input_mask", "segment_ids", "news_segment_ids",
            "sentence_ids", "sentence_mask")

    def to_t(mb):
        out = {k: torch.tensor(mb[k].astype(np.int64)) for k in KEYS}
        out["sentence_segment_ids"] = torch.tensor(
            mb["sentence_segment_ids"].astype(np.int64))
        return out

    def torch_forward(mb):
        with torch.no_grad():
            return tmodel(**to_t(mb)).numpy()

    def torch_step(mb):
        logits = tmodel(**to_t(mb))
        loss = loss_obj.compute_vanilla(
            logits, torch.tensor(mb["label"].astype(np.float32)))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), CLIP)
        opt.step()
        sched.step()
        return float(loss.detach())

    # --- same weights across
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_unbert_state_dict(sd)
    cfg = dc.replace(PLMConfig.tiny(vocab), type_vocab_size=2,
                     max_position_embeddings=L, hidden_dropout=0.0,
                     attention_dropout=0.0, layer_norm_eps=1e-12)
    jmodel = UNBert(cfg=cfg, num_news_layers=cfg.num_layers, news_mode="nseg")
    init = jmodel.init(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(batches[0][k]) for k in KEYS},
    )["params"]
    init_keys = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(init)}
    conv_keys = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert init_keys == conv_keys, (
        f"missing={sorted(init_keys - conv_keys)} "
        f"extra={sorted(conv_keys - init_keys)}"
    )
    params = jax.tree_util.tree_map(
        lambda leaf: jnp.asarray(leaf, jnp.float32), params)

    fwd = jax.jit(lambda p, mb: jmodel.apply(
        {"params": p}, mb, deterministic=True))

    def arrays_of(mb):
        return {k: jnp.asarray(mb[k]) for k in KEYS}

    np.testing.assert_allclose(np.asarray(fwd(params, arrays_of(batches[0]))),
                               torch_forward(batches[0]),
                               rtol=1e-4, atol=1e-5)

    state = _make_optimizer_state(params, None)

    @jax.jit
    def train_step(state, arrays, label):
        def loss_fn(p):
            logits = jmodel.apply({"params": p}, arrays, deterministic=True)
            # the reference objective verbatim (see docstring)
            return -jnp.sum(
                label * jax.nn.log_softmax(logits.astype(jnp.float32)))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    jax_losses, torch_losses = [], []
    for i in range(N_STEPS):
        mb = batches[i % len(batches)]
        state, l = train_step(state, arrays_of(mb),
                              jnp.asarray(mb["label"], jnp.float32))
        jax_losses.append(float(l))
        torch_losses.append(torch_step(mb))

    np.testing.assert_allclose(
        np.asarray(jax_losses), np.asarray(torch_losses),
        rtol=2e-4, atol=2e-4,
        err_msg="unbert loss trajectories diverged",
    )
    # Final-state tolerance is looser than the per-step loss check: the
    # batch-softmax objective couples every row's gradient, so fp32
    # reduction-order noise gets amplified through AdamW's per-param
    # normalization over 20 steps (observed drift ~5e-3 on logits ~1.5
    # while the loss trajectory stays within 2e-4).
    np.testing.assert_allclose(np.asarray(fwd(state.params,
                                              arrays_of(batches[0]))),
                               torch_forward(batches[0]),
                               rtol=1e-2, atol=1e-3)


def test_unisrec_step_level_training_parity(tmp_path, monkeypatch, ref_mod):
    """Shared-weight 20-step torch-vs-JAX training parity for the reference
    ``UniSRec`` (src/model/model_unisrec.py:369-600): NewsEncoderMoe
    (BertModel + 8-expert MoE adaptor, hard-coded 768->300) -> position
    embeddings + LayerNorm -> 2-layer causal transformer -> position-0
    user vector -> dot scores, trained with ``compute_vanilla`` under the
    reference's freeze (ONLY the MoE adaptor updates,
    model_unisrec.py:448-450; ours via the optax multi_transform freeze).
    The torch side runs in eval() mode during the step so its hard-coded
    dropouts and the noisy gating (news_encoder.py:148-154, active only in
    training mode) are off — gradients still flow; our side runs
    deterministic=True."""
    import torch
    from transformers import BertConfig

    from miner_tpu.models import UniSRec
    from miner_tpu.models.hf_import import convert_unisrec_model_state_dict
    from miner_tpu.models.news_encoder import NewsEncoderMoe
    from miner_tpu.models.plm import PLMConfig
    from miner_tpu.training import losses
    from miner_tpu.training.optim import make_optimizer
    from miner_tpu.training.train_state import TrainState

    _, ref_loss = ref_mod
    for m in ("src.model.model_unisrec", "src.model.news_encoder"):
        sys.modules.pop(m, None)
    sys.path.insert(0, REF)
    try:
        from src.model.model_unisrec import UniSRec as RefUniSRec
        from src.model.news_encoder import NewsEncoderMoe as RefNewsEncoderMoe
    finally:
        sys.path.remove(REF)

    vocab = 1000
    holder = []
    batches = _fixture_batches(tmp_path, holder)
    assert len(batches) >= 4

    # --- reference model (PLM hidden forced to 768 by the adaptor)
    rcfg = BertConfig(
        vocab_size=vocab, hidden_size=768, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=40, type_vocab_size=2, layer_norm_eps=1e-12,
        pad_token_id=0, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    monkeypatch.chdir(tmp_path)
    os.makedirs("unisrec_pretrained_weights", exist_ok=True)
    torch.save({}, "unisrec_pretrained_weights/unisrec_pretained_state_dict.pth")
    torch.manual_seed(0)
    renc = RefNewsEncoderMoe(config=rcfg, apply_reduce_dim=False,
                             use_sapo=True, dropout=0.0,
                             freeze_transformer=False,
                             combine_type="pre-concat")
    tmodel = RefUniSRec(news_encoder=renc, args=None)
    tmodel.eval()  # kills dropout + gating noise; grads still flow
    loss_obj = ref_loss.Loss(torch.nn.CrossEntropyLoss())
    opt, sched = _torch_groups_opt_sched(tmodel)

    def to_t(mb):
        return {
            "title": torch.tensor(mb["cand_title"].astype(np.int64)),
            "title_mask": torch.tensor(mb["cand_title_mask"].astype(np.int64)),
            "his_title": torch.tensor(mb["his_title"].astype(np.int64)),
            "his_title_mask": torch.tensor(mb["his_title_mask"].astype(np.int64)),
            "his_mask": torch.tensor(mb["his_mask"].astype(np.int64)),
            # pre-concat returns the title branch before sapo is touched
            "sapo": torch.tensor(mb["cand_title"].astype(np.int64)),
            "sapo_mask": torch.tensor(mb["cand_title_mask"].astype(np.int64)),
            "his_sapo": torch.tensor(mb["his_title"].astype(np.int64)),
            "his_sapo_mask": torch.tensor(mb["his_title_mask"].astype(np.int64)),
        }

    def torch_forward(mb):
        with torch.no_grad():
            return tmodel(**to_t(mb)).numpy()

    def torch_step(mb):
        logits = tmodel(**to_t(mb))
        loss = loss_obj.compute_vanilla(logits, torch.tensor(mb["label"]))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), CLIP)
        opt.step()
        sched.step()
        return float(loss.detach())

    # --- same weights across
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_unisrec_model_state_dict(sd, num_layers=2)
    plm = PLMConfig(vocab_size=vocab, hidden_size=768, num_layers=2,
                    num_heads=4, intermediate_size=128,
                    max_position_embeddings=40, type_vocab_size=2,
                    layer_norm_eps=1e-12, hidden_dropout=0.0,
                    attention_dropout=0.0, pad_token_id=0, position_offset=0)
    enc_j = NewsEncoderMoe(plm_cfg=plm, use_sapo=False,
                           combine_type="pre-concat", n_experts=8,
                           adaptor_out_dim=300, adaptor_dropout=0.0,
                           dropout=0.0)
    jmodel = UniSRec(news_encoder=enc_j, max_his_len=50)

    def arrays_of(mb):
        return {k: jnp.asarray(mb[k]) for k in
                ("cand_title", "cand_title_mask", "his_title",
                 "his_title_mask", "his_mask")}

    init = jmodel.init(
        {"params": jax.random.PRNGKey(0), "gating": jax.random.PRNGKey(1)},
        arrays_of(batches[0]))["params"]
    init_keys = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(init)}
    conv_keys = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert init_keys == conv_keys, (
        f"missing={sorted(init_keys - conv_keys)} "
        f"extra={sorted(conv_keys - init_keys)}"
    )
    params = jax.tree_util.tree_map(
        lambda leaf: jnp.asarray(leaf, jnp.float32), params)

    fwd = jax.jit(lambda p, mb: jmodel.apply(
        {"params": p}, mb, deterministic=True))
    np.testing.assert_allclose(np.asarray(fwd(params, arrays_of(batches[0]))),
                               torch_forward(batches[0]),
                               rtol=1e-4, atol=1e-5)

    # --- the reference freeze: only the MoE adaptor trains
    tx = make_optimizer(params, learning_rate=LR, total_steps=N_STEPS,
                        warmup_steps=WARMUP, weight_decay=WD,
                        max_grad_norm=CLIP,
                        trainable_pred=lambda name: "moe" in name.lower())
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))

    @jax.jit
    def train_step(state, arrays, label):
        def loss_fn(p):
            logits = jmodel.apply({"params": p}, arrays, deterministic=True)
            return losses.vanilla_loss(logits, label)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    jax_losses, torch_losses = [], []
    for i in range(N_STEPS):
        mb = batches[i % len(batches)]
        state, l = train_step(state, arrays_of(mb), jnp.asarray(mb["label"]))
        jax_losses.append(float(l))
        torch_losses.append(torch_step(mb))

    np.testing.assert_allclose(
        np.asarray(jax_losses), np.asarray(torch_losses),
        rtol=2e-4, atol=2e-4,
        err_msg="unisrec loss trajectories diverged",
    )
    np.testing.assert_allclose(np.asarray(fwd(state.params,
                                              arrays_of(batches[0]))),
                               torch_forward(batches[0]),
                               rtol=1e-3, atol=1e-4)
    # the freeze held: non-MoE params are bitwise untouched
    init_flat = {jax.tree_util.keystr(p): l for p, l in
                 jax.tree_util.tree_leaves_with_path(params)}
    changed_moe = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        key = jax.tree_util.keystr(path)
        if "moe" in key.lower():
            changed_moe += int(not np.array_equal(np.asarray(leaf),
                                                  np.asarray(init_flat[key])))
        else:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(init_flat[key]),
                                          err_msg=key)
    assert changed_moe > 0, "no MoE params changed — the freeze ate training"
