"""PLM parity: our TransformerPLM with imported HF weights must reproduce
transformers' BertModel hidden states (golden-logit test, SURVEY.md §7.3#1).

Uses a locally-instantiated random-init HF model (no downloads)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miner_tpu.models.hf_import import convert_plm_params, load_into_params
from miner_tpu.models.plm import PLMConfig, TransformerPLM


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=500,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        type_vocab_size=2,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_ckpt")
    torch.save(model.state_dict(), os.path.join(str(d), "pytorch_model.bin"))
    return str(d), model, cfg


def test_imported_plm_matches_transformers(hf_checkpoint):
    import torch

    ckpt_dir, hf_model, hf_cfg = hf_checkpoint
    cfg = PLMConfig(
        vocab_size=500,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        type_vocab_size=2,
        layer_norm_eps=1e-12,
        pad_token_id=0,
        position_offset=0,
    )
    plm = TransformerPLM(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 500, size=(3, 12)).astype(np.int32)
    mask = np.ones((3, 12), dtype=np.int32)
    mask[0, 8:] = 0

    params = plm.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))
    imported = convert_plm_params(ckpt_dir, num_layers=2)
    out = plm.apply(
        {"params": imported}, jnp.asarray(ids), jnp.asarray(mask)
    )

    with torch.no_grad():
        want = hf_model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    got = np.asarray(out)
    # masked positions may legitimately differ (we don't attend FROM them the
    # same way HF does for padded queries) — compare valid positions only
    np.testing.assert_allclose(got[0, :8], want[0, :8], atol=2e-4)
    np.testing.assert_allclose(got[1:], want[1:], atol=2e-4)


def test_load_into_params_grafts_subtree(hf_checkpoint):
    ckpt_dir, _, _ = hf_checkpoint
    from miner_tpu.models import NewsEncoder

    cfg = PLMConfig(
        vocab_size=500, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
        layer_norm_eps=1e-12, pad_token_id=0, position_offset=0,
    )
    enc = NewsEncoder(plm_cfg=cfg, apply_reduce_dim=True, word_embed_dim=16,
                      use_sapo=False)
    ids = jnp.ones((2, 8), dtype=jnp.int32)
    mask = jnp.ones((2, 8), dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]
    before = np.asarray(params["plm"]["embeddings"]["word_embeddings"]["embedding"])
    new_params = load_into_params(params, ckpt_dir, plm_prefix="plm")
    after = np.asarray(new_params["plm"]["embeddings"]["word_embeddings"]["embedding"])
    assert not np.allclose(before, after)
    # non-PLM params untouched
    np.testing.assert_array_equal(
        np.asarray(params["reduce_dim"]["kernel"]),
        np.asarray(new_params["reduce_dim"]["kernel"]),
    )


def test_shape_mismatch_raises(hf_checkpoint):
    ckpt_dir, _, _ = hf_checkpoint
    cfg = PLMConfig(vocab_size=500, hidden_size=64, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position_embeddings=64,
                    type_vocab_size=2, pad_token_id=0, position_offset=0)
    plm = TransformerPLM(cfg)
    ids = jnp.ones((1, 4), dtype=jnp.int32)
    params = plm.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))["params"]
    with pytest.raises(ValueError, match="shape mismatch"):
        load_into_params(params, ckpt_dir, plm_prefix="")


# ---------------------------------------------------------------- UniSRec pth
def test_load_unisrec_pretrained(tmp_path):
    """A RecBole-style UniSRec state dict grafts into our param tree with
    strict=False semantics (reference: src/trainer_fastformer.py:134-138):
    trm layers / position embedding / top LN land in the model, the
    moe_adaptor experts+gates land in the news encoder, everything else in
    the dict is ignored, everything else in the tree is untouched."""
    import torch

    from miner_tpu.models.hf_import import load_unisrec_pretrained
    from miner_tpu.models.news_encoder import NewsEncoderMoe
    from miner_tpu.models.unisrec import UniSRec

    rng = np.random.default_rng(0)
    enc = NewsEncoderMoe(plm_cfg=PLMConfig.tiny(), adaptor_out_dim=24,
                         n_experts=4)
    model = UniSRec(news_encoder=enc, max_his_len=5)

    B, C, H, Lt = 2, 3, 5, 8

    def ids(shape):
        return jnp.asarray(rng.integers(1, 1000, size=shape).astype(np.int32))

    batch = {
        "cand_title": ids((B, C, Lt)),
        "cand_title_mask": jnp.ones((B, C, Lt), jnp.int32),
        "his_title": ids((B, H, Lt)),
        "his_title_mask": jnp.ones((B, H, Lt), jnp.int32),
        "his_mask": jnp.ones((B, H), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    D = 24  # hidden == adaptor_out_dim
    inner = 256  # sasrec_encoder_cfg intermediate is fixed at 256
    torch.manual_seed(1)
    sd = {"position_embedding.weight": torch.randn(5, D),
          "LayerNorm.weight": torch.randn(D), "LayerNorm.bias": torch.randn(D),
          "some.unrelated.key": torch.randn(3)}
    for i in range(2):
        p = f"trm_encoder.layer.{i}."
        for nm in ("query", "key", "value"):
            sd[p + f"multi_head_attention.{nm}.weight"] = torch.randn(D, D)
            sd[p + f"multi_head_attention.{nm}.bias"] = torch.randn(D)
        sd[p + "multi_head_attention.dense.weight"] = torch.randn(D, D)
        sd[p + "multi_head_attention.dense.bias"] = torch.randn(D)
        sd[p + "multi_head_attention.LayerNorm.weight"] = torch.randn(D)
        sd[p + "multi_head_attention.LayerNorm.bias"] = torch.randn(D)
        sd[p + "feed_forward.dense_1.weight"] = torch.randn(inner, D)
        sd[p + "feed_forward.dense_1.bias"] = torch.randn(inner)
        sd[p + "feed_forward.dense_2.weight"] = torch.randn(D, inner)
        sd[p + "feed_forward.dense_2.bias"] = torch.randn(D)
        sd[p + "feed_forward.LayerNorm.weight"] = torch.randn(D)
        sd[p + "feed_forward.LayerNorm.bias"] = torch.randn(D)
    for i in range(4):
        sd[f"moe_adaptor.experts.{i}.bias"] = torch.randn(64)  # PLM hidden
        sd[f"moe_adaptor.experts.{i}.lin.weight"] = torch.randn(24, 64)
    sd["moe_adaptor.w_gate"] = torch.randn(64, 4)
    sd["moe_adaptor.w_noise"] = torch.randn(64, 4)

    path = str(tmp_path / "unisrec.pth")
    torch.save(sd, path)
    merged, n_loaded = load_unisrec_pretrained(params, path)

    # fused qkv = concat of q/k/v transposed kernels
    q = sd["trm_encoder.layer.0.multi_head_attention.query.weight"].numpy().T
    k = sd["trm_encoder.layer.0.multi_head_attention.key.weight"].numpy().T
    vv = sd["trm_encoder.layer.0.multi_head_attention.value.weight"].numpy().T
    np.testing.assert_allclose(
        merged["trm_layer_0"]["attention"]["qkv"]["kernel"],
        np.concatenate([q, k, vv], axis=1), rtol=1e-6)
    np.testing.assert_allclose(
        merged["ln"]["scale"], sd["LayerNorm.weight"].numpy(), rtol=1e-6)
    # expert i kernel = lin.weight.T stacked
    np.testing.assert_allclose(
        merged["news_encoder"]["moe_adaptor"]["experts"]["kernel"][2],
        sd["moe_adaptor.experts.2.lin.weight"].numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        merged["news_encoder"]["moe_adaptor"]["w_gate"],
        sd["moe_adaptor.w_gate"].numpy(), rtol=1e-6)
    # PLM tower untouched
    before = jax.tree_util.tree_leaves(params["news_encoder"]["plm"])
    after = jax.tree_util.tree_leaves(merged["news_encoder"]["plm"])
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    assert n_loaded > 0
    # forward still works with the grafted params
    scores = model.apply({"params": merged}, batch)
    assert scores.shape == (B, C)
    assert np.isfinite(np.asarray(scores)).all()


def test_pretrained_embedding_flag_loads_weights(hf_checkpoint, tmp_path):
    """The reference's --pretrained_embedding flag loads PLM weights when it
    names a local checkpoint directory (no --hf_checkpoint needed)."""
    import glob as _glob

    from miner_tpu.training.trainer import Trainer
    from miner_tpu.config import make_parser
    from tests.fixture_data import make_fixture

    ckpt_dir, hf_model, hf_cfg = hf_checkpoint
    fixture = make_fixture(str(tmp_path / "data"))
    argv = [
        "train",
        "--model_name", "Miner",
        "--pretrained_tokenizer", "hash:500",
        "--user2id_path", os.path.join(fixture, "user2id.json"),
        "--category2id_path", os.path.join(fixture, "category2id.json"),
        "--train_behaviors_path", os.path.join(fixture, "behaviors.tsv"),
        "--train_news_path", os.path.join(fixture, "news.tsv"),
        "--eval_behaviors_path", os.path.join(fixture, "behaviors.tsv"),
        "--eval_news_path", os.path.join(fixture, "news.tsv"),
        "--max_title_length", "12", "--max_sapo_length", "12",
        "--his_length", "4", "--plm_preset", "tiny",
        "--apply_reduce_dim", "--use_sapo", "--use_category_bias",
        "--word_embed_dim", "16", "--category_embed_dim", "8",
        "--num_context_codes", "2", "--context_code_dim", "8",
        "--npratio", "2", "--train_batch_size", "4",
        "--num_train_epochs", "1", "--compute_dtype", "float32",
        "--metrics", "auc",
        "--pretrained_embedding", ckpt_dir,
        "--train_path", str(tmp_path / "out"),
    ]
    # the tiny preset differs from the checkpoint architecture; patching the
    # preset to the checkpoint's shape is the job of plm_preset — here we
    # only verify the flag routes into the HF import (shape mismatch raises)
    args = make_parser().parse_args(argv)
    trainer = Trainer(args)
    with pytest.raises(ValueError, match="shape mismatch"):
        trainer.train()


def test_export_miner_round_trip():
    """export_miner_state_dict is the exact inverse of
    convert_miner_state_dict: params -> reference sd -> params is identity."""
    from miner_tpu.models import Miner, NewsEncoder
    from miner_tpu.models.hf_import import (
        convert_miner_state_dict,
        export_miner_state_dict,
    )

    cfg = PLMConfig.tiny()
    enc = NewsEncoder(plm_cfg=cfg, apply_reduce_dim=True, word_embed_dim=32,
                      use_sapo=False, combine_type="linear")
    model = Miner(news_encoder=enc, use_category_bias=True,
                  num_context_codes=4, context_code_dim=16,
                  score_type="weighted", num_categories=7,
                  category_embed_dim=8, category_pad_id=0)
    B, C, H, L = 2, 3, 4, 8
    rng = np.random.default_rng(0)
    ids = lambda shape: jnp.asarray(
        rng.integers(1, cfg.vocab_size, size=shape).astype(np.int32))
    ones = lambda shape: jnp.ones(shape, jnp.int32)
    batch = {
        "cand_title": ids((B, C, L)), "cand_title_mask": ones((B, C, L)),
        "his_title": ids((B, H, L)), "his_title_mask": ones((B, H, L)),
        "cand_category": ids((B, C)) % 7, "his_category": ids((B, H)) % 7,
        "his_mask": ones((B, H)),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    sd = export_miner_state_dict(params, plm_name="roberta")
    back = convert_miner_state_dict(sd, num_layers=cfg.num_layers)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(
        ("/".join(str(k) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(back)[0]
    )
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        key = "/".join(str(k) for k in path)
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[key]), err_msg=key)


def test_export_scan_layers_checkpoint_matches_unrolled():
    """export_miner_state_dict on a --scan_layers checkpoint (layers stored
    stacked under 'layers/layer') produces the SAME reference state dict as
    the unrolled layout — it used to silently export zero encoder layers."""
    from miner_tpu.models import Miner, NewsEncoder
    from miner_tpu.models.hf_import import (
        export_miner_state_dict,
        stack_layer_params,
    )

    cfg = PLMConfig.tiny()
    enc = NewsEncoder(plm_cfg=cfg, apply_reduce_dim=True, word_embed_dim=32,
                      use_sapo=False, combine_type="linear")
    model = Miner(news_encoder=enc, use_category_bias=True,
                  num_context_codes=4, context_code_dim=16,
                  score_type="weighted", num_categories=7,
                  category_embed_dim=8, category_pad_id=0)
    B, C, H, L = 2, 3, 4, 8
    rng = np.random.default_rng(0)
    ids = lambda shape: jnp.asarray(
        rng.integers(1, cfg.vocab_size, size=shape).astype(np.int32))
    ones = lambda shape: jnp.ones(shape, jnp.int32)
    batch = {
        "cand_title": ids((B, C, L)), "cand_title_mask": ones((B, C, L)),
        "his_title": ids((B, H, L)), "his_title_mask": ones((B, H, L)),
        "cand_category": ids((B, C)) % 7, "his_category": ids((B, H)) % 7,
        "his_mask": ones((B, H)),
    }
    params = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0), batch)["params"])
    scan_params = dict(params)
    scan_params["news_encoder"] = dict(params["news_encoder"])
    scan_params["news_encoder"]["plm"] = stack_layer_params(
        params["news_encoder"]["plm"])

    sd_unrolled = export_miner_state_dict(params, plm_name="roberta")
    sd_scan = export_miner_state_dict(scan_params, plm_name="roberta")
    assert set(sd_scan) == set(sd_unrolled)
    assert any(".encoder.layer.1." in k for k in sd_scan)
    for k in sd_unrolled:
        np.testing.assert_array_equal(sd_scan[k], sd_unrolled[k], err_msg=k)


def test_lstm_combine_transfer_raises_loudly():
    """The lstm combiner is a documented architectural deviation (the
    reference's unbatched nn.LSTM path is broken): both transfer directions
    must fail loudly instead of silently dropping the combiner weights."""
    from miner_tpu.models.hf_import import (
        convert_miner_state_dict,
        export_miner_state_dict,
    )

    with pytest.raises(ValueError, match="lstm"):
        export_miner_state_dict({"news_encoder": {"lstm_combine": {}}})
    with pytest.raises(ValueError, match="lstm"):
        convert_miner_state_dict(
            {"news_encoder.lstm.weight_ih_l0": np.zeros((4, 4))}, num_layers=1)


def _round_trip_check(params, sd, back):
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(
        ("/".join(str(k) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(back)[0]
    )
    assert len(flat_a) == len(flat_b), (
        sorted("/".join(str(k) for k in p) for p, _ in flat_a),
        sorted(flat_b),
    )
    for path, leaf in flat_a:
        key = "/".join(str(k) for k in path)
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[key]), err_msg=key)


def test_export_fastformer_round_trip():
    """export_fastformer_state_dict is the exact inverse of
    convert_fastformer_state_dict (every trainable tensor of the reference
    FastFormer, src/model/model.py:223-341, round-trips)."""
    from miner_tpu.models import FastformerUserModel, NewsEncoder
    from miner_tpu.models.fastformer import FastformerConfig
    from miner_tpu.models.hf_import import (
        convert_fastformer_state_dict,
        export_fastformer_state_dict,
    )

    cfg = PLMConfig.tiny()
    enc = NewsEncoder(plm_cfg=cfg, apply_reduce_dim=True, word_embed_dim=32,
                      use_sapo=True, combine_type="linear")
    fcfg = FastformerConfig(hidden_size=32, num_heads=4, intermediate_size=32,
                            max_position_embeddings=16)
    model = FastformerUserModel(news_encoder=enc, cfg=fcfg)
    B, C, H, L = 2, 3, 4, 8
    rng = np.random.default_rng(0)
    ids = lambda shape: jnp.asarray(
        rng.integers(1, cfg.vocab_size, size=shape).astype(np.int32))
    ones = lambda shape: jnp.ones(shape, jnp.int32)
    batch = {
        "cand_title": ids((B, C, L)), "cand_title_mask": ones((B, C, L)),
        "his_title": ids((B, H, L)), "his_title_mask": ones((B, H, L)),
        "cand_sapo": ids((B, C, L)), "cand_sapo_mask": ones((B, C, L)),
        "his_sapo": ids((B, H, L)), "his_sapo_mask": ones((B, H, L)),
        "his_mask": ones((B, H)),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    sd = export_fastformer_state_dict(params, plm_name="roberta")
    back = convert_fastformer_state_dict(sd, num_layers=cfg.num_layers)
    _round_trip_check(params, sd, back)
    # reference-format key spelling spot checks (src/model/model.py:268-271,
    # 482-500): FastformerEncoder layers live under fast_attn.encoders.{i}
    assert "fast_attn.encoders.0.attention.self.query_att.weight" in sd
    assert "fast_attn.poolers.0.att_fc1.weight" in sd
    assert "fast_attn.position_embeddings.weight" in sd


def test_export_unbert_round_trip():
    """export_unbert_state_dict is the exact inverse of
    convert_unbert_state_dict (reference UNBERT layout,
    src/model/model_unbert.py:88-289; the untrained _model.pooler.* is
    deliberately absent — strict=False regenerates it and the score never
    consumes it)."""
    from miner_tpu.data.unbert_packing import SEQ_MAX_LEN
    from miner_tpu.models.hf_import import (
        convert_unbert_state_dict,
        export_unbert_state_dict,
    )
    from miner_tpu.models.unbert import UNBert
    import dataclasses as dc

    cfg = dc.replace(PLMConfig.tiny(), type_vocab_size=2,
                     max_position_embeddings=SEQ_MAX_LEN + 2)
    model = UNBert(cfg=cfg, num_news_layers=1, news_mode="nseg")
    B, L, S = 2, 32, 4
    rng = np.random.default_rng(0)
    feat = {
        "input_ids": jnp.asarray(
            rng.integers(1, cfg.vocab_size, size=(B, L)).astype(np.int32)),
        "input_mask": jnp.ones((B, L), jnp.int32),
        "segment_ids": jnp.zeros((B, L), jnp.int32),
        "news_segment_ids": jnp.zeros((B, L), jnp.int32),
        "sentence_ids": jnp.asarray(
            np.tile(np.arange(S, dtype=np.int32) * 4, (B, 1))),
        "sentence_mask": jnp.ones((B, S), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), feat)["params"]
    sd = export_unbert_state_dict(params)
    back = convert_unbert_state_dict(sd)
    _round_trip_check(params, sd, back)
    assert "_model.embeddings.segment_embeddings.weight" in sd
    assert "_model.encoder.layer.0.attention.self.query.weight" in sd
    assert "_model.encoder_news.layer.0.attention.self.query.weight" in sd
    assert "_dense.weight" in sd
    assert sd["_dense.weight"].shape[0] == 2  # 2-logit head, score = [:, 1]


def test_export_unisrec_round_trip():
    """export_unisrec_state_dict inverts convert_unisrec_model_state_dict
    over the FULL reference UniSRec layout (news_encoder.roberta.* +
    news_encoder.moe_adaptor.* + position_embedding/trm_encoder/LayerNorm;
    src/model/model_unisrec.py:369-450)."""
    from miner_tpu.models import UniSRec
    from miner_tpu.models.news_encoder import NewsEncoderMoe
    from miner_tpu.models.hf_import import (
        convert_unisrec_model_state_dict,
        export_unisrec_state_dict,
    )

    cfg = PLMConfig.tiny()
    enc = NewsEncoderMoe(plm_cfg=cfg, use_sapo=False,
                         combine_type="pre-concat", n_experts=3,
                         adaptor_out_dim=24)
    model = UniSRec(news_encoder=enc, max_his_len=4)
    B, C, H, L = 2, 3, 4, 8
    rng = np.random.default_rng(0)
    ids = lambda shape: jnp.asarray(
        rng.integers(1, cfg.vocab_size, size=shape).astype(np.int32))
    ones = lambda shape: jnp.ones(shape, jnp.int32)
    batch = {
        "cand_title": ids((B, C, L)), "cand_title_mask": ones((B, C, L)),
        "his_title": ids((B, H, L)), "his_title_mask": ones((B, H, L)),
        "his_mask": ones((B, H)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gating": jax.random.PRNGKey(1)},
        batch)["params"]
    sd = export_unisrec_state_dict(params, plm_name="roberta")
    back = convert_unisrec_model_state_dict(sd, num_layers=cfg.num_layers)
    _round_trip_check(params, sd, back)
    # RecBole-format spellings the reference's strict=False load keys on
    # (src/model/model_unisrec.py:59-343)
    assert "news_encoder.moe_adaptor.experts.0.lin.weight" in sd
    assert "news_encoder.moe_adaptor.w_gate" in sd
    assert "trm_encoder.layer.0.multi_head_attention.query.weight" in sd
    assert "trm_encoder.layer.0.feed_forward.dense_1.weight" in sd
    assert "position_embedding.weight" in sd
    assert "LayerNorm.weight" in sd


def test_load_unisrec_pretrained_full_layout(tmp_path):
    """A FULL reference-model-layout .pth (the export_unisrec_state_dict
    artifact: news_encoder.roberta.* tower + news_encoder.moe_adaptor.* +
    seq-encoder keys) grafts back completely — including the tower. The
    reference's model-level ``load_state_dict(..., strict=False)``
    (src/trainer_fastformer.py:134-138) lands every one of those keys, so
    ours must too: this is what makes the manufactured pretrain->finetune
    contract carry the trained tower into the frozen finetune."""
    import torch

    from miner_tpu.models import UniSRec
    from miner_tpu.models.hf_import import (
        export_unisrec_state_dict,
        load_unisrec_pretrained,
    )
    from miner_tpu.models.news_encoder import NewsEncoderMoe

    cfg = PLMConfig.tiny()
    enc = NewsEncoderMoe(plm_cfg=cfg, use_sapo=False,
                         combine_type="pre-concat", n_experts=3,
                         adaptor_out_dim=24)
    model = UniSRec(news_encoder=enc, max_his_len=4)
    B, C, H, L = 2, 3, 4, 8
    rng = np.random.default_rng(0)

    def ids(shape):
        return jnp.asarray(
            rng.integers(1, cfg.vocab_size, size=shape).astype(np.int32))

    batch = {
        "cand_title": ids((B, C, L)),
        "cand_title_mask": jnp.ones((B, C, L), jnp.int32),
        "his_title": ids((B, H, L)),
        "his_title_mask": jnp.ones((B, H, L), jnp.int32),
        "his_mask": jnp.ones((B, H), jnp.int32),
    }
    src = model.init(
        {"params": jax.random.PRNGKey(0), "gating": jax.random.PRNGKey(1)},
        batch)["params"]
    dst = model.init(
        {"params": jax.random.PRNGKey(7), "gating": jax.random.PRNGKey(8)},
        batch)["params"]

    path = str(tmp_path / "full_unisrec.pth")
    torch.save({k: torch.from_numpy(np.asarray(v).copy()) for k, v in
                export_unisrec_state_dict(src, plm_name="roberta").items()},
               path)
    merged, n_loaded = load_unisrec_pretrained(dst, path)

    src_leaves = jax.tree_util.tree_leaves_with_path(src)
    merged_map = dict(jax.tree_util.tree_leaves_with_path(merged))
    assert len(src_leaves) == n_loaded  # every tensor (incl. tower) landed
    for path_, leaf in src_leaves:
        np.testing.assert_allclose(
            np.asarray(merged_map[path_]), np.asarray(leaf), atol=1e-6,
            err_msg=jax.tree_util.keystr(path_))

    # The artifact self-describes its history layout (clicks-first default);
    # consuming it under --legacy_history_layout is a DIFFERENT function for
    # UniSRec (position-0 user vector) and must be refused without force.
    with pytest.raises(ValueError, match="history layout"):
        load_unisrec_pretrained(dst, path, legacy_layout=True)
    merged2, n2 = load_unisrec_pretrained(dst, path, legacy_layout=True,
                                          force=True)
    assert n2 == n_loaded

    # A legacy-marked export only loads into a legacy-layout run.
    path_l = str(tmp_path / "full_unisrec_legacy.pth")
    torch.save(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
         export_unisrec_state_dict(src, plm_name="roberta",
                                   history_layout="legacy").items()},
        path_l)
    with pytest.raises(ValueError, match="history layout"):
        load_unisrec_pretrained(dst, path_l)
    load_unisrec_pretrained(dst, path_l, legacy_layout=True)

    # An UNMARKED full-layout artifact (a reference-trained model, whose
    # recipe is pads-first) needs the same acknowledgment as
    # tools/import_reference_checkpoint.py.
    path_u = str(tmp_path / "full_unisrec_unmarked.pth")
    torch.save(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
         export_unisrec_state_dict(src, plm_name="roberta",
                                   history_layout=None).items()},
        path_u)
    with pytest.raises(ValueError, match="legacy_history_layout"):
        load_unisrec_pretrained(dst, path_u)
    load_unisrec_pretrained(dst, path_u, legacy_layout=True)
    load_unisrec_pretrained(dst, path_u, force=True)


def test_layout_gate_for_position_sensitive_transfer():
    """Checkpoint transfer of position-sensitive models errors loudly
    unless the legacy (reference pads-first) layout is acknowledged —
    the lstm-combine precedent (PARITY.md deviations; reference layout:
    src/reader.py:154)."""
    from miner_tpu.models.hf_import import (
        POSITION_SENSITIVE_MODELS,
        check_history_layout_for_transfer,
    )

    assert set(POSITION_SENSITIVE_MODELS) == {"fastformer", "unbert",
                                              "unisrec"}
    # Miner is permutation-invariant under masking: never gated
    check_history_layout_for_transfer("miner", legacy_layout=False)
    for name in POSITION_SENSITIVE_MODELS:
        with pytest.raises(ValueError, match="legacy_history_layout"):
            check_history_layout_for_transfer(name, legacy_layout=False)
        check_history_layout_for_transfer(name, legacy_layout=True)
        check_history_layout_for_transfer(name, legacy_layout=False,
                                          force=True)
