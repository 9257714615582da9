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
