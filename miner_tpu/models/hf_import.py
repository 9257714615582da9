"""Import HuggingFace BERT/RoBERTa checkpoint weights into the native PLM.

Maps a transformers state dict (``pytorch_model.bin`` / ``model.safetensors``
in a local checkpoint dir) onto ``miner_tpu.models.plm.TransformerPLM``'s
parameter tree.  The QKV projections are fused here into the single ``qkv``
kernel the TPU tower uses.

This is the replacement for the reference's
``NewsEncoder.from_pretrained(...)`` (reference: src/trainer.py:92-108); in
environments without checkpoint files the towers train from random init.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _load_state_dict(checkpoint_dir: str) -> Dict[str, np.ndarray]:
    st_path = os.path.join(checkpoint_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    bin_path = os.path.join(checkpoint_dir, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model weights found in {checkpoint_dir}")


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    for prefix in ("roberta.", "bert.", "model."):
        if any(k.startswith(prefix) for k in sd):
            return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return sd


def convert_plm_params(checkpoint_dir: str, num_layers: int) -> Dict:
    """Returns a params subtree matching TransformerPLM's structure."""
    return convert_plm_state_dict(
        _strip_prefix(_load_state_dict(checkpoint_dir)), num_layers
    )


def convert_bert_layer(sd: Dict[str, np.ndarray], p: str) -> Dict:
    """One HF-BERT-format encoder layer (torch keys under prefix ``p``) ->
    our ``TransformerLayer`` params subtree, QKV fused."""

    def t(name):  # torch Linear weight -> flax kernel
        return np.asarray(sd[name]).T

    def v(name):
        return np.asarray(sd[name])

    q_w = t(p + "attention.self.query.weight")
    k_w = t(p + "attention.self.key.weight")
    v_w = t(p + "attention.self.value.weight")
    q_b = v(p + "attention.self.query.bias")
    k_b = v(p + "attention.self.key.bias")
    v_b = v(p + "attention.self.value.bias")
    return {
        "attention": {
            "qkv": {
                "kernel": np.concatenate([q_w, k_w, v_w], axis=1),
                "bias": np.concatenate([q_b, k_b, v_b]),
            },
            "out": {
                "kernel": t(p + "attention.output.dense.weight"),
                "bias": v(p + "attention.output.dense.bias"),
            },
        },
        "attention_ln": {
            "scale": v(p + "attention.output.LayerNorm.weight"),
            "bias": v(p + "attention.output.LayerNorm.bias"),
        },
        "ffn_in": {
            "kernel": t(p + "intermediate.dense.weight"),
            "bias": v(p + "intermediate.dense.bias"),
        },
        "ffn_out": {
            "kernel": t(p + "output.dense.weight"),
            "bias": v(p + "output.dense.bias"),
        },
        "ffn_ln": {
            "scale": v(p + "output.LayerNorm.weight"),
            "bias": v(p + "output.LayerNorm.bias"),
        },
    }


def export_bert_layer(lp: Dict, p: str) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_bert_layer`: ``TransformerLayer`` subtree ->
    HF-BERT-format torch keys under prefix ``p`` (fused QKV split back)."""

    def a(x):
        return np.asarray(x)

    sd: Dict[str, np.ndarray] = {}
    qkv_k = a(lp["attention"]["qkv"]["kernel"])  # (D, 3D)
    qkv_b = a(lp["attention"]["qkv"]["bias"])
    D = qkv_k.shape[0]
    for j, name in enumerate(("query", "key", "value")):
        sd[p + f"attention.self.{name}.weight"] = qkv_k[:, j * D:(j + 1) * D].T
        sd[p + f"attention.self.{name}.bias"] = qkv_b[j * D:(j + 1) * D]
    sd[p + "attention.output.dense.weight"] = a(
        lp["attention"]["out"]["kernel"]).T
    sd[p + "attention.output.dense.bias"] = a(lp["attention"]["out"]["bias"])
    sd[p + "attention.output.LayerNorm.weight"] = a(lp["attention_ln"]["scale"])
    sd[p + "attention.output.LayerNorm.bias"] = a(lp["attention_ln"]["bias"])
    sd[p + "intermediate.dense.weight"] = a(lp["ffn_in"]["kernel"]).T
    sd[p + "intermediate.dense.bias"] = a(lp["ffn_in"]["bias"])
    sd[p + "output.dense.weight"] = a(lp["ffn_out"]["kernel"]).T
    sd[p + "output.dense.bias"] = a(lp["ffn_out"]["bias"])
    sd[p + "output.LayerNorm.weight"] = a(lp["ffn_ln"]["scale"])
    sd[p + "output.LayerNorm.bias"] = a(lp["ffn_ln"]["bias"])
    return sd


def convert_plm_state_dict(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    """In-memory transformers state dict -> TransformerPLM params subtree."""

    def v(name):
        return np.asarray(sd[name])

    params: Dict = {
        "embeddings": {
            "word_embeddings": {"embedding": v("embeddings.word_embeddings.weight")},
            "position_embeddings": {
                "embedding": v("embeddings.position_embeddings.weight")
            },
            "token_type_embeddings": {
                "embedding": v("embeddings.token_type_embeddings.weight")
            },
            "ln": {
                "scale": v("embeddings.LayerNorm.weight"),
                "bias": v("embeddings.LayerNorm.bias"),
            },
        }
    }
    for i in range(num_layers):
        params[f"layer_{i}"] = convert_bert_layer(sd, f"encoder.layer.{i}.")
    return params


def stack_layer_params(plm_params: Dict) -> Dict:
    """Per-layer PLM params ({layer_i: subtree}) -> the scan layout
    ({layers: {layer: (num_layers, ...)-stacked leaves}}) used when
    ``PLMConfig.scan_layers`` is on. Inverse-free: only needed when loading
    unrolled checkpoints into a scanned tower."""
    n = sum(1 for k in plm_params if k.startswith("layer_"))

    def stack(trees):
        if isinstance(trees[0], dict):
            return {k: stack([t[k] for t in trees]) for k in trees[0]}
        return np.stack([np.asarray(t) for t in trees])

    out = {k: v for k, v in plm_params.items() if not k.startswith("layer_")}
    out["layers"] = {
        "layer": stack([plm_params[f"layer_{i}"] for i in range(n)])
    }
    return out


def unstack_layer_params(plm_params: Dict) -> Dict:
    """Inverse of :func:`stack_layer_params`: the scan layout
    ({layers: {layer: (num_layers, ...)-stacked leaves}}) -> per-layer
    ({layer_i: subtree}). Needed to export ``--scan_layers``-trained
    checkpoints to the reference/unrolled formats."""
    stacked = plm_params["layers"]["layer"]
    leaf = stacked
    while isinstance(leaf, dict):
        leaf = next(iter(leaf.values()))
    n = int(np.asarray(leaf).shape[0])

    def pick(tree, i):
        if isinstance(tree, dict):
            return {k: pick(v, i) for k, v in tree.items()}
        return np.asarray(tree)[i]

    out = {k: v for k, v in plm_params.items() if k != "layers"}
    for i in range(n):
        out[f"layer_{i}"] = pick(stacked, i)
    return out


def _convert_news_encoder(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    """The reference ``NewsEncoder`` subtree (torch keys under
    ``news_encoder.``) -> our ``NewsEncoder`` params subtree.  Shared by the
    Miner and Fastformer converters (both reference models hold the same
    news tower; reference: src/model/news_encoder.py:11-110)."""
    if any(k.startswith("news_encoder.lstm.") for k in sd):
        raise ValueError(
            "cannot import a --combine_type lstm checkpoint: the reference's "
            "lstm combiner feeds a 2-D tensor into nn.LSTM (unbatched-"
            "sequence semantics; reference: src/model/news_encoder.py:52-56, "
            "100-104) while ours is a BiLSTM over the [title, sapo] pair — "
            "the weight shapes are architecturally incompatible (see "
            "PARITY.md deviations). Retrain, or use combine_type linear."
        )

    def t(name):
        return sd[name].T

    def v(name):
        return sd[name]

    plm_sd = {k[len("news_encoder.roberta."):]: vv for k, vv in sd.items()
              if k.startswith("news_encoder.roberta.")}
    if not plm_sd:
        plm_sd = {k[len("news_encoder.bert."):]: vv for k, vv in sd.items()
                  if k.startswith("news_encoder.bert.")}
    news_encoder: Dict = {"plm": convert_plm_state_dict(plm_sd, num_layers)}
    if "news_encoder.reduce_dim.weight" in sd:
        news_encoder["reduce_dim"] = {
            "kernel": t("news_encoder.reduce_dim.weight"),
            "bias": v("news_encoder.reduce_dim.bias"),
        }
    if "news_encoder.linear_combine.weight" in sd:
        news_encoder["linear_combine"] = {
            "kernel": t("news_encoder.linear_combine.weight"),
            "bias": v("news_encoder.linear_combine.bias"),
        }
    return news_encoder


def convert_miner_state_dict(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    """Reference-format MINER torch state dict -> our full Miner param tree.

    Maps every trainable tensor of the reference ``Miner`` (reference:
    src/model/model.py:13-138 + src/model/news_encoder.py:11-110) onto
    ``miner_tpu.models.miner.Miner``'s parameter layout, fusing the QKV
    projections. Lets a user of the reference bring a trained checkpoint's
    ``state_dict`` across (see tools/import_reference_checkpoint.py), and
    powers the step-level torch-vs-JAX training-parity test
    (tests/test_torch_parity.py).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def t(name):
        return sd[name].T

    def v(name):
        return sd[name]

    params: Dict = {
        "news_encoder": _convert_news_encoder(sd, num_layers),
        "poly_attn": {
            "proj_kernel": t("poly_attn.linear.weight"),
            "context_codes": v("poly_attn.context_codes"),
        },
    }
    if "category_embedding.weight" in sd:
        params["category_embedding"] = {
            "embedding": v("category_embedding.weight")
        }
    if "target_aware_attn.linear.weight" in sd:
        params["target_aware_attn"] = {
            "proj": {"kernel": t("target_aware_attn.linear.weight")}
        }
    return params


def export_plm_state_dict(plm: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """``TransformerPLM`` param subtree -> transformers-format state dict.

    Exact inverse of :func:`convert_plm_state_dict`: flax kernels transpose
    back to torch ``Linear.weight`` layout and the fused ``qkv`` kernel
    splits into query/key/value."""

    def a(x):
        return np.asarray(x)

    if "layers" in plm:  # --scan_layers checkpoint: unstack to per-layer
        plm = unstack_layer_params(plm)
    sd: Dict[str, np.ndarray] = {}
    emb = plm["embeddings"]
    sd[prefix + "embeddings.word_embeddings.weight"] = a(
        emb["word_embeddings"]["embedding"])
    sd[prefix + "embeddings.position_embeddings.weight"] = a(
        emb["position_embeddings"]["embedding"])
    sd[prefix + "embeddings.token_type_embeddings.weight"] = a(
        emb["token_type_embeddings"]["embedding"])
    sd[prefix + "embeddings.LayerNorm.weight"] = a(emb["ln"]["scale"])
    sd[prefix + "embeddings.LayerNorm.bias"] = a(emb["ln"]["bias"])
    i = 0
    while f"layer_{i}" in plm:
        sd.update(export_bert_layer(plm[f"layer_{i}"],
                                    f"{prefix}encoder.layer.{i}."))
        i += 1
    return sd


def _export_news_encoder(ne: Dict, plm_name: str) -> Dict[str, np.ndarray]:
    """Inverse of :func:`_convert_news_encoder`."""

    def a(x):
        return np.asarray(x)

    if "lstm_combine" in ne:
        raise ValueError(
            "cannot export a --combine_type lstm model to the reference "
            "format: our BiLSTM-over-[title, sapo] combiner is a deliberate "
            "redesign of the reference's broken unbatched nn.LSTM path "
            "(reference: src/model/news_encoder.py:52-56, 100-104) — the "
            "weight shapes are architecturally incompatible (see PARITY.md "
            "deviations)."
        )
    sd = export_plm_state_dict(ne["plm"], prefix=f"news_encoder.{plm_name}.")
    if "reduce_dim" in ne:
        sd["news_encoder.reduce_dim.weight"] = a(ne["reduce_dim"]["kernel"]).T
        sd["news_encoder.reduce_dim.bias"] = a(ne["reduce_dim"]["bias"])
    if "linear_combine" in ne:
        sd["news_encoder.linear_combine.weight"] = a(
            ne["linear_combine"]["kernel"]).T
        sd["news_encoder.linear_combine.bias"] = a(ne["linear_combine"]["bias"])
    return sd


def export_miner_state_dict(params: Dict,
                            plm_name: str = "roberta") -> Dict[str, np.ndarray]:
    """Our full ``Miner`` param tree -> reference-format torch state dict.

    Exact inverse of :func:`convert_miner_state_dict` — lets a model trained
    here load into the reference ``Miner`` (reference: src/model/model.py:
    13-138) via ``load_state_dict(..., strict=False)`` (the reference also
    carries non-trainable buffers like ``position_ids`` that ``strict=False``
    regenerates). See tools/export_to_reference.py for the checkpoint-dir
    front end; round-trip-tested in tests/test_hf_import.py."""

    def a(x):
        return np.asarray(x)

    sd = _export_news_encoder(params["news_encoder"], plm_name)
    sd["poly_attn.linear.weight"] = a(params["poly_attn"]["proj_kernel"]).T
    sd["poly_attn.context_codes"] = a(params["poly_attn"]["context_codes"])
    if "category_embedding" in params:
        sd["category_embedding.weight"] = a(
            params["category_embedding"]["embedding"])
    if "target_aware_attn" in params:
        sd["target_aware_attn.linear.weight"] = a(
            params["target_aware_attn"]["proj"]["kernel"]).T
    return sd


def convert_fastformer_state_dict(sd: Dict[str, np.ndarray],
                                  num_layers: int) -> Dict:
    """Reference-format Fastformer torch state dict -> our
    ``FastformerUserModel`` param tree.

    Covers every trainable tensor of the reference ``FastFormer``
    (reference: src/model/model.py:223-341: the shared news tower +
    ``fast_attn`` = FastformerEncoder with position embeddings, LayerNorm,
    ``encoders.{i}`` additive-attention layers, and ``poolers.0``).
    ``num_layers`` is the PLM tower depth (the Fastformer layer count is
    read from the dict).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def t(name):
        return sd[name].T

    def v(name):
        return sd[name]

    fast: Dict = {
        "position_embeddings": {
            "embedding": v("fast_attn.position_embeddings.weight")
        },
        "ln": {
            "scale": v("fast_attn.LayerNorm.weight"),
            "bias": v("fast_attn.LayerNorm.bias"),
        },
        "pooler": {
            "fc1": {"kernel": t("fast_attn.poolers.0.att_fc1.weight"),
                    "bias": v("fast_attn.poolers.0.att_fc1.bias")},
            "fc2": {"kernel": t("fast_attn.poolers.0.att_fc2.weight"),
                    "bias": v("fast_attn.poolers.0.att_fc2.bias")},
        },
    }
    i = 0
    while f"fast_attn.encoders.{i}.attention.self.query.weight" in sd:
        p = f"fast_attn.encoders.{i}."
        fast[f"layer_{i}"] = {
            "self_attn": {
                "query": {"kernel": t(p + "attention.self.query.weight"),
                          "bias": v(p + "attention.self.query.bias")},
                "key": {"kernel": t(p + "attention.self.key.weight"),
                        "bias": v(p + "attention.self.key.bias")},
                "query_att_kernel": t(p + "attention.self.query_att.weight"),
                "query_att_bias": v(p + "attention.self.query_att.bias"),
                "key_att_kernel": t(p + "attention.self.key_att.weight"),
                "key_att_bias": v(p + "attention.self.key_att.bias"),
                "transform": {"kernel": t(p + "attention.self.transform.weight"),
                              "bias": v(p + "attention.self.transform.bias")},
            },
            "attn_out": {"kernel": t(p + "attention.output.dense.weight"),
                         "bias": v(p + "attention.output.dense.bias")},
            "attn_ln": {"scale": v(p + "attention.output.LayerNorm.weight"),
                        "bias": v(p + "attention.output.LayerNorm.bias")},
            "ffn_in": {"kernel": t(p + "intermediate.dense.weight"),
                       "bias": v(p + "intermediate.dense.bias")},
            "ffn_out": {"kernel": t(p + "output.dense.weight"),
                        "bias": v(p + "output.dense.bias")},
            "ffn_ln": {"scale": v(p + "output.LayerNorm.weight"),
                       "bias": v(p + "output.LayerNorm.bias")},
        }
        i += 1
    return {
        "news_encoder": _convert_news_encoder(sd, num_layers),
        "fast_attn": fast,
    }


def export_fastformer_state_dict(params: Dict,
                                 plm_name: str = "roberta") -> Dict[str, np.ndarray]:
    """Exact inverse of :func:`convert_fastformer_state_dict` — lets a
    Fastformer trained here load into the reference ``FastFormer``
    (reference: src/model/model.py:223-341) via ``load_state_dict(...,
    strict=False)``."""

    def a(x):
        return np.asarray(x)

    sd = _export_news_encoder(params["news_encoder"], plm_name)
    fast = params["fast_attn"]
    sd["fast_attn.position_embeddings.weight"] = a(
        fast["position_embeddings"]["embedding"])
    sd["fast_attn.LayerNorm.weight"] = a(fast["ln"]["scale"])
    sd["fast_attn.LayerNorm.bias"] = a(fast["ln"]["bias"])
    sd["fast_attn.poolers.0.att_fc1.weight"] = a(
        fast["pooler"]["fc1"]["kernel"]).T
    sd["fast_attn.poolers.0.att_fc1.bias"] = a(fast["pooler"]["fc1"]["bias"])
    sd["fast_attn.poolers.0.att_fc2.weight"] = a(
        fast["pooler"]["fc2"]["kernel"]).T
    sd["fast_attn.poolers.0.att_fc2.bias"] = a(fast["pooler"]["fc2"]["bias"])
    i = 0
    while f"layer_{i}" in fast:
        lp = fast[f"layer_{i}"]
        p = f"fast_attn.encoders.{i}."
        sa = lp["self_attn"]
        sd[p + "attention.self.query.weight"] = a(sa["query"]["kernel"]).T
        sd[p + "attention.self.query.bias"] = a(sa["query"]["bias"])
        sd[p + "attention.self.key.weight"] = a(sa["key"]["kernel"]).T
        sd[p + "attention.self.key.bias"] = a(sa["key"]["bias"])
        sd[p + "attention.self.query_att.weight"] = a(sa["query_att_kernel"]).T
        sd[p + "attention.self.query_att.bias"] = a(sa["query_att_bias"])
        sd[p + "attention.self.key_att.weight"] = a(sa["key_att_kernel"]).T
        sd[p + "attention.self.key_att.bias"] = a(sa["key_att_bias"])
        sd[p + "attention.self.transform.weight"] = a(sa["transform"]["kernel"]).T
        sd[p + "attention.self.transform.bias"] = a(sa["transform"]["bias"])
        sd[p + "attention.output.dense.weight"] = a(lp["attn_out"]["kernel"]).T
        sd[p + "attention.output.dense.bias"] = a(lp["attn_out"]["bias"])
        sd[p + "attention.output.LayerNorm.weight"] = a(lp["attn_ln"]["scale"])
        sd[p + "attention.output.LayerNorm.bias"] = a(lp["attn_ln"]["bias"])
        sd[p + "intermediate.dense.weight"] = a(lp["ffn_in"]["kernel"]).T
        sd[p + "intermediate.dense.bias"] = a(lp["ffn_in"]["bias"])
        sd[p + "output.dense.weight"] = a(lp["ffn_out"]["kernel"]).T
        sd[p + "output.dense.bias"] = a(lp["ffn_out"]["bias"])
        sd[p + "output.LayerNorm.weight"] = a(lp["ffn_ln"]["scale"])
        sd[p + "output.LayerNorm.bias"] = a(lp["ffn_ln"]["bias"])
        i += 1
    return sd


def convert_unbert_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference-format UNBERT torch state dict -> our ``UNBert`` param tree.

    The reference model (reference: src/model/model_unbert.py:88-289) is
    ``_model`` (UNBertModel: embeddings incl. the 64-entry news-``segment_
    embeddings``, a word-level ``encoder``, a news-level ``encoder_news``,
    and an unused-in-the-score ``pooler``) plus the ``_dense`` head and the
    optional attention-mode ``att`` MLP.  ``_model.pooler.*`` has no
    counterpart here: its output is computed but never consumed by the score
    path (model_unbert.py:158, 276-289), so it is deliberately dropped.
    Layer counts are read from the dict.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def t(name):
        return sd[name].T

    def v(name):
        return sd[name]

    e = "_model.embeddings."
    params: Dict = {
        "word_embeddings": {"embedding": v(e + "word_embeddings.weight")},
        "position_embeddings": {"embedding": v(e + "position_embeddings.weight")},
        "token_type_embeddings": {
            "embedding": v(e + "token_type_embeddings.weight")
        },
        "news_segment_embeddings": {"embedding": v(e + "segment_embeddings.weight")},
        "emb_ln": {"scale": v(e + "LayerNorm.weight"),
                   "bias": v(e + "LayerNorm.bias")},
        "score_head": {"kernel": t("_dense.weight"), "bias": v("_dense.bias")},
    }
    i = 0
    while f"_model.encoder.layer.{i}.attention.self.query.weight" in sd:
        params[f"word_layer_{i}"] = convert_bert_layer(
            sd, f"_model.encoder.layer.{i}.")
        i += 1
    i = 0
    while f"_model.encoder_news.layer.{i}.attention.self.query.weight" in sd:
        params[f"news_layer_{i}"] = convert_bert_layer(
            sd, f"_model.encoder_news.layer.{i}.")
        i += 1
    if "att.0.weight" in sd:  # attention news_mode's Sequential MLP
        params["att_mapping_in"] = {"kernel": t("att.0.weight"),
                                    "bias": v("att.0.bias")}
        params["att_mapping_out"] = {"kernel": t("att.2.weight"),
                                     "bias": v("att.2.bias")}
    return params


def export_unbert_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Exact inverse of :func:`convert_unbert_state_dict` — lets a UnBERT
    trained here load into the reference ``UNBERT`` via
    ``load_state_dict(..., strict=False)`` (strict=False regenerates the
    ``_model.pooler.*`` tensors we never train; they do not affect the
    reference's score, model_unbert.py:276-289)."""

    def a(x):
        return np.asarray(x)

    e = "_model.embeddings."
    sd: Dict[str, np.ndarray] = {
        e + "word_embeddings.weight": a(params["word_embeddings"]["embedding"]),
        e + "position_embeddings.weight": a(
            params["position_embeddings"]["embedding"]),
        e + "token_type_embeddings.weight": a(
            params["token_type_embeddings"]["embedding"]),
        e + "segment_embeddings.weight": a(
            params["news_segment_embeddings"]["embedding"]),
        e + "LayerNorm.weight": a(params["emb_ln"]["scale"]),
        e + "LayerNorm.bias": a(params["emb_ln"]["bias"]),
        "_dense.weight": a(params["score_head"]["kernel"]).T,
        "_dense.bias": a(params["score_head"]["bias"]),
    }
    i = 0
    while f"word_layer_{i}" in params:
        sd.update(export_bert_layer(params[f"word_layer_{i}"],
                                    f"_model.encoder.layer.{i}."))
        i += 1
    i = 0
    while f"news_layer_{i}" in params:
        sd.update(export_bert_layer(params[f"news_layer_{i}"],
                                    f"_model.encoder_news.layer.{i}."))
        i += 1
    if "att_mapping_in" in params:
        sd["att.0.weight"] = a(params["att_mapping_in"]["kernel"]).T
        sd["att.0.bias"] = a(params["att_mapping_in"]["bias"])
        sd["att.2.weight"] = a(params["att_mapping_out"]["kernel"]).T
        sd["att.2.bias"] = a(params["att_mapping_out"]["bias"])
    return sd


def convert_unisrec_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Map a RecBole-style UniSRec torch state dict onto our param tree.

    The reference loads ``unisrec_pretrained_weights/unisrec_pretained_state_
    dict.pth`` twice with ``strict=False`` — once into the news encoder (only
    the ``moe_adaptor.*`` keys land) and once into the model (the
    ``position_embedding`` / ``trm_encoder`` / top-level ``LayerNorm`` keys
    land) (reference: src/trainer_fastformer.py:134-138).  Here both grafts
    are computed in one pass; QKV projections are fused into the single
    ``qkv`` kernel our ``TransformerLayer`` uses, and the per-expert PW
    weights are stacked into the batched (E, D_in, D_out) expert tensor.

    Returns a partial tree: only the keys present in ``sd`` appear.
    """

    def t(name):
        return np.asarray(sd[name]).T

    def v(name):
        return np.asarray(sd[name])

    out: Dict = {}
    if "position_embedding.weight" in sd:
        out["position_embedding"] = {"embedding": v("position_embedding.weight")}
    if "LayerNorm.weight" in sd:
        out["ln"] = {"scale": v("LayerNorm.weight"), "bias": v("LayerNorm.bias")}

    n_layers = 0
    while f"trm_encoder.layer.{n_layers}.multi_head_attention.query.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        p = f"trm_encoder.layer.{i}."
        out[f"trm_layer_{i}"] = {
            "attention": {
                "qkv": {
                    "kernel": np.concatenate(
                        [t(p + "multi_head_attention.query.weight"),
                         t(p + "multi_head_attention.key.weight"),
                         t(p + "multi_head_attention.value.weight")], axis=1
                    ),
                    "bias": np.concatenate(
                        [v(p + "multi_head_attention.query.bias"),
                         v(p + "multi_head_attention.key.bias"),
                         v(p + "multi_head_attention.value.bias")]
                    ),
                },
                "out": {
                    "kernel": t(p + "multi_head_attention.dense.weight"),
                    "bias": v(p + "multi_head_attention.dense.bias"),
                },
            },
            "attention_ln": {
                "scale": v(p + "multi_head_attention.LayerNorm.weight"),
                "bias": v(p + "multi_head_attention.LayerNorm.bias"),
            },
            "ffn_in": {
                "kernel": t(p + "feed_forward.dense_1.weight"),
                "bias": v(p + "feed_forward.dense_1.bias"),
            },
            "ffn_out": {
                "kernel": t(p + "feed_forward.dense_2.weight"),
                "bias": v(p + "feed_forward.dense_2.bias"),
            },
            "ffn_ln": {
                "scale": v(p + "feed_forward.LayerNorm.weight"),
                "bias": v(p + "feed_forward.LayerNorm.bias"),
            },
        }

    n_exps = 0
    while f"moe_adaptor.experts.{n_exps}.lin.weight" in sd:
        n_exps += 1
    if n_exps:
        moe = {
            "experts": {
                "bias": np.stack(
                    [v(f"moe_adaptor.experts.{i}.bias") for i in range(n_exps)]
                ),
                "kernel": np.stack(
                    [t(f"moe_adaptor.experts.{i}.lin.weight") for i in range(n_exps)]
                ),
            }
        }
        if "moe_adaptor.w_gate" in sd:
            moe["w_gate"] = v("moe_adaptor.w_gate")
        if "moe_adaptor.w_noise" in sd:
            moe["w_noise"] = v("moe_adaptor.w_noise")
        out["news_encoder"] = {"moe_adaptor": moe}
    return out


POSITION_SENSITIVE_MODELS = ("fastformer", "unbert", "unisrec")


def check_history_layout_for_transfer(model_name: str, legacy_layout: bool,
                                      force: bool = False) -> None:
    """Loud gate for reference-checkpoint transfer of position-sensitive
    models (the lstm-combine precedent: fail loudly rather than silently
    change the computed function).

    The reference PREPENDS pad news to every click history
    (src/reader.py:154, 204, 268, 319, 369, 405); our default layout is
    clicks-first (PARITY.md deviations). Miner's poly-attention is
    permutation-invariant under masking, so its checkpoints transfer under
    either layout — but UnBERT (packer reads the first hist slots),
    UniSRec (position-0 user vector) and Fastformer (learned positions)
    compute DIFFERENT functions per layout. A checkpoint crossing the
    framework boundary for those models is only bit-faithful when this
    side runs with ``--legacy_history_layout``.
    """
    if model_name not in POSITION_SENSITIVE_MODELS or legacy_layout or force:
        return
    raise ValueError(
        f"{model_name} is position-sensitive in the history layout: the "
        "reference prepends pad news (src/reader.py:154) while this "
        "framework's default is clicks-first (PARITY.md deviations). A "
        "transferred checkpoint only reproduces the reference's function "
        "when run with --legacy_history_layout. Pass "
        "--legacy_history_layout to acknowledge that recipe, or "
        "--force_layout_mismatch to transfer anyway (the model will see a "
        "shifted input distribution)."
    )


def convert_unisrec_model_state_dict(sd: Dict[str, np.ndarray],
                                     num_layers: int) -> Dict:
    """Full reference-format UniSRec torch state dict -> our full param tree.

    Unlike :func:`convert_unisrec_state_dict` (which maps the *partial*
    RecBole ``unisrec_pretained_state_dict.pth`` whose keys sit at the top
    level), this maps a complete trained ``UniSRec`` model state dict
    (reference: src/model/model_unisrec.py:369-450: ``news_encoder.roberta.*``
    + ``news_encoder.moe_adaptor.*`` + ``position_embedding`` /
    ``trm_encoder.layer.{i}.*`` / top-level ``LayerNorm``) onto
    ``miner_tpu.models.unisrec.UniSRec``'s layout.  ``num_layers`` is the PLM
    tower depth; the sequential-encoder depth is read from the dict.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def t(name):
        return sd[name].T

    def v(name):
        return sd[name]

    # Route the seq-encoder + adaptor keys through the partial converter by
    # presenting them at the top-level spelling it expects.
    sub = {k: vv for k, vv in sd.items()
           if not k.startswith("news_encoder.")}
    sub.update({k[len("news_encoder."):]: vv for k, vv in sd.items()
                if k.startswith("news_encoder.moe_adaptor.")})
    params = convert_unisrec_state_dict(sub)

    # The reference NewsEncoderMoe's PLM attribute is named ``roberta`` even
    # when it holds a BertModel (reference: src/model/news_encoder.py:190).
    plm_sd = {k[len("news_encoder.roberta."):]: vv for k, vv in sd.items()
              if k.startswith("news_encoder.roberta.")}
    if not plm_sd:
        plm_sd = {k[len("news_encoder.bert."):]: vv for k, vv in sd.items()
                  if k.startswith("news_encoder.bert.")}
    ne = params.setdefault("news_encoder", {})
    ne["plm"] = convert_plm_state_dict(plm_sd, num_layers)
    if "news_encoder.linear_combine.weight" in sd:
        ne["linear_combine"] = {
            "kernel": t("news_encoder.linear_combine.weight"),
            "bias": v("news_encoder.linear_combine.bias"),
        }
    return params


HISTORY_LAYOUT_MARKER = "_miner_tpu_history_layout"


def export_unisrec_state_dict(params: Dict, plm_name: str = "roberta",
                              history_layout: str = "clicks_first",
                              ) -> Dict[str, np.ndarray]:
    """Exact inverse of :func:`convert_unisrec_model_state_dict` — lets a
    UniSRec trained here load into the reference ``UniSRec`` (reference:
    src/model/model_unisrec.py:369-450) via ``load_state_dict(...,
    strict=False)``.  The batched (E, D_in, D_out) expert tensor unstacks
    back into per-expert ``moe_adaptor.experts.{i}.lin.weight`` / ``.bias``
    keys and the fused QKV kernels split back into RecBole's
    ``multi_head_attention.{query,key,value}`` spellings.

    ``history_layout`` records which history convention the model was
    trained under (``"clicks_first"`` — our default — or ``"legacy"``, the
    reference's pads-first rows) as a one-element marker tensor under
    ``HISTORY_LAYOUT_MARKER``: UniSRec's position-0 user vector makes the
    artifact layout-sensitive, and :func:`load_unisrec_pretrained` uses the
    marker to verify the consuming run's layout matches. The reference's own
    ``load_state_dict(..., strict=False)`` simply reports the marker as an
    unexpected key. ``history_layout=None`` omits the marker."""

    def a(x):
        return np.asarray(x)

    ne = params["news_encoder"]
    sd = export_plm_state_dict(ne["plm"], prefix=f"news_encoder.{plm_name}.")
    moe = ne["moe_adaptor"]
    sd["news_encoder.moe_adaptor.w_gate"] = a(moe["w_gate"])
    sd["news_encoder.moe_adaptor.w_noise"] = a(moe["w_noise"])
    kernel = a(moe["experts"]["kernel"])  # (E, D_in, D_out)
    bias = a(moe["experts"]["bias"])  # (E, D_in)
    for i in range(kernel.shape[0]):
        sd[f"news_encoder.moe_adaptor.experts.{i}.lin.weight"] = kernel[i].T
        sd[f"news_encoder.moe_adaptor.experts.{i}.bias"] = bias[i]
    if "linear_combine" in ne:
        sd["news_encoder.linear_combine.weight"] = a(
            ne["linear_combine"]["kernel"]).T
        sd["news_encoder.linear_combine.bias"] = a(ne["linear_combine"]["bias"])

    sd["position_embedding.weight"] = a(params["position_embedding"]["embedding"])
    sd["LayerNorm.weight"] = a(params["ln"]["scale"])
    sd["LayerNorm.bias"] = a(params["ln"]["bias"])
    i = 0
    while f"trm_layer_{i}" in params:
        lp = params[f"trm_layer_{i}"]
        p = f"trm_encoder.layer.{i}."
        qkv_k = a(lp["attention"]["qkv"]["kernel"])  # (D, 3D)
        qkv_b = a(lp["attention"]["qkv"]["bias"])
        D = qkv_k.shape[0]
        for j, name in enumerate(("query", "key", "value")):
            sd[p + f"multi_head_attention.{name}.weight"] = (
                qkv_k[:, j * D:(j + 1) * D].T)
            sd[p + f"multi_head_attention.{name}.bias"] = qkv_b[j * D:(j + 1) * D]
        sd[p + "multi_head_attention.dense.weight"] = a(
            lp["attention"]["out"]["kernel"]).T
        sd[p + "multi_head_attention.dense.bias"] = a(
            lp["attention"]["out"]["bias"])
        sd[p + "multi_head_attention.LayerNorm.weight"] = a(
            lp["attention_ln"]["scale"])
        sd[p + "multi_head_attention.LayerNorm.bias"] = a(
            lp["attention_ln"]["bias"])
        sd[p + "feed_forward.dense_1.weight"] = a(lp["ffn_in"]["kernel"]).T
        sd[p + "feed_forward.dense_1.bias"] = a(lp["ffn_in"]["bias"])
        sd[p + "feed_forward.dense_2.weight"] = a(lp["ffn_out"]["kernel"]).T
        sd[p + "feed_forward.dense_2.bias"] = a(lp["ffn_out"]["bias"])
        sd[p + "feed_forward.LayerNorm.weight"] = a(lp["ffn_ln"]["scale"])
        sd[p + "feed_forward.LayerNorm.bias"] = a(lp["ffn_ln"]["bias"])
        i += 1
    if history_layout is not None:
        if history_layout not in ("clicks_first", "legacy"):
            raise ValueError(f"unknown history_layout {history_layout!r}")
        sd[HISTORY_LAYOUT_MARKER] = np.asarray(
            [1 if history_layout == "legacy" else 0], np.int8)
    return sd


def load_unisrec_pretrained(params, pth_path: str, legacy_layout: bool = False,
                            force: bool = False):
    """Graft a UniSRec pretrained torch checkpoint into ``params``.

    ``strict=False`` semantics: only keys present in both trees are replaced;
    a shape mismatch is an error (torch would raise there too).

    Two artifact layouts are accepted, mirroring what the reference's
    double ``load_state_dict(..., strict=False)`` (reference:
    src/trainer_fastformer.py:134-138) would land:

    * the external RecBole layout — top-level ``moe_adaptor.*`` /
      ``position_embedding`` / ``trm_encoder.*`` / ``LayerNorm`` keys, no
      news tower (the tower comes separately from the pretrained PLM,
      reference: src/model/news_encoder.py:190).  Accepted without a layout
      gate: the artifact's sequential encoder was pretrained on external
      item sequences (RecBole's own convention), not on either of this
      family's history-row layouts.
    * a full reference-model layout (``news_encoder.roberta.*`` +
      ``news_encoder.moe_adaptor.*`` + the seq-encoder keys) — e.g. the
      :func:`export_unisrec_state_dict` artifact.  The reference's
      model-level strict=False load would restore the tower from such a
      dict too, so this does as well.  This layout IS history-layout
      sensitive (the position-0 user vector reads the first history slot —
      a pad row under the reference's pads-first rows, a click under our
      default): our exports carry a layout marker that must match
      ``legacy_layout``; an unmarked (reference-trained) artifact requires
      the same ``--legacy_history_layout`` / ``force`` acknowledgment as
      tools/import_reference_checkpoint.py.
    """
    import re

    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    marker = sd.pop(HISTORY_LAYOUT_MARKER, None)
    sd = {k: np.asarray(vv) for k, vv in sd.items()
          if not k.startswith("_miner_tpu")}
    tower_layer = re.compile(
        r"news_encoder\.(?:roberta|bert)\.encoder\.layer\.(\d+)\.")
    layer_ids = [int(m.group(1)) for m in map(tower_layer.match, sd) if m]
    if layer_ids:
        if marker is not None:
            artifact_legacy = bool(int(np.asarray(marker).ravel()[0]))
            if artifact_legacy != bool(legacy_layout) and not force:
                a_name = "legacy (pads-first)" if artifact_legacy \
                    else "clicks-first"
                r_name = "legacy (pads-first)" if legacy_layout \
                    else "clicks-first"
                raise ValueError(
                    f"UniSRec artifact {pth_path} was trained under the "
                    f"{a_name} history layout but this run uses {r_name}: "
                    "the position-0 user vector would read a different "
                    "history slot than the one it was trained on. Match "
                    "the layout (--legacy_history_layout) or pass "
                    "--force_layout_mismatch to load anyway."
                )
        else:
            check_history_layout_for_transfer("unisrec", legacy_layout,
                                              force=force)
        partial = convert_unisrec_model_state_dict(sd, max(layer_ids) + 1)
    else:
        partial = convert_unisrec_state_dict(sd)

    n_loaded = 0

    def merge(old, new, path=""):
        nonlocal n_loaded
        if not isinstance(new, dict):
            if hasattr(old, "shape") and tuple(old.shape) != tuple(new.shape):
                raise ValueError(
                    f"shape mismatch at {path}: {tuple(old.shape)} vs "
                    f"checkpoint {tuple(new.shape)}"
                )
            n_loaded += 1
            return np.asarray(new, dtype=np.float32)
        out = dict(old)
        for k, sub in new.items():
            if k in out:
                out[k] = merge(out[k], sub, f"{path}/{k}")
        return out

    merged = merge(params, partial)
    return merged, n_loaded


def load_into_params(params, checkpoint_dir: str, plm_prefix: str):
    """Replace the PLM subtree at ``plm_prefix`` (slash path) in ``params``."""
    import jax

    keys = [k for k in plm_prefix.split("/") if k]
    sub = params
    for k in keys:
        sub = sub[k]
    if "layers" in sub:  # scan layout: leaves carry a leading layer axis
        num_layers = jax.tree_util.tree_leaves(sub["layers"])[0].shape[0]
        new_plm = stack_layer_params(
            convert_plm_params(checkpoint_dir, num_layers)
        )
    else:
        num_layers = sum(1 for k in sub if k.startswith("layer_"))
        new_plm = convert_plm_params(checkpoint_dir, num_layers)

    # Shape-check against the existing tree, then graft.
    old_leaves = jax.tree_util.tree_leaves_with_path(sub)
    flat_old = {jax.tree_util.keystr(p): l for p, l in old_leaves}
    for p, leaf in jax.tree_util.tree_leaves_with_path(new_plm):
        key = jax.tree_util.keystr(p)
        if key in flat_old and flat_old[key].shape != leaf.shape:
            raise ValueError(
                f"shape mismatch at {plm_prefix}{key}: "
                f"{flat_old[key].shape} vs checkpoint {leaf.shape}"
            )

    def graft(tree, path_keys, value):
        if not path_keys:
            return value
        out = dict(tree)
        out[path_keys[0]] = graft(tree[path_keys[0]], path_keys[1:], value)
        return out

    merged = dict(sub)
    for k, val in new_plm.items():
        merged[k] = val
    return graft(params, keys, merged)
