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
    sd = _strip_prefix(_load_state_dict(checkpoint_dir))

    def t(name):  # torch Linear weight -> flax kernel
        return np.asarray(sd[name]).T

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
        p = f"encoder.layer.{i}."
        q_w = t(p + "attention.self.query.weight")
        k_w = t(p + "attention.self.key.weight")
        v_w = t(p + "attention.self.value.weight")
        q_b = v(p + "attention.self.query.bias")
        k_b = v(p + "attention.self.key.bias")
        v_b = v(p + "attention.self.value.bias")
        params[f"layer_{i}"] = {
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
    return params


def load_into_params(params, checkpoint_dir: str, plm_prefix: str):
    """Replace the PLM subtree at ``plm_prefix`` (slash path) in ``params``."""
    import jax

    keys = [k for k in plm_prefix.split("/") if k]
    sub = params
    for k in keys:
        sub = sub[k]
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
