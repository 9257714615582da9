"""Tensor + expert parallelism for the model weights (GSPMD sharding).

No reference counterpart (the reference is single-GPU; SURVEY §2.6#5 lists
TP over the PLM as the stretch strategy for this workload). The design is
pure GSPMD: parameters get ``NamedSharding`` placements over the mesh's
``model`` axis —

  * ``qkv`` / ``ffn_in`` kernels column-parallel  (D, F) -> P(None, 'model');
  * ``out`` / ``ffn_out`` kernels row-parallel    (F, D) -> P('model', None);
  * matching biases shard on their only dim;
  * the MoE adaptor's stacked expert weights shard on the expert dim
    (expert parallelism for UniSRec's dense mixture);
  * everything else replicates —

and XLA's SPMD partitioner derives the activation layouts and inserts the
all-reduces (the scaling-book recipe: annotate placements, let the compiler
place collectives). Works under ``--scan_layers`` too (stacked leaves get a
leading replicated layer axis). Correctness is CI-tested on the virtual
8-device mesh (tests/test_tp.py); fused Pallas kernels are data-parallel
only and stay off when model > 1 (trainer._use_fused).
"""
from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miner_tpu.parallel.mesh import MODEL_AXIS

# (path regex, spec over the leaf's trailing dims)
_RULES = [
    (re.compile(r"(qkv|ffn_in)/kernel$"), (None, MODEL_AXIS)),
    (re.compile(r"(qkv|ffn_in)/bias$"), (MODEL_AXIS,)),
    (re.compile(r"(attention/out|ffn_out)/kernel$"), (MODEL_AXIS, None)),
    # Expert parallelism for the MoE adaptor (models/news_encoder.py
    # _PWExperts): the stacked (E, D_in, D_out) expert weights shard on the
    # expert dim — each device runs its local experts, and XLA reduces the
    # gated "be,beo->bo" mixture over the model axis. The mixture is dense
    # (every expert sees every token, reference: src/model/news_encoder.py:
    # 135-166), so EP here is a weight/compute split, not a routed dispatch.
    (re.compile(r"experts/kernel$"), (MODEL_AXIS, None, None)),
    (re.compile(r"experts/bias$"), (MODEL_AXIS, None)),
]


def tp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings implementing the rules above.

    Leaves with more dims than a rule's spec (scan-stacked layers) get the
    spec right-aligned with leading replicated axes. Dimensions that do not
    divide the model-axis size fall back to replication (correct, just not
    sharded).
    """
    n_model = mesh.shape[MODEL_AXIS]

    def one(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        for rule, spec in _RULES:
            if rule.search(name):
                full = (None,) * (leaf.ndim - len(spec)) + tuple(spec)
                ok = all(
                    s is None or leaf.shape[i] % n_model == 0
                    for i, s in enumerate(full)
                )
                if ok:
                    return NamedSharding(mesh, P(*full))
                break
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place parameters per ``tp_param_shardings`` (multi-process safe)."""
    shardings = tp_param_shardings(params, mesh)
    if jax.process_count() > 1:
        import numpy as np

        return jax.tree_util.tree_map(
            lambda x, s: jax.make_array_from_callback(
                x.shape, s, lambda idx: np.asarray(x)[idx]
            ),
            params, shardings,
        )
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
