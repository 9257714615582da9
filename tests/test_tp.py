"""Tensor parallelism (parallel/tp.py): a full training run with PLM weights
sharded over the model axis must produce the same parameters as the pure
data-parallel run — GSPMD resharding changes layouts and collectives, never
math. Also asserts the weights really are model-sharded (not silently
replicated)."""
import numpy as np
import pytest

import jax

from miner_tpu.parallel.mesh import MODEL_AXIS
from tests.fixture_data import make_fixture
from tests.test_e2e import _train_args


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    return make_fixture(str(tmp_path_factory.mktemp("mind_tp")), num_lines=40)


def _train(fixture_dir, out_dir, mesh_model):
    from miner_tpu.training.trainer import Trainer

    args = _train_args(fixture_dir, out_dir)
    args.num_train_epochs = 1
    args.mesh_model = mesh_model
    args.mesh_data = 8 // mesh_model
    return Trainer(args).train()


def test_tp_matches_data_parallel(fixture_dir, tmp_path):
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    state_dp = _train(fixture_dir, str(tmp_path / "dp"), mesh_model=1)
    state_tp = _train(fixture_dir, str(tmp_path / "tp"), mesh_model=4)
    assert int(state_tp.step) == int(state_dp.step)

    sharded = 0
    for (path, tl), (_, dl) in zip(
        jax.tree_util.tree_leaves_with_path(state_tp.params),
        jax.tree_util.tree_leaves_with_path(state_dp.params),
    ):
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(tl), np.asarray(dl), rtol=1e-4, atol=1e-5,
            err_msg=f"{name}: TP != DP",
        )
        spec = tl.sharding.spec if hasattr(tl.sharding, "spec") else ()
        if any(s == MODEL_AXIS for s in spec):
            sharded += 1
    # qkv/out/ffn kernels (+ shardable biases) across the PLM layers
    assert sharded >= 8, f"only {sharded} leaves are model-sharded"


def test_ep_unisrec_matches_data_parallel(fixture_dir, tmp_path):
    """Expert parallelism: UniSRec's MoE adaptor trained with the expert
    stack sharded over the model axis must equal the data-parallel run, and
    the expert weights must actually be sharded."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")

    def _train_unisrec(out_dir, mesh_model):
        from miner_tpu.training.trainer import Trainer

        args = _train_args(fixture_dir, out_dir)
        args.model_name = "unisrec"
        args.combine_type = "pre-concat"
        args.num_train_epochs = 1
        args.mesh_model = mesh_model
        args.mesh_data = 8 // mesh_model
        return Trainer(args).train()

    state_dp = _train_unisrec(str(tmp_path / "dp"), mesh_model=1)
    state_ep = _train_unisrec(str(tmp_path / "ep"), mesh_model=4)

    expert_sharded = 0
    for (path, tl), (_, dl) in zip(
        jax.tree_util.tree_leaves_with_path(state_ep.params),
        jax.tree_util.tree_leaves_with_path(state_dp.params),
    ):
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(tl), np.asarray(dl), rtol=1e-4, atol=1e-5,
            err_msg=f"{name}: EP != DP",
        )
        spec = tl.sharding.spec if hasattr(tl.sharding, "spec") else ()
        if "experts" in name and any(s == MODEL_AXIS for s in spec):
            expert_sharded += 1
    # experts/kernel (E, D_in, D_out) and experts/bias (E, D_in)
    assert expert_sharded >= 2, (
        f"only {expert_sharded} expert leaves are model-sharded")


def test_tp_shardings_rules():
    """Rule unit test: kernels shard on the right axes, odd shapes fall
    back to replication."""
    import jax.numpy as jnp

    from miner_tpu.parallel.mesh import MeshConfig, make_mesh
    from miner_tpu.parallel.tp import tp_param_shardings

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(MeshConfig(data=2, table=1, model=4))
    params = {
        "plm": {
            "layer_0": {
                "attention": {
                    "qkv": {"kernel": jnp.zeros((64, 192)),
                            "bias": jnp.zeros((192,))},
                    "out": {"kernel": jnp.zeros((64, 64)),
                            "bias": jnp.zeros((64,))},
                },
                "ffn_in": {"kernel": jnp.zeros((64, 128)),
                           "bias": jnp.zeros((128,))},
                "ffn_out": {"kernel": jnp.zeros((128, 64))},
            },
            # scan layout: stacked leaves get a leading replicated axis
            "layers": {"layer": {"ffn_in": {"kernel": jnp.zeros((2, 64, 128))}}},
        },
        "head": {"kernel": jnp.zeros((64, 3))},  # no rule -> replicated
        "odd": {"qkv": {"kernel": jnp.zeros((64, 50))}},  # 50 % 4 -> replicated
    }
    from jax.sharding import PartitionSpec as P

    sh = tp_param_shardings(params, mesh)
    l0 = sh["plm"]["layer_0"]
    assert l0["attention"]["qkv"]["kernel"].spec == P(None, MODEL_AXIS)
    assert l0["attention"]["qkv"]["bias"].spec == P(MODEL_AXIS)
    assert l0["attention"]["out"]["kernel"].spec == P(MODEL_AXIS, None)
    assert l0["attention"]["out"]["bias"].spec == P()
    assert l0["ffn_in"]["kernel"].spec == P(None, MODEL_AXIS)
    assert l0["ffn_out"]["kernel"].spec == P(MODEL_AXIS, None)
    assert sh["plm"]["layers"]["layer"]["ffn_in"]["kernel"].spec == \
        P(None, None, MODEL_AXIS)
    assert sh["head"]["kernel"].spec == P()
    assert sh["odd"]["qkv"]["kernel"].spec == P()

    moe = {
        "experts": {"kernel": jnp.zeros((8, 64, 32)),
                    "bias": jnp.zeros((8, 64))},
        "w_gate": jnp.zeros((64, 8)),
        # 6 experts % 4 devices -> replicated fallback
        "odd_experts": {"experts": {"kernel": jnp.zeros((6, 64, 32))}},
    }
    sh = tp_param_shardings(moe, mesh)
    assert sh["experts"]["kernel"].spec == P(MODEL_AXIS, None, None)
    assert sh["experts"]["bias"].spec == P(MODEL_AXIS, None)
    assert sh["w_gate"].spec == P()
    assert sh["odd_experts"]["experts"]["kernel"].spec == P()
