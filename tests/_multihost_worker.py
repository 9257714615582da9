"""Multi-process worker: N train steps of the real miner_tpu stack.

Run as ``python tests/_multihost_worker.py <proc_id> <n_procs> <port>
<fixture_dir> <out.npz>``. With n_procs > 1 it joins a ``jax.distributed``
cluster of CPU processes (4 virtual devices each); with n_procs == 1 it is
the single-process reference over the same total device count. Every process
computes the same global host batches (the samplers are pure functions of
(seed, epoch)) and contributes only its own rows via
``parallel.sharding.shard_batch``; final params are written to ``out.npz``
for bitwise comparison by tests/test_multihost.py.
"""
import itertools
import os
import sys


def run(fixture_dir: str, out_path: str, steps: int = 3,
        mesh_model: int = 1):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from miner_tpu.config import make_parser
    from miner_tpu.data.batcher import Batcher
    from miner_tpu.data.behaviors import BehaviorsLog
    from miner_tpu.parallel.sharding import replicate_tree, shard_batch
    from miner_tpu.training.optim import make_optimizer
    from miner_tpu.training.train_state import TrainState
    from miner_tpu.training.trainer import Trainer

    argv = [
        "train",
        "--model_name", "Miner",
        "--pretrained_tokenizer", "hash:1000",
        "--user2id_path", os.path.join(fixture_dir, "user2id.json"),
        "--category2id_path", os.path.join(fixture_dir, "category2id.json"),
        "--train_behaviors_path", os.path.join(fixture_dir, "behaviors.tsv"),
        "--train_news_path", os.path.join(fixture_dir, "news.tsv"),
        "--max_title_length", "16",
        "--max_sapo_length", "24",
        "--his_length", "5",
        "--seed", "7",
        "--plm_preset", "tiny",
        "--apply_reduce_dim", "--use_sapo", "--use_category_bias",
        "--word_embed_dim", "32",
        "--category_embed_dim", "8",
        "--num_context_codes", "4",
        "--context_code_dim", "16",
        "--npratio", "3",
        "--train_batch_size", "8",
        "--compute_dtype", "float32",
        "--train_path", os.path.join(fixture_dir, "unused"),
    ]
    if mesh_model > 1:
        # tensor parallelism over the PLM: devices differing only in the
        # model coordinate own the SAME batch rows (regression coverage for
        # process_row_range's span dedupe)
        argv += ["--mesh_model", str(mesh_model)]
    args = make_parser().parse_args(argv)
    tr = Trainer(args)
    store = tr._load_store(args.train_news_path)
    tr._num_augs = 0
    log = BehaviorsLog.from_tsv(
        args.train_behaviors_path, store, tr.user2id, args.his_length
    )
    sampler = tr._train_sampler(log, store)
    table = tr._make_table(store)
    model, kind = tr.build_model(store)

    batcher = Batcher(args.train_batch_size, drop_last=True, shuffle=True,
                      seed=args.seed)
    block = sampler.sample_epoch(0)
    example = next(batcher.batches(block))
    example = {k: jnp.asarray(v) for k, v in example.items() if k != "valid"}
    params = tr._init_params_for_kind(model, kind, tr._host_table(store),
                                      example)
    if mesh_model > 1:
        # mirror Trainer.train: Megatron placements BEFORE optimizer init so
        # the Adam moments inherit the shardings; no blanket replication
        from miner_tpu.parallel.tp import shard_params

        params = shard_params(params, tr.mesh)
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=steps,
                        warmup_steps=0)
    state = TrainState.create(params, tx, jax.random.PRNGKey(args.seed + 1))
    if mesh_model == 1:
        state = replicate_tree(tr.mesh, state)
    train_step = tr._make_train_step(model, kind, table)

    step_losses = []
    for batch in itertools.islice(batcher.batches(block, 0), steps):
        dev = shard_batch(tr.mesh, {k: v for k, v in batch.items()
                                    if k != "valid"})
        state, loss = train_step(state, dev)
        step_losses.append(float(jax.device_get(loss)))

    out_params = state.params
    if mesh_model > 1:
        # model-axis-sharded leaves are not fully addressable per process;
        # all-gather them back to replicated before fetching
        from jax.sharding import NamedSharding, PartitionSpec as P

        out_params = jax.jit(
            lambda t: t, out_shardings=NamedSharding(tr.mesh, P())
        )(out_params)
    flat = {
        jax.tree_util.keystr(p): np.asarray(jax.device_get(leaf))
        for p, leaf in jax.tree_util.tree_leaves_with_path(out_params)
    }
    np.savez(out_path, __losses__=np.asarray(step_losses, np.float64), **flat)


def main():
    proc_id, n_procs = int(sys.argv[1]), int(sys.argv[2])
    port, fixture_dir, out_path = sys.argv[3], sys.argv[4], sys.argv[5]
    mesh_model = int(sys.argv[6]) if len(sys.argv) > 6 else 1

    per_proc = 8 // n_procs
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={per_proc}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if n_procs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=n_procs,
            process_id=proc_id,
        )
    assert jax.device_count() == 8, jax.devices()
    run(fixture_dir, out_path, mesh_model=mesh_model)


if __name__ == "__main__":
    main()
