"""Capture a jax.profiler trace of the Miner train step and print the top
HLO ops by self time (via tensorboard_plugin_profile's xplane converter)."""
from __future__ import annotations

import glob
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def build_step(B=16, rbg=True, gelu=True):
    if rbg:
        jax.config.update("jax_default_prng_impl", "rbg")
    from __graft_entry__ import _build_miner, _synthetic_batch
    from miner_tpu.training import losses
    from miner_tpu.training.optim import make_optimizer
    from miner_tpu.training.train_state import TrainState

    C, H, Lt, Ls = 5, 50, 32, 128
    vocab, n_cat = 30522, 32
    rng = np.random.default_rng(0)
    model = _build_miner(plm_preset="roberta_base", vocab=vocab, n_cat=n_cat,
                         dtype=jnp.bfloat16, remat=True, use_fused=True,
                         gelu_approx=gelu)
    batch = _synthetic_batch(rng, B, C, H, Lt, Ls, vocab, n_cat)
    label = jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, size=B)])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch
    )["params"]
    tx = make_optimizer(params, learning_rate=2e-5, total_steps=1000,
                        warmup_steps=100)
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))

    @jax.jit
    def train_step(state, batch, label):
        rngs = {"dropout": jax.random.fold_in(state.rng, state.step)}

        def loss_fn(p):
            interests, logits = model.apply(
                {"params": p}, batch, deterministic=False, rngs=rngs)
            return losses.miner_loss(interests, logits, label)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return train_step, state, batch, label


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    train_step, state, batch, label = build_step()
    state, loss = train_step(state, batch, label)
    float(loss)
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        state, loss = train_step(state, batch, label)
    float(loss)
    jax.profiler.stop_trace()

    xplanes = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, file=sys.stderr)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "op_profile", {})
    prof = json.loads(data)

    def walk(node, depth=0, out=None):
        out.append((node.get("name"),
                    node.get("metrics", {}).get("time", 0.0),
                    node.get("metrics", {}).get("flops", 0.0)))
        for ch in node.get("children", []):
            walk(ch, depth + 1, out)
        return out

    by_cat = prof.get("byCategory", prof)
    rows = []
    for ch in by_cat.get("children", []):
        t = ch.get("metrics", {}).get("time", 0.0)
        rows.append((ch.get("name"), t, len(ch.get("children", []))))
    rows.sort(key=lambda r: -r[1])
    print("== top categories (fraction of total time) ==")
    for name, t, n in rows[:15]:
        print(f"{t:8.4f}  {name}  ({n} subnodes)")
    # also dump the deepest two levels for the top categories
    print("== top ops within top categories ==")
    for ch in sorted(by_cat.get("children", []),
                     key=lambda c: -c.get("metrics", {}).get("time", 0))[:6]:
        for op in sorted(ch.get("children", []),
                         key=lambda c: -c.get("metrics", {}).get("time", 0))[:4]:
            m = op.get("metrics", {})
            print(f"{m.get('time', 0):8.4f}  {ch['name']} / {op.get('name')}")


if __name__ == "__main__":
    main()
