"""Capture a jax.profiler trace of the Miner train step and print device
time aggregated by (opcode, output shape).

The tensorboard_plugin_profile converter is incompatible with the installed
TF/protobuf, so the *.xplane.pb is parsed directly
(tensorflow.tsl.profiler.protobuf.xplane_pb2) and the "XLA Ops" line of the
TPU device plane is aggregated.

Usage: python tools/profile_step.py [outdir] [--analyze-only]
"""
from __future__ import annotations

import glob
import re
import sys
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def build_step(B=16, rbg=True, gelu=True, remat=True):
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
                         dtype=jnp.bfloat16, remat=remat, use_fused=True,
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


def analyze(outdir: str, top: int = 25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = {k: v.name for k, v in plane.event_metadata.items()}
        agg = defaultdict(float)
        total = 0.0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                m = re.match(r"%?([a-zA-Z_\-]+)[\d.]* = \(?([a-z0-9]+\[[^\]]*\])",
                             name)
                key = f"{m.group(1)} {m.group(2)}" if m else name[:40]
                agg[key] += ev.duration_ps
                total += ev.duration_ps
        rows = sorted(agg.items(), key=lambda kv: -kv[1])
        print(f"device {plane.name}: total {total / 1e9:.1f} ms")
        csum = 0.0
        for name, ps in rows[:top]:
            csum += ps
            print(f"{ps / total * 100:6.2f}% (cum {csum / total * 100:5.1f}%)"
                  f"  {name[:90]}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    outdir = args[0] if args else "/tmp/jax_trace"
    B = 16
    for a in sys.argv[1:]:
        if a.startswith("--B="):
            B = int(a.split("=")[1])
    remat = "--no-remat" not in sys.argv
    if "--analyze-only" not in sys.argv:
        train_step, state, batch, label = build_step(B=B, remat=remat)
        state, loss = train_step(state, batch, label)
        float(loss)
        jax.profiler.start_trace(outdir)
        for _ in range(3):
            state, loss = train_step(state, batch, label)
        float(loss)
        jax.profiler.stop_trace()
    analyze(outdir)


if __name__ == "__main__":
    main()
