"""Shared tool preamble for the axon environment.

The axon sitecustomize force-registers the TPU backend and overrides
``jax_platforms`` programmatically, so an env var alone is not honored;
worse, the first backend query initializes the (slow, occasionally wedged)
remote TPU tunnel even for pure-host work.  Call :func:`honor_env_platform`
BEFORE anything queries a backend (orbax checkpointers call
``jax.default_backend()`` on construction).
"""
from __future__ import annotations

import os


def honor_env_platform() -> None:
    """Make an explicit ``JAX_PLATFORMS`` env var win over the sitecustomize
    platform override.  No-op (axon default) when the var is unset.

    Canonical home for this workaround (used by tools/, bench.py,
    __graft_entry__.py); ``miner_tpu/cli.py`` keeps its own inline copy
    deliberately — the installable package must not import from tools/."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
