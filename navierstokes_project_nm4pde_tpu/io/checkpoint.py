"""Checkpoint / resume of the (u, p, t, step) state.

A new capability: the reference has none -- its VTU outputs are
visualization-only and cannot restart a run (SURVEY.md section 5).  Plain
`.npz` keeps the dependency surface minimal and is exact for restart
purposes; orbax can be layered on for async multi-host checkpointing later.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from navierstokes_project_nm4pde_tpu.models.base import State


def save_checkpoint(path: str, state: State, meta: dict | None = None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {
        "u": np.asarray(jax.device_get(state.u)),
        "p": np.asarray(jax.device_get(state.p)),
        "t": np.asarray(jax.device_get(state.t)),
        "step": np.asarray(jax.device_get(state.step)),
    }
    for name in ("u_prev", "p_prev", "u_prev2", "p_prev2", "conv_prev", "fpool", "spool", "fwpool"):
        val = getattr(state, name)
        if val is not None:
            arrays[name] = np.asarray(jax.device_get(val))
    if meta:
        for k, v in meta.items():
            arrays[f"meta_{k}"] = np.asarray(v)
    np.savez(path, **arrays)


def save_checkpoint_orbax(path: str, state: State):
    """Orbax backend (async/multi-host-capable); optional dependency."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        {
            "u": state.u,
            "p": state.p,
            "t": state.t,
            "step": state.step,
            **{
                name: getattr(state, name)
                for name in ("u_prev", "p_prev", "u_prev2", "p_prev2", "conv_prev", "fpool", "spool", "fwpool")
                if getattr(state, name) is not None
            },
        },
        force=True,
    )
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str) -> State:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    return State(
        u=tree["u"],
        p=tree["p"],
        t=tree["t"],
        step=tree["step"],
        u_prev=tree.get("u_prev"),
        p_prev=tree.get("p_prev"),
        u_prev2=tree.get("u_prev2"),
        p_prev2=tree.get("p_prev2"),
        conv_prev=tree.get("conv_prev"),
        fpool=tree.get("fpool"),
        spool=tree.get("spool"),
        fwpool=tree.get("fwpool"),
    )


def load_checkpoint(path: str, dtype=jnp.float32) -> State:
    with np.load(path) as z:
        return State(
            u=jnp.asarray(z["u"], dtype=dtype),
            p=jnp.asarray(z["p"], dtype=dtype),
            t=jnp.asarray(z["t"], dtype=dtype),
            step=jnp.asarray(z["step"], dtype=jnp.int32),
            **{
                name: jnp.asarray(z[name], dtype=dtype)
                if name in z
                else None
                for name in ("u_prev", "p_prev", "u_prev2", "p_prev2", "conv_prev", "fpool", "spool", "fwpool")
            },
        )
