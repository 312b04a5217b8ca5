"""Checkpoint save/load: orbax sharded checkpoints + the reference's
tracker-file protocol.

Layout mirrors the reference's directory contract (utils.py:158-234):

    <save>/<iteration>/            one orbax checkpoint: params, opt state,
                                   iteration, training rng, dataloader
                                   position (loader_consumed), and — under
                                   --fp16 — the dynamic loss-scaler state
                                   (the TPU analog of utils.py:203-220's
                                   rng-state bundle; the lr schedule is a
                                   pure function of iteration, so it needs
                                   no saved state)
    <save>/latest_checkpointed_iteration.txt

so ``load_latest`` resumes exactly like utils.py:255-380 (including the
``--finetune``-style reset that skips optimizer/rng and zeroes the
iteration).  Sharded arrays restore with their shardings when a mesh is
active; single-host tests round-trip plain numpy.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

TRACKER = "latest_checkpointed_iteration.txt"


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(save_dir: str, iteration: int, state: Dict[str, Any]) -> str:
    """state: pytree (params/opt_state/rng/schedule...).  Returns the path."""
    path = os.path.join(os.path.abspath(save_dir), str(iteration))
    _ckptr().save(path, state, force=True)
    with open(os.path.join(save_dir, TRACKER), "w") as f:
        f.write(str(iteration))
    return path


def get_checkpoint_iteration(load_dir: str) -> Optional[int]:
    tracker = os.path.join(load_dir, TRACKER)
    if not os.path.exists(tracker):
        return None
    with open(tracker) as f:
        txt = f.read().strip()
    if txt == "release":
        return 0
    return int(txt)


def load_checkpoint(path: str, target: Any = None) -> Dict[str, Any]:
    """``target`` (a matching pytree, e.g. a freshly-initialized train
    state) restores exact container types — orbax alone returns plain
    dicts/lists, which breaks optax's NamedTuple states."""
    return _ckptr().restore(os.path.abspath(path), item=target)


def load_latest(load_dir: str, target: Any = None) -> Optional[Dict[str, Any]]:
    it = get_checkpoint_iteration(load_dir)
    if it is None:
        return None
    return load_checkpoint(os.path.join(load_dir, str(it)), target=target)


def maybe_load_orbax(path: str) -> Optional[Dict[str, Any]]:
    """CLI helper: orbax dir (with or without tracker) -> params pytree,
    else None (caller falls back to the torch .pt converter)."""
    if not os.path.isdir(path):
        return None
    state = (
        load_latest(path)
        if os.path.exists(os.path.join(path, TRACKER))
        else load_checkpoint(path)
    )
    if state is None:
        return None
    return state.get("params", state)
