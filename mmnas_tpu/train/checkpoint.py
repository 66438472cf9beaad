"""Checkpoint save/load (TPU rebuild of the reference torch.save flow).

The reference saves `{state_dict, net_optim, epoch}` per epoch to
`logs/ckpts/<version>_epoch<N>.pkl` (train_vqa.py:315-321); search adds the
alpha optimizer (search_vqa.py:351-356). The default backend keeps the same
dict shape with pytrees of numpy arrays, serialized with pickle — fully
host-side, device-agnostic (the torch `map_location` remap at
train_vqa.py:243-246 has no TPU analog: arrays re-shard on the next jit).

Opt-in `orbax` backend (`--CKPT_BACKEND orbax`): the same state dict saved
through an `orbax.checkpoint.AsyncCheckpointer` — the device→host copy
happens synchronously but serialization/IO overlaps the next epoch's
compute, which matters at production param sizes. Checkpoints become
directories named `<version>_epoch<N>.orbax`; `load_checkpoint` dispatches
on that suffix, so `--RESUME --CKPT_PATH ...` works unchanged. Engines
gate saves with is_writer(); that stays correct for orbax multi-host
because the state is host-fetched (fully-replicated DP params) before the
writer saves.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict

import jax
import numpy as np

ORBAX_SUFFIX = ".orbax"
_ASYNC_CKPTR = None
_SYNC_CKPTR = None


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _orbax_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until any in-flight async (orbax) save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(path: str, state: Dict) -> None:
    """Save `state` to `path`; the backend is inferred from the suffix
    (`ckpt_path(..., backend=...)` picks it). Pickle saves are atomic via
    tmp+rename; orbax saves are atomic via orbax's own commit protocol and
    return before IO completes (wait_for_saves() to force)."""
    if path.endswith(ORBAX_SUFFIX):
        import orbax.checkpoint as ocp
        ckptr = _orbax_checkpointer()
        ckptr.wait_until_finished()  # one in-flight save at a time
        ckptr.save(os.path.abspath(path), args=ocp.args.StandardSave(
            _to_host(state)), force=True)
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(state), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict:
    if path.endswith(ORBAX_SUFFIX) or path.endswith(ORBAX_SUFFIX + "/"):
        import orbax.checkpoint as ocp
        global _SYNC_CKPTR
        wait_for_saves()
        if _SYNC_CKPTR is None:
            # kept open for the process lifetime: closing a Checkpointer
            # can tear down executors shared with the async saver
            _SYNC_CKPTR = ocp.Checkpointer(ocp.StandardCheckpointHandler())
        return _SYNC_CKPTR.restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return pickle.load(f)


def ckpt_path(ckpt_root: str, version: str, epoch: int,
              backend: str = "pickle") -> str:
    """Reference naming: <root><version>_epoch<N>.pkl (train_vqa.py:321);
    the orbax backend swaps the suffix for a checkpoint directory."""
    ext = ORBAX_SUFFIX if backend == "orbax" else ".pkl"
    return os.path.join(ckpt_root, f"{version}_epoch{epoch}{ext}")
