"""Checkpoint save/load (TPU rebuild of the reference torch.save flow).

The reference saves `{state_dict, net_optim, epoch}` per epoch to
`logs/ckpts/<version>_epoch<N>.pkl` (train_vqa.py:315-321); search adds the
alpha optimizer (search_vqa.py:351-356). Here a checkpoint is the same dict
shape with pytrees of numpy arrays, serialized with pickle — fully
host-side, device-agnostic (the torch `map_location` remap at
train_vqa.py:243-246 has no TPU analog: arrays re-shard on the next jit).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(state), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def ckpt_path(ckpt_root: str, version: str, epoch: int) -> str:
    """Reference naming: <root><version>_epoch<N>.pkl (train_vqa.py:321)."""
    return os.path.join(ckpt_root, f"{version}_epoch{epoch}.pkl")
