"""Append-only text logging + result-JSON writers.

Mirrors the reference observability surface (SURVEY.md §5): text logs at
`./logs/log/log_<version>.txt` (train_vqa.py:328-338) and EvalAI-format
result JSONs under the ckpt root (train_vqa.py:421-430). Single-controller
JAX: process 0 is the only writer (multi-host safe via process_index).
"""

from __future__ import annotations

import datetime
import json
import os

import jax


def is_writer() -> bool:
    return jax.process_index() == 0


class TextLogger:
    def __init__(self, log_root: str, version: str):
        self.path = os.path.join(log_root, f"log_{version}.txt")
        if is_writer():
            os.makedirs(log_root, exist_ok=True)

    def write(self, msg: str) -> None:
        if not is_writer():
            return
        with open(self.path, "a+") as f:
            f.write(msg.rstrip("\n") + "\n")

    def stamp(self) -> None:
        self.write("nowTime: " + datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"))


def dump_result_json(path: str, result) -> None:
    if not is_writer():
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(result, f)
