"""Step checkpoints for resume (.ok-equivalents).

The reference drops pickled ``.ok`` files after every major step
(reference small_tools.py:40-70, usage map in __main__.py:346-487). Here a
checkpoint is a JSON manifest keyed by a parameter digest, with numpy
payloads in a sibling ``.npz`` — so resume also invalidates when the
parameters that produced a step changed, not only when the file exists.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

import numpy as np


def _digest(params: dict | None) -> str:
    if not params:
        return "-"
    blob = json.dumps(params, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


class Checkpoint:
    def __init__(self, tmpdir: str):
        self.tmpdir = tmpdir
        os.makedirs(tmpdir, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        base = os.path.join(self.tmpdir, name.replace("/", "_"))
        return base + ".ok.json", base + ".ok.npz"

    def has(self, name: str, params: dict | None = None) -> bool:
        meta_path, _ = self._paths(name)
        if not os.path.exists(meta_path):
            return False
        try:
            with open(meta_path) as f:
                meta = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        return meta.get("digest") == _digest(params)

    def load(self, name: str) -> dict[str, Any]:
        meta_path, npz_path = self._paths(name)
        with open(meta_path) as f:
            meta = json.load(f)
        payload = dict(meta.get("payload", {}))
        if os.path.exists(npz_path):
            with np.load(npz_path, allow_pickle=False) as data:
                for key in data.files:
                    payload[key] = data[key]
        return payload

    def save(self, name: str, params: dict | None = None, **payload) -> None:
        meta_path, npz_path = self._paths(name)
        arrays = {k: v for k, v in payload.items() if isinstance(v, np.ndarray)}
        scalars = {k: v for k, v in payload.items() if not isinstance(v, np.ndarray)}
        if arrays:
            np.savez(npz_path, **arrays)
        elif os.path.exists(npz_path):
            os.remove(npz_path)
        with open(meta_path, "w") as f:
            json.dump({"digest": _digest(params), "payload": scalars}, f)

    def clear(self, name: str) -> None:
        for p in self._paths(name):
            if os.path.exists(p):
                os.remove(p)
