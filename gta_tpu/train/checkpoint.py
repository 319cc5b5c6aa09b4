"""Orbax checkpointing with the reference's {rolling, backup, best} triple.

Layout under <out_dir>/ckpts/:
  latest/   rolling checkpoint (reference model.pt, train.py:307-308)
  step_N/   iteration-stamped backups (model_<it>.pt, train.py:312-313)
  best/     best-validation-metric model (model_best.pt, train.py:338)

Each checkpoint stores {state: TrainState pytree, scalars: python dict}
(epoch_it / it / t / loss_val_best — reference train.py:301-305). Restores
are shape/dtype-checked against a template state. Multi-host safe: orbax
coordinates across processes; scalars ride in a separate msgpack-free
JSON file written by process 0.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, out_dir: str):
        self.root = os.path.abspath(os.path.join(out_dir, "ckpts"))
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def save(self, name: str, state, scalars: Optional[Dict[str, Any]] = None):
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        if scalars is not None and jax.process_index() == 0:
            with open(os.path.join(path, "scalars.json"), "w") as f:
                json.dump(scalars, f)

    def restore(self, name: str, template) -> Tuple[Any, Dict[str, Any]]:
        path = self._path(name)
        state = self._ckptr.restore(path, template)
        scalars = {}
        sp = os.path.join(path, "scalars.json")
        if os.path.exists(sp):
            with open(sp) as f:
                scalars = json.load(f)
        return state, scalars

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def try_restore_latest(self, template, max_it: Optional[int] = None):
        """Auto-resume: prefer the final backup, else the rolling checkpoint
        (reference train.py:221-235)."""
        if max_it is not None and self.exists(f"step_{max_it}"):
            return self.restore(f"step_{max_it}", template)
        if self.exists("latest"):
            return self.restore("latest", template)
        return None, {}
