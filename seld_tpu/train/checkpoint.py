"""Checkpoint save/restore (orbax).

Unlike the reference (HDF5 weights with include_optimizer=False,
train.py:377-380 — optimizer state lost on resume), a checkpoint here is the
complete functional state: params, batch stats, optimizer slots, RNG key,
step counter, SWA average, and best score. Filenames encode the metric like
the reference (`bestscore_<score>`), and `keep_best_only` reproduces its
delete-previous-best behavior (train.py:372-376).
"""
from __future__ import annotations

import glob
import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp

from seld_tpu.train.train_state import TrainState, SWAState


def _to_saveable(state: TrainState, swa: Optional[SWAState]) -> Dict[str, Any]:
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": state.rng,
    }
    if swa is not None:
        tree["swa"] = {"avg_params": swa.avg_params, "count": swa.count,
                       "avg_batch_stats": swa.avg_batch_stats}
    return tree


def save_checkpoint(directory: str, name: str, state: TrainState,
                    swa: Optional[SWAState] = None,
                    extra: Optional[Dict[str, Any]] = None,
                    keep_best_only: bool = False) -> str:
    """Save state under `<directory>/<name>`; returns the path."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.abspath(os.path.join(directory, name))
    if keep_best_only:
        for old in glob.glob(os.path.join(directory, "bestscore_*")):
            # exact-path match, not startswith: 'bestscore_0.41' must still
            # delete an older 'bestscore_0.4123'
            if os.path.abspath(old) in (path, path + ".meta.json"):
                continue
            if os.path.isdir(old):
                shutil.rmtree(old, ignore_errors=True)
            else:  # orphaned .meta.json sidecars
                os.remove(old)
    if os.path.exists(path):
        shutil.rmtree(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, _to_saveable(state, swa))
    if extra:
        with open(path + ".meta.json", "w") as f:
            json.dump(extra, f)
    return path


def restore_checkpoint(path: str, state: TrainState,
                       swa: Optional[SWAState] = None):
    """Restore into templates; returns (state, swa, extra)."""
    ckpt = ocp.PyTreeCheckpointer()
    template = _to_saveable(state, swa)
    # a checkpoint saved without SWA must restore into an SWA-bearing
    # template gracefully (orbax raises on tree-structure mismatch)
    if swa is not None:
        try:
            on_disk = list(ckpt.metadata(path).item_metadata.keys())
        except Exception:
            on_disk = None
        if on_disk is not None and "swa" not in on_disk:
            template = _to_saveable(state, None)
    # restore_args carry the template's shardings so checkpoints move across
    # topologies (e.g. saved on an 8-chip mesh, restored single-chip)
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    restored = ckpt.restore(path, item=template, restore_args=restore_args)
    new_state = state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        rng=restored["rng"],
    )
    new_swa = None
    if swa is not None and "swa" in restored:
        new_swa = SWAState(avg_params=restored["swa"]["avg_params"],
                           count=restored["swa"]["count"],
                           avg_batch_stats=restored["swa"].get(
                               "avg_batch_stats"))
    extra = None
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            extra = json.load(f)
    return new_state, new_swa, extra


def load_variables(path: str, template_variables: Dict[str, Any]
                   ) -> Dict[str, Any]:
    """Restore only model variables (params [+ batch_stats]) from a checkpoint.

    For inference tooling that has no optimizer state (evaluator.py:53-58's
    weights-only load). `template_variables` comes from `model.init`.
    """
    ckpt = ocp.PyTreeCheckpointer()
    item = {"params": template_variables["params"]}
    if template_variables.get("batch_stats") is not None:
        item["batch_stats"] = template_variables["batch_stats"]
    restore_args = ocp.checkpoint_utils.construct_restore_args(item)
    restored = ckpt.restore(path, item=item, restore_args=restore_args,
                            partial_restore=True)
    out = {"params": restored["params"]}
    if "batch_stats" in item:
        out["batch_stats"] = restored["batch_stats"]
    return out


def latest_best(directory: str) -> Optional[str]:
    """Find the best-score checkpoint dir (lowest score in the name)."""
    candidates = [p for p in glob.glob(os.path.join(directory, "bestscore_*"))
                  if os.path.isdir(p)]
    if not candidates:
        return None

    def score(p):
        m = re.search(r"bestscore_([0-9]+(?:\.[0-9]+)?)", os.path.basename(p))
        return float(m.group(1)) if m else np.inf

    return os.path.abspath(min(candidates, key=score))  # orbax needs absolute
