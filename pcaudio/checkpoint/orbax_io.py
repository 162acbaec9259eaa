"""Orbax checkpoint save/load with reference-schema config sidecars.

The reference saves once at end-of-training: ``torch.save(state_dict)`` plus a
config JSON (``Code/settransformer.py:134-162``), and never resumes.  The
TPU-native framework upgrades this to orbax checkpoints with step-based
save-every-N and resume (SURVEY.md §5 checkpoint/resume), while still writing
the reference-schema ``*_config.json`` sidecar so legacy tooling can read it.
"""
from __future__ import annotations

import json
import os
import warnings
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

from pcaudio.core.config import ExperimentConfig

CONFIG_FILE = "reference_config.json"


def save_checkpoint(
    directory: str,
    params: Any,
    config: Optional[ExperimentConfig] = None,
    *,
    step: int = 0,
    opt_state: Any = None,
) -> str:
    """Save params (and optionally optimizer state) under
    ``directory/step_<N>``; writes the reference-schema config sidecar."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}")
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    if os.path.exists(path):
        # make destructive overwrites visible (rerunning training into an
        # existing out_dir replaces prior checkpoints at colliding steps)
        warnings.warn(f"overwriting existing checkpoint at {path}")
    with ocp.StandardCheckpointer() as ckptr:
        # force=True: saving the same step twice overwrites (the end-of-train
        # save collides with the periodic save whenever epochs % N == 0)
        ckptr.save(path, tree, force=True)
    if config is not None:
        with open(os.path.join(directory, CONFIG_FILE), "w") as f:
            json.dump(config.to_reference_json(), f)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(d[len("step_"):]) for d in os.listdir(directory)
             if d.startswith("step_") and d[len("step_"):].isdigit()]
    return max(steps) if steps else None


def load_checkpoint(
    directory: str, step: Optional[int] = None
) -> Tuple[Any, Optional[ExperimentConfig], int]:
    """Restore ``(tree, config, step)`` — ``tree`` has ``params`` (+ optional
    ``opt_state``).  ``step=None`` loads the latest."""
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(directory, f"step_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    cfg_path = os.path.join(directory, CONFIG_FILE)
    config = (ExperimentConfig.from_reference_json(cfg_path)
              if os.path.exists(cfg_path) else None)
    return tree, config, step
