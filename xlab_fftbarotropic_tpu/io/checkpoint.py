"""Checkpoint / resume.

New capability (the reference has none — SURVEY.md §6: a run could only be
restarted implicitly from a recorded vort_step_N.bin with no step-offset
plumbing). A checkpoint stores the EXACT spectral state zeta_hat (complex64)
— not the physical field, whose r2c/c2r roundtrip would perturb dealiased
modes — plus the step index and a config hash so restarts are deterministic
and misconfigured restarts fail loudly.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

from ..config import ModelConfig


def save_checkpoint(path, cfg: ModelConfig, zeta_hat, step: int) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path,
             zeta_hat=np.asarray(zeta_hat, dtype=np.complex64),
             step=np.int64(step),
             config_json=np.bytes_(cfg.to_json().encode()),
             config_hash=np.bytes_(cfg.config_hash().encode()))


def load_checkpoint(path, cfg: ModelConfig = None) -> Tuple[np.ndarray, int, ModelConfig]:
    """Returns (zeta_hat, step, saved_cfg). If cfg is given, validates the
    config hash and raises on mismatch."""
    with np.load(Path(path)) as z:
        zeta_hat = z["zeta_hat"]
        step = int(z["step"])
        saved_cfg = ModelConfig.from_json(bytes(z["config_json"]).decode())
    if cfg is not None and cfg.config_hash() != saved_cfg.config_hash():
        raise ValueError(
            f"checkpoint config mismatch: saved {saved_cfg.config_hash()} "
            f"!= current {cfg.config_hash()}")
    return zeta_hat, step, saved_cfg
