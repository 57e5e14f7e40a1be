"""Run orchestration: the time loop of main.cpp / main-shallow-water.cpp.

TPU-native structure: the reference executes 20 serial FFTs per step in one
thread with per-step printf; here the hot path is a single jitted lax.scan
over `record_step` RK4 steps (no host round-trips between record points).
Host work happens only at segment boundaries: field records, manifest lines,
per-step scalars, checkpoints, and forcing updates.

Forcing interaction (SURVEY.md §3.2): the reference reads the source stream
once per step BEFORE the RK backup (main-shallow-water.cpp:304). FIFO mode
therefore steps one step at a time (each step is still one jitted call; the
blocking 1-byte flag read is overlapped with the device step by dispatching
the step before the next protocol read is consumed). EMPTY/SCRIPT modes use
full-segment scans, with SCRIPT splitting segments at recipe times.
"""

from __future__ import annotations

import dataclasses
import sys
import time as _time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .forcing.source import SourceReader, make_reader
from .io.checkpoint import load_checkpoint, save_checkpoint
from .io.fieldio import FieldRecorder, Manifest, read_field
from .models.barotropic import BarotropicModel


@dataclasses.dataclass
class RunResult:
    zeta_hat: jax.Array
    steps_run: int
    wall_time: float
    stats_history: list


def run(cfg: ModelConfig,
        vort0: Optional[np.ndarray] = None,
        recipe: str = "empty",
        src_path=None,
        record: bool = True,
        manifest_path: str = "log",
        progress: bool = False,
        resume_from=None,
        model: Optional[BarotropicModel] = None,
        collect_stats: bool = True) -> RunResult:
    """Integrate cfg.total_steps of the barotropic model.

    vort0: physical initial vorticity; if None, read from
    cfg.input_dir/cfg.init_file exactly like main.cpp:143-144.
    """
    model = model or BarotropicModel.build(cfg)

    start_step = 0
    if resume_from is not None:
        zeta_np, start_step, _ = load_checkpoint(resume_from, cfg)
        zeta_hat = jnp.asarray(zeta_np)
    else:
        if vort0 is None:
            vort0 = read_field(Path(cfg.input_dir) / cfg.init_file,
                               cfg.grid_shape)
        zeta_hat = model.init_state(vort0)

    src_np = np.zeros(cfg.grid_shape, dtype=np.float32)
    src = jnp.asarray(src_np)
    reader: SourceReader = make_reader(cfg, recipe, src_path)

    manifest = Manifest(manifest_path) if record else None
    recorder = FieldRecorder(cfg.output_dir, manifest) if record else None

    stats_history = []
    t0 = _time.perf_counter()
    step = start_step

    def do_record(step, zeta_hat, src_np):
        d = model.diags(zeta_hat)
        recorder.record(step,
                        vort_src=src_np,
                        vort=np.asarray(d.vort),
                        psi=np.asarray(d.psi),
                        u=np.asarray(d.u),
                        v=np.asarray(d.v))

    def note_stats(step, zeta_hat):
        if collect_stats:
            s = model.stats(zeta_hat)
            stats_history.append(
                dict(step=step,
                     max_abs_vort=float(s.max_abs_vort),
                     energy=float(s.energy),
                     enstrophy=float(s.enstrophy),
                     cfl=float(s.cfl)))

    per_step = recipe == "fifo"
    while step < cfg.total_steps:
        if record and step % cfg.record_step == 0:
            do_record(step, zeta_hat, src_np)
            note_stats(step, zeta_hat)
            if progress:
                print(f"# Step {step}, time = {step * cfg.dt:.2f}, "
                      f"record now!", file=sys.stderr)
        if cfg.checkpoint_step and step % cfg.checkpoint_step == 0 and \
                step > start_step:
            save_checkpoint(Path(cfg.output_dir) / f"ckpt_step_{step}.npz",
                            cfg, np.asarray(zeta_hat), step)

        if per_step:
            # main-shallow-water.cpp:304 — source read precedes the step.
            changed, field = reader.read(step * cfg.dt)
            if changed:
                src_np = np.asarray(field, dtype=np.float32)
                src = jnp.asarray(src_np)
            zeta_hat = model.step(zeta_hat, src)
            step += 1
        else:
            # run to the next record/checkpoint/recipe boundary in one scan
            boundaries = [cfg.total_steps,
                          ((step // cfg.record_step) + 1) * cfg.record_step]
            if cfg.checkpoint_step:
                boundaries.append(
                    ((step // cfg.checkpoint_step) + 1) * cfg.checkpoint_step)
            if recipe == "script":
                changed, field = reader.read(step * cfg.dt)
                if changed:
                    src_np = np.asarray(field, dtype=np.float32)
                    src = jnp.asarray(src_np)
                nxt = _next_recipe_step(reader, cfg, step)
                if nxt is not None:
                    boundaries.append(nxt)
            n = max(1, min(boundaries) - step)
            zeta_hat = model.segment(zeta_hat, src, n)
            step += n

    zeta_hat.block_until_ready()
    wall = _time.perf_counter() - t0
    if manifest is not None:
        manifest.close()
    reader.close()
    return RunResult(zeta_hat=zeta_hat, steps_run=step - start_step,
                     wall_time=wall, stats_history=stats_history)


def _next_recipe_step(reader, cfg, step):
    """First future step at which a SCRIPT recipe fires, or None."""
    if not hasattr(reader, "recipes") or reader._next >= len(reader.recipes):
        return None
    t_next = reader.recipes[reader._next][0]
    import math
    return max(step + 1, int(math.ceil(t_next / cfg.dt)))
