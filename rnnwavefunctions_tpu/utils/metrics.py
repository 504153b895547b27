"""Training metrics: the reference's published .npy artifact series plus
structured JSONL logs.

The reference appends mean/var energy per step and ``np.save``s the full
series every 10 steps under ``Check_Points/`` with hyperparameter-encoding
filenames (``TrainingRNN_1DTFIM.py:224-227``, ``TrainingRNN_J1J2.py:292-294``),
and prints a summary line every 10 steps (``:213-214``).  ``MetricsSeries``
keeps that artifact contract (meanEnergy_<tag>.npy / varEnergy_<tag>.npy,
loadable for resume — the reference resumes the step counter from
``len(meanEnergy)``, ``TrainingRNN_1DTFIM.py:199``) and adds a
``metrics_<tag>.jsonl`` structured log with wall-clock timing.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Union

import numpy as np

Number = Union[float, complex]


class MetricsSeries:
    def __init__(self, directory: str, tag: str, resume: bool = False,
                 write: bool = True):
        """``write=False`` (multi-host non-primary processes) keeps the
        series in memory but never mutates the on-disk artifacts — the
        primary owns them."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.tag = tag
        self.write = write
        self.mean_energy: List[Number] = []
        self.var_energy: List[float] = []
        self._t0 = time.time()
        self._jsonl_path = os.path.join(self.directory, f"metrics_{tag}.jsonl")
        if resume and os.path.exists(self.mean_path):
            mean = np.load(self.mean_path)
            cast = complex if np.iscomplexobj(mean) else float
            self.mean_energy = [cast(x) for x in mean]
            # np.save is not atomic and the two series flush sequentially:
            # a crash between them can leave var missing or shorter — keep
            # the consistent common prefix instead of failing the resume
            if os.path.exists(self.var_path):
                self.var_energy = [float(x) for x in np.load(self.var_path)]
            n = min(len(self.mean_energy), len(self.var_energy))
            del self.mean_energy[n:]
            del self.var_energy[n:]
        elif not resume and write and os.path.exists(self._jsonl_path):
            try:
                os.remove(self._jsonl_path)
            except FileNotFoundError:
                pass  # raced by another process on a shared filesystem

    @property
    def mean_path(self) -> str:
        return os.path.join(self.directory, f"meanEnergy_{self.tag}.npy")

    @property
    def var_path(self) -> str:
        return os.path.join(self.directory, f"varEnergy_{self.tag}.npy")

    @property
    def step(self) -> int:
        """Resume point, reference-style: number of recorded steps."""
        return len(self.mean_energy)

    def append(self, mean_e: Number, var_e: float) -> None:
        self.mean_energy.append(mean_e)
        self.var_energy.append(var_e)

    def truncate(self, num_steps: int) -> None:
        """Drop entries beyond ``num_steps`` (resume alignment: the restored
        checkpoint's step counter wins over a series that flushed ahead).
        The JSONL log is truncated to match — re-trained steps would
        otherwise append a second, conflicting record per step."""
        del self.mean_energy[num_steps:]
        del self.var_energy[num_steps:]
        if self.write and os.path.exists(self._jsonl_path):
            kept = []
            with open(self._jsonl_path) as f:
                for line in f:
                    try:
                        # entry j <-> step j: step num_steps will be
                        # re-trained, so its old record goes too
                        if json.loads(line)["step"] >= num_steps:
                            break
                    except (ValueError, KeyError):
                        break
                    kept.append(line)
            with open(self._jsonl_path, "w") as f:
                f.writelines(kept)

    def flush_npy(self) -> None:
        if not self.write:
            return
        np.save(self.mean_path, np.asarray(self.mean_energy))
        np.save(self.var_path, np.asarray(self.var_energy))

    def log_jsonl(self, step: int, **extra) -> None:
        if not self.write:
            return
        rec = {
            "step": step,
            "wall_time_s": round(time.time() - self._t0, 3),
            "mean_energy": _jsonable(self.mean_energy[-1]),
            "var_energy": _jsonable(self.var_energy[-1]),
        }
        rec.update({k: _jsonable(v) for k, v in extra.items()})
        with open(self._jsonl_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def print_line(self, step: int, num_samples: int) -> None:
        """The reference's per-10-step console line
        (``TrainingRNN_1DTFIM.py:213-214`` format, minus the blank lines)."""
        print(
            f"mean(E): {self.mean_energy[-1]}, var(E): {self.var_energy[-1]}, "
            f"#samples {num_samples}, #Step {step}"
        )


def _jsonable(v):
    if isinstance(v, (np.generic, np.ndarray)):
        v = v.item()  # np.float32/np.complex64 are not json-serializable
    if isinstance(v, complex):
        return {"re": v.real, "im": v.imag}
    return v
