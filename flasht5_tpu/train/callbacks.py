"""Trainer callbacks: experiment trackers and energy reporting.

The reference wires ClearML + codecarbon into its main driver
(train_flash_t5.py:7-9,96) and wandb into the minipile driver
(examples/minipile/train_fat5_minipile.py:8,89). Here the same surface is a
small callback protocol on the Trainer: every logging/eval/save event fans
out to registered callbacks, and the tracker integrations are import-gated so
the core has no hard dependency on any tracker (none are baked into this
environment).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class TrainerCallback:
    """Base callback; all hooks are optional no-ops."""

    def on_train_begin(self, trainer) -> None: ...

    def on_log(self, trainer, entry: Dict) -> None: ...

    def on_eval(self, trainer, metrics: Dict) -> None: ...

    def on_save(self, trainer, path: str) -> None: ...

    def on_train_end(self, trainer, result: Dict) -> None: ...


class JSONLCallback(TrainerCallback):
    """Structured log file, one JSON object per event."""

    def __init__(self, path: str):
        self.path = path

    def _write(self, kind: str, payload: Dict) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps({"kind": kind, **payload}) + "\n")

    def on_log(self, trainer, entry):
        self._write("train", entry)

    def on_eval(self, trainer, metrics):
        self._write("eval", metrics)

    def on_save(self, trainer, path):
        self._write("checkpoint", {"path": path, "step": trainer.step_num})


class WandbCallback(TrainerCallback):
    """Weights & Biases tracker (reference: train_fat5_minipile.py:8,89).
    Import-gated: constructing it without wandb installed raises ImportError
    with a clear message."""

    def __init__(self, project: str, run_name: Optional[str] = None,
                 config: Optional[Dict] = None):
        try:
            import wandb
        except ImportError as e:
            raise ImportError(
                "WandbCallback requires the `wandb` package") from e
        self._wandb = wandb
        self._run = wandb.init(project=project, name=run_name,
                               config=config or {})

    def on_log(self, trainer, entry):
        self._run.log(entry, step=entry.get("step"))

    def on_eval(self, trainer, metrics):
        self._run.log(metrics)

    def on_train_end(self, trainer, result):
        self._run.finish()


class ClearMLCallback(TrainerCallback):
    """ClearML tracker (reference: train_flash_t5.py:7-9,156)."""

    def __init__(self, project: str, task_name: str):
        try:
            from clearml import Task
        except ImportError as e:
            raise ImportError(
                "ClearMLCallback requires the `clearml` package") from e
        self._task = Task.init(project_name=project, task_name=task_name)
        self._logger = self._task.get_logger()

    def _report(self, series_prefix: str, entry: Dict) -> None:
        step = int(entry.get("step", 0))
        for k, v in entry.items():
            if isinstance(v, (int, float)) and k != "step":
                self._logger.report_scalar(
                    title=series_prefix, series=k, value=float(v),
                    iteration=step)

    def on_log(self, trainer, entry):
        self._report("train", entry)

    def on_eval(self, trainer, metrics):
        self._report("eval", metrics)

    def on_train_end(self, trainer, result):
        self._task.close()


class EnergyCallback(TrainerCallback):
    """Energy/carbon reporting (reference: codecarbon, train_flash_t5.py:96).

    codecarbon is not available in this environment and knows nothing about
    TPUs anyway; this estimates energy as `elapsed_hours x chips x
    watts_per_chip` (v5e ~200W TDP per chip by default) and CO2 via a grid
    intensity factor, appending a summary entry at train end and exposing
    running totals in every log entry under `energy_kwh`.
    """

    def __init__(self, n_chips: int = 1, watts_per_chip: float = 200.0,
                 kg_co2_per_kwh: float = 0.475,
                 out_path: Optional[str] = None):
        self.n_chips = n_chips
        self.watts = watts_per_chip
        self.intensity = kg_co2_per_kwh
        self.out_path = out_path
        self._t0 = None

    def _totals(self) -> Dict:
        hours = (time.perf_counter() - self._t0) / 3600.0 if self._t0 else 0.0
        kwh = hours * self.n_chips * self.watts / 1000.0
        return {"energy_kwh": round(kwh, 6),
                "co2_kg": round(kwh * self.intensity, 6)}

    def on_train_begin(self, trainer):
        self._t0 = time.perf_counter()

    def on_log(self, trainer, entry):
        entry.update(self._totals())

    def on_train_end(self, trainer, result):
        summary = self._totals()
        result["energy"] = summary
        if self.out_path:
            os.makedirs(os.path.dirname(self.out_path) or ".", exist_ok=True)
            with open(self.out_path, "w") as f:
                json.dump(summary, f)
