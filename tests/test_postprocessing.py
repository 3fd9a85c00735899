"""Headless figure-regeneration smoke tests (VERDICT r04 item 7).

A fresh clone must be able to render the paper figures without first
re-running the TPU experiments: the plot scripts fall back to the
committed ``experiments/SUMMARY_*.json`` aggregates (and the small
committed npz artifacts).  These tests run two representative scripts
end-to-end under the Agg backend.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    env = dict(os.environ)
    env.setdefault("MPLBACKEND", "Agg")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "postprocessing", script), *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )


@pytest.mark.slow
def test_benes_errs_plot_renders_from_summary():
    r = _run(
        "plot_benes_bernoulli_errs_and_times.py",
        "--Ns", "3", "5", "8", "11", "15",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "saved" in r.stdout
    assert os.path.exists(os.path.join(
        REPO, "postprocessing", "figures",
        "benes_bernoulli_errs_and_times_raw.png",
    ))


@pytest.mark.slow
def test_convergence_plot_renders_from_summary():
    r = _run("plot_convergence.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "saved" in r.stdout
    assert os.path.exists(os.path.join(
        REPO, "postprocessing", "figures", "convergence.png",
    ))
