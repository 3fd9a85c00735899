"""Tests for the experiment harness's resumable-chunk protocol.

The reference's fault tolerance is one-npz-per-trial Slurm resume
(``dardel/benes_bernoulli/mf.py:83-92``); the batch-first counterpart
is ``experiments.common.run_chunked``: per-chunk part files, skipped on
re-run, merged into one npz independent of the chunk size.
"""
import numpy as np
import pytest

from experiments import common


@pytest.fixture
def results_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(common, "RESULTS_DIR", str(tmp_path))
    return tmp_path


def _run_chunk(lo, n):
    ids = np.arange(lo, lo + n)
    return dict(
        vals=ids * 2.0,
        mat=np.stack([ids, ids + 1], axis=1),
        wall=np.float64(n * 0.5),
        tag=np.float64(lo),
    )


def test_merge_independent_of_chunk_size(results_dir):
    a, _ = common.run_chunked("e", "a", 12, 3, _run_chunk, sum_keys=("wall",))
    b, _ = common.run_chunked("e", "b", 12, 4, _run_chunk, sum_keys=("wall",))
    np.testing.assert_array_equal(a["vals"], b["vals"])
    np.testing.assert_array_equal(a["mat"], b["mat"])
    assert a["wall"] == b["wall"] == 6.0  # summed
    assert a["tag"] == 9.0 and b["tag"] == 8.0  # last chunk wins


def test_resume_skips_completed_chunks(results_dir):
    calls = []

    def run_chunk(lo, n):
        calls.append(lo)
        if lo == 8 and len(calls) <= 3:
            raise RuntimeError("injected fault")
        return _run_chunk(lo, n)

    with pytest.raises(RuntimeError):
        common.run_chunked("e", "c", 12, 4, run_chunk)
    assert calls == [0, 4, 8]

    merged, path = common.run_chunked("e", "c", 12, 4, run_chunk)
    # Chunks 0 and 4 were persisted; only chunk 8 re-ran.
    assert calls == [0, 4, 8, 8]
    np.testing.assert_array_equal(merged["vals"], np.arange(12) * 2.0)
    # Part files are cleaned up after the merge; final npz reloads.
    assert not list(results_dir.glob("e/c.part*.npz"))
    again, _ = common.run_chunked("e", "c", 12, 4, run_chunk)
    assert calls == [0, 4, 8, 8]  # fully cached now
    np.testing.assert_array_equal(again["vals"], merged["vals"])


def test_trial_axes_concatenation(results_dir):
    def run_chunk(lo, n):
        return dict(ts=np.ones((5, n)) * lo)

    merged, _ = common.run_chunked(
        "e", "d", 8, 4, run_chunk, trial_axes={"ts": 1}
    )
    assert merged["ts"].shape == (5, 8)
    np.testing.assert_array_equal(merged["ts"][:, 4:], 4.0)


def test_timed_call_time_chunked_matches_unchunked():
    """Time-chunked dispatch must reproduce the single-dispatch filter
    exactly: trajectories concatenate, the carry re-enters as the next
    chunk's initial state, and the nell accumulates additively."""
    import jax
    import jax.numpy as jnp

    def fake_filter(c0, m0, ys):
        def body(carry, y):
            c, m = carry
            c2 = c * 0.9 + y[:, None] * 0.1
            m2 = m * 0.95 + y * 0.05
            return (c2, m2), (c2, m2, -jnp.log(jnp.abs(y) + 0.5))

        _, (cs, ms, nl) = jax.lax.scan(body, (c0, m0), ys)
        return cs, ms, nl.sum(0)

    B, T = 4, 12
    rng = np.random.default_rng(0)
    c0 = jnp.ones((B, 3))
    m0 = jnp.zeros((B,))
    ys = jnp.asarray(rng.standard_normal((T, B)))
    full, _ = common.timed_call(fake_filter, c0, m0, ys)
    chunked, _ = common.timed_call_time_chunked(
        fake_filter, (c0, m0), ys, 4, traj_idx=(0, 1)
    )
    for a, b in zip(full, chunked):
        np.testing.assert_allclose(a, b, atol=1e-12)

    with pytest.raises(ValueError):
        common.timed_call_time_chunked(
            fake_filter, (c0, m0), ys, 5, traj_idx=(0, 1)
        )
