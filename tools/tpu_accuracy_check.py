"""On-TPU validation of the fused Pallas quadrature kernel.

The CPU test suite exercises the kernel *body* as a jnp oracle
(``tests/test_pallas_quadrature.py``); this script validates the
compiled Mosaic kernel on real TPU hardware at production size
(N=15, batch 1024) against the XLA-composed f64 path:

- node/weight agreement between the two implementations,
- worst moment-reproduction error of each rule (the kernel's
  double-f32 Sturm/Newton pipeline measures *more* accurate than the
  f64 refined path at N=15: ~1e-9 vs ~1e-5),
- steady-state per-call latency of pallas / refined / xla.

Run from the repo root on a TPU host:  ``python tools/tpu_accuracy_check.py``
"""
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from mfs_tpu.one_dim.quadrature import moment_quadrature  # noqa: E402
from mfs_tpu.utils.gaussian import normal_raw_moments_all  # noqa: E402

N = int(os.environ.get("CHECK_N", "15"))
B = int(os.environ.get("CHECK_B", "1024"))


def main():
    print("devices:", jax.devices(), flush=True)
    assert jax.devices()[0].platform != "cpu", (
        "this check must run on the TPU; devices show CPU"
    )
    rng = np.random.RandomState(0)
    means = jnp.asarray(rng.randn(B) * 0.3)
    varis = jnp.asarray(0.5 + rng.rand(B))
    ms = (
        0.6 * normal_raw_moments_all(means, varis, 2 * N)
        + 0.4 * normal_raw_moments_all(means + 0.3, varis * 0.8, 2 * N)
    )

    @jax.jit
    def compare(ms):
        w_r, x_r = moment_quadrature(ms, sort_nodes=True, eigh_impl="refined")
        w_p, x_p = moment_quadrature(ms, eigh_impl="pallas")
        order = jnp.argsort(x_p, axis=-1)
        x_p = jnp.take_along_axis(x_p, order, axis=-1)
        w_p = jnp.take_along_axis(w_p, order, axis=-1)
        pows = jnp.arange(2 * N)
        got_r = jnp.einsum(
            "bpn,bn->bp", x_r[..., None, :] ** pows[:, None], w_r
        )
        got_p = jnp.einsum(
            "bpn,bn->bp", x_p[..., None, :] ** pows[:, None], w_p
        )
        rel = lambda got: jnp.max(jnp.abs(got - ms) / (jnp.abs(ms) + 1e-30))
        return (
            jnp.max(jnp.abs(x_p - x_r)),
            jnp.max(jnp.abs(w_p - w_r)),
            rel(got_r),
            rel(got_p),
        )

    out = jax.block_until_ready(compare(ms))
    print(f"node max |pallas - refined|:   {float(out[0]):.3e}")
    print(f"weight max |pallas - refined|: {float(out[1]):.3e}")
    print(f"refined worst moment rel err:  {float(out[2]):.3e}")
    print(f"pallas  worst moment rel err:  {float(out[3]):.3e}")
    assert float(out[3]) < 1e-7, "Mosaic kernel lost double-f32 precision"
    assert float(out[0]) < 1e-4 and float(out[1]) < 1e-5

    for impl in ("refined", "pallas", "xla"):
        f = jax.jit(lambda m, impl=impl: moment_quadrature(m, eigh_impl=impl))
        jax.block_until_ready(f(ms))
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(f(ms))
            ts.append(time.time() - t0)
        print(f"{impl:8s} steady per call: {1e3 * min(ts):.2f} ms")

    # gradient path: the fused kernel's custom JVP routes tangents
    # through the XLA implementation, so parameter-estimation gradients
    # must match the pure-XLA path exactly at the primal point.
    ms_small = ms[:8, :16]  # N=8 keeps the double grad cheap

    def loss(m, impl):
        w, x = moment_quadrature(m, eigh_impl=impl)
        return jnp.sum(w * jnp.tanh(x))

    g_p = jax.jit(jax.grad(lambda m: loss(m, "pallas")))(ms_small)
    g_r = jax.jit(jax.grad(lambda m: loss(m, "refined")))(ms_small)
    # m_0 column excluded: the fused kernel's Christoffel weights carry
    # the measure mass (sum w = m_0) while the XLA path is normalized,
    # so only the j >= 1 sensitivities are comparable (identical for
    # the filters' normalized moment vectors).
    g_p, g_r = g_p[..., 1:], g_r[..., 1:]
    gdiff = float(jnp.max(jnp.abs(g_p - g_r) / (jnp.abs(g_r) + 1e-12)))
    print(f"grad(pallas) vs grad(refined) max rel diff: {gdiff:.3e}")
    assert gdiff < 1e-6, "fused-kernel gradient path diverged from XLA"
    print("TPU ACCURACY CHECK PASSED")


if __name__ == "__main__":
    main()
