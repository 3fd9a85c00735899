import mfs_tpu; mfs_tpu.enable_x64()
import time, jax, jax.numpy as jnp
from mfs_tpu.ops.eigh import eigh_batched

def timeit(f, *a, reps=5):
    out = f(*a); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(reps): out = f(*a); jax.block_until_ready(out)
    return (time.time()-t0)/reps*1e3

for B, n in [(1024,15),(1024,30),(8192,15)]:
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (B, n, n), dtype=jnp.float64)
    K = A + jnp.swapaxes(A,-1,-2)
    jac = jax.jit(lambda K: eigh_batched(K))
    t = timeit(jac, K)
    vals, vecs = jac(K)
    resid = float(jnp.abs(jnp.einsum('bik,bk,bjk->bij', vecs, vals, vecs) - K).max())
    xla = jax.jit(lambda K: jax.lax.linalg.eigh(K, sort_eigenvalues=False))
    tx = timeit(xla, K)
    vx, wx = xla(K)
    residx = float(jnp.abs(jnp.einsum('bik,bk,bjk->bij', vx, wx, vx) - K).max())
    print(f"B={B} n={n}: jacobi {t:.1f}ms resid {resid:.1e} | xla {tx:.1f}ms resid {residx:.1e}")
