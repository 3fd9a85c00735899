"""Fused Pallas TPU kernel for the 1D moment quadrature.

The XLA-composed quadrature (gather → cholesky → triangular solves →
eigh) executes as a dozen separate f64 ops per step; TPU has no f64
ALU, so XLA emulates each op at ~1.5 GFLOP/s effective with HBM
round-trips in between.  This kernel fuses the *entire* pipeline into
one VMEM-resident program carrying ~2^-45 precision as double-f32
pairs (``mfs_tpu.ops.doublefloat``), with the Monte-Carlo batch in the
lane dimension:

    moments (2n, B) → Cholesky of the Hankel Gram matrix
                    → Golub–Welsch recurrence coefficients
                      (last diagonal entry via a backsolve quadratic
                      form against the shifted Hankel matrix)
                    → eigenvalues of the Jacobi matrix by two-phase
                      Sturm bisection (f32 bracketing + double-f32
                      refinement)
                    → weights from the Christoffel function
                      w_k = 1 / sum_j p̃_j(λ_k)^2
                    → affine node map (mean, scale).

No eigenvectors are ever formed — the first-row-squared weights of the
eigh formulation equal the Christoffel weights exactly.

Differentiation: the public wrapper routes tangents through the XLA
implementation (``custom_jvp``), so gradients of the filter likelihood
are unchanged.
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import mfs_tpu.ops.doublefloat as dfm
from mfs_tpu.ops.doublefloat import DF
from mfs_tpu.typings import Array

_F32_BISECT_ITERS = 32
_DF_NEWTON_ITERS = 8
# Module-level default for pallas_call's interpret mode: tests flip
# this to True to run the *exact* pallas_call path (not just the jnp
# oracle) on the CPU backend.
INTERPRET = False
# After the f32 phase the bracket is re-widened by this fraction of the
# spectral range: the f32 Sturm count's flip point is displaced by up
# to ~n * 2^-24 of the range, so a 2^-17 margin guarantees the true
# eigenvalue lies inside the clamp interval of the Newton phase.
_HANDOFF_MARGIN = 2.0**-17
# Pivot completion mirrors the LDL path (``utils/linalg.py::ldl_chol``):
# non-positive pivots (PD loss) are replaced so the Cholesky diagonal
# becomes 1e-8 * ||G||_F — the same nearby-PD completion the f64
# filters use with ``stable=True``.  The clamp must be sign-based:
# *small positive* pivots are legitimate (in central mode the diagonal
# decays like scale^j), and a magnitude threshold destroys them.  The
# previous absolute floor (1e-30) turned negative pivots into ~1e-15
# diagonals that blew up the recurrence coefficients and cost ~5%
# extra divergent trials at N=15 versus the LDL path.
_PIVOT_DIAG = 1e-8


def _sturm_count_f32(alphas, betas2, x, n):
    """Number of eigenvalues of the Jacobi matrix below x (f32).

    ``alphas``/``betas2`` are length-n / n-1 lists of (B,) f32 rows;
    ``x`` is (n, B).  Classic LDL' sign-count recurrence.
    """
    tiny = jnp.float32(1e-20)
    q = alphas[0] - x
    q = jnp.where(jnp.abs(q) < tiny, -tiny, q)
    cnt = (q < 0).astype(jnp.int32)
    for i in range(1, n):
        q = alphas[i] - x - betas2[i - 1] / q
        q = jnp.where(jnp.abs(q) < tiny, -tiny, q)
        cnt = cnt + (q < 0).astype(jnp.int32)
    return cnt


def _sturm_count_df(alphas, betas2, x: DF, n):
    """Sturm count in double-f32 (alphas/betas2 are lists of DF rows)."""
    tiny = jnp.float32(1e-26)
    q = dfm.sub(alphas[0], x)
    q = dfm.where(jnp.abs(q.hi) < tiny, dfm.df(-tiny), q)
    cnt = (q.hi < 0).astype(jnp.int32)
    for i in range(1, n):
        q = dfm.sub(dfm.sub(alphas[i], x), dfm.div(betas2[i - 1], q))
        q = dfm.where(jnp.abs(q.hi) < tiny, dfm.df(-tiny), q)
        cnt = cnt + (q.hi < 0).astype(jnp.int32)
    return cnt


def _quadrature_kernel(n: int, jitter: float, ms_hi_ref, ms_lo_ref,
                       mean_ref, scale_ref,
                       w_hi_ref, w_lo_ref, x_hi_ref, x_lo_ref):
    """One fused quadrature for a (2n, B) block of moment vectors.

    All linear algebra is expressed as (n, B)-wide column operations:
    Hankel structure makes every Gram/H column a *contiguous static
    slice* of the moment rows, so the Cholesky needs only n^2/2 wide
    double-f32 ops (not n^3/6 scalar ones) — which keeps both the VPU
    busy and the traced program small.

    ``jitter`` (static) adds ``jitter * I`` to the *equilibrated* Gram
    matrix (whose diagonal is exactly 1), i.e. a relative Tikhonov
    regularisation.  Zero for production accuracy; the divergence-
    rescue tiers re-run lost trials with ``jitter ~ 1e-6`` so the
    double-f32 factorisation survives Hankel matrices whose condition
    number exceeds the 2^-45 working precision.
    """
    b = ms_hi_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)

    def col(j) -> DF:
        # Gram column j: rows i + j for i = 0..n-1 — a contiguous slice.
        return DF(ms_hi_ref[j:j + n, :], ms_lo_ref[j:j + n, :])

    def getrow(x: DF, i) -> DF:
        # keep everything 2-D: Mosaic does not lower 1-D vector values.
        return DF(x.hi[i:i + 1, :], x.lo[i:i + 1, :])

    def msrow(i) -> DF:
        return DF(ms_hi_ref[i:i + 1, :], ms_lo_ref[i:i + 1, :])

    # ---- van der Sluis equilibration ---------------------------------
    # Basis order j is rescaled by c_j = 1/sqrt(m_{2j}) so the Gram
    # diagonal becomes exactly 1 — the optimal diagonal preconditioning.
    # Central-mode moments decay like var^j, giving the raw Hankel a
    # geometric condition blow-up that double-f32 cannot factorise at
    # N = 15; the equilibrated matrix removes the artificial part of
    # that conditioning.  The Jacobi-matrix formulas pick up the ratios
    # r_i = c_i / c_{i+1} = sqrt(m_{2i+2} / m_{2i}) below.
    sq = []   # sqrt(m_{2j}) as DF (1, b) rows
    cs = []   # c_j = 1 / sqrt(m_{2j})
    tiny_m = jnp.float32(1e-30)
    for j in range(n):
        m2j = msrow(2 * j)
        m2j = dfm.where(m2j.hi <= tiny_m, dfm.df(tiny_m), m2j)
        sqj = dfm.sqrt(m2j)
        sq.append(sqj)
        cs.append(dfm.div(dfm.df(1.0), sqj))
    rs = [dfm.div(sq[i + 1], sq[i]) for i in range(n - 1)]
    # column vector of c_i stacked into an (n, b) DF
    cvec = DF(
        jnp.concatenate([c.hi for c in cs], axis=0),
        jnp.concatenate([c.lo for c in cs], axis=0),
    )

    def col_scaled(j) -> DF:
        # G'[:, j] = c_i * m_{i+j} * c_j
        return dfm.mul(dfm.mul(cvec, col(j)), cs[j])

    # After equilibration diag(G') = 1, so ||G'||_F is in [sqrt(n), n];
    # the LDL completion scale is 1e-8 * n (matching ldl_chol's
    # 1e-8 * ||.||_F up to a factor < sqrt(n)).
    pivot_diag = np.float32(_PIVOT_DIAG * n)

    # ---- LDL^T of the equilibrated Gram matrix, column by column -----
    # Factorise with the TRUE pivots (possibly negative, exactly like
    # ``utils/linalg.py::ldl``) and clamp only when forming the final
    # scaled factor R' = (L diag(scale))^T: clamping *during* the
    # factorisation corrupts every later column's Schur update and was
    # measurably less stable than the LDL path on indefinite states.
    Lunits = []   # unit-lower columns (diag row = 1)
    ds = []       # true pivots
    diag = []     # R' diagonal: sqrt(d) or the completion value
    for j in range(n):
        acc = col_scaled(j)
        if jitter:
            # relative Tikhonov: the equilibrated diagonal is 1, so
            # adding ``jitter`` at row j regularises G' by jitter * I.
            jcol = jnp.where(
                row_ids == j, jnp.float32(jitter), jnp.float32(0.0)
            )
            acc = dfm.add(acc, DF(jcol, jnp.zeros_like(jcol)))
        for k in range(j):
            acc = dfm.sub(
                acc, dfm.mul(Lunits[k], dfm.mul(ds[k], getrow(Lunits[k], j)))
            )
        d = getrow(acc, j)
        # PD-loss test on the TRUE pivot first: exact zeros and
        # negatives take the completion branch below.
        bad = d.hi <= 0.0
        # zero-pivot guard for the division (f32 can hit exact 0);
        # sign-preserving so a tiny-negative pivot stays negative.
        tiny = jnp.float32(1e-35)
        signed_tiny = DF(
            jnp.where(d.hi < 0.0, -tiny, tiny), jnp.zeros_like(d.hi)
        )
        d = dfm.where(jnp.abs(d.hi) < tiny, signed_tiny, d)
        sqrt_d = dfm.sqrt(dfm.where(bad, dfm.df(1.0), d))
        scale_j = DF(
            jnp.where(bad, pivot_diag, sqrt_d.hi),
            jnp.where(bad, 0.0, sqrt_d.lo),
        )
        cu = dfm.div(acc, d)
        below = row_ids > j
        on = row_ids == j
        cu = DF(
            jnp.where(on, 1.0, jnp.where(below, cu.hi, 0.0)),
            jnp.where(on, 0.0, jnp.where(below, cu.lo, 0.0)),
        )
        Lunits.append(cu)
        ds.append(d)
        diag.append(scale_j)

    # ---- Golub–Welsch recurrence coefficients ------------------------
    # In the monomial basis R[i, j] = L'[j, i] / c_j, so
    #   R[i, i+1]/R[i, i]     = r_i * Lunit'_i[i+1]
    #   R[k, k]/R[k-1, k-1]   = r_{k-1} * s'_k / s'_{k-1}.
    alphas = [None] * n
    betas = [None] * (n - 1)
    sup_ratio = [
        dfm.mul(rs[i], getrow(Lunits[i], i + 1)) for i in range(n - 1)
    ]
    alphas[0] = sup_ratio[0]
    for i in range(1, n - 1):
        alphas[i] = dfm.sub(sup_ratio[i], sup_ratio[i - 1])
    for k in range(1, n):
        betas[k - 1] = dfm.mul(rs[k - 1], dfm.div(diag[k], diag[k - 1]))

    # Last diagonal entry needs the order-(2n-1) moment:
    # alpha_{n-1} = u^T H u with R^T u = e_{n-1}, H[i, j] = m_{i+j+1}.
    # Solve in the equilibrated basis (Lunit'^T v = e_{n-1}/s'_{n-1}, a
    # unit backsolve) and map back: u_i = c_i v_i.
    v = [None] * n
    v[n - 1] = dfm.div(dfm.df(1.0), diag[n - 1])
    for i in range(n - 2, -1, -1):
        acc = dfm.df(0.0)
        for j in range(i + 1, n):
            acc = dfm.add(acc, dfm.mul(getrow(Lunits[i], j), v[j]))
        v[i] = dfm.neg(acc)
    u = [dfm.mul(cs[i], v[i]) for i in range(n)]

    alpha_last = dfm.df(0.0)
    for i in range(n):
        for j in range(i, n):
            term = dfm.mul(dfm.mul(u[i], u[j]), msrow(i + j + 1))
            if j > i:
                term = dfm.scale_f32(term, jnp.float32(2.0))
            alpha_last = dfm.add(alpha_last, term)
    alphas[n - 1] = alpha_last

    betas2 = [dfm.mul(bt, bt) for bt in betas]

    # ---- Eigenvalues by Sturm bisection -------------------------------
    a32 = [a.hi for a in alphas]
    b32_sq = [b2.hi for b2 in betas2]
    babs = [jnp.sqrt(jnp.abs(b2)) for b2 in b32_sq]
    glo = a32[0] - babs[0]
    ghi = a32[0] + babs[0]
    for i in range(1, n):
        left = babs[i - 1] + (babs[i] if i < n - 1 else 0.0)
        glo = jnp.minimum(glo, a32[i] - left)
        ghi = jnp.maximum(ghi, a32[i] + left)
    pad = jnp.float32(1e-3) * (ghi - glo) + jnp.float32(1e-20)
    glo = glo - pad
    ghi = ghi + pad

    lo = jnp.broadcast_to(glo, (n, b))
    hi = jnp.broadcast_to(ghi, (n, b))
    ks = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)

    # Statically unrolled, like the double-f32 phase below: loop-carried
    # ``fori_loop`` state inside Pallas has been observed to corrupt the
    # bisection brackets (see the df-phase note).
    for _ in range(_F32_BISECT_ITERS):
        mid = 0.5 * (lo + hi)
        cnt = _sturm_count_f32(a32, b32_sq, mid, n)
        take_hi = cnt >= ks + 1
        lo = jnp.where(take_hi, lo, mid)
        hi = jnp.where(take_hi, mid, hi)

    margin = jnp.float32(_HANDOFF_MARGIN) * (ghi - glo)
    clamp_lo = lo - margin
    clamp_hi = hi + margin

    # Double-f32 refinement: clamped Newton iteration on the *monic*
    # characteristic recurrence of the Jacobi matrix
    #   pi_{j+1}(x) = (x - alpha_j) pi_j(x) - beta_j^2 pi_{j-1}(x),
    # whose roots are the quadrature nodes.  Division-free inner loop,
    # quadratic convergence from the f32 bracket midpoint; steps are
    # clamped to the margin-widened bracket so clustered roots cannot
    # be skipped.  (Statically unrolled: loop-carried double-f32 state
    # under ``lax.fori_loop`` inside Pallas loses its compensation
    # terms even with optimization barriers.)
    lam = dfm.df(0.5 * (lo + hi))
    for _ in range(_DF_NEWTON_ITERS):
        p_prev = dfm.df(0.0)
        p_cur = dfm.df(jnp.ones_like(lam.hi))
        d_prev = dfm.df(0.0)
        d_cur = dfm.df(0.0)
        for j in range(n):
            t = dfm.mul(dfm.sub(lam, alphas[j]), p_cur)
            dt = dfm.add(dfm.mul(dfm.sub(lam, alphas[j]), d_cur), p_cur)
            if j > 0:
                t = dfm.sub(t, dfm.mul(betas2[j - 1], p_prev))
                dt = dfm.sub(dt, dfm.mul(betas2[j - 1], d_prev))
            p_prev, p_cur = p_cur, t
            d_prev, d_cur = d_cur, dt
        denom = dfm.where(jnp.abs(d_cur.hi) < 1e-30, dfm.df(1e-30), d_cur)
        step = dfm.div(p_cur, denom)
        lam = dfm.sub(lam, step)
        lam = dfm.where(lam.hi < clamp_lo, dfm.df(clamp_lo), lam)
        lam = dfm.where(lam.hi > clamp_hi, dfm.df(clamp_hi), lam)

    # ---- Weights from the Christoffel function ------------------------
    # orthonormal recurrence: beta_{j+1} p_{j+1} = (x - alpha_j) p_j
    #                                              - beta_j p_{j-1}
    # p_0 = 1/R[0,0] in the monomial basis: R[0,0] = s'_0 * sqrt(m_0).
    r00 = dfm.mul(diag[0], sq[0])
    p_prev = dfm.df(jnp.zeros((n, b), jnp.float32))
    p = dfm.div(dfm.df(jnp.ones((n, b), jnp.float32)),
                DF(jnp.broadcast_to(r00.hi, (n, b)),
                   jnp.broadcast_to(r00.lo, (n, b))))
    s = dfm.mul(p, p)
    for j in range(n - 1):
        t = dfm.mul(dfm.sub(lam, alphas[j]), p)
        if j > 0:
            t = dfm.sub(t, dfm.mul(betas[j - 1], p_prev))
        p_next = dfm.div(t, betas[j])
        p_prev, p = p, p_next
        s = dfm.add(s, dfm.mul(p, p))
    w = dfm.div(dfm.df(1.0), s)

    # ---- Affine node map ----------------------------------------------
    mean = DF(mean_ref[0:1, :], mean_ref[1:2, :])
    scale = DF(scale_ref[0:1, :], scale_ref[1:2, :])
    nodes = dfm.add(dfm.mul(lam, scale), mean)

    w_hi_ref[:, :] = w.hi
    w_lo_ref[:, :] = w.lo
    x_hi_ref[:, :] = nodes.hi
    x_lo_ref[:, :] = nodes.lo


class _ArrayRef:
    """Minimal pl.Ref stand-in so the kernel body runs as plain jnp."""

    def __init__(self, value=None, shape=None, dtype=jnp.float32):
        self.value = value if value is not None else jnp.zeros(shape, dtype)

    @property
    def shape(self):
        return self.value.shape

    def __getitem__(self, idx):
        return self.value[idx]

    def __setitem__(self, idx, val):
        self.value = self.value.at[idx].set(val)


def run_kernel_as_jnp(n: int, ms_hi, ms_lo, mean_in, scale_in, jitter=0.0):
    """Execute the kernel body outside Pallas (testing / CPU oracle)."""
    outs = [
        _ArrayRef(shape=(n, ms_hi.shape[1])) for _ in range(4)
    ]
    _quadrature_kernel(
        n,
        jitter,
        _ArrayRef(ms_hi),
        _ArrayRef(ms_lo),
        _ArrayRef(mean_in),
        _ArrayRef(scale_in),
        *outs,
    )
    return tuple(o.value for o in outs)


@functools.lru_cache(maxsize=None)
def _build_kernel(n: int, block_b: int, interpret: bool, jitter: float = 0.0):
    kern = functools.partial(_quadrature_kernel, n, jitter)
    # The wrapper slices the batch into blocks itself, so each call is
    # one whole-array block (a grid index map returning a python-int 0
    # lowers to an i64 under x64 and fails Mosaic's func.return checks).
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)],
        out_shape=[
            jax.ShapeDtypeStruct((n, block_b), jnp.float32) for _ in range(4)
        ],
        interpret=interpret,
    )


def moment_quadrature_pallas(
    ms: Array,
    mean=0.0,
    scale=1.0,
    block_b: int = 512,
    interpret: bool = None,
    jitter: float = 0.0,
) -> Tuple[Array, Array]:
    """Drop-in fused-kernel counterpart of ``moment_quadrature``.

    Parameters match ``mfs_tpu.one_dim.quadrature.moment_quadrature``
    (f64 in, f64 out); internally computes with double-f32 precision
    (~2^-45).  Not differentiable by itself — see
    ``moment_quadrature_fused`` for the autodiff-composable wrapper.

    Mass convention: the Christoffel weights carry the measure mass,
    ``sum_k w_k = m_0`` (the XLA path returns the normalized rule,
    ``sum_k w_k = 1``).  The filters always pass normalized moment
    vectors (m_0 = 1), where the two conventions coincide.
    """
    if interpret is None:
        interpret = INTERPRET
    ms = jnp.asarray(ms)
    in_dtype = ms.dtype
    batch_shape = ms.shape[:-1]
    two_n = ms.shape[-1]
    n = two_n // 2
    B = int(np.prod(batch_shape)) if batch_shape else 1

    mean = jnp.broadcast_to(jnp.asarray(mean, in_dtype), batch_shape)
    scale = jnp.broadcast_to(jnp.asarray(scale, in_dtype), batch_shape)

    ms2 = ms.reshape(B, two_n).T  # (2n, B)
    mean2 = mean.reshape(1, B)
    scale2 = scale.reshape(1, B)

    pad = (-B) % block_b
    if pad:
        # pad with a benign standard-normal moment vector
        from mfs_tpu.utils.gaussian import normal_raw_moments_all

        filler = normal_raw_moments_all(0.0, 1.0, two_n).astype(in_dtype)
        ms2 = jnp.concatenate([ms2, jnp.tile(filler[:, None], (1, pad))], axis=1)
        mean2 = jnp.concatenate([mean2, jnp.zeros((1, pad), in_dtype)], axis=1)
        scale2 = jnp.concatenate([scale2, jnp.ones((1, pad), in_dtype)], axis=1)
    Bp = B + pad

    ms_df = dfm.from_f64(ms2)
    mean_df = dfm.from_f64(mean2)
    scale_df = dfm.from_f64(scale2)
    mean_in = jnp.concatenate([mean_df.hi, mean_df.lo], axis=0)  # (2, Bp)
    scale_in = jnp.concatenate([scale_df.hi, scale_df.lo], axis=0)

    call = _build_kernel(n, block_b, interpret, float(jitter))
    outs = []
    # Mosaic rejects (and does not need) the XLA anti-folding barriers;
    # trace the kernel body without them.
    with dfm.barrier_mode("none" if not interpret else "xla"):
        for s0 in range(0, Bp, block_b):
            sl = slice(s0, s0 + block_b)
            outs.append(
                call(ms_df.hi[:, sl], ms_df.lo[:, sl], mean_in[:, sl], scale_in[:, sl])
            )
    w_hi = jnp.concatenate([o[0] for o in outs], axis=1)
    w_lo = jnp.concatenate([o[1] for o in outs], axis=1)
    x_hi = jnp.concatenate([o[2] for o in outs], axis=1)
    x_lo = jnp.concatenate([o[3] for o in outs], axis=1)

    weights = dfm.to_f64(DF(w_hi[:, :B], w_lo[:, :B])).astype(in_dtype)
    nodes = dfm.to_f64(DF(x_hi[:, :B], x_lo[:, :B])).astype(in_dtype)
    return (
        weights.T.reshape(batch_shape + (n,)),
        nodes.T.reshape(batch_shape + (n,)),
    )


def _solve_f32_refined(a, b, iters: int = 4):
    """Batched linear solve: equilibrated f32 LU + f64 refinement.

    TPU's LuDecomposition expander only implements F32/C64, so a plain
    f64 ``jnp.linalg.solve`` fails to compile there.  The confluent
    Vandermonde systems solved here are badly *scaled* (row j grows
    like max|t|^j; the dnode columns carry weights down to ~1e-8), so
    max-abs row+column equilibration is applied first — it removes the
    artificial part of the conditioning so the f32 factorisation is an
    effective preconditioner; true-f64 residual refinement
    (x <- x + C (RAC)^{-1} R (b - A x)) then restores f64 accuracy.
    """
    import jax.scipy.linalg as jsl

    tiny = jnp.finfo(a.dtype).tiny
    row_s = 1.0 / jnp.maximum(jnp.max(jnp.abs(a), axis=-1), tiny)
    a1 = a * row_s[..., :, None]
    col_s = 1.0 / jnp.maximum(jnp.max(jnp.abs(a1), axis=-2), tiny)
    a2 = a1 * col_s[..., None, :]

    lu, piv = jsl.lu_factor(a2.astype(jnp.float32))

    def precond_solve(r):
        y = jsl.lu_solve((lu, piv), (r * row_s[..., :, None]).astype(jnp.float32))
        return col_s[..., :, None] * y.astype(a.dtype)

    x = precond_solve(b)
    for _ in range(iters):
        r = b - jnp.einsum("...ij,...jk->...ik", a, x)
        x = x + precond_solve(r)
    return x


def _vdm_frame(w, x, ms, mean, scale):
    """Confluent-Vandermonde system of the moment-reproduction identity.

    The quadrature is the (locally unique) solution of

        sum_k w_k lam_k^j = m_j,   j = 0 .. 2n-1,

    in the eigenvalue frame ``lam = (x - mean) / scale``.  To keep the
    powers O(1) regardless of the moment mode, work with ``t = lam /
    sigma`` for a *constant* (primal, stop-gradient) frame scale
    ``sigma ~ std``; the identity becomes ``sum_k w_k t_k^j = m_j /
    sigma^j``.  Returns ``(A, P, lam, sigma, sig_pows)`` where ``A`` is
    the (..., 2n, 2n) Jacobian ``[P | w * dP/dt]`` of the identity with
    respect to ``[w | t]`` and ``P[..., j, k] = t_k^j``.

    Shared by the implicit-function JVP of the fused kernel and the
    f64 Newton polish (``moment_quadrature_polished``).
    """
    n = w.shape[-1]
    dtype = w.dtype
    mean_b = jnp.asarray(mean, dtype)[..., None]
    scale_b = jnp.asarray(scale, dtype)[..., None]
    lam = (x - mean_b) / scale_b

    m0 = jnp.maximum(ms[..., 0], jnp.finfo(dtype).tiny)
    sigma = jax.lax.stop_gradient(
        jnp.sqrt(jnp.maximum(ms[..., 2] / m0, jnp.finfo(dtype).tiny))
    )[..., None]
    t = lam / sigma

    powers = [jnp.ones_like(t)]
    for _ in range(2 * n - 1):
        powers.append(powers[-1] * t)
    P = jnp.stack(powers, axis=-2)  # (..., 2n, n): t_k^j
    j_col = jnp.arange(2 * n, dtype=dtype)[:, None]
    dPdt = j_col * jnp.concatenate(
        [jnp.zeros_like(P[..., :1, :]), P[..., :-1, :]], axis=-2
    )  # j * t^{j-1}, with the j = 0 row exactly zero
    A = jnp.concatenate([P, w[..., None, :] * dPdt], axis=-1)  # (..., 2n, 2n)

    sig_pows = sigma ** jnp.arange(2 * n, dtype=dtype)
    return A, P, lam, sigma, sig_pows


def _implicit_tangent(w, x, ms, mean, scale, dms, dmean, dscale):
    """Tangent of the quadrature via the moment-reproduction identity."""
    n = w.shape[-1]
    dtype = w.dtype
    A, _, lam, sigma, sig_pows = _vdm_frame(w, x, ms, mean, scale)
    rhs = (jnp.asarray(dms, dtype) / sig_pows)[..., None]
    sol = _solve_f32_refined(A, rhs)[..., 0]
    dw = sol[..., :n]
    dlam = sol[..., n:] * sigma

    scale_b = jnp.asarray(scale, dtype)[..., None]
    dmean_b = jnp.asarray(dmean, dtype)[..., None]
    dscale_b = jnp.asarray(dscale, dtype)[..., None]
    dx = dscale_b * lam + scale_b * dlam + dmean_b
    return dw, dx


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _fused_core(jitter, ms, mean, scale):
    return moment_quadrature_pallas(ms, mean, scale, jitter=jitter)


@_fused_core.defjvp
def _fused_jvp(jitter, primals, tangents):
    ms, mean, scale = primals
    dms, dmean, dscale = tangents
    w, x = _fused_core(jitter, ms, mean, scale)
    dw, dx = _implicit_tangent(w, x, ms, mean, scale, dms, dmean, dscale)
    return (w, x), (dw, dx)


def moment_quadrature_fused(ms, mean, scale, jitter: float = 0.0):
    """Fused Pallas quadrature with implicit-function derivatives.

    Primal: the double-f32 Pallas kernel.  Tangent: the quadrature is
    the (locally unique) solution of the moment-reproduction system,
    so its exact Jacobian is the inverse of the confluent Vandermonde
    matrix at the primal nodes — one batched (2n, 2n) linear solve,
    instead of re-running the entire f64 XLA quadrature pipeline the
    way the old tangent rule did (~10x the work).  See ``_fused_jvp``.

    ``jitter`` (static) regularises the in-kernel Gram factorisation —
    see ``moment_quadrature_pallas``.
    """
    return _fused_core(float(jitter), ms, mean, scale)


# NOTE (round 5): a "polished" variant — kernel primal + f64 Newton
# correction on the moment-reproduction system, reusing ``_vdm_frame``
# — was implemented and measured (tools/PROBE_RESCUE2.json).  It is
# structurally unsound at production orders: the confluent Vandermonde
# of the identity has condition ~1e28 at n = 15 (t^29 spans ~19 decades
# across the node range), so the Newton step's error exceeds the
# kernel's own ~1e-9 error by orders of magnitude and *corrupts* good
# outputs (measured finite_frac 0.06 on the N=15 bench workload).  The
# implicit-function JVP tolerates the same solve because optimiser
# tangents only need relative accuracy; state corrections do not.  The
# divergence-rescue role is instead filled by the jittered kernel
# (``jitter`` above), which rescued 265/265 lost trials at N=15 where
# the host LAPACK-f64 tier managed 249/265.
