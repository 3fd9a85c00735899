"""Fused Pallas TPU kernel for the N-D moment quadrature eigenpairs.

The N-D quadrature (``mfs_tpu/multi_dims/quadrature.py``) spends its
time in tiny (s x s, s = C(N-1+d, d)) dense linear algebra executed as
XLA-emulated f64 ops — measured ~60% of the prey-predator filter step.
This kernel fuses the whole eigenpair pipeline per dimension into one
VMEM program carrying double-f32 precision (``mfs_tpu.ops.doublefloat``)
with the Monte-Carlo batch in the lane dimension:

    moments (z, B) -> equilibrated Gram gather (c_j = 1/sqrt(G_jj))
                   -> LDL^T with true pivots + completion (as in the 1D
                      kernel / ``ldl_chol``)
                   -> per-dimension K_i = R^{-1} H_i R^{-T} by two
                      unit-triangular solves
                   -> eigenpairs of each K_i by hybrid Jacobi:
                      f32 sweeps from identity, then double-f32 sweeps
                      with DF-renormalised rotations.

Equilibration does not change K_i or its eigenpairs: the orthonormal
polynomial basis produced by Gram-Schmidt on the graded monomials is
invariant under positive per-element scaling, so the multiplication
operators are identical in exact arithmetic.

Unlike the 1D kernel no Christoffel shortcut exists — the chained
inner-product weights need the eigenvectors — so the kernel outputs
(vals, vecs) per dimension and the cheap O(s^2) weight/node assembly
stays in XLA f64.

Everything is statically unrolled per matrix entry; the kernel is
gated to s <= 10 (d = 2 up to N = 4) to bound the traced program —
larger bases fall back to the XLA path.
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
from mfs_tpu.ops.eigh import _round_robin_schedule
from mfs_tpu.typings import Array

MAX_S = 10
_F32_SWEEPS = 6
_DF_SWEEPS = 2
_PIVOT_DIAG = 1e-8
# Tests flip this to run pallas_call in interpret mode on CPU.
INTERPRET = False


def _rot_f32(app, aqq, apq):
    """Jacobi rotation (c, s) from f32 entries (Golub-Van Loan 8.4.1)."""
    tiny = jnp.float32(1e-30)
    diag_scale = jnp.abs(app) + jnp.abs(aqq)
    small = jnp.abs(apq) <= jnp.float32(1e-12) * diag_scale + tiny
    safe_apq = jnp.where(small, jnp.float32(1.0), apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)
    t = jnp.where(small, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    return c, s


def _nd_kernel(d: int, s: int, ig, ihs, ms_hi_ref, ms_lo_ref,
               vals_hi_ref, vals_lo_ref, vecs_hi_ref, vecs_lo_ref):
    """Eigenpairs of the d multiplication operators for one lane block.

    ``ig``/``ihs`` are static (s, s) / (d, s, s) moment-index tables.
    Outputs: vals (d*s, B), vecs (d*s*s, B) with vecs[m, i, j] = i-th
    component of the j-th eigenvector of K_m.
    """
    def msrow(i) -> DF:
        return DF(ms_hi_ref[i:i + 1, :], ms_lo_ref[i:i + 1, :])

    # ---- equilibration factors --------------------------------------
    cs = []
    for j in range(s):
        gjj = msrow(int(ig[j, j]))
        gjj = dfm.where(gjj.hi <= jnp.float32(1e-30), dfm.df(1.0), gjj)
        cs.append(dfm.div(dfm.df(1.0), dfm.sqrt(gjj)))

    def gent(i, j) -> DF:
        return dfm.mul(dfm.mul(cs[i], msrow(int(ig[i, j]))), cs[j])

    # ---- LDL^T with true pivots (deferred completion) ----------------
    pivot_diag = np.float32(_PIVOT_DIAG * s)
    Lu = [[None] * s for _ in range(s)]   # unit-lower, Lu[i][j] for i > j
    dpiv = [None] * s
    scale = [None] * s
    for j in range(s):
        acc = [None] * s
        for i in range(j, s):
            a = gent(i, j) if i >= j else None
            for k in range(j):
                a = dfm.sub(a, dfm.mul(Lu[i][k], dfm.mul(dpiv[k], Lu[j][k])))
            acc[i] = a
        dj = acc[j]
        # PD-loss test on the TRUE pivot first (exact zeros -> completion
        # branch), then a sign-preserving guard for the division.
        bad = dj.hi <= 0.0
        tiny = jnp.float32(1e-35)
        signed_tiny = DF(
            jnp.where(dj.hi < 0.0, -tiny, tiny), jnp.zeros_like(dj.hi)
        )
        dj = dfm.where(jnp.abs(dj.hi) < tiny, signed_tiny, dj)
        sq = dfm.sqrt(dfm.where(bad, dfm.df(1.0), dj))
        scale[j] = DF(jnp.where(bad, pivot_diag, sq.hi),
                      jnp.where(bad, 0.0, sq.lo))
        dpiv[j] = dj
        for i in range(j + 1, s):
            Lu[i][j] = dfm.div(acc[i], dj)

    # ---- per-dimension K_m and its eigenpairs ------------------------
    schedule = _round_robin_schedule(s)
    for m in range(d):
        ih = ihs[m]

        def hent(i, j) -> DF:
            return dfm.mul(dfm.mul(cs[i], msrow(int(ih[i, j]))), cs[j])

        # forward solve X = R^{-1} H  (R lower = Lu diag(scale)),
        # column by column: x_r = (h_r - sum_{k<r} Lu[r][k] s_k x_k)/s_r
        X = [[None] * s for _ in range(s)]
        for c in range(s):
            for r in range(s):
                a = hent(r, c)
                for k in range(r):
                    a = dfm.sub(a, dfm.mul(Lu[r][k], dfm.mul(scale[k], X[k][c])))
                X[r][c] = dfm.div(a, scale[r])
        # second solve K = X R^{-T} == (R^{-1} X^T)^T, same recursion on
        # the columns of X^T (= rows of X)
        K = [[None] * s for _ in range(s)]
        for c in range(s):
            for r in range(s):
                a = X[c][r]
                for k in range(r):
                    a = dfm.sub(a, dfm.mul(Lu[r][k], dfm.mul(scale[k], K[k][c])))
                K[r][c] = dfm.div(a, scale[r])
        # symmetrise
        for i in range(s):
            for j in range(i + 1, s):
                avg = dfm.scale_f32(dfm.add(K[i][j], K[j][i]), jnp.float32(0.5))
                K[i][j] = avg
                K[j][i] = avg

        # ---- phase 1: f32 Jacobi from identity -----------------------
        a32 = [[K[i][j].hi for j in range(s)] for i in range(s)]
        v32 = [[jnp.full_like(K[0][0].hi, 1.0 if i == j else 0.0)
                for j in range(s)] for i in range(s)]
        for _ in range(_F32_SWEEPS):
            for ps, qs in schedule:
                for p, q in zip(ps, qs):
                    c, sn = _rot_f32(a32[p][p], a32[q][q], a32[p][q])
                    for i in range(s):
                        aip, aiq = a32[i][p], a32[i][q]
                        a32[i][p] = c * aip - sn * aiq
                        a32[i][q] = sn * aip + c * aiq
                    for j in range(s):
                        apj, aqj = a32[p][j], a32[q][j]
                        a32[p][j] = c * apj - sn * aqj
                        a32[q][j] = sn * apj + c * aqj
                    for i in range(s):
                        vip, viq = v32[i][p], v32[i][q]
                        v32[i][p] = c * vip - sn * viq
                        v32[i][q] = sn * vip + c * viq

        # The composed f32 rotations are only ~1e-6 orthonormal; two
        # double-f32 Newton-Schulz iterations square that error away
        # (1e-6 -> 1e-12 -> floor) exactly as the 1D refined path does.
        V = [[dfm.df(v32[i][j]) for j in range(s)] for i in range(s)]
        for _ in range(2):
            Gm = [[None] * s for _ in range(s)]  # V^T V
            for i in range(s):
                for j in range(s):
                    acc = None
                    for k in range(s):
                        t = dfm.mul(V[k][i], V[k][j])
                        acc = t if acc is None else dfm.add(acc, t)
                    Gm[i][j] = acc
            # W = 1.5 I - 0.5 G;  V <- V W
            W = [[dfm.scale_f32(Gm[i][j], jnp.float32(-0.5)) for j in range(s)]
                 for i in range(s)]
            for i in range(s):
                W[i][i] = dfm.add(W[i][i], dfm.df(1.5))
            Vn = [[None] * s for _ in range(s)]
            for i in range(s):
                for j in range(s):
                    acc = None
                    for k in range(s):
                        t = dfm.mul(V[i][k], W[k][j])
                        acc = t if acc is None else dfm.add(acc, t)
                    Vn[i][j] = acc
            V = Vn

        # rotate K into the orthonormalised eigenbasis: A1 = V^T K V
        M = [[None] * s for _ in range(s)]  # K V
        for i in range(s):
            for j in range(s):
                acc = None
                for k in range(s):
                    t = dfm.mul(K[i][k], V[k][j])
                    acc = t if acc is None else dfm.add(acc, t)
                M[i][j] = acc
        A1 = [[None] * s for _ in range(s)]
        for i in range(s):
            for j in range(s):
                acc = None
                for k in range(s):
                    t = dfm.mul(V[k][i], M[k][j])
                    acc = t if acc is None else dfm.add(acc, t)
                A1[i][j] = acc

        # ---- phase 2: double-f32 Jacobi sweeps -----------------------
        for _ in range(_DF_SWEEPS):
            for ps, qs in schedule:
                for p, q in zip(ps, qs):
                    c32, s32 = _rot_f32(A1[p][p].hi, A1[q][q].hi, A1[p][q].hi)
                    # renormalise (c, s) in DF so the rotation is
                    # orthogonal to double-f32 precision even though the
                    # angle itself is f32-accurate (enough: off-diagonal
                    # shrinks quadratically regardless).
                    cD, sD = dfm.df(c32), dfm.df(s32)
                    nrm = dfm.sqrt(dfm.add(dfm.mul(cD, cD), dfm.mul(sD, sD)))
                    cD = dfm.div(cD, nrm)
                    sD = dfm.div(sD, nrm)
                    for i in range(s):
                        aip, aiq = A1[i][p], A1[i][q]
                        A1[i][p] = dfm.sub(dfm.mul(cD, aip), dfm.mul(sD, aiq))
                        A1[i][q] = dfm.add(dfm.mul(sD, aip), dfm.mul(cD, aiq))
                    for j in range(s):
                        apj, aqj = A1[p][j], A1[q][j]
                        A1[p][j] = dfm.sub(dfm.mul(cD, apj), dfm.mul(sD, aqj))
                        A1[q][j] = dfm.add(dfm.mul(sD, apj), dfm.mul(cD, aqj))
                    for i in range(s):
                        vip, viq = V[i][p], V[i][q]
                        V[i][p] = dfm.sub(dfm.mul(cD, vip), dfm.mul(sD, viq))
                        V[i][q] = dfm.add(dfm.mul(sD, vip), dfm.mul(cD, viq))

        for j in range(s):
            r = m * s + j
            vals_hi_ref[r:r + 1, :] = A1[j][j].hi
            vals_lo_ref[r:r + 1, :] = A1[j][j].lo
        for i in range(s):
            for j in range(s):
                r = m * s * s + i * s + j
                vecs_hi_ref[r:r + 1, :] = V[i][j].hi
                vecs_lo_ref[r:r + 1, :] = V[i][j].lo


# ---------------------------------------------------------------------------
# Column-layout K-builder kernel (no s <= 10 gate)
# ---------------------------------------------------------------------------
#
# The per-entry kernel above unrolls O(s^3) traced statements per solve,
# which bounds it to s <= 10.  This kernel instead works on whole
# (s, B)-wide *columns* (the 1D kernel's layout): the equilibrated
# Gram/multiplication matrices are gathered by exact one-hot MXU dots,
# the LDL and the two unit-triangular solves run column-by-column with
# O(s^2) wide statements, and the eigendecomposition of the resulting
# K_m (the only O(s^3)-statement stage) is done OUTSIDE the kernel by
# ``eigh_refined`` — batched f32 XLA eigh + a few true-f64 matmuls,
# which XLA/MXU already handle well at any s.


def _nd_k_kernel(d: int, s: int, oh_ref, ms_hi_ref, ms_lo_ref,
                 k_hi_ref, k_lo_ref):
    """Build the d multiplication operators K_m for one lane block.

    ``oh_ref``: ((d+1)*s*s, z) 0/1 f32 input; chunk m's row j*s + i
    selects moment index table m's [i, j] entry (column-major: column j
    is a contiguous row slice); chunk 0 is the Gram matrix, chunks
    1..d the H_m.  Outputs (d*s*s, B) with row (m*s + i)*s + j =
    K_m[i, j].
    """
    b = ms_hi_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, b), 0)
    ms_hi = ms_hi_ref[:, :]
    ms_lo = ms_lo_ref[:, :]

    def gather(m):
        oh = oh_ref[m * s * s:(m + 1) * s * s, :]
        return DF(
            jax.lax.dot(oh, ms_hi, precision=jax.lax.Precision.HIGHEST),
            jax.lax.dot(oh, ms_lo, precision=jax.lax.Precision.HIGHEST),
        )

    Gflat = gather(0)  # (s*s, B), column-major

    def gcol(flat: DF, j) -> DF:
        return DF(flat.hi[j * s:(j + 1) * s, :], flat.lo[j * s:(j + 1) * s, :])

    def getrow(x: DF, i) -> DF:
        return DF(x.hi[i:i + 1, :], x.lo[i:i + 1, :])

    # ---- equilibration: c_j = 1 / sqrt(G_jj) --------------------------
    cs = []
    for j in range(s):
        gjj = getrow(gcol(Gflat, j), j)
        gjj = dfm.where(gjj.hi <= jnp.float32(1e-30), dfm.df(1.0), gjj)
        cs.append(dfm.div(dfm.df(1.0), dfm.sqrt(gjj)))
    cvec = DF(
        jnp.concatenate([c.hi for c in cs], axis=0),
        jnp.concatenate([c.lo for c in cs], axis=0),
    )

    # ---- LDL^T of the equilibrated Gram, column-wise ------------------
    pivot_diag = np.float32(_PIVOT_DIAG * s)
    Lcols = []   # unit-lower columns (zeros above diag, 1 on diag)
    dpivs = []   # true pivots (1, B)
    scales = []  # R' diagonal: sqrt(d) or completion value
    inv_scales = []
    for j in range(s):
        acc = dfm.mul(dfm.mul(cvec, gcol(Gflat, j)), cs[j])
        for k in range(j):
            acc = dfm.sub(
                acc, dfm.mul(Lcols[k], dfm.mul(dpivs[k], getrow(Lcols[k], j)))
            )
        dj = getrow(acc, j)
        bad = dj.hi <= 0.0
        tiny = jnp.float32(1e-35)
        signed_tiny = DF(
            jnp.where(dj.hi < 0.0, -tiny, tiny), jnp.zeros_like(dj.hi)
        )
        dj = dfm.where(jnp.abs(dj.hi) < tiny, signed_tiny, dj)
        sq = dfm.sqrt(dfm.where(bad, dfm.df(1.0), dj))
        scale_j = DF(jnp.where(bad, pivot_diag, sq.hi),
                     jnp.where(bad, 0.0, sq.lo))
        cu = dfm.div(acc, dj)
        below = row_ids > j
        on = row_ids == j
        cu = DF(
            jnp.where(on, 1.0, jnp.where(below, cu.hi, 0.0)),
            jnp.where(on, 0.0, jnp.where(below, cu.lo, 0.0)),
        )
        Lcols.append(cu)
        dpivs.append(dj)
        scales.append(scale_j)
        inv_scales.append(dfm.div(dfm.df(1.0), scale_j))

    # ---- per-dimension K_m by two unit-triangular solves --------------
    # K = S^{-1} (Lu^{-1} H' Lu^{-T}) S^{-1} with S = diag(scales):
    # unit solves need no divisions in the inner loop.
    inv_scale_vec = DF(
        jnp.concatenate([sc.hi for sc in inv_scales], axis=0),
        jnp.concatenate([sc.lo for sc in inv_scales], axis=0),
    )
    for m in range(d):
        Hflat = gather(m + 1)

        # forward solve W = Lu^{-1} H', column by column
        Wcols = []
        for c in range(s):
            v = dfm.mul(dfm.mul(cvec, gcol(Hflat, c)), cs[c])
            rows = []
            for k in range(s):
                xk = getrow(v, k)
                rows.append(xk)
                if k < s - 1:
                    v = dfm.sub(v, dfm.mul(Lcols[k], xk))
            Wcols.append(DF(
                jnp.concatenate([r.hi for r in rows], axis=0),
                jnp.concatenate([r.lo for r in rows], axis=0),
            ))

        # second solve: Y^T = Lu^{-1} W^T, i.e. Y = W Lu^{-T}; work on
        # the columns of W^T (= rows of W), then K = S^{-1} Y S^{-1}.
        for i in range(s):
            # row i of W as an (s, B) block (column i of W^T)
            v = DF(
                jnp.concatenate([getrow(Wcols[c], i).hi for c in range(s)], axis=0),
                jnp.concatenate([getrow(Wcols[c], i).lo for c in range(s)], axis=0),
            )
            rows = []
            for k in range(s):
                xk = getrow(v, k)
                rows.append(xk)
                if k < s - 1:
                    v = dfm.sub(v, dfm.mul(Lcols[k], xk))
            # K_m[i, j] = rows[j] * inv_scale_i * inv_scale_j
            krow = DF(
                jnp.concatenate([r.hi for r in rows], axis=0),
                jnp.concatenate([r.lo for r in rows], axis=0),
            )
            krow = dfm.mul(dfm.mul(krow, inv_scales[i]), inv_scale_vec)
            base = (m * s + i) * s
            k_hi_ref[base:base + s, :] = krow.hi
            k_lo_ref[base:base + s, :] = krow.lo


def _nd_ldl_kernel(s: int, ms_hi_ref, ms_lo_ref, oh_ref,
                   l_hi_ref, l_lo_ref, c_hi_ref, c_lo_ref,
                   isc_hi_ref, isc_lo_ref):
    """Stage 1 of the staged K-builder: equilibrated LDL of the Gram.

    Same math as the LDL block of ``_nd_k_kernel`` but emitted as its
    own Pallas program so the traced statement count stays below the
    Mosaic compile wall (the monolithic kernel crashes the remote
    compiler at s = 36).  Outputs: the unit-lower factor L (flat
    column-major, (s*s, B)), the equilibration vector c, and the
    inverse R'-diagonal 1/scale — everything stages 2/3 need.
    """
    b = ms_hi_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, b), 0)
    ms_hi = ms_hi_ref[:, :]
    ms_lo = ms_lo_ref[:, :]
    oh = oh_ref[:, :]
    Gflat = DF(
        jax.lax.dot(oh, ms_hi, precision=jax.lax.Precision.HIGHEST),
        jax.lax.dot(oh, ms_lo, precision=jax.lax.Precision.HIGHEST),
    )

    def gcol(flat: DF, j) -> DF:
        return DF(flat.hi[j * s:(j + 1) * s, :], flat.lo[j * s:(j + 1) * s, :])

    def getrow(x: DF, i) -> DF:
        return DF(x.hi[i:i + 1, :], x.lo[i:i + 1, :])

    cs = []
    for j in range(s):
        gjj = getrow(gcol(Gflat, j), j)
        gjj = dfm.where(gjj.hi <= jnp.float32(1e-30), dfm.df(1.0), gjj)
        cs.append(dfm.div(dfm.df(1.0), dfm.sqrt(gjj)))
    cvec = DF(
        jnp.concatenate([c.hi for c in cs], axis=0),
        jnp.concatenate([c.lo for c in cs], axis=0),
    )

    pivot_diag = np.float32(_PIVOT_DIAG * s)
    Lcols, dpivs, inv_scales = [], [], []
    for j in range(s):
        acc = dfm.mul(dfm.mul(cvec, gcol(Gflat, j)), cs[j])
        for k in range(j):
            acc = dfm.sub(
                acc, dfm.mul(Lcols[k], dfm.mul(dpivs[k], getrow(Lcols[k], j)))
            )
        dj = getrow(acc, j)
        bad = dj.hi <= 0.0
        tiny = jnp.float32(1e-35)
        signed_tiny = DF(
            jnp.where(dj.hi < 0.0, -tiny, tiny), jnp.zeros_like(dj.hi)
        )
        dj = dfm.where(jnp.abs(dj.hi) < tiny, signed_tiny, dj)
        sq = dfm.sqrt(dfm.where(bad, dfm.df(1.0), dj))
        scale_j = DF(jnp.where(bad, pivot_diag, sq.hi),
                     jnp.where(bad, 0.0, sq.lo))
        cu = dfm.div(acc, dj)
        below = row_ids > j
        on = row_ids == j
        cu = DF(
            jnp.where(on, 1.0, jnp.where(below, cu.hi, 0.0)),
            jnp.where(on, 0.0, jnp.where(below, cu.lo, 0.0)),
        )
        Lcols.append(cu)
        dpivs.append(dj)
        inv_scales.append(dfm.div(dfm.df(1.0), scale_j))
        l_hi_ref[j * s:(j + 1) * s, :] = cu.hi
        l_lo_ref[j * s:(j + 1) * s, :] = cu.lo

    c_hi_ref[:, :] = cvec.hi
    c_lo_ref[:, :] = cvec.lo
    isc_hi_ref[:, :] = jnp.concatenate([x.hi for x in inv_scales], axis=0)
    isc_lo_ref[:, :] = jnp.concatenate([x.lo for x in inv_scales], axis=0)


def _nd_fsolve_kernel(s: int, c0: int, c1: int, ms_hi_ref, ms_lo_ref,
                      oh_ref, l_hi_ref, l_lo_ref, c_hi_ref, c_lo_ref,
                      w_hi_ref, w_lo_ref):
    """Stage 2: W[:, c0:c1] = Lu^{-1} H'[:, c0:c1] for one column chunk.

    The column loop is embarrassingly parallel across chunks, so the
    statement count per program is bounded by (c1 - c0) * s rowops
    regardless of s — the knob that keeps every stage below the Mosaic
    wall.  ``oh_ref`` holds only the one-hot gather rows of the H
    columns in this chunk.
    """
    ms_hi = ms_hi_ref[:, :]
    ms_lo = ms_lo_ref[:, :]
    oh = oh_ref[:, :]
    Hflat = DF(
        jax.lax.dot(oh, ms_hi, precision=jax.lax.Precision.HIGHEST),
        jax.lax.dot(oh, ms_lo, precision=jax.lax.Precision.HIGHEST),
    )
    cvec = DF(c_hi_ref[:, :], c_lo_ref[:, :])

    def getrow(x: DF, i) -> DF:
        return DF(x.hi[i:i + 1, :], x.lo[i:i + 1, :])

    def lcol(k) -> DF:
        return DF(l_hi_ref[k * s:(k + 1) * s, :], l_lo_ref[k * s:(k + 1) * s, :])

    Lcols = [lcol(k) for k in range(s - 1)]
    for c in range(c0, c1):
        off = (c - c0) * s
        hcol = DF(Hflat.hi[off:off + s, :], Hflat.lo[off:off + s, :])
        v = dfm.mul(dfm.mul(cvec, hcol), getrow(cvec, c))
        rows = []
        for k in range(s):
            xk = getrow(v, k)
            rows.append(xk)
            if k < s - 1:
                v = dfm.sub(v, dfm.mul(Lcols[k], xk))
        w_hi_ref[off:off + s, :] = jnp.concatenate(
            [r.hi for r in rows], axis=0
        )
        w_lo_ref[off:off + s, :] = jnp.concatenate(
            [r.lo for r in rows], axis=0
        )


def _nd_tsolve_kernel(s: int, i0: int, i1: int, w_hi_ref, w_lo_ref,
                      l_hi_ref, l_lo_ref, isc_hi_ref, isc_lo_ref,
                      k_hi_ref, k_lo_ref):
    """Stage 3: K[i0:i1, :] = S^{-1} (Lu^{-1} W^T)^T S^{-1} row chunk.

    Row i of W is gathered as s strided (1, B) slices (W is stored
    column-major flat), solved through Lu, and scaled.  The i loop is
    independent across chunks, bounding the per-program size.
    """
    inv_scale_vec = DF(isc_hi_ref[:, :], isc_lo_ref[:, :])

    def getrow(x: DF, i) -> DF:
        return DF(x.hi[i:i + 1, :], x.lo[i:i + 1, :])

    def lcol(k) -> DF:
        return DF(l_hi_ref[k * s:(k + 1) * s, :], l_lo_ref[k * s:(k + 1) * s, :])

    Lcols = [lcol(k) for k in range(s - 1)]
    for i in range(i0, i1):
        v = DF(
            jnp.concatenate(
                [w_hi_ref[c * s + i:c * s + i + 1, :] for c in range(s)], axis=0
            ),
            jnp.concatenate(
                [w_lo_ref[c * s + i:c * s + i + 1, :] for c in range(s)], axis=0
            ),
        )
        rows = []
        for k in range(s):
            xk = getrow(v, k)
            rows.append(xk)
            if k < s - 1:
                v = dfm.sub(v, dfm.mul(Lcols[k], xk))
        krow = DF(
            jnp.concatenate([r.hi for r in rows], axis=0),
            jnp.concatenate([r.lo for r in rows], axis=0),
        )
        krow = dfm.mul(
            dfm.mul(krow, getrow(inv_scale_vec, i)), inv_scale_vec
        )
        off = (i - i0) * s
        k_hi_ref[off:off + s, :] = krow.hi
        k_lo_ref[off:off + s, :] = krow.lo


def _nd_cvec_kernel(s: int, ms_hi_ref, ms_lo_ref, ohdiag_ref,
                    c_hi_ref, c_lo_ref):
    """Equilibration vector c_j = 1/sqrt(G_jj) for the panelled LDL."""
    diag = DF(
        jax.lax.dot(ohdiag_ref[:, :], ms_hi_ref[:, :],
                    precision=jax.lax.Precision.HIGHEST),
        jax.lax.dot(ohdiag_ref[:, :], ms_lo_ref[:, :],
                    precision=jax.lax.Precision.HIGHEST),
    )
    diag = dfm.where(diag.hi <= jnp.float32(1e-30), dfm.df(1.0), diag)
    cvec = dfm.div(dfm.df(1.0), dfm.sqrt(diag))
    c_hi_ref[:, :] = cvec.hi
    c_lo_ref[:, :] = cvec.lo


def _nd_ldl_panel_kernel(s: int, j0: int, j1: int, ms_hi_ref, ms_lo_ref,
                         oh_ref, c_hi_ref, c_lo_ref,
                         lprev_hi_ref, lprev_lo_ref,
                         dprev_hi_ref, dprev_lo_ref,
                         l_hi_ref, l_lo_ref, d_hi_ref, d_lo_ref,
                         isc_hi_ref, isc_lo_ref):
    """Left-looking LDL panel: factor columns [j0, j1) given columns
    < j0 (``lprev``/``dprev``).

    The single-program LDL compiles up to s = 36 but crashes the
    remote Mosaic compiler at s = 45; the column loop is sequential,
    so unlike the solves it cannot be chunked independently — instead
    each panel program applies the *left-looking* update (every k < j
    contribution, reading the already-factored columns from HBM) and
    factors only its own panel, bounding the per-program unroll to
    ~(j1 - j0) * s column-ops.  ``oh_ref`` gathers only this panel's
    Gram columns; the equilibration vector comes precomputed from
    ``_nd_cvec_kernel``.
    """
    b = ms_hi_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, b), 0)
    ms_hi = ms_hi_ref[:, :]
    ms_lo = ms_lo_ref[:, :]
    oh = oh_ref[:, :]
    Gpan = DF(
        jax.lax.dot(oh, ms_hi, precision=jax.lax.Precision.HIGHEST),
        jax.lax.dot(oh, ms_lo, precision=jax.lax.Precision.HIGHEST),
    )
    cvec = DF(c_hi_ref[:, :], c_lo_ref[:, :])

    def gcol(flat: DF, j) -> DF:
        return DF(flat.hi[j * s:(j + 1) * s, :], flat.lo[j * s:(j + 1) * s, :])

    def getrow(x: DF, i) -> DF:
        return DF(x.hi[i:i + 1, :], x.lo[i:i + 1, :])

    Lcols = [
        DF(lprev_hi_ref[k * s:(k + 1) * s, :], lprev_lo_ref[k * s:(k + 1) * s, :])
        for k in range(j0)
    ]
    dpivs = [
        DF(dprev_hi_ref[k:k + 1, :], dprev_lo_ref[k:k + 1, :])
        for k in range(j0)
    ]

    pivot_diag = np.float32(_PIVOT_DIAG * s)
    for j in range(j0, j1):
        acc = dfm.mul(dfm.mul(cvec, gcol(Gpan, j - j0)), getrow(cvec, j))
        for k in range(j):
            acc = dfm.sub(
                acc, dfm.mul(Lcols[k], dfm.mul(dpivs[k], getrow(Lcols[k], j)))
            )
        dj = getrow(acc, j)
        bad = dj.hi <= 0.0
        tiny = jnp.float32(1e-35)
        signed_tiny = DF(
            jnp.where(dj.hi < 0.0, -tiny, tiny), jnp.zeros_like(dj.hi)
        )
        dj = dfm.where(jnp.abs(dj.hi) < tiny, signed_tiny, dj)
        sq = dfm.sqrt(dfm.where(bad, dfm.df(1.0), dj))
        scale_j = DF(jnp.where(bad, pivot_diag, sq.hi),
                     jnp.where(bad, 0.0, sq.lo))
        inv_scale_j = dfm.div(dfm.df(1.0), scale_j)
        cu = dfm.div(acc, dj)
        below = row_ids > j
        on = row_ids == j
        cu = DF(
            jnp.where(on, 1.0, jnp.where(below, cu.hi, 0.0)),
            jnp.where(on, 0.0, jnp.where(below, cu.lo, 0.0)),
        )
        Lcols.append(cu)
        dpivs.append(dj)
        off = (j - j0)
        l_hi_ref[off * s:(off + 1) * s, :] = cu.hi
        l_lo_ref[off * s:(off + 1) * s, :] = cu.lo
        d_hi_ref[off:off + 1, :] = dj.hi
        d_lo_ref[off:off + 1, :] = dj.lo
        isc_hi_ref[off:off + 1, :] = inv_scale_j.hi
        isc_lo_ref[off:off + 1, :] = inv_scale_j.lo


# Per-program unroll budget for the staged builder's chunked stages, in
# solve rowops.  The monolithic kernel compiles at ~3100 rowops (s=28)
# and crashes the remote Mosaic compiler at ~5800 (s=36); 1600 leaves a
# 2x margin below the known-good size.
_STAGED_ROWOPS = 1600
# Largest s for the single-program LDL stage (measured: compiles at
# s = 36, remote Mosaic crash at s = 45); beyond it the panelled
# left-looking LDL takes over.
_LDL_MAX_S_SINGLE = 36


@functools.lru_cache(maxsize=None)
def _build_staged_kernels(s: int, z: int, block_b: int, interpret: bool):
    f32 = jnp.float32
    if s <= _LDL_MAX_S_SINGLE:
        ldl = ("single", pl.pallas_call(
            functools.partial(_nd_ldl_kernel, s),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
            out_shape=[
                jax.ShapeDtypeStruct((s * s, block_b), f32),
                jax.ShapeDtypeStruct((s * s, block_b), f32),
                jax.ShapeDtypeStruct((s, block_b), f32),
                jax.ShapeDtypeStruct((s, block_b), f32),
                jax.ShapeDtypeStruct((s, block_b), f32),
                jax.ShapeDtypeStruct((s, block_b), f32),
            ],
            interpret=interpret,
        ))
    else:
        cvec_call = pl.pallas_call(
            functools.partial(_nd_cvec_kernel, s),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2)],
            out_shape=[
                jax.ShapeDtypeStruct((s, block_b), f32) for _ in range(2)
            ],
            interpret=interpret,
        )
        # Heaviest panel does ~p * s column updates; the single-program
        # LDL compiles at 648 updates (s = 36) and crashes at 1013
        # (s = 45), so bound panels well below the known-good size.
        p = max(4, 560 // s)
        panels = []
        for j0 in range(0, s, p):
            j1 = min(s, j0 + p)
            panels.append((j0, j1, pl.pallas_call(
                functools.partial(_nd_ldl_panel_kernel, s, j0, j1),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(9)
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)
                ],
                out_shape=[
                    jax.ShapeDtypeStruct(((j1 - j0) * s, block_b), f32),
                    jax.ShapeDtypeStruct(((j1 - j0) * s, block_b), f32),
                    jax.ShapeDtypeStruct((j1 - j0, block_b), f32),
                    jax.ShapeDtypeStruct((j1 - j0, block_b), f32),
                    jax.ShapeDtypeStruct((j1 - j0, block_b), f32),
                    jax.ShapeDtypeStruct((j1 - j0, block_b), f32),
                ],
                interpret=interpret,
            )))
        ldl = ("panelled", cvec_call, panels)
    cols_per = max(1, _STAGED_ROWOPS // s)
    fsolves, tsolves = [], []
    for c0 in range(0, s, cols_per):
        c1 = min(s, c0 + cols_per)
        fsolves.append((c0, c1, pl.pallas_call(
            functools.partial(_nd_fsolve_kernel, s, c0, c1),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2)],
            out_shape=[
                jax.ShapeDtypeStruct(((c1 - c0) * s, block_b), f32)
                for _ in range(2)
            ],
            interpret=interpret,
        )))
        tsolves.append((c0, c1, pl.pallas_call(
            functools.partial(_nd_tsolve_kernel, s, c0, c1),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2)],
            out_shape=[
                jax.ShapeDtypeStruct(((c1 - c0) * s, block_b), f32)
                for _ in range(2)
            ],
            interpret=interpret,
        )))
    return ldl, fsolves, tsolves


def nd_k_pallas_staged(
    ms: Array,
    inds: np.ndarray,
    block_b: int = 128,
    interpret: bool = None,
) -> Array:
    """Staged multi-``pallas_call`` K-builder for large bases (s > 28).

    Splits the monolithic ``nd_k_pallas`` program — whose traced size
    crashes the remote Mosaic compiler at s = 36 even inside the VMEM
    budget — into one LDL program plus per-chunk forward/transpose
    solve programs with bounded unrolls (``_STAGED_ROWOPS``).  The
    factor L, the equilibration vector, and the solve workspace W
    round-trip through HBM between stages; at these sizes the extra
    traffic is well under the compute time.  Same math, same outputs
    as ``nd_k_pallas``.
    """
    if interpret is None:
        interpret = INTERPRET
    inds = np.asarray(inds, dtype=np.int64)
    d, s = inds.shape[0] - 1, inds.shape[1]
    # Largest live set in any one stage: the transpose solve holds the
    # full L and W plus a K chunk ~ 2.5 s^2 f32 pairs per lane (vs
    # (4 + d) s^2 for the monolithic kernel, whose whole pipeline is
    # live at once).  Measured: s = 66 (2D N = 11) compiles and runs
    # at the 128-lane floor (predicted 11.1 MB of the 16 MB scoped
    # budget; K vs host-f64 3.7e-12).
    per_lane_bytes = int(2.5 * s * s * 8)
    fit = int(14e6 / per_lane_bytes) // 128 * 128
    if fit < 128:
        raise ValueError(
            f"nd_k_pallas_staged: d={d}, s={s} needs {per_lane_bytes} "
            "B/lane; even the minimum 128-lane block exceeds VMEM — "
            "use the XLA K-builder instead."
        )
    block_b = min(block_b, fit)
    ms = jnp.asarray(ms)
    in_dtype = ms.dtype
    batch_shape = ms.shape[:-1]
    z = ms.shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1

    ms2 = ms.reshape(B, z).T
    pad = (-B) % block_b
    if pad:
        ms2 = jnp.concatenate([ms2, jnp.tile(ms2[:, :1], (1, pad))], axis=1)
    Bp = B + pad

    ms_df = dfm.from_f64(ms2)
    key = tuple(int(v) for v in inds.reshape(-1))
    oh_all = _nd_onehots(key, d, s, z)  # (d+1, s*s, z) numpy
    oh_g = jnp.asarray(oh_all[0])
    ldl, fsolves, tsolves = _build_staged_kernels(s, z, block_b, interpret)

    outs = []
    with dfm.barrier_mode("none" if not interpret else "xla"):
        for s0 in range(0, Bp, block_b):
            sl = slice(s0, s0 + block_b)
            mh, ml = ms_df.hi[:, sl], ms_df.lo[:, sl]
            if ldl[0] == "single":
                l_h, l_l, c_h, c_l, i_h, i_l = ldl[1](mh, ml, oh_g)
            else:
                _, cvec_call, panels = ldl
                ohdiag = jnp.asarray(
                    oh_all[0].reshape(s, s, z)[
                        np.arange(s), np.arange(s)
                    ]
                )  # (s, z): row j selects G[j, j]
                c_h, c_l = cvec_call(mh, ml, ohdiag)
                lparts_h, lparts_l = [], []
                dparts_h, dparts_l = [], []
                iparts_h, iparts_l = [], []
                for j0, j1, call in panels:
                    done = j0 * s
                    zl = jnp.zeros((s * s - done, block_b), jnp.float32)
                    lprev_h = jnp.concatenate(lparts_h + [zl], axis=0)
                    lprev_l = jnp.concatenate(lparts_l + [zl], axis=0)
                    zd = jnp.zeros((s - j0, block_b), jnp.float32)
                    dprev_h = jnp.concatenate(dparts_h + [zd], axis=0)
                    dprev_l = jnp.concatenate(dparts_l + [zd], axis=0)
                    oh_pan = jnp.asarray(oh_all[0][j0 * s:j1 * s])
                    ph, plo, dh, dlo, ih, ilo = call(
                        mh, ml, oh_pan, c_h, c_l,
                        lprev_h, lprev_l, dprev_h, dprev_l,
                    )
                    lparts_h.append(ph)
                    lparts_l.append(plo)
                    dparts_h.append(dh)
                    dparts_l.append(dlo)
                    iparts_h.append(ih)
                    iparts_l.append(ilo)
                l_h = jnp.concatenate(lparts_h, axis=0)
                l_l = jnp.concatenate(lparts_l, axis=0)
                i_h = jnp.concatenate(iparts_h, axis=0)
                i_l = jnp.concatenate(iparts_l, axis=0)
            per_dim = []
            for m in range(d):
                w_parts = []
                for c0, c1, call in fsolves:
                    oh_c = jnp.asarray(oh_all[m + 1][c0 * s:c1 * s])
                    w_parts.append(call(mh, ml, oh_c, l_h, l_l, c_h, c_l))
                w_h = jnp.concatenate([p[0] for p in w_parts], axis=0)
                w_l = jnp.concatenate([p[1] for p in w_parts], axis=0)
                k_parts = [
                    call(w_h, w_l, l_h, l_l, i_h, i_l)
                    for _, _, call in tsolves
                ]
                per_dim.append((
                    jnp.concatenate([p[0] for p in k_parts], axis=0),
                    jnp.concatenate([p[1] for p in k_parts], axis=0),
                ))
            outs.append((
                jnp.concatenate([p[0] for p in per_dim], axis=0),
                jnp.concatenate([p[1] for p in per_dim], axis=0),
            ))
    k_h = jnp.concatenate([o[0] for o in outs], axis=1)[:, :B]
    k_l = jnp.concatenate([o[1] for o in outs], axis=1)[:, :B]
    Ks = dfm.to_f64(DF(k_h, k_l)).astype(in_dtype)
    Ks = Ks.T.reshape(batch_shape + (d, s, s))
    return 0.5 * (Ks + jnp.swapaxes(Ks, -1, -2))


@functools.lru_cache(maxsize=None)
def _nd_onehots(inds_key, d: int, s: int, z: int):
    inds = np.asarray(inds_key, dtype=np.int64).reshape(d + 1, s, s)
    oh = np.zeros((d + 1, s * s, z), np.float32)
    for m in range(d + 1):
        for j in range(s):
            for i in range(s):
                oh[m, j * s + i, inds[m, i, j]] = 1.0
    return oh


@functools.lru_cache(maxsize=None)
def _build_nd_k_kernel(d: int, s: int, z: int, block_b: int,
                       interpret: bool):
    kern = functools.partial(_nd_k_kernel, d, s)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2)],
        out_shape=[
            jax.ShapeDtypeStruct((d * s * s, block_b), jnp.float32)
            for _ in range(2)
        ],
        interpret=interpret,
    )


def nd_k_pallas(
    ms: Array,
    inds: np.ndarray,
    block_b: int = 512,
    interpret: bool = None,
) -> Array:
    """The d multiplication operators K_m via the column-layout kernel.

    Unlike ``nd_eigh_pallas`` there is NO s gate: the O(s^3) eigen
    stage stays outside (pair with ``eigh_refined``).

    Parameters
    ----------
    ms : Array (..., z) f64 moment vectors.
    inds : (d + 1, s, s) static index tables.

    Returns
    -------
    Ks : (..., d, s, s) f64, symmetrised.
    """
    if interpret is None:
        interpret = INTERPRET
    inds = np.asarray(inds, dtype=np.int64)
    d, s = inds.shape[0] - 1, inds.shape[1]
    # The kernel's live DF column blocks (G/H gather, L columns, the
    # solve workspace, and the K output) total ~(4 + d) s^2 f32 pairs
    # per lane; cap the lane block so the scoped VMEM stack stays under
    # the 16M limit (s = 28 at 512 lanes needs 28M and is rejected).
    per_lane_bytes = (4 + d) * s * s * 8
    fit = int(10e6 / per_lane_bytes) // 128 * 128
    if fit < 128:
        # Even one 128-lane block exceeds the 10 MB budget.  Measured
        # (d=2, s=45, 12.4 MB): the remote Mosaic compile crashes, so
        # the old silent floor-to-128 reproduced the rejection the cap
        # exists to prevent (advisor r03 finding 1) — fail loudly; the
        # "auto" dispatch routes such sizes to the XLA path instead.
        raise ValueError(
            f"builder_nd_k_pallas: d={d}, s={s} needs "
            f"{per_lane_bytes} B/lane; even the minimum 128-lane "
            "block exceeds VMEM — use the XLA K-builder instead."
        )
    # Only ever *shrink* a caller-specified block (never grow past it).
    block_b = min(block_b, fit)
    ms = jnp.asarray(ms)
    in_dtype = ms.dtype
    batch_shape = ms.shape[:-1]
    z = ms.shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1

    ms2 = ms.reshape(B, z).T
    pad = (-B) % block_b
    if pad:
        ms2 = jnp.concatenate([ms2, jnp.tile(ms2[:, :1], (1, pad))], axis=1)
    Bp = B + pad

    ms_df = dfm.from_f64(ms2)
    key = tuple(int(v) for v in inds.reshape(-1))
    oh = jnp.asarray(
        _nd_onehots(key, d, s, z).reshape((d + 1) * s * s, z)
    )
    call = _build_nd_k_kernel(d, s, z, block_b, interpret)
    outs = []
    with dfm.barrier_mode("none" if not interpret else "xla"):
        for s0 in range(0, Bp, block_b):
            sl = slice(s0, s0 + block_b)
            outs.append(call(oh, ms_df.hi[:, sl], ms_df.lo[:, sl]))
    k_h = jnp.concatenate([o[0] for o in outs], axis=1)[:, :B]
    k_l = jnp.concatenate([o[1] for o in outs], axis=1)[:, :B]
    Ks = dfm.to_f64(DF(k_h, k_l)).astype(in_dtype)
    Ks = Ks.T.reshape(batch_shape + (d, s, s))
    return 0.5 * (Ks + jnp.swapaxes(Ks, -1, -2))


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


def run_nd_kernel_as_jnp(d, s, ig, ihs, ms_hi, ms_lo):
    """Execute the kernel body outside Pallas (testing / CPU oracle)."""
    B = ms_hi.shape[1]
    outs = [
        _ArrayRef(shape=(d * s, B)), _ArrayRef(shape=(d * s, B)),
        _ArrayRef(shape=(d * s * s, B)), _ArrayRef(shape=(d * s * s, B)),
    ]
    _nd_kernel(d, s, ig, ihs, _ArrayRef(ms_hi), _ArrayRef(ms_lo), *outs)
    return tuple(o.value for o in outs)


@functools.lru_cache(maxsize=None)
def _build_nd_kernel(d: int, s: int, inds_key, block_b: int, interpret: bool):
    inds = np.asarray(inds_key, dtype=np.int64).reshape(d + 1, s, s)
    kern = functools.partial(_nd_kernel, d, s, inds[0], inds[1:])
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)],
        out_shape=[
            jax.ShapeDtypeStruct((d * s, block_b), jnp.float32),
            jax.ShapeDtypeStruct((d * s, block_b), jnp.float32),
            jax.ShapeDtypeStruct((d * s * s, block_b), jnp.float32),
            jax.ShapeDtypeStruct((d * s * s, block_b), jnp.float32),
        ],
        interpret=interpret,
    )


def nd_eigh_pallas(
    ms: Array,
    inds: np.ndarray,
    block_b: int = 512,
    interpret: bool = None,
) -> Tuple[Array, Array]:
    """Eigenpairs of the d multiplication operators via the fused kernel.

    Parameters
    ----------
    ms : Array (..., z) f64 moment vectors.
    inds : (d + 1, s, s) static index tables.

    Returns
    -------
    vals : (..., d, s) f64, vecs : (..., d, s, s) f64 (columns are
    eigenvectors) — same convention as the XLA path.
    """
    if interpret is None:
        interpret = INTERPRET
    inds = np.asarray(inds, dtype=np.int64)
    d, s = inds.shape[0] - 1, inds.shape[1]
    if s > MAX_S:
        raise ValueError(
            f"fused N-D kernel supports s <= {MAX_S} (got s = {s}); "
            "use the XLA path"
        )
    # Scoped-VMEM lane cap.  Measured: every d=2, s<=10 program runs at
    # 512 lanes, but the d=3, s=10 program OOMs the 16 MB scoped VMEM
    # at 512 lanes — the compiler reported 42.75 MB, i.e. ~83.5 KB per
    # lane (the Jacobi eigen stage keeps d (s, s) operand/rotation sets
    # live).  Anchor the estimate at that measurement, scale by d*s^2,
    # and shrink the block to fit a 14 MB budget (floor one 128-lane
    # block, which fits: 128 x 83.5 KB = 10.7 MB).
    if d >= 3:
        per_lane = 83.5e3 * (d / 3.0) * (s * s / 100.0)
        fit = max(128, int(14e6 / per_lane) // 128 * 128)
        block_b = min(block_b, fit)
    ms = jnp.asarray(ms)
    in_dtype = ms.dtype
    batch_shape = ms.shape[:-1]
    z = ms.shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1

    ms2 = ms.reshape(B, z).T  # (z, B)
    pad = (-B) % block_b
    if pad:
        filler = ms2[:, :1]
        ms2 = jnp.concatenate([ms2, jnp.tile(filler, (1, pad))], axis=1)
    Bp = B + pad

    ms_df = dfm.from_f64(ms2)
    key = tuple(int(v) for v in inds.reshape(-1))
    call = _build_nd_kernel(d, s, key, block_b, interpret)
    outs = []
    with dfm.barrier_mode("none" if not interpret else "xla"):
        for s0 in range(0, Bp, block_b):
            sl = slice(s0, s0 + block_b)
            outs.append(call(ms_df.hi[:, sl], ms_df.lo[:, sl]))
    va_h = jnp.concatenate([o[0] for o in outs], axis=1)[:, :B]
    va_l = jnp.concatenate([o[1] for o in outs], axis=1)[:, :B]
    ve_h = jnp.concatenate([o[2] for o in outs], axis=1)[:, :B]
    ve_l = jnp.concatenate([o[3] for o in outs], axis=1)[:, :B]

    vals = dfm.to_f64(DF(va_h, va_l)).astype(in_dtype)
    vecs = dfm.to_f64(DF(ve_h, ve_l)).astype(in_dtype)
    vals = vals.T.reshape(batch_shape + (d, s))
    vecs = vecs.T.reshape(batch_shape + (d, s, s))
    return vals, vecs
