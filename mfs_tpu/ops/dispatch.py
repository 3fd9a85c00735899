"""Measured kernel-dispatch policy for ``eigh_impl="auto"``.

The fused double-f32 Pallas quadrature amortises over the lane
dimension: its cost is flat up to one lane block (the wrapper pads the
batch), so it wins exactly when the trial batch is large enough to
fill the block it pays for.  The refined XLA-f64 path scales down to
single trials.  Neither default is right everywhere — VERDICT r03
measured a 2.7x foot-gun at ND N=3/B=64 with the pallas default and
the inverse 2.3x at B=256 with the refined default.

``resolve_impl*`` below encode the crossover measured on a real TPU
v5e by ``tools/measure_dispatch.py`` (table: ``tools/DISPATCH_MEASURE
.json``; summary in BASELINE.md).  On non-TPU platforms "auto" always
resolves to "refined" (the Pallas kernels target Mosaic; interpret
mode is for tests).

The policy sees the *static flat batch size* of the quadrature call
(shapes are compile-time constants under jit).  Inside an outer
``jax.vmap`` the mapped axis is invisible to the trace, so "auto"
would under-count the batch — the filters are batch-first by
construction and never vmap the trial axis, but user code that does
should pass an explicit ``eigh_impl``.
"""
import jax

# Measured minimum flat batch at which the fused 1D Pallas kernel beats
# the refined XLA path for a full filter pass (tools/measure_dispatch.py
# on TPU v5e, 2026-08; table in tools/DISPATCH_MEASURE.json, summary in
# BASELINE.md).  The kernel pads to a 512-lane block yet wins at EVERY
# measured batch down to B=4 (1.9x at N=4/B=4 up to 43x at N=15/B=512)
# because the XLA-f64 emulation overhead exceeds the padding waste.
_MIN_BATCH_PALLAS_1D = 1
# Measured upper order boundary for the fused 1D kernel (VERDICT r04
# item 4): the statically-unrolled O(n^2) column program compiles and
# wins at every measured n up to 32 (33x at n=16 to 121x at n=32,
# B=512 — tools/DISPATCH_MEASURE.json; no Mosaic statement-count crash
# in range, unlike the ND K-builder's s=36 wall).  Orders beyond 32
# (modes of 64 moments) are unmeasured territory — route them to the
# refined XLA path rather than risk an unbounded remote compile.
_MAX_N_PALLAS_1D = 32

# ND: the fused kernel (s <= 10) and the hybrid K-builder + refined
# eigh (s > 10) beat the all-XLA refined path at every measured cell —
# N in {3,5,7} x B in {32..512}: 1.4x to 2.6x (tools/DISPATCH_MEASURE
# .json).  The only gate is VMEM feasibility of the K-builder's
# minimum 128-lane block (d=2: s <= ~49), checked in resolve_impl_nd.
_MIN_BATCH_PALLAS_ND = 1
# mirror of the K-builder's VMEM budget (pallas_quadrature_nd):
# (4 + d) * s^2 * 8 bytes/lane must fit a 128-lane block in the 10 MB
# budget.
_ND_VMEM_BUDGET = 10e6
# Measured Mosaic-compile feasibility (tools/DISPATCH_MEASURE.json):
# the MONOLITHIC K-builder's per-entry unrolled program compiles and
# wins at s = 28 (d=2 N=7) but the remote compile crashes at s = 36
# and 45 even though both fit the VMEM budget — the statement count,
# not memory, is the boundary.  Above it the STAGED multi-pallas_call
# builder (panelled left-looking LDL + chunked solves,
# ``nd_k_pallas_staged``) takes over: measured to compile and beat
# refined at s = 36 (1.23-1.27x), s = 45 (1.2x), and s = 66 (1.14x,
# 2D N = 11) — the reference's whole GPU sweep.  s > 66 is unmeasured
# compile territory (the staged VMEM wall is ~s = 79 at 128 lanes).
_ND_MAX_S_PALLAS = 28        # monolithic program boundary
_ND_MAX_S_PALLAS_STAGED = 66  # staged-builder measured boundary


def _default_platform() -> str:
    """Platform of the device computations will actually land on."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def resolve_impl_1d(n: int, batch: int, requested: str = "auto") -> str:
    """Resolve ``eigh_impl`` for the 1D quadrature.

    Parameters: ``n`` quadrature order (= moment count / 2), ``batch``
    flat trial count, ``requested`` the user's choice ("auto" or any
    concrete impl, which is passed through).
    """
    if requested != "auto":
        return requested
    if _default_platform() != "tpu":
        return "refined"
    if n > _MAX_N_PALLAS_1D:
        return "refined"  # beyond the measured compile/win range
    return "pallas" if batch >= _MIN_BATCH_PALLAS_1D else "refined"


def resolve_impl_nd(
    s: int, batch: int, requested: str = "auto", d: int = 2
) -> str:
    """Resolve ``eigh_impl`` for the ND quadrature (``s`` = basis size)."""
    if requested != "auto":
        return requested
    if _default_platform() != "tpu":
        return "refined"
    if s > _ND_MAX_S_PALLAS_STAGED:
        return "refined"  # beyond the staged builder's measured range
    if s > _ND_MAX_S_PALLAS:
        # staged builder: largest per-stage live set ~2.5 s^2 DF pairs
        # (the transpose solve holds L + W + a K chunk; measured good
        # at s = 66 / 128 lanes)
        if int(2.5 * s * s * 8) * 128 > 14e6:
            return "refined"
        return "pallas" if batch >= _MIN_BATCH_PALLAS_ND else "refined"
    if (4 + d) * s * s * 8 * 128 > _ND_VMEM_BUDGET:
        return "refined"  # K-builder's minimum block cannot fit VMEM
    if d >= 3 and s < 10:
        # Measured (3D Lotka-Volterra, T=200, B=64, SUMMARY_lotka_
        # volterra_3d.json): at d=3 s=4 the fused kernel loses to
        # refined 2.6x (4.6 vs 1.7 s) — the tiny eigenproblems cannot
        # amortise the d^2-growing VMEM-capped lane blocks — while at
        # d=3 s=10 it wins 1.22x (19.1 vs 23.3 s).
        return "refined"
    return "pallas" if batch >= _MIN_BATCH_PALLAS_ND else "refined"
