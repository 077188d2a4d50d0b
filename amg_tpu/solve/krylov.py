"""Krylov solvers (jittable, device-resident).

Replicas of the reference's coarsest-level solvers with the textbook-correct
numerics (the reference's CG beta uses an uninitialized GPU buffer,
amg/Solve/SSS_cycle.cu:373-374 — SURVEY.md "bugs to NOT replicate"):

* :func:`cg` — preconditioned conjugate gradients with the reference's
  safety nets expressed as loop-carried state: best-solution tracking
  (amg/Solve/SSS_cycle.cu:238-242) and divergence detection.
* :func:`gmres` — restarted GMRES with modified Gram-Schmidt and Givens
  rotations (amg/Solve/SSS_cycle.cu:440-817).

Both are pure functions of padded device arrays, run entirely under ``jit``
(``lax.while_loop`` over iterations), and reduce with ``psum`` when an
``axis_name`` is supplied so the same code serves the sharded solver.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..params import SMALLFLOAT
from ..sparse import Ell, Dia, Dense, BandedBlocks
from ..ops.spmv import spmv
from ..ops.blas import dot, norm2


def _as_op(a):
    if isinstance(a, (Ell, Dia, Dense, BandedBlocks)):
        return lambda v: spmv(a, v)
    return a


def cg(a, b, x0, tol=1e-7, maxit=250, M=None, axis_name=None,
       stop_type=None):
    """Conjugate gradients. Returns ``(x, converged)``.

    ``a`` is an :class:`Ell` or a matvec callable; ``M`` an optional
    preconditioner callable (z = M(r)).  ``stop_type`` replicates the
    reference's three criteria (amg/Solve/SSS_cycle.cu:101-130):

    * ``REL_RES`` (default): ``||r|| / max(eps, ||r0||) < tol``
    * ``REL_PRECRES``: ``sqrt(r.z) / sqrt(r0.z0) < tol`` (B-norm)
    * ``MOD_REL_RES``: ``||r|| / max(eps, ||x||) < tol``
    """
    from ..params import StopType

    amul = _as_op(a)
    prec = M if M is not None else (lambda v: v)
    st = StopType.REL_RES if stop_type is None else stop_type

    r0 = b - amul(x0)
    z0 = prec(r0)
    absres0 = norm2(r0, axis_name)
    normr0 = jnp.maximum(SMALLFLOAT, absres0)
    rho0 = dot(z0, r0, axis_name)
    prec0 = jnp.maximum(SMALLFLOAT, jnp.sqrt(jnp.abs(rho0)))

    def _ratio(x, r, rho):
        if st == StopType.REL_PRECRES:
            return jnp.sqrt(jnp.abs(rho)) / prec0
        if st == StopType.MOD_REL_RES:
            return norm2(r, axis_name) / jnp.maximum(
                SMALLFLOAT, norm2(x, axis_name))
        return norm2(r, axis_name) / normr0

    def cond(c):
        x, r, z, p, rho, it, absres, best_x, best_res = c
        return (it < maxit) & (_ratio(x, r, rho) >= tol) & (rho != 0.0)

    def body(c):
        x, r, z, p, rho, it, absres, best_x, best_res = c
        t = amul(p)
        denom = dot(p, t, axis_name)
        alpha = jnp.where(denom != 0, rho / jnp.where(denom != 0, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * t
        z = prec(r)
        rho_new = dot(z, r, axis_name)
        beta = jnp.where(rho != 0, rho_new / jnp.where(rho != 0, rho, 1.0), 0.0)
        p = z + beta * p
        absres = norm2(r, axis_name)
        better = absres < best_res
        best_x = jnp.where(better, x, best_x)
        best_res = jnp.where(better, absres, best_res)
        return (x, r, z, p, rho_new, it + 1, absres, best_x, best_res)

    init = (x0, r0, z0, z0, rho0, jnp.zeros((), jnp.int32), absres0, x0, absres0)
    x, r, z, p, rho, it, absres, best_x, best_res = jax.lax.while_loop(
        cond, body, init
    )
    converged = _ratio(x, r, rho) < tol
    # restore best solution when the final iterate diverged
    # (reference best-solution net, amg/Solve/SSS_cycle.cu:381-419)
    x = jnp.where(absres <= best_res, x, best_x)
    return x, converged


def fcg_init(amul, prec, b, x0, axis_name=None):
    """Initial state for flexible CG: ``(x, r, z, p, rho)``."""
    r0 = b - amul(x0)
    z0 = prec(r0)
    rho0 = dot(z0, r0, axis_name)
    return (x0, r0, z0, z0, rho0)


def fcg_step(amul, prec, state, axis_name=None):
    """One flexible-CG iteration (Notay's FCG / IPCG).

    Flexible CG tolerates a *variable* preconditioner — exactly what one AMG
    V-cycle in low precision with Krylov coarsest solves is — by computing
    beta with the Polak-Ribiere form ``<z_new, r_new - r_old> / <z_old,
    r_old>`` instead of the Fletcher-Reeves ratio.  Costs one extra dot per
    iteration vs. standard PCG.

    Returns ``(state, absres)``.
    """
    x, r, z, p, rho = state
    q = amul(p)
    denom = dot(p, q, axis_name)
    alpha = jnp.where(denom != 0, dot(p, r, axis_name)
                      / jnp.where(denom != 0, denom, 1.0), 0.0)
    x = x + alpha * p
    r_new = r - alpha * q
    z_new = prec(r_new)
    rho_new = dot(z_new, r_new, axis_name)
    # <z_new, r_new - r_old> = <z_new, -alpha q>
    rho_pr = rho_new - dot(z_new, r, axis_name)
    beta = jnp.where(rho != 0, rho_pr / jnp.where(rho != 0, rho, 1.0), 0.0)
    p = z_new + beta * p
    return (x, r_new, z_new, p, rho_new), norm2(r_new, axis_name)


def fcg(a, b, x0, tol=1e-7, maxit=100, M=None, axis_name=None):
    """Flexible preconditioned CG under one ``lax.while_loop``.

    Returns ``(x, nits, absres)``.  Stopping: ``||r|| / ||b|| < tol``
    (the AMG outer-loop criterion, amg/Solve/SSS_SOLVE.c:64-79, not the
    coarsest-CG criterion).
    """
    amul = _as_op(a)
    prec = M if M is not None else (lambda v: v)
    sumb = jnp.maximum(norm2(b, axis_name), SMALLFLOAT)
    st0 = fcg_init(amul, prec, b, x0, axis_name)
    absres0 = norm2(st0[1], axis_name)

    def cond(c):
        st, it, absres = c
        return (it < maxit) & (absres / sumb >= tol)

    def body(c):
        st, it, absres = c
        st, absres = fcg_step(amul, prec, st, axis_name)
        return (st, it + 1, absres)

    st, it, absres = jax.lax.while_loop(
        cond, body, (st0, jnp.zeros((), jnp.int32), absres0))
    return st[0], it, absres


def gmres(a, b, x0, tol=1e-7, maxit=1000, restart=30, M=None, axis_name=None,
          return_iters=False):
    """Restarted GMRES(m) with MGS + Givens. Returns ``(x, converged)``
    (or ``(x, converged, iters)`` with ``return_iters``).  ``M`` is applied
    as a RIGHT preconditioner (e.g. one AMG cycle), so the residual being
    driven down is the true residual."""
    amul = _as_op(a)
    prec = M if M is not None else (lambda v: v)
    m = restart
    n = b.shape[0]
    dtype = b.dtype

    r0 = b - amul(x0)
    beta0 = norm2(r0, axis_name)
    normr0 = jnp.maximum(SMALLFLOAT, beta0)

    def outer_cond(c):
        x, it, res, conv = c
        return (it < maxit) & (~conv)

    def outer_body(c):
        x, it, res, conv = c
        r = b - amul(x)
        beta = norm2(r, axis_name)

        V = jnp.zeros((m + 1, n), dtype)
        V = V.at[0].set(r / jnp.maximum(beta, SMALLFLOAT))
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)

        def arnoldi(j, st):
            V, H, cs, sn, g, done, k_eff = st
            w = amul(prec(V[j]))
            # modified Gram-Schmidt against all previous basis vectors
            def mgs(i, wh):
                w, hcol = wh
                hij = dot(V[i], w, axis_name)
                # only orthogonalize against built vectors (i <= j)
                hij = jnp.where(i <= j, hij, 0.0)
                w = w - hij * V[i]
                hcol = hcol.at[i].set(hij)
                return (w, hcol)

            w, hcol = jax.lax.fori_loop(0, m + 1, mgs, (w, jnp.zeros((m + 1,), dtype)))
            hj1 = norm2(w, axis_name)
            hcol = hcol.at[j + 1].set(hj1)
            V = V.at[j + 1].set(
                jnp.where(hj1 > SMALLFLOAT, w / jnp.maximum(hj1, SMALLFLOAT), w)
            )

            # apply previous Givens rotations to the new column
            def giv(i, hc):
                hi = cs[i] * hc[i] + sn[i] * hc[i + 1]
                hi1 = -sn[i] * hc[i] + cs[i] * hc[i + 1]
                sel = i < j
                hc = hc.at[i].set(jnp.where(sel, hi, hc[i]))
                hc = hc.at[i + 1].set(jnp.where(sel, hi1, hc[i + 1]))
                return hc

            hcol = jax.lax.fori_loop(0, m, giv, hcol)

            # new rotation annihilating hcol[j+1]
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            c_new = jnp.where(denom > SMALLFLOAT, hcol[j] / jnp.maximum(denom, SMALLFLOAT), 1.0)
            s_new = jnp.where(denom > SMALLFLOAT, hcol[j + 1] / jnp.maximum(denom, SMALLFLOAT), 0.0)
            cs = cs.at[j].set(jnp.where(done, cs[j], c_new))
            sn = sn.at[j].set(jnp.where(done, sn[j], s_new))
            hcol = hcol.at[j].set(c_new * hcol[j] + s_new * hcol[j + 1])
            hcol = hcol.at[j + 1].set(0.0)
            H = H.at[:, j].set(jnp.where(done, H[:, j], hcol))

            gj1 = -s_new * g[j]
            gj = c_new * g[j]
            g = g.at[j].set(jnp.where(done, g[j], gj))
            g = g.at[j + 1].set(jnp.where(done, g[j + 1], gj1))

            new_done = done | (jnp.abs(gj1) / normr0 < tol) | (hj1 <= SMALLFLOAT)
            k_eff = jnp.where(done, k_eff, j + 1)
            return (V, H, cs, sn, g, new_done, k_eff)

        st = (V, H, cs, sn, g, jnp.zeros((), bool), jnp.zeros((), jnp.int32))
        V, H, cs, sn, g, done, k_eff = jax.lax.fori_loop(0, m, arnoldi, st)

        # back-substitution on the k_eff x k_eff triangular system (masked)
        y = jnp.zeros((m,), dtype)

        def backsub(idx, y):
            jj = m - 1 - idx
            act = jj < k_eff
            s = g[jj] - jnp.dot(H[jj, :], y)
            hjj = H[jj, jj]
            val = jnp.where(jnp.abs(hjj) > SMALLFLOAT, s / jnp.where(hjj != 0, hjj, 1.0), 0.0)
            return y.at[jj].set(jnp.where(act, val, 0.0))

        y = jax.lax.fori_loop(0, m, backsub, y)
        dx = prec(V[:m].T @ y)
        x = x + dx

        res = jnp.abs(g[jnp.minimum(k_eff, m)])
        conv = res / normr0 < tol
        return (x, it + k_eff, res, conv)

    init = (x0, jnp.zeros((), jnp.int32), beta0, beta0 / normr0 < tol)
    x, it, res, conv = jax.lax.while_loop(outer_cond, outer_body, init)
    if return_iters:
        return x, conv, it
    return x, conv
