"""Sparse matrix-vector products on device.

The hot kernel of the whole framework (SURVEY.md section 3.5): the
reference's CSR SpMV is a scalar row loop on CPU (``SSS_blas_mv_mxy``,
amg/SSS_utils.c:182-201) and a thread-per-row CUDA kernel
(``spmv_kernel``, amg/Solve/SSS_cuda.cu:77-96).

TPU-native design: matrices live in padded ELL (:class:`amg_tpu.sparse.Ell`)
so the product is

    y[i] = sum_w vals[i, w] * x[cols[i, w]]

a rectangular gather + multiply + small-axis reduction.  XLA lowers the
gather to efficient dynamic-slices over VMEM tiles and fuses the multiply
and reduction; the whole op is HBM-bandwidth bound, which is speed-of-light
for SpMV.  There is no host<->device traffic per call (the reference copies
A, x, y to the GPU on *every* SpMV, amg/Solve/SSS_cuda.cu:124-139).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse import Ell, Dia, Dense, BandedBlocks, WEll


def spmv_ell(a: Ell, x: jnp.ndarray) -> jnp.ndarray:
    """Gather-based ELL SpMV (general fallback)."""
    gathered = x[a.cols]                      # (pr, w) gather
    y = jnp.sum(a.vals * gathered, axis=1)
    return y


def spmv_well(a: WEll, x: jnp.ndarray) -> jnp.ndarray:
    """Windowed-gather ELL SpMV (unstructured TPU fast path).

    On TPU, the Pallas kernel (ops/pallas_well.py) resolves each slot
    with one VMEM dynamic slice + sublane gather + lane shuffle.  The
    XLA fallback below is the same math via a plain gather (fine on
    CPU; on TPU it would hit the scalar-loop gather path, but TPU
    always takes the kernel)."""
    from . import pallas_well

    if a.vals_lo is not None and pallas_well.usable_df64(a, x):
        return pallas_well.spmv_df64(a, x)
    if pallas_well.usable(a, x):
        return pallas_well.spmv(a, x)
    pc = a.pad_cols
    xp = jnp.pad(x, (0, pc - x.shape[0])) if x.shape[0] < pc else x[:pc]
    loc32 = a.loc.astype(jnp.int32)
    r = loc32 & 127
    q = jnp.take_along_axis(loc32, r, axis=3) >> 7   # Q table at lane=r
    idx = (a.base.astype(jnp.int32)[:, :, None, None] + q) * 128 + r
    v = a.vals
    if a.vals_lo is not None:
        # df64 split on a non-kernel path: recombine to the x precision
        v = v.astype(x.dtype) + a.vals_lo.astype(x.dtype)
    if v.dtype != x.dtype:
        v = v.astype(x.dtype)
    y = jnp.sum(v * xp[idx], axis=1)
    return y.reshape(a.padded_rows)


def spmv_dia(a: Dia, x: jnp.ndarray) -> jnp.ndarray:
    """Diagonal-offset SpMV: static shifted slices + FMA, no gathers.

    ~35x faster than the gather path on TPU (VPU streaming at HBM
    bandwidth); this is the per-chip speed-of-light kernel for banded
    operators (SURVEY.md section 3.5).

    Narrow stencils unroll fully (XLA fuses the FMA chain).  Wide stencils
    (embedded coarse operators can have hundreds of diagonals) run as a
    ``lax.scan`` over chunks of diagonals so the program stays small while
    each chunk still fuses.
    """
    from . import pallas_dia

    if pallas_dia.usable(a, x):
        # wide band: tiled Pallas kernel keeps the x window in VMEM
        # (the shifted-slice formulation re-reads x once per diagonal).
        # The custom-vmap wrapper makes this safe under jax.vmap (the
        # batched multi-rhs solver).
        return pallas_dia._spmv_vmappable(a, x)

    if a.vals.ndim == 3:
        # blocked (Pallas-native) storage on a non-Pallas path (CPU tests,
        # emulated meshes): fall back through the 2-D view.  The reshape
        # is a free view on CPU; on TPU this path is not the hot one.
        from ..sparse import Dia as _Dia

        return spmv_dia(
            _Dia(a.vals2d, a.offsets, a.shape, a.nnz), x
        )

    pad = a.padded_rows
    nd = len(a.offsets)
    lo = max(-min(a.offsets), 0) if a.offsets else 0
    hi = max(max(a.offsets), 0) if a.offsets else 0
    xp = jnp.pad(x, (lo, hi))

    chunk = 16
    # unroll generously: device-side loops (scan) serialize per-iteration
    # through remote-execution relays, and embedding caps stencils at
    # ~embed_max_diags anyway
    if nd <= 512:
        y = jnp.zeros((pad,), x.dtype)
        for k, off in enumerate(a.offsets):
            start = lo + off
            y = y + a.vals[k] * jax.lax.slice(xp, (start,), (start + pad,))
        return y

    nchunks = (nd + chunk - 1) // chunk
    nd_pad = nchunks * chunk
    vals = a.vals
    starts = np.asarray(a.offsets, dtype=np.int32) + lo
    if nd_pad != nd:
        vals = jnp.pad(vals, ((0, nd_pad - nd), (0, 0)))
        starts = np.pad(starts, (0, nd_pad - nd))
    vals_c = vals.reshape(nchunks, chunk, pad)
    starts_c = jnp.asarray(starts.reshape(nchunks, chunk))

    def body(y, sc):
        v, s = sc
        for j in range(chunk):
            y = y + v[j] * jax.lax.dynamic_slice(xp, (s[j],), (pad,))
        return y, None

    y, _ = jax.lax.scan(body, jnp.zeros((pad,), x.dtype), (vals_c, starts_c))
    return y


def spmv_dense(a: Dense, x: jnp.ndarray) -> jnp.ndarray:
    """Dense matvec on the MXU (small deep levels; no gathers)."""
    return a.vals @ x[: a.padded_cols]


def spmv_banded(a: BandedBlocks, x: jnp.ndarray) -> jnp.ndarray:
    """Block-banded SpMV: static shifted x slices + one batched 128x128
    block matvec — pure streaming + MXU, no gathers.  The RCM-ordered
    replacement for gather-ELL coarse levels."""
    nbr = a.vals.shape[0]
    w = a.vals.shape[1]
    nb = a.nb
    pad = nbr * 128
    xp = jnp.pad(x[:pad], (nb * 128, nb * 128)).astype(a.vals.dtype)
    xw = jnp.stack(
        [jax.lax.slice(xp, (d * 128,), (d * 128 + pad,)).reshape(nbr, 128)
         for d in range(w)],
        axis=1,
    )  # (nbr, w, 128): block-column d of block-row i = x block i + d - nb
    y = jnp.einsum("idrc,idc->ir", a.vals, xw,
                   preferred_element_type=x.dtype)
    return y.reshape(pad).astype(x.dtype)


def spmv(a, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x. Returns a vector of length ``a.padded_rows`` (padding rows
    produce zeros because their values are zero).  Dispatches on format."""
    if isinstance(a, Dia):
        return spmv_dia(a, x)
    if isinstance(a, Dense):
        return spmv_dense(a, x)
    if isinstance(a, BandedBlocks):
        return spmv_banded(a, x)
    if isinstance(a, WEll):
        return spmv_well(a, x)
    return spmv_ell(a, x)


def spmv_n(a: Ell, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x truncated to the logical row count."""
    return spmv(a, x)[: a.n_rows]


def residual(a: Ell, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """r = b - A @ x (reference ``SSS_blas_mv_amxpy`` with alpha=-1 as used
    by the outer loop, amg/Solve/SSS_SOLVE.c:59-60)."""
    return b - spmv(a, x)[: b.shape[0]]


def residual_fused(a, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """r = b - A @ x, with the subtraction fused INTO the Pallas DIA
    kernel when it applies (XLA cannot fuse an elementwise op into a
    pallas_call, so the plain form pays an extra ~12 B/row pass on the
    hot fine level)."""
    from . import pallas_dia

    if isinstance(a, Dia) and b.shape[0] == a.padded_rows \
            and pallas_dia.usable(a, x):
        return pallas_dia.resid(a, x, b)
    return b - spmv(a, x)[: b.shape[0]]
