"""Model-problem generators.

The reference bundles a single test matrix (HB/1138_bus).  The BASELINE
configs additionally call for generated Poisson problems:

* 2D 5-point Poisson (Dirichlet), size nx*ny
* 3D 7-point Poisson, size nx*ny*nz
* anisotropic 2D Poisson (epsilon-scaled y-coupling)

All generators emit host :class:`~amg_tpu.sparse.CSR` directly (vectorized
stencil assembly, no Python loops) so 10M+ row problems build in seconds.
"""

from __future__ import annotations

import numpy as np

from ..sparse import CSR


def poisson2d(nx: int, ny: int | None = None, epsilon: float = 1.0) -> CSR:
    """2D 5-point Laplacian on an nx-by-ny grid, Dirichlet boundaries.

    ``epsilon`` scales the y-direction coupling (anisotropy); stencil is
    [ -eps; -1, 2+2*eps, -1; -eps ].
    """
    if ny is None:
        ny = nx
    n = nx * ny
    idx = np.arange(n, dtype=np.int64)
    ix = idx % nx
    iy = idx // nx

    diag_val = 2.0 + 2.0 * epsilon

    rows = [idx]
    cols = [idx]
    vals = [np.full(n, diag_val)]

    # left/right neighbors (x direction, coupling -1)
    m = ix > 0
    rows.append(idx[m]); cols.append(idx[m] - 1); vals.append(np.full(m.sum(), -1.0))
    m = ix < nx - 1
    rows.append(idx[m]); cols.append(idx[m] + 1); vals.append(np.full(m.sum(), -1.0))
    # down/up neighbors (y direction, coupling -epsilon)
    m = iy > 0
    rows.append(idx[m]); cols.append(idx[m] - nx); vals.append(np.full(m.sum(), -epsilon))
    m = iy < ny - 1
    rows.append(idx[m]); cols.append(idx[m] + nx); vals.append(np.full(m.sum(), -epsilon))

    return CSR.from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), (n, n)
    )


def poisson3d(nx: int, ny: int | None = None, nz: int | None = None) -> CSR:
    """3D 7-point Laplacian on nx*ny*nz grid, Dirichlet boundaries."""
    if ny is None:
        ny = nx
    if nz is None:
        nz = nx
    n = nx * ny * nz
    idx = np.arange(n, dtype=np.int64)
    ix = idx % nx
    iy = (idx // nx) % ny
    iz = idx // (nx * ny)

    rows = [idx]
    cols = [idx]
    vals = [np.full(n, 6.0)]

    for mask, off in (
        (ix > 0, -1),
        (ix < nx - 1, 1),
        (iy > 0, -nx),
        (iy < ny - 1, nx),
        (iz > 0, -nx * ny),
        (iz < nz - 1, nx * ny),
    ):
        rows.append(idx[mask])
        cols.append(idx[mask] + off)
        vals.append(np.full(mask.sum(), -1.0))

    return CSR.from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), (n, n)
    )


def random_spd(n: int, density: float = 0.05, seed: int = 0) -> CSR:
    """Random diagonally-dominant SPD matrix (test fixture)."""
    rng = np.random.default_rng(seed)
    nnz = max(int(n * n * density), n)
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = -rng.random(nnz)
    # symmetrize
    r = np.concatenate([rows, cols])
    c = np.concatenate([cols, rows])
    v = np.concatenate([vals, vals]) * 0.5
    off = r != c
    a = CSR.from_coo(r[off], c[off], v[off], (n, n))
    # diagonal = 1 + sum|offdiag| per row  -> strictly diagonally dominant
    rowsum = np.zeros(n)
    rr = np.repeat(np.arange(n), a.row_degrees)
    np.add.at(rowsum, rr, np.abs(a.data))
    d = CSR.from_coo(np.arange(n), np.arange(n), 1.0 + rowsum, (n, n))
    return CSR.from_coo(
        np.concatenate([np.repeat(np.arange(n), a.row_degrees), np.arange(n)]),
        np.concatenate([a.indices, np.arange(n)]),
        np.concatenate([a.data, d.data]),
        (n, n),
    )
