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


def _stencil_csr(n: int, terms) -> CSR:
    """Assemble a stencil matrix directly in CSR order — no sort.

    ``terms`` is a list of ``(offset, mask, value)`` sorted by offset;
    per-row nnz positions come from a running prefix over the sorted terms.
    O(nnz) with ~3 passes; a 10M-row 7-point matrix assembles in ~2s.
    """
    masks = [np.asarray(m) for (_, m, _) in terms]
    deg = np.zeros(n, dtype=np.int64)
    for m in masks:
        deg += m
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    nnz = int(indptr[-1])
    indices = np.empty(nnz, dtype=np.int32)
    data = np.empty(nnz, dtype=np.float64)
    idx = np.arange(n, dtype=np.int64)
    prefix = np.zeros(n, dtype=np.int64)
    for (off, _, val), m in zip(terms, masks):
        pos = indptr[:-1][m] + prefix[m]
        indices[pos] = (idx[m] + off).astype(np.int32)
        data[pos] = val
        prefix += m
    return CSR(indptr, indices, data, (n, n))


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
    ones = np.ones(n, dtype=bool)

    return _stencil_csr(n, [
        (-nx, iy > 0, -epsilon),
        (-1, ix > 0, -1.0),
        (0, ones, 2.0 + 2.0 * epsilon),
        (1, ix < nx - 1, -1.0),
        (nx, iy < ny - 1, -epsilon),
    ])


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
    ones = np.ones(n, dtype=bool)

    return _stencil_csr(n, [
        (-nx * ny, iz > 0, -1.0),
        (-nx, iy > 0, -1.0),
        (-1, ix > 0, -1.0),
        (0, ones, 6.0),
        (1, ix < nx - 1, -1.0),
        (nx, iy < ny - 1, -1.0),
        (nx * ny, iz < nz - 1, -1.0),
    ])


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
