"""CSR / ELL container tests (vs scipy oracles)."""

import numpy as np
import pytest

import amg_tpu as amg
from amg_tpu.sparse import CSR, Ell


def _random_csr(rng, m=40, n=50, density=0.1):
    import scipy.sparse as sp

    a = sp.random(m, n, density=density, random_state=np.random.RandomState(0),
                  format="csr")
    a.data = rng.standard_normal(a.nnz)
    return a


def test_from_coo_dedup():
    a = CSR.from_coo([0, 0, 1], [1, 1, 0], [2.0, 3.0, 4.0], (2, 2))
    assert a.nnz == 2
    d = a.to_dense()
    assert d[0, 1] == 5.0 and d[1, 0] == 4.0


def test_transpose_matches_scipy(rng):
    s = _random_csr(rng)
    a = CSR.from_scipy(s)
    at = a.transpose()
    np.testing.assert_allclose(at.to_dense(), s.T.toarray(), atol=1e-14)


def test_matvec_matches_scipy(rng):
    s = _random_csr(rng)
    a = CSR.from_scipy(s)
    x = rng.standard_normal(a.n_cols)
    np.testing.assert_allclose(a.matvec(x), s @ x, rtol=1e-13)


def test_diagonal(rng):
    a = amg.poisson2d(8)
    np.testing.assert_allclose(a.diagonal_fast(), np.full(64, 4.0))
    np.testing.assert_allclose(a.diagonal(), a.diagonal_fast())


def test_ell_roundtrip(rng):
    s = _random_csr(rng, 33, 33, 0.15)
    a = CSR.from_scipy(s)
    e = Ell.from_csr(a)
    assert e.padded_rows % 8 == 0
    back = e.to_csr()
    np.testing.assert_allclose(back.to_dense(), a.to_dense(), atol=1e-14)


def test_ell_spmv(rng):
    from amg_tpu.ops.spmv import spmv, spmv_n, residual

    s = _random_csr(rng, 37, 41, 0.2)
    a = CSR.from_scipy(s)
    e = Ell.from_csr(a)
    x = rng.standard_normal(41)
    y = np.asarray(spmv(e, x))
    np.testing.assert_allclose(y[:37], s @ x, rtol=1e-12)
    assert np.all(y[37:] == 0)
    np.testing.assert_allclose(np.asarray(spmv_n(e, x)), s @ x, rtol=1e-12)
    b = rng.standard_normal(37)
    np.testing.assert_allclose(np.asarray(residual(e, x, b)), b - s @ x,
                               rtol=1e-12)


def test_ell_row_padding():
    a = amg.poisson2d(5)  # 25 rows
    e = Ell.from_csr(a, pad_rows_to=64)
    assert e.padded_rows == 64
    x = np.ones(25)
    from amg_tpu.ops.spmv import spmv

    y = np.asarray(spmv(e, x))
    np.testing.assert_allclose(y[:25], a.matvec(x), rtol=1e-13)
    assert np.all(y[25:] == 0)


def test_dia_roundtrip():
    from amg_tpu.sparse import Dia

    a = amg.poisson2d(9)
    d = Dia.from_csr(a)
    assert d.n_diags == 5
    np.testing.assert_allclose(d.to_csr().to_dense(), a.to_dense())


def test_dia_spmv_matches_csr(rng):
    from amg_tpu.sparse import Dia
    from amg_tpu.ops.spmv import spmv

    a = amg.poisson2d(11)
    d = Dia.from_csr(a)
    x = np.zeros(d.padded_rows)
    x[: a.n_rows] = rng.standard_normal(a.n_rows)
    import jax.numpy as jnp

    y = np.asarray(spmv(d, jnp.asarray(x)))
    np.testing.assert_allclose(y[: a.n_rows], a.matvec(x[: a.n_rows]),
                               rtol=1e-13)
    assert np.all(y[a.n_rows:] == 0)


def test_dia_num_offsets():
    from amg_tpu.sparse import Dia

    a = amg.poisson3d(5)
    assert Dia.num_offsets(a) == 7


def test_pallas_dia_kernel_interpret():
    """The Pallas wide-DIA SpMV kernel (interpret mode) matches the host
    CSR product."""
    import jax.numpy as jnp
    import amg_tpu as amg
    from amg_tpu.ops import pallas_dia
    from amg_tpu.sparse import Dia

    n = pallas_dia.TILE * 2
    rng = np.random.default_rng(0)
    # banded matrix with ~40 scattered diagonals
    offs = np.unique(rng.integers(-300, 300, 40))
    rows_l, cols_l, vals_l = [], [], []
    for o in offs:
        i = np.arange(max(0, -o), min(n, n - o))
        rows_l.append(i)
        cols_l.append(i + o)
        vals_l.append(rng.standard_normal(len(i)))
    a = CSR.from_coo(np.concatenate(rows_l), np.concatenate(cols_l),
                     np.concatenate(vals_l), (n, n))
    d = Dia.from_csr(a, dtype=jnp.float32, pad_rows_to=n)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(pallas_dia.spmv(d, jnp.asarray(x), interpret=True))
    want = a.matvec(x.astype(np.float64))
    np.testing.assert_allclose(y, want, rtol=2e-5, atol=1e-5)


def test_pallas_dia_narrow_band_interpret():
    """Narrow stencil (7 diagonals, wide span) through the tile-picking
    window kernel matches the host product — the round-3 extension that
    lets the fine Poisson operator run in Pallas instead of XLA shifted
    slices (which re-read x once per diagonal)."""
    import jax.numpy as jnp
    from amg_tpu.ops import pallas_dia
    from amg_tpu.sparse import Dia

    n = 40960  # one big tile: amplification (tile+span)/tile stays low
    a = amg.poisson3d(34)  # 39304 rows, 7 diagonals, span +/-1156
    d = Dia.from_csr(a, dtype=jnp.float32, pad_rows_to=n)
    assert len(d.offsets) == 7
    # the picker must select a tile for this pad and judge it profitable
    tile = pallas_dia._pick_tile(7, 1156, 1156, 4, 4, n)
    assert tile == 40960
    assert pallas_dia.will_use(tuple(d.offsets), n, jnp.float32, jnp.float32)
    rng_ = np.random.default_rng(3)
    x = np.zeros(n, dtype=np.float32)
    x[: a.n_rows] = rng_.standard_normal(a.n_rows)
    y = np.asarray(pallas_dia.spmv(d, jnp.asarray(x), interpret=True))
    want = a.matvec(x[: a.n_rows].astype(np.float64))
    np.testing.assert_allclose(y[: a.n_rows], want, rtol=2e-5, atol=1e-5)


def test_pallas_pick_tile_rules():
    """Tile selection: wide bands are VMEM-capped to small tiles, narrow
    bands get the largest dividing tile, and the XLA path keeps very
    narrow/span-heavy cases."""
    from amg_tpu.ops import pallas_dia

    # 201 diagonals f32: 2*201*t*4 bytes of double-buffered vals caps the
    # tile well below the maximum
    assert pallas_dia._pick_tile(201, 500, 500, 4, 4, 40960) in (4096, 8192)
    assert pallas_dia._pick_tile(300, 500, 500, 4, 4, 40960) == 4096
    # too many value planes for VMEM at any tile -> no kernel
    assert pallas_dia._pick_tile(420, 500, 500, 4, 4, 40960) is None
    # 7 diagonals: largest tile
    assert pallas_dia._pick_tile(7, 10000, 10000, 4, 4, 1024000) == 40960
    # pad not divisible by the larger tiles
    assert pallas_dia._pick_tile(7, 100, 100, 4, 4, 8192) == 8192
    # profitability: tridiagonal with a huge span at a small tile loses
    assert not pallas_dia._wins_vs_xla(3, 4000, 4000, 4096, 4, 4)
    # pad rounding helper prefers the largest tile within 2.5%
    assert pallas_dia.good_pad(1000000) == 1024000
    assert pallas_dia.good_pad(9938376) == 9994240
    assert pallas_dia.good_pad(262144) == 266240


def test_dia_blocked_layout_roundtrip():
    """Blocked (nd, pad//128, 128) Dia storage: same SpMV results and
    host round-trip as the 2-D layout."""
    import jax.numpy as jnp
    import amg_tpu as amg
    from amg_tpu.sparse import Dia
    from amg_tpu.ops.spmv import spmv

    a = amg.poisson3d(8)
    pad = 1024  # multiple of 128
    d2 = Dia.from_csr(a, dtype=jnp.float64, pad_rows_to=pad)
    d3 = Dia.from_csr(a, dtype=jnp.float64, pad_rows_to=pad, blocked=True)
    assert d3.blocked and d3.vals.ndim == 3
    assert d3.padded_rows == d2.padded_rows
    x = jnp.asarray(np.random.default_rng(0).standard_normal(pad))
    np.testing.assert_allclose(np.asarray(spmv(d3, x)),
                               np.asarray(spmv(d2, x)), rtol=1e-13)
    c2, c3 = d2.to_csr().to_dense(), d3.to_csr().to_dense()
    np.testing.assert_allclose(c3, c2)


def test_pallas_kernel_blocked_vals():
    """The Pallas kernel consumes blocked vals without reshaping."""
    import jax.numpy as jnp
    from amg_tpu.sparse import Dia
    from amg_tpu.ops import pallas_dia
    from amg_tpu.ops.spmv import spmv_dia

    n = pallas_dia.TILE
    offs = tuple(range(-40, 41, 2))
    rng_ = np.random.default_rng(1)
    vals2 = rng_.standard_normal((len(offs), n)).astype(np.float32)
    d2 = Dia(jnp.asarray(vals2), offs, (n, n), len(offs) * n)
    d3 = Dia(jnp.asarray(vals2.reshape(len(offs), n // 128, 128)),
             offs, (n, n), len(offs) * n)
    x = jnp.asarray(rng_.standard_normal(n).astype(np.float32))
    y3 = np.asarray(pallas_dia.spmv(d3, x, interpret=True))
    y2 = np.asarray(spmv_dia(d2, x))
    # f32 with a different accumulation order (grouped by lane remainder)
    np.testing.assert_allclose(y3, y2, rtol=2e-4, atol=1e-5)


def test_banded_blocks_matches_csr():
    """BandedBlocks SpMV == host CSR matvec, round-trip preserved."""
    import jax.numpy as jnp
    import amg_tpu as amg
    from amg_tpu.sparse import BandedBlocks
    from amg_tpu.ops.spmv import spmv

    a = amg.poisson3d(8)  # n=512, bandwidth 64 -> nb=1
    bb = BandedBlocks.from_csr(a, dtype=jnp.float64)
    assert bb.nb >= 1 and bb.padded_rows % 128 == 0
    rng_ = np.random.default_rng(7)
    x = rng_.standard_normal(bb.padded_rows)
    x[a.n_rows:] = 0.0
    y = np.asarray(spmv(bb, jnp.asarray(x)))
    want = a.matvec(x[: a.n_rows])
    np.testing.assert_allclose(y[: a.n_rows], want, rtol=1e-13, atol=1e-13)
    assert y[a.n_rows:].size == 0 or np.abs(y[a.n_rows:]).max() == 0.0
    np.testing.assert_allclose(bb.to_csr().to_dense(), a.to_dense())


def test_pallas_multi_rhs_interpret():
    """The multi-rhs kernel (interpret mode) matches per-column SpMV,
    both directly and through the custom-vmap rule."""
    import jax
    import jax.numpy as jnp
    from amg_tpu.ops import pallas_dia
    from amg_tpu.sparse import Dia
    from amg_tpu.ops.spmv import spmv_dia

    n = pallas_dia.TILE
    offs = tuple(range(-48, 49, 3))
    rng_ = np.random.default_rng(2)
    vals = rng_.standard_normal((len(offs), n)).astype(np.float32)
    d = Dia(jnp.asarray(vals), offs, (n, n), len(offs) * n)
    k = 4
    xb = jnp.asarray(rng_.standard_normal((k, n)).astype(np.float32))
    ys = np.asarray(pallas_dia.spmv_multi(d, xb, interpret=True))
    for j in range(k):
        want = np.asarray(spmv_dia(d, xb[j]))
        np.testing.assert_allclose(ys[j], want, rtol=2e-4, atol=1e-5)


def test_blas1_matches_numpy(rng):
    """BLAS-1 surface (reference SSS_blas_array_*, amg/SSS_utils.c:151-260)."""
    import jax.numpy as jnp
    from amg_tpu.ops.blas import dot, norm2, norminf, axpy, axpby

    x = rng.standard_normal(97)
    y = rng.standard_normal(97)
    jx, jy = jnp.asarray(x), jnp.asarray(y)
    np.testing.assert_allclose(float(dot(jx, jy)), x @ y, rtol=1e-12)
    np.testing.assert_allclose(float(norm2(jx)), np.linalg.norm(x), rtol=1e-12)
    np.testing.assert_allclose(float(norminf(jx)), np.abs(x).max(), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(axpy(0.7, jx, jy)), 0.7 * x + y,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(axpby(0.3, jx, -1.2, jy)),
                               0.3 * x - 1.2 * y, rtol=1e-12)


def test_well_roundtrip_and_spmv(rng):
    """WEll packing invariants + SpMV vs scipy on an unstructured matrix
    (the TPU-native answer to the reference's general CSR SpMV,
    amg/SSS_utils.c:182-201)."""
    import jax.numpy as jnp
    from amg_tpu.io.generators import fem2d
    from amg_tpu.sparse import WEll
    from amg_tpu.ops.spmv import spmv

    a = fem2d(3000, seed=1)
    # f64 pack: the roundtrip is exact
    w64 = WEll.from_csr(a, dtype=jnp.float64)
    back = w64.to_csr()
    diff = (a.to_scipy() - back.to_scipy()).tocoo()
    diff.eliminate_zeros()
    assert diff.nnz == 0

    w = WEll.from_csr(a, dtype=jnp.float32)

    # packing invariants: remainders in [0,128), Q blocks in [0,8),
    # windows inside the padded x; int16 storage of (Q << 7) | r
    loc = np.asarray(w.loc)
    assert loc.dtype == np.int16
    loc = loc.astype(np.int32)
    base = np.asarray(w.base)
    assert ((loc & 127) < 128).all() and (loc >= 0).all()
    assert (loc >> 7 < 8).all()
    assert base.min() >= 0
    assert (128 * base.max() + 1024) <= w.pad_cols

    x = rng.standard_normal(a.n_cols).astype(np.float32)
    y = np.asarray(spmv(w, jnp.asarray(x)))[: a.n_rows]
    want = a.to_scipy() @ x
    np.testing.assert_allclose(y, want, rtol=2e-4, atol=2e-4)


def test_well_rectangular(rng):
    """WEll on a rectangular operator (P/R shapes)."""
    import jax.numpy as jnp
    from amg_tpu.sparse import WEll
    from amg_tpu.ops.spmv import spmv

    a = CSR.from_scipy(_random_csr(rng, m=1500, n=700, density=0.01))
    w = WEll.from_csr(a, dtype=jnp.float32)
    x = rng.standard_normal(a.n_cols).astype(np.float32)
    y = np.asarray(spmv(w, jnp.asarray(x)))[: a.n_rows]
    want = a.to_scipy() @ x
    np.testing.assert_allclose(y, want, rtol=2e-4, atol=2e-4)


def test_well_df64_spmv(rng):
    """The double-single (df64) WEll path delivers an f64-quality matvec
    from f32 planes: split-pack roundtrip is ~exact and both the Pallas
    kernel (interpret) and the XLA fallback match scipy f64 to ~1e-13 —
    far beyond f32's ~1e-6 (this backs the mixed-precision outer loop on
    TPU, which has no hardware f64)."""
    import jax.numpy as jnp
    from amg_tpu.io.generators import fem2d
    from amg_tpu.sparse import WEll
    from amg_tpu.ops import pallas_well
    from amg_tpu.ops.spmv import spmv

    a = fem2d(3000, seed=4)
    w = WEll.from_csr_df64(a)
    # split reproduces the f64 operator to double-single precision:
    # 24+24 = 48 mantissa bits, so ~2^-48 RELATIVE error is the exact
    # representation floor (the old absolute-1e-15 bound was a dead
    # assertion — an operator precedence bug kept it from running; once
    # fixed it failed, correctly, on the 1e3-conductivity entries)
    back = w.to_csr().to_scipy() - a.to_scipy()
    scale = np.abs(a.data).max()
    rel = (np.abs(back.data).max() / scale) if back.nnz else 0.0
    assert rel < 1e-13, rel

    x = rng.standard_normal(a.n_cols)
    want = a.to_scipy() @ x
    scale = np.abs(want).max()

    y_fb = np.asarray(spmv(w, jnp.asarray(x)))[: a.n_rows]
    assert np.abs(y_fb - want).max() / scale < 1e-13

    # Pallas interpret mode does not preserve the Dekker-split exactness
    # (XLA's CPU pipeline simplifies hh = c - (c - v) away), so interpret
    # only checks shape/plumbing at f32 accuracy; the f64-quality claim
    # is verified on hardware (measured 4.3e-15 rel err on TPU v5e).
    y_k = np.asarray(pallas_well.spmv_df64(w, jnp.asarray(x),
                                           interpret=True))[: a.n_rows]
    assert np.abs(y_k - want).max() / scale < 1e-5

    # and the f32 kernel path on the same operator is ~1e-6 (sanity that
    # the df64 machinery is actually buying precision)
    w32 = WEll.from_csr(a, dtype=jnp.float32)
    y32 = np.asarray(spmv(w32, jnp.asarray(x.astype(np.float32))))
    assert np.abs(y32[: a.n_rows] - want).max() / scale > 1e-9


def test_well_pallas_interpret(rng):
    """The Pallas WEll kernel (interpret mode) matches the XLA reference."""
    import jax.numpy as jnp
    from amg_tpu.io.generators import fem2d
    from amg_tpu.sparse import WEll
    from amg_tpu.ops import pallas_well
    from amg_tpu.ops.spmv import spmv

    a = fem2d(2500, seed=2)
    w = WEll.from_csr(a, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(a.n_cols).astype(np.float32))
    y = np.asarray(pallas_well.spmv(w, x, interpret=True))[: a.n_rows]
    want = np.asarray(spmv(w, x))[: a.n_rows]
    np.testing.assert_allclose(y, want, rtol=2e-4, atol=2e-4)


def test_pallas_dia_fused_epilogues(rng):
    """The fused DIA kernel epilogues (r = b - Ax; x + w*(b - Ax)) match
    the unfused forms (interpret mode; on TPU these cut the smoother's
    HBM traffic by the separate elementwise pass per color)."""
    import jax.numpy as jnp
    import amg_tpu as amg
    from amg_tpu.sparse import Dia
    from amg_tpu.ops import pallas_dia
    from amg_tpu.ops.spmv import spmv

    a = amg.poisson3d(16)
    d = Dia.from_csr(a, dtype=jnp.float32, pad_rows_to=4096)
    x = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    ax = np.asarray(spmv(d, x))
    scale = np.abs(ax).max()

    r_k = np.asarray(pallas_dia.resid(d, x, b, interpret=True))
    np.testing.assert_allclose(r_k / scale,
                               (np.asarray(b) - ax) / scale, atol=2e-6)

    u_k = np.asarray(pallas_dia.gs_update(d, x, b, w, interpret=True))
    want = np.asarray(x) + np.asarray(w) * (np.asarray(b) - ax)
    np.testing.assert_allclose(u_k / scale, want / scale, atol=2e-6)


def test_well_group_chunking(rng, monkeypatch):
    """When the window-base table exceeds the SMEM budget, the WEll SpMV
    splits the group axis into independent kernel calls and still matches
    the unchunked product (this is what lets 10M-row operators use the
    kernel instead of the 1.4 s/apply XLA f64 gather)."""
    import jax.numpy as jnp
    from amg_tpu.io.generators import fem2d
    from amg_tpu.sparse import WEll
    from amg_tpu.ops import pallas_well

    a = fem2d(5000, seed=9)
    w = WEll.from_csr(a, dtype=jnp.float32)
    w64 = WEll.from_csr_df64(a)
    x = rng.standard_normal(w.pad_cols)
    want = a.to_scipy() @ x[: a.n_cols]
    scale = np.abs(want).max()

    y1 = np.asarray(pallas_well.spmv(w, jnp.asarray(x, dtype=jnp.float32),
                                     interpret=True))[: a.n_rows]
    # force chunking: budget fits ~2 groups per chunk
    monkeypatch.setattr(pallas_well, "_SMEM_BASE_BUDGET",
                        2 * w.n_slots * 4)
    assert len(pallas_well._group_chunks(w.vals.shape[0], w.n_slots)) > 1
    y2 = np.asarray(pallas_well.spmv(w, jnp.asarray(x, dtype=jnp.float32),
                                     interpret=True))[: a.n_rows]
    np.testing.assert_allclose(y2, y1, rtol=0, atol=0)  # identical math
    np.testing.assert_allclose(y2 / scale, want / scale, atol=2e-6)

    y3 = np.asarray(pallas_well.spmv_df64(
        w64, jnp.asarray(x), interpret=True))[: a.n_rows]
    assert np.all(np.isfinite(y3))
