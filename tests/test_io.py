"""MatrixMarket I/O tests (symmetric expansion parity with the reference
mmio_highlevel semantics)."""

import numpy as np
import pytest

import amg_tpu as amg
from amg_tpu.io.matrix_market import read_mtx, write_mtx, MatrixMarketError


def test_1138_bus_expansion(bus1138):
    # header says 1138x1138 with 2596 stored entries; symmetric expansion
    # gives 4054 nnz (SURVEY.md C15)
    assert bus1138.shape == (1138, 1138)
    assert bus1138.nnz == 4054
    # matrix is symmetric after expansion
    d = bus1138.to_dense()
    np.testing.assert_allclose(d, d.T)


def test_roundtrip(tmp_path, rng):
    a = amg.random_spd(30, density=0.1, seed=3)
    path = tmp_path / "m.mtx"
    write_mtx(path, a)
    b = read_mtx(path)
    np.testing.assert_allclose(a.to_dense(), b.to_dense(), rtol=1e-15)


def test_pattern_file(tmp_path):
    path = tmp_path / "p.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "3 3 4\n1 1\n2 2\n3 3\n1 3\n"
    )
    a = read_mtx(path)
    assert a.nnz == 4
    assert a.to_dense()[0, 2] == 1.0


def test_integer_symmetric(tmp_path):
    path = tmp_path / "i.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate integer symmetric\n"
        "% comment\n"
        "2 2 2\n1 1 5\n2 1 -3\n"
    )
    a = read_mtx(path)
    d = a.to_dense()
    assert d[0, 0] == 5 and d[1, 0] == -3 and d[0, 1] == -3
    assert a.nnz == 3


def test_complex_takes_real_part(tmp_path):
    path = tmp_path / "c.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate complex general\n"
        "2 2 2\n1 1 2.5 1.0\n2 2 3.5 -1.0\n"
    )
    a = read_mtx(path)
    d = a.to_dense()
    assert d[0, 0] == 2.5 and d[1, 1] == 3.5


def test_skew_symmetric(tmp_path):
    path = tmp_path / "s.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "2 2 1\n2 1 4.0\n"
    )
    a = read_mtx(path)
    d = a.to_dense()
    assert d[1, 0] == 4.0 and d[0, 1] == -4.0


def test_bad_banner(tmp_path):
    path = tmp_path / "bad.mtx"
    path.write_text("nope\n1 1 1\n1 1 1.0\n")
    with pytest.raises(MatrixMarketError):
        read_mtx(path)


def test_generators_shapes():
    a = amg.poisson2d(16)
    assert a.shape == (256, 256)
    assert a.nnz == 256 * 5 - 4 * 16  # 5-pt minus boundary truncations
    b = amg.poisson3d(8)
    assert b.shape == (512, 512)
    # SPD sanity: positive diag, symmetric
    d = a.to_dense()
    np.testing.assert_allclose(d, d.T)
    assert (np.diag(d) > 0).all()


def test_hierarchy_checkpoint_roundtrip(tmp_path):
    from amg_tpu.io.checkpoint import save_hierarchy, load_hierarchy
    from amg_tpu.params import AMGParams

    a = amg.poisson2d(16)
    hh = amg.setup_host(a, AMGParams(verbose=0))
    path = tmp_path / "h.npz"
    save_hierarchy(path, hh)
    hh2 = load_hierarchy(path)
    assert hh2.num_levels == hh.num_levels
    for m1, m2 in zip(hh.a, hh2.a):
        np.testing.assert_allclose(m1.to_dense(), m2.to_dense())
    for p1, p2 in zip(hh.p, hh2.p):
        np.testing.assert_allclose(p1.to_dense(), p2.to_dense())
    for c1, c2 in zip(hh.cfmark, hh2.cfmark):
        np.testing.assert_array_equal(c1, c2)
