"""Native C++ extension vs pure-Python equivalence tests."""

import numpy as np
import pytest

import amg_tpu as amg
from amg_tpu.sparse import CSR
from amg_tpu.params import AMGParams, InterpType

native = pytest.importorskip("amg_tpu.native")
if native.lib is None:
    pytest.skip("native extension unavailable", allow_module_level=True)


def test_spgemm_matches_scipy(rng):
    import scipy.sparse as sp

    x = sp.random(50, 60, density=0.15, random_state=np.random.RandomState(5),
                  format="csr")
    y = sp.random(60, 40, density=0.15, random_state=np.random.RandomState(6),
                  format="csr")
    c = native.lib.spgemm(CSR.from_scipy(x), CSR.from_scipy(y))
    np.testing.assert_allclose(c.to_dense(), (x @ y).toarray(),
                               rtol=1e-12, atol=1e-14)


def test_rs_split_matches_python():
    from amg_tpu.setup_phase.strength import strength_matrix
    from amg_tpu.setup_phase.cf_split import _rs_split_py

    for gen in (lambda: amg.poisson2d(13), lambda: amg.poisson2d(9, epsilon=0.05),
                lambda: amg.poisson3d(6)):
        a = gen()
        s = strength_matrix(a)
        vec_c, col_c = native.lib.rs_split(s)
        vec_p, col_p = _rs_split_py(s)
        assert col_c == col_p
        np.testing.assert_array_equal(vec_c, vec_p)


def test_rs_split_matches_python_bus(bus1138):
    from amg_tpu.setup_phase.strength import strength_matrix
    from amg_tpu.setup_phase.cf_split import _rs_split_py

    s = strength_matrix(bus1138)
    vec_c, col_c = native.lib.rs_split(s)
    vec_p, col_p = _rs_split_py(s)
    assert col_c == col_p
    np.testing.assert_array_equal(vec_c, vec_p)


def test_clean_ff_matches_python(bus1138):
    from amg_tpu.setup_phase.strength import strength_matrix
    from amg_tpu.setup_phase.cf_split import _rs_split_py

    s = strength_matrix(bus1138)
    vec, col = _rs_split_py(s)

    vec_c = vec.copy()
    col_c = native.lib.clean_ff(s, vec_c, col)

    # run the pure-python path by bypassing the native dispatch
    vec_p = vec.copy()
    n = s.n_rows
    sp_, sj = s.indptr, s.indices
    cindex = np.full(n, -1, dtype=np.int64)
    c_i_nonempty = False
    ci_tilde = -1
    ci_tilde_mark = -1
    col_p = col
    i = 0
    while i < n:
        if vec_p[i] != 0:
            i += 1
            continue
        for ji in range(sp_[i], sp_[i + 1]):
            j = sj[ji]
            cindex[j] = i if vec_p[j] == 1 else -1
        if ci_tilde_mark != i:
            ci_tilde = -1
        redo = False
        for ji in range(sp_[i], sp_[i + 1]):
            j = sj[ji]
            if vec_p[j] != 0:
                continue
            set_empty = True
            for jj in range(sp_[j], sp_[j + 1]):
                if cindex[sj[jj]] == i:
                    set_empty = False
                    break
            if set_empty:
                if c_i_nonempty:
                    vec_p[i] = 1
                    col_p += 1
                    if ci_tilde > -1:
                        vec_p[ci_tilde] = 0
                        col_p -= 1
                        ci_tilde = -1
                    c_i_nonempty = False
                else:
                    vec_p[j] = 1
                    col_p += 1
                    ci_tilde = j
                    ci_tilde_mark = i
                    c_i_nonempty = True
                    redo = True
                break
        if not redo:
            i += 1

    assert col_c == col_p
    np.testing.assert_array_equal(vec_c, vec_p)


def test_std_interp_matches_python():
    from amg_tpu.setup_phase.strength import strength_matrix
    from amg_tpu.setup_phase.cf_split import rs_split
    from amg_tpu.setup_phase.interp import p_pattern_std, interp_std_values

    a = amg.poisson2d(10)
    s = strength_matrix(a)
    vec, col = rs_split(s)

    p1 = p_pattern_std(s, vec, col)
    native.lib.std_interp_values(a, vec, p1, s)

    import os

    p2 = p_pattern_std(s, vec, col)
    # force the python path
    import amg_tpu.setup_phase.interp as interp_mod
    import amg_tpu.native as native_mod

    saved = native_mod.lib
    try:
        native_mod.lib = None
        interp_std_values(a, vec, p2, s)
    finally:
        native_mod.lib = saved

    np.testing.assert_allclose(p1.data, p2.data, rtol=1e-13, atol=1e-15)


def test_p_pattern_dir_matches_python():
    from amg_tpu.setup_phase.strength import strength_matrix
    from amg_tpu.setup_phase.cf_split import rs_split, clean_ff_couplings
    from amg_tpu.setup_phase.interp import _p_pattern_dir_py

    for gen in (lambda: amg.poisson2d(17), lambda: amg.poisson3d(7),
                lambda: amg.fem2d(900, seed=4)):
        a = gen()
        s = strength_matrix(a)
        vec, col = rs_split(s)
        col = clean_ff_couplings(s, vec, col)
        p_n = native.lib.p_pattern_dir(s, vec, col)
        p_p = _p_pattern_dir_py(s, vec, col)
        np.testing.assert_array_equal(p_n.indptr, p_p.indptr)
        np.testing.assert_array_equal(p_n.indices, p_p.indices)
