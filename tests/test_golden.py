"""Golden parity tests against the unmodified reference implementation.

Two golden surfaces (VERDICT round-1 item 6):

1. **C/F partition identity.**  ``tests/data/golden/*_cf_{DIR,STD}.txt``
   were dumped by a CPU-only stub build of the reference's coarsening path
   (``amg/Setup/SSS_coarsen.c`` compiled unmodified, driven by a 45-line C
   main that calls ``SSS_amg_coarsen`` and prints the ``vertices`` array).
   Our splitter must reproduce the partition bit-for-bit: same strength
   graph (``strong_couplings``), same greedy RS first pass, same C1 second
   pass, same ``clean_ff_couplings`` fixup (DIR only).

   Golden header: ``# cfmark for <path> rows=R P=RxC Pnnz=N`` followed by
   one marker per row (FGPT=0, CGPT=1, ISPT=2).  ``C`` is the coarse count
   and ``N`` the P-*pattern* nnz (``form_P_pattern_dir|std``, before values
   and truncation).

2. **Residual histories.**  ``tests/data/golden/resid_*.json`` pin the full
   absolute-residual history, iteration count and final relres of the
   default solver under the reference's manual protocol (b=1, x0=1,
   default params — amg/SSS_main.c:141-154) on CPU/f64.  Regenerate with
   ``python -m tests.gen_goldens`` after an *intentional* numerics change.
"""

import json
import os
import re

import numpy as np
import pytest

import amg_tpu as amg
from amg_tpu.params import AMGParams, InterpType
from amg_tpu.setup_phase.strength import strength_matrix
from amg_tpu.setup_phase.cf_split import rs_split, clean_ff_couplings
from amg_tpu.setup_phase.interp import p_pattern_dir, p_pattern_std

GOLD = os.path.join(os.path.dirname(__file__), "data", "golden")


def _load_cf_golden(name):
    path = os.path.join(GOLD, name)
    with open(path) as f:
        header = f.readline()
        marks = np.array([int(line) for line in f], dtype=np.int32)
    m = re.search(r"rows=(\d+) P=(\d+)x(\d+) Pnnz=(\d+)", header)
    assert m, f"malformed golden header in {name}: {header!r}"
    rows, p_rows, p_cols, p_nnz = map(int, m.groups())
    assert rows == p_rows == marks.size
    return marks, p_cols, p_nnz


def _matrices():
    data = os.path.join(os.path.dirname(__file__), "data")
    return {
        "1138_bus": lambda: amg.read_mtx(os.path.join(data, "1138_bus.mtx")),
        "p2d32": lambda: amg.poisson2d(32),
        "p2d48aniso": lambda: amg.poisson2d(48, epsilon=0.01),
        "p3d16": lambda: amg.poisson3d(16),
        "rspd": lambda: amg.random_spd(800, density=0.01, seed=3),
    }


CF_CASES = [
    ("1138_bus", InterpType.DIR),
    ("p2d32", InterpType.DIR),
    ("p2d32", InterpType.STD),
    ("p2d48aniso", InterpType.DIR),
    ("p2d48aniso", InterpType.STD),
    ("p3d16", InterpType.DIR),
    ("p3d16", InterpType.STD),
    ("rspd", InterpType.DIR),
    ("rspd", InterpType.STD),
]


@pytest.mark.parametrize("name,interp", CF_CASES,
                         ids=[f"{n}-{i.name}" for n, i in CF_CASES])
def test_cfmark_matches_reference(name, interp):
    """Reference SSS_amg_coarsen (strength -> RS split -> C1 pass ->
    clean_ff for DIR -> P pattern) vs our pipeline: exact partition and
    pattern-size identity."""
    a = _matrices()[name]()
    golden, n_coarse_ref, p_nnz_ref = _load_cf_golden(
        f"{name}_cf_{interp.name}.txt")

    s = strength_matrix(a)  # defaults: strong_threshold=0.3, max_row_sum=0.9
    vec, col = rs_split(s)
    if interp == InterpType.DIR:
        col = clean_ff_couplings(s, vec, col)
        p = p_pattern_dir(s, vec, col)
    else:
        p = p_pattern_std(s, vec, col)

    np.testing.assert_array_equal(vec, golden)
    assert col == n_coarse_ref
    assert p.nnz == p_nnz_ref


RESID_CASES = ["1138_bus", "p2d32", "p2d64", "p3d16"]


def _load_resid_golden(name):
    with open(os.path.join(GOLD, f"resid_{name}.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("name", RESID_CASES)
def test_residual_history_golden(name):
    """Default-solver residual history is pinned line-by-line (reference
    surface: SSS_print_itinfo table, amg/SSS_utils.c:104-133)."""
    gens = dict(_matrices())
    gens["p2d64"] = lambda: amg.poisson2d(64)
    a = gens[name]()
    gold = _load_resid_golden(name)

    n = a.n_rows
    assert gold["n_rows"] == n
    b = np.ones(n)
    x0 = np.ones(n)
    from amg_tpu.solve.driver import solver_amg

    _, info = solver_amg(a, x0, b, AMGParams(verbose=False),
                         log=lambda *a_, **k_: None)

    assert info.nits == gold["nits"]
    got = np.array(info.residuals)
    want = np.array(gold["residuals"])
    assert got.size == want.size
    # CPU f64, but XLA's CPU codegen reassociates reductions differently
    # across host microarchitectures: bit-identical histories only hold
    # per machine (measured cross-host drift ~1.3e-4 by the last
    # iterations of 1138_bus).  1e-3 still pins the trajectory hard — any
    # behavioral change (different splitting, interpolation, smoothing)
    # moves residuals by factors, not fractions of a percent.
    np.testing.assert_allclose(got, want, rtol=1e-3)
    assert info.rres == pytest.approx(gold["rres"], rel=1e-3)
    assert info.rres < 1e-6  # converged to the reference default tol
