"""Regenerate golden residual-history files (tests/data/golden/resid_*.json).

Run from the repo root on CPU (the platform the test suite uses):

    JAX_PLATFORMS=cpu python -m tests.gen_goldens

The golden surface mirrors the reference's manual test protocol
(amg/SSS_main.c:141-154): b = 1, x0 = 1, default parameters, record the
full absolute-residual history, final relres and iteration count.

The C/F-splitting goldens (tests/data/golden/*_cf_*.txt) are NOT produced
here: they were dumped by a CPU-only stub build of the unmodified reference
coarsening path (amg/Setup/SSS_coarsen.c) driven by a tiny C main that
calls SSS_amg_coarsen on each matrix and prints `vertices` — see
tests/test_golden.py for the format.  Our splitter reproduces them
bit-for-bit (exercised by test_cfmark_matches_reference).
"""

import json
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

from amg_tpu.compile_cache import enable as _enable_cache

_enable_cache()

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLD = os.path.join(DATA, "golden")


def cases():
    import amg_tpu as amg

    yield "1138_bus", amg.read_mtx(os.path.join(DATA, "1138_bus.mtx"))
    yield "p2d32", amg.poisson2d(32)
    yield "p2d64", amg.poisson2d(64)
    yield "p3d16", amg.poisson3d(16)


def main():
    import amg_tpu as amg
    from amg_tpu.params import AMGParams
    from amg_tpu.solve.driver import solver_amg

    for name, a in cases():
        n = a.n_rows
        b = np.ones(n)
        x0 = np.ones(n)
        pars = AMGParams(verbose=False)
        _, info = solver_amg(a, x0, b, pars, log=lambda *a_, **k_: None)
        out = {
            "matrix": name,
            "n_rows": int(n),
            "nits": int(info.nits),
            "rres": float(info.rres),
            "residuals": [float(r) for r in info.residuals],
        }
        path = os.path.join(GOLD, f"resid_{name}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"{name}: nits={info.nits} rres={info.rres:.3e} -> {path}")


if __name__ == "__main__":
    main()
