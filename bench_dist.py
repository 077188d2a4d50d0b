"""Weak-scaling benchmark: solve nnz/s per device count.

For each mesh size N (powers of two up to the available device count), a
3D Poisson problem with ~``AMG_DIST_ROWS_PER_DEV`` rows per device is
solved by :class:`~amg_tpu.parallel.DistAMGSolver`, and throughput
``nnz * cycles / solve_seconds`` plus weak-scaling efficiency vs N=1 is
reported (the BASELINE.json north star: >= 70% at 2+ hosts).

On this environment only one real TPU chip is attached; run with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
to exercise the SPMD code path on an emulated mesh (throughput numbers on
emulated CPU devices are functional, not performance, results).

Prints one JSON line per mesh size.
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("AMG_TPU_COMPILE_CACHE",
                                     "/tmp/amg_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    import amg_tpu as amg
    from amg_tpu.parallel import DistAMGSolver, make_mesh
    from amg_tpu.params import SmootherType

    rows_per_dev = int(os.environ.get("AMG_DIST_ROWS_PER_DEV", "262144"))
    ndev_avail = min(
        jax.device_count(),
        int(os.environ.get("AMG_DIST_MAX_DEV", "1024")),
    )
    log(f"devices: {ndev_avail} x {jax.devices()[0].device_kind}")

    base_nnz_s = None
    sizes = []
    n = 1
    while n <= ndev_avail:
        sizes.append(n)
        n *= 2

    for ndev in sizes:
        n_side = max(int(round((rows_per_dev * ndev) ** (1.0 / 3.0))), 8)
        a = amg.poisson3d(n_side)
        pars = amg.AMGParams(
            tol=1e-8, dtype="float32", refine=True, verbose=0,
            coarse_smoother=SmootherType.CHEBYSHEV,
            coarse_op_dtype="bfloat16",
        )
        mesh = make_mesh(ndev)
        t0 = time.perf_counter()
        solver = DistAMGSolver(a, pars, mesh=mesh, log=log)
        setup_s = time.perf_counter() - t0
        b = np.ones(a.n_rows)
        solver.solve(b)  # warmup (compile)
        x, info = solver.solve(b)
        r = b - a.matvec(x.astype(np.float64))
        true_rres = float(np.linalg.norm(r) / np.linalg.norm(b))
        nnz_s = a.nnz * info.nits / max(info.solve_seconds, 1e-9)
        if base_nnz_s is None:
            base_nnz_s = nnz_s / ndev
        eff = nnz_s / (base_nnz_s * ndev)
        log(f"N={ndev}: n={a.n_rows} nnz={a.nnz} its={info.nits} "
            f"rres={true_rres:.2e} setup={setup_s:.1f}s "
            f"solve={info.solve_seconds:.3f}s")
        print(json.dumps({
            "metric": "weak_scaling_solve_nnz_cycles_per_s",
            "devices": ndev,
            "value": float(f"{nnz_s:.4g}"),
            "unit": "nnz*cycles/s",
            "efficiency_vs_1dev": float(f"{eff:.4g}"),
            "true_rres": float(f"{true_rres:.3g}"),
        }), flush=True)


if __name__ == "__main__":
    main()
