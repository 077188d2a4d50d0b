"""Pallas TPU kernel: windowed-gather ELL (WEll) SpMV.

The general-sparsity companion of :mod:`ops.pallas_dia`.  XLA's gather on
TPU runs a scalar per-element loop (measured 1.2 GB/s = 0.1% of HBM
bandwidth for the padded-ELL ``x[cols]`` SpMV at 1M rows); the fast
dynamic data movement on the VPU is ``tpu.dynamic_gather`` — a 128-lane
shuffle per sublane row (``take_along_axis(..., axis=1)``) and an
8-sublane (one-vreg) gather (``axis=0``).  The WEll layout (see
:class:`amg_tpu.sparse.WEll`) restructures the matrix so each slot needs
exactly one dynamic slice of the VMEM-resident x plus those two gathers:

    window = x2d[base_k : base_k + 8]            # 1024 entries of x
    gathered = window[loc >> 7, loc & 127]       # sublane gather + shuffle
    acc += vals_k * gathered

Measured ~10 cycles per (vreg, slot) unit — the whole SpMV is then bound
by streaming the (vals, loc) planes from HBM, which is the speed of light
for an unstructured operator.

Replaces the reference's thread-per-row CSR CUDA kernel
(amg/Solve/SSS_cuda.cu:77-96) for the unstructured case.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse import _round_up

# VMEM budget: full x2d + double-buffered (vals, loc) slot tiles + out
_VMEM_BUDGET = 100 * 1024 * 1024


def _platform() -> str:
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover
        return "cpu"


def _gather_sub(t, q):
    """out[s, l] = t[q[s, l], l] — Mosaic ``tpu.dynamic_gather`` along
    sublanes (one vreg).  Explicit ``lax.gather`` keeps the indices i32
    (``jnp.take_along_axis`` promotes them to i64 under jax x64, which
    Mosaic rejects)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
        operand_batching_dims=(1,), start_indices_batching_dims=(1,))
    return jax.lax.gather(t, q[..., None], dn, (1, 1),
                          mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _gather_lane(t, r):
    """out[s, l] = t[s, r[s, l]] — 128-lane shuffle per sublane row."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(t, r[..., None], dn, (1, 1),
                          mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


@functools.lru_cache(maxsize=None)
def _build(ngroups, S, xrows, dtype_name, vals_dtype_name, interpret=False):
    dtype = jnp.dtype(dtype_name)
    vals_dtype = jnp.dtype(vals_dtype_name)
    # index maps must emit i32 (the library enables jax x64 globally and
    # i64 scalars fail Mosaic lowering — same workaround as pallas_dia)
    i32 = jnp.int32

    def kernel(base_ref, x_ref, loc_ref, vals_ref, out_ref):
        g = pl.program_id(0)
        acc = jnp.zeros((8, 128), dtype)
        for k in range(S):  # static unroll: S is small (~max row degree)
            b = base_ref[g * S + k]
            tbl = x_ref[pl.ds(b, 8), :]
            lc = loc_ref[0, k]
            # lc packs two planes: bits 0..6 the entry's column remainder
            # (at the entry's own lane), bits 16+ the Q table (block of
            # the remainder-j entry, at lane j).  The two-step gather
            # composes as window[Q[s, r[s,l]], r[s,l]] — exactly the
            # entry's column (packer invariant).
            q_tab = jax.lax.shift_right_logical(lc, jnp.int32(16))
            r = jax.lax.bitwise_and(lc, jnp.int32(127))
            gx = _gather_lane(_gather_sub(tbl, q_tab), r)
            v = vals_ref[0, k]
            if vals_dtype != dtype:
                v = v.astype(dtype)
            acc = acc + v * gx
        out_ref[0] = acc

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,                      # window bases (SMEM)
            grid=(ngroups,),
            in_specs=[
                # x2d, fully VMEM-resident (explicit i32 index map: the
                # default trivial map emits i64 zeros under jax x64)
                pl.BlockSpec((xrows, 128),
                             lambda g, base: (i32(0), i32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, 8, 128),
                             lambda g, base: (g, i32(0), i32(0), i32(0)),
                             memory_space=pltpu.VMEM),  # loc tile
                pl.BlockSpec((1, S, 8, 128),
                             lambda g, base: (g, i32(0), i32(0), i32(0)),
                             memory_space=pltpu.VMEM),  # vals tile
            ],
            out_specs=pl.BlockSpec((1, 8, 128),
                                   lambda g, base: (g, i32(0), i32(0)),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((ngroups, 8, 128), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ngroups * S * 1024,
            bytes_accessed=ngroups * S * 1024 * (
                4 + vals_dtype.itemsize) + xrows * 128 * dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )


def will_use(ngroups, n_slots, pad_cols, vals_dtype, x_dtype) -> bool:
    """Applicability of the kernel for a WEll operator (backend check is
    the caller's job): f32 compute path, x fully VMEM-resident, window
    bases within the SMEM prefetch budget."""
    if jnp.dtype(x_dtype) != jnp.float32:
        return False
    if jnp.dtype(vals_dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    # the base table is a prefetched SMEM operand (limit 1 MB on v5e);
    # an unreordered matrix can blow S up past it — fall back rather
    # than fail compile
    if ngroups * n_slots * 4 > 900 * 1024:
        return False
    xrows = pad_cols // 128
    x_bytes = xrows * 128 * 4
    tile_bytes = 2 * n_slots * 1024 * (4 + jnp.dtype(vals_dtype).itemsize)
    return x_bytes + 2 * tile_bytes + 8 * 1024 <= _VMEM_BUDGET


def usable(a, x) -> bool:
    if _platform() != "tpu":
        return False
    if jax.device_count() > 1:
        return False
    return will_use(a.vals.shape[0], a.n_slots, a.pad_cols, a.vals.dtype,
                    x.dtype)


def spmv(a, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """y = A @ x via the windowed-gather kernel (caller checked
    :func:`usable`).  ``x`` may be shorter than ``pad_cols``; it is
    zero-padded (window bases were clamped against ``pad_cols``)."""
    pc = a.pad_cols
    xp = jnp.pad(x, (0, pc - x.shape[0])) if x.shape[0] < pc else x[:pc]
    x2d = xp.reshape(pc // 128, 128)
    ngroups = a.vals.shape[0]
    fn = _build(ngroups, a.n_slots, pc // 128, str(x.dtype),
                str(a.vals.dtype), interpret=interpret)
    return fn(a.base.reshape(-1), x2d, a.loc,
              a.vals).reshape(ngroups * 1024)
