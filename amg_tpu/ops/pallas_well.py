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


def _decode(lc):
    """Split a loc plane into (Q table, remainder).  loc is int16,
    ``(Q << 7) | r`` — 10 bits (Q < 8, r < 128); int16 storage halves
    both the HBM footprint and the streamed bytes of every index plane
    vs the former int32 ``(Q << 16) | r`` encoding."""
    lc = lc.astype(jnp.int32)
    return (jax.lax.shift_right_logical(lc, jnp.int32(7)),
            jax.lax.bitwise_and(lc, jnp.int32(127)))


@functools.lru_cache(maxsize=None)
def _build(cg, S, xrows, dtype_name, vals_dtype_name, interpret=False):
    """Kernel over ``cg`` row groups.  Operands are the FULL (ngroups)
    loc/vals arrays; a scalar-prefetched chunk offset shifts the grid's
    block index maps, so group-chunked calls (SMEM base-table budget)
    slice NOTHING — a jax-level ``a.loc[s:s+cg]`` materialized ~760 MB
    HLO-temp copies per chunk at 10M rows and OOM'd compilation."""
    dtype = jnp.dtype(dtype_name)
    vals_dtype = jnp.dtype(vals_dtype_name)
    # index maps must emit i32 (the library enables jax x64 globally and
    # i64 scalars fail Mosaic lowering — same workaround as pallas_dia)
    i32 = jnp.int32

    def kernel(s0_ref, base_ref, x_ref, loc_ref, vals_ref, out_ref):
        g = pl.program_id(0)
        acc = jnp.zeros((8, 128), dtype)
        for k in range(S):  # static unroll: S is small (~max row degree)
            b = base_ref[g * S + k]
            tbl = x_ref[pl.ds(b, 8), :]
            # loc packs two planes: bits 0..6 the entry's column remainder
            # (at the entry's own lane), bits 7..9 the Q table (block of
            # the remainder-j entry, at lane j).  The two-step gather
            # composes as window[Q[s, r[s,l]], r[s,l]] — exactly the
            # entry's column (packer invariant).
            q_tab, r = _decode(loc_ref[0, k])
            gx = _gather_lane(_gather_sub(tbl, q_tab), r)
            v = vals_ref[0, k]
            if vals_dtype != dtype:
                v = v.astype(dtype)
            acc = acc + v * gx
        out_ref[0] = acc

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,          # chunk offset + window bases
            grid=(cg,),
            in_specs=[
                # x2d, fully VMEM-resident (explicit i32 index map: the
                # default trivial map emits i64 zeros under jax x64)
                pl.BlockSpec((xrows, 128),
                             lambda g, s0, base: (i32(0), i32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, 8, 128),
                             lambda g, s0, base: (g + s0[0], i32(0),
                                                  i32(0), i32(0)),
                             memory_space=pltpu.VMEM),  # loc tile
                pl.BlockSpec((1, S, 8, 128),
                             lambda g, s0, base: (g + s0[0], i32(0),
                                                  i32(0), i32(0)),
                             memory_space=pltpu.VMEM),  # vals tile
            ],
            out_specs=pl.BlockSpec((1, 8, 128),
                                   lambda g, s0, base: (g, i32(0), i32(0)),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((cg, 8, 128), dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * cg * S * 1024),
            bytes_accessed=int(cg * S * 1024 * (
                2 + vals_dtype.itemsize) + xrows * 128 * dtype.itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _build_df64(cg, S, xrows, interpret=False):
    """Double-single (df64) WEll SpMV: f64-quality y = A @ x from pure-f32
    VPU arithmetic — the TPU-native stand-in for the f64 matvec the outer
    defect-correction / FCG loop needs (TPU has no hardware f64; the XLA
    f64 gather fallback measured ~1.4 s/apply at 1M rows vs ~1 ms here).

    A and x arrive split into non-overlapping f32 pairs (hi = f32(v),
    lo = f32(v - hi)).  Per slot the kernel computes the hi*hi product
    exactly with a Dekker split (no fma primitive in Pallas; the
    4097-multiply split is exact for 24-bit mantissas), carries the
    product error + the hi*lo/lo*hi cross terms in a compensation
    stream, and accumulates with Knuth TwoSum.  Result (y_hi, y_lo)
    satisfies y_hi + y_lo = A x to ~1e-13 relative — far below the
    1e-8 outer-loop target (true f64 would give 1e-16).
    """
    f32 = jnp.float32
    i32 = jnp.int32

    def kernel(s0_ref, base_ref, xh_ref, xl_ref, loc_ref, vh_ref,
               vl_ref, oh_ref, ol_ref):
        g = pl.program_id(0)
        s = jnp.zeros((8, 128), f32)
        c = jnp.zeros((8, 128), f32)
        for k in range(S):
            b = base_ref[g * S + k]
            q_tab, r = _decode(loc_ref[0, k])
            gh = _gather_lane(_gather_sub(xh_ref[pl.ds(b, 8), :], q_tab), r)
            gl = _gather_lane(_gather_sub(xl_ref[pl.ds(b, 8), :], q_tab), r)
            vh = vh_ref[0, k]
            vl = vl_ref[0, k]
            # Dekker 12-bit splits (exact halves: 12x12 -> 24-bit products)
            cv = vh * f32(4097.0)
            vhh = cv - (cv - vh)
            vhl = vh - vhh
            cg = gh * f32(4097.0)
            ghh = cg - (cg - gh)
            ghl = gh - ghh
            p = vh * gh
            perr = ((vhh * ghh - p) + vhh * ghl + vhl * ghh) + vhl * ghl
            cross = vh * gl + vl * gh
            # Knuth TwoSum: s + p exactly as (t, err)
            t = s + p
            bb = t - s
            err = (s - (t - bb)) + (p - bb)
            s = t
            c = c + (err + perr + cross)
        oh_ref[0] = s
        ol_ref[0] = c

    tile = lambda: pl.BlockSpec((1, S, 8, 128),
                                lambda g, s0, base: (g + s0[0], i32(0),
                                                     i32(0), i32(0)),
                                memory_space=pltpu.VMEM)
    xspec = lambda: pl.BlockSpec((xrows, 128),
                                 lambda g, s0, base: (i32(0), i32(0)),
                                 memory_space=pltpu.VMEM)
    ospec = lambda: pl.BlockSpec((1, 8, 128),
                                 lambda g, s0, base: (g, i32(0), i32(0)),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,          # chunk offset + window bases
            grid=(cg,),
            in_specs=[xspec(), xspec(), tile(), tile(), tile()],
            out_specs=[ospec(), ospec()],
        ),
        out_shape=[jax.ShapeDtypeStruct((cg, 8, 128), f32),
                   jax.ShapeDtypeStruct((cg, 8, 128), f32)],
        cost_estimate=pl.CostEstimate(
            flops=int(30 * cg * S * 1024),
            bytes_accessed=int(cg * S * 1024 * 10 + 2 * xrows * 128 * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )


# SMEM budget for the prefetched window-base table (v5e SMEM ~1 MB);
# operators whose full table exceeds it run in group CHUNKS — each chunk
# is an independent pallas_call over a slice of the group axis (same
# compiled kernel for equal chunk sizes), so 10M-row operators clear the
# gate instead of falling back to the 1.4 s/apply XLA f64 gather
# (VERDICT r4 item 3)
_SMEM_BASE_BUDGET = 900 * 1024


def _group_chunks(ngroups: int, S: int):
    """Split the group axis so each chunk's base table fits SMEM."""
    max_g = max(_SMEM_BASE_BUDGET // (S * 4), 1)
    if ngroups <= max_g:
        return [(0, ngroups)]
    n_chunks = -(-ngroups // max_g)
    cg = -(-ngroups // n_chunks)
    return [(s, min(cg, ngroups - s)) for s in range(0, ngroups, cg)]


def spmv_df64(a, x64: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """f64-quality y = A @ x for a df64-split WEll (``a.vals_lo`` set).

    ``x64`` is float64; returns float64 of length ``a.padded_rows``.
    Caller checked :func:`usable_df64`.
    """
    pc = a.pad_cols
    xp = jnp.pad(x64, (0, pc - x64.shape[0])) if x64.shape[0] < pc \
        else x64[:pc]
    xh = xp.astype(jnp.float32)
    xl = (xp - xh.astype(jnp.float64)).astype(jnp.float32)
    ngroups = a.vals.shape[0]
    xh2, xl2 = xh.reshape(pc // 128, 128), xl.reshape(pc // 128, 128)
    outs = []
    for s, cg in _group_chunks(ngroups, a.n_slots):
        fn = _build_df64(cg, a.n_slots, pc // 128, interpret=interpret)
        yh, yl = fn(jnp.asarray([s], dtype=jnp.int32),
                    a.base[s:s + cg].reshape(-1), xh2, xl2,
                    a.loc, a.vals, a.vals_lo)
        outs.append((yh.astype(jnp.float64)
                     + yl.astype(jnp.float64)).reshape(cg * 1024))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def usable_df64(a, x) -> bool:
    if _platform() != "tpu" or jax.device_count() > 1:
        return False
    if a.vals_lo is None or jnp.dtype(x.dtype) != jnp.float64:
        return False
    if jnp.dtype(a.vals.dtype) != jnp.float32:
        return False
    # no base-table cap: spmv_df64 chunks the group axis to fit SMEM
    xrows = a.pad_cols // 128
    tile_bytes = 3 * a.n_slots * 1024 * 4
    return 2 * xrows * 128 * 4 + 2 * tile_bytes + 8 * 1024 <= _VMEM_BUDGET


def will_use(ngroups, n_slots, pad_cols, vals_dtype, x_dtype) -> bool:
    """Applicability of the kernel for a WEll operator (backend check is
    the caller's job): f32 compute path, x fully VMEM-resident, window
    bases within the SMEM prefetch budget."""
    if jnp.dtype(x_dtype) != jnp.float32:
        return False
    if jnp.dtype(vals_dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    # (the base table chunks over the group axis when it exceeds SMEM;
    # no ngroups cap here)
    xrows = pad_cols // 128
    x_bytes = xrows * 128 * 4
    tile_bytes = 2 * n_slots * 1024 * (2 + jnp.dtype(vals_dtype).itemsize)
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
    outs = []
    for s, cg in _group_chunks(ngroups, a.n_slots):
        fn = _build(cg, a.n_slots, pc // 128, str(x.dtype),
                    str(a.vals.dtype), interpret=interpret)
        # full loc/vals operands + a prefetched chunk offset: only the
        # (small) base slice materializes
        outs.append(fn(jnp.asarray([s], dtype=jnp.int32),
                       a.base[s:s + cg].reshape(-1), x2d,
                       a.loc, a.vals).reshape(cg * 1024))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)
