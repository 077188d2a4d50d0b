"""Pallas TPU kernel: wide diagonal-offset (DIA) SpMV.

For a banded operator with ``nd`` diagonals, the XLA shifted-slice
formulation (ops/spmv.py::spmv_dia) re-reads the x vector from HBM once per
diagonal — at nd=231 (an embedded coarse operator) that's ~2.3x the
operator's own traffic.  This kernel tiles rows and keeps each tile's x
window (tile + band halo) in VMEM: x is read once per tile, the diagonal
values stream through a pipelined double buffer, and every FMA runs on the
VPU against VMEM operands.  Per pass the HBM traffic is
``nd * n * itemsize + O(n)`` — the speed of light for this format.

Everything is laid out 2-D (sublanes x 128 lanes); a shifted read at
offset ``s = 128*q + r`` is two static row slices of the window stitched
with a static lane split — no gathers, no dynamic indexing in compute.

Replaces the reference's thread-per-row CSR CUDA kernel
(amg/Solve/SSS_cuda.cu:77-96) for the banded/embedded case.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# minimum rows per grid step; level pads are rounded so the grid divides
# evenly (see hierarchy.to_device).  The actual tile is chosen PER OPERATOR
# by _pick_tile: the x-window read amplification of a tile is
# (tile + band span) / tile, so NARROW stencils with a wide span (e.g. the
# 7-point Poisson operator, span 2n^2) need a much larger tile than the
# VMEM-bound wide embedded stencils (200+ diagonals) that cap it at 4096.
TILE = 4096
# candidate tiles, largest first (largest fitting tile wins: least x
# re-reading, fewest DMA trips); all divide one another so a pad rounded
# to a big tile still offers the smaller ones for VMEM-bound operators
TILES = (81920, 40960, 20480, 8192, TILE)
# narrowest band the kernel accepts (below this XLA's fused shifted
# slices are already at speed of light)
MIN_DIAGS = 3
# VMEM ceiling for (double-buffered vals tile + x window)
_VMEM_BUDGET = 13 * 1024 * 1024


def _platform() -> str:
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover
        return "cpu"


def _window_rows(lo: int, hi: int, tile: int = TILE) -> int:
    # rows needed: tile/128 + ceil((lo+hi)/128) + 1 carry row, rounded so the
    # VMEM scratch stays (8,128)-tile aligned
    w = ((tile + lo + hi + 128 + 1023) // 1024) * 1024
    return w // 128


def _tile_vmem(nd, lo, hi, tile, vals_itemsize, x_itemsize, kb=1):
    """VMEM bytes of one grid step: double-buffered vals tile +
    double-buffered x window scratch + output tile."""
    return (
        2 * nd * tile * vals_itemsize
        + 2 * kb * _window_rows(lo, hi, tile) * 128 * x_itemsize
        + 2 * kb * tile * x_itemsize
    )


def _pick_tile(nd, lo, hi, vals_itemsize, x_itemsize, pad, kb=1):
    """Largest candidate tile that divides ``pad`` and fits VMEM
    (None if none does)."""
    for t in TILES:
        if pad % t == 0 and t <= pad and _tile_vmem(
                nd, lo, hi, t, vals_itemsize, x_itemsize, kb) <= _VMEM_BUDGET:
            return t
    return None


def _wins_vs_xla(nd, lo, hi, tile, vals_itemsize, x_itemsize) -> bool:
    """Estimated HBM traffic of the window kernel vs the XLA shifted-slice
    path.  XLA re-reads x once per diagonal; the kernel reads each tile's
    window once, amplification (tile + span)/tile.  Wide bands always win;
    narrow bands win only when the tile is large relative to the span."""
    if nd >= 32:
        return True
    amp = _window_rows(lo, hi, tile) * 128 / tile
    pallas_b = nd * vals_itemsize + (amp + 1.0) * x_itemsize
    xla_b = nd * vals_itemsize + (nd + 1.0) * x_itemsize
    return pallas_b <= 0.9 * xla_b


def good_pad(n: int, max_overhead: float = 0.025) -> int:
    """Row padding that unlocks the largest kernel tile within a relative
    overhead budget (hierarchy packing uses this for the shared embedded
    pad)."""
    best = ((n + TILE - 1) // TILE) * TILE
    for t in TILES:
        p = ((n + t - 1) // t) * t
        if n > 0 and (p - n) / n <= max_overhead:
            return p
    return best


# bf16-multiply mode for mixed bf16-values/f32-x kernels: convert the x
# window to bf16 ONCE per lane-remainder group and multiply in bf16 with
# f32 accumulation, instead of up-converting every one of the nd value
# planes (the convert was measured compute-bound at nd~200, ROADMAP).
# "1" = on, "0" = off; the numerics difference is one bf16 rounding of
# each product term — the operator values are already bf16-quantized.
_BF16_MUL = os.environ.get("AMG_DIA_BF16_MUL", "1") == "1"


@functools.lru_cache(maxsize=None)
def _build(offsets, pad, lo, hi, dtype_name, vals_dtype_name,
           interpret=False, bf16_mul=None, tile=TILE, epilogue="spmv"):
    """epilogue: "spmv" -> y = A x; "resid" -> y = b - A x;
    "update" -> y = x + w * (b - A x)  (the masked-GS / Jacobi / L1
    update with w = group-masked inverse diagonal, fused so the smoother
    costs one operator pass instead of SpMV + a separate 24 B/row
    elementwise pass)."""
    dtype = jnp.dtype(dtype_name)
    vals_dtype = jnp.dtype(vals_dtype_name)
    nd = len(offsets)
    wrows = _window_rows(lo, hi, tile)
    ntiles = pad // tile
    _T128 = tile // 128
    if bf16_mul is None:
        bf16_mul = _BF16_MUL
    # bf16 multiplies only pay off on WIDE bands, where up-converting every
    # value plane was measured compute-bound (ROADMAP, nd~200).  Narrow
    # bands are bandwidth-bound either way (the values are bf16 in HBM
    # regardless); multiplying in f32 there costs nothing and keeps the
    # product exact, which measurably preserves smoother strength (a 1M
    # solve went 8 -> 12 cycles with bf16 products on the 19-diagonal
    # embedded level-1 operator).
    bf16_mul = (bf16_mul and nd >= 32 and vals_dtype == jnp.bfloat16
                and dtype == jnp.float32)

    # everything index-typed as i32: the library enables jax x64 globally,
    # and i64 scalars fail Mosaic lowering
    i32 = jnp.int32

    # group offsets by lane remainder r: a shifted read at offset
    # s = 128*q + r needs a lane stitch (shuffle) that depends only on r,
    # so do it ONCE per distinct r over the whole window and serve every
    # diagonal in the group with free static row slices.  Stencil offset
    # sets share few distinct remainders (e.g. +/-1, +/-n, +/-n^2 families),
    # so this cuts the lane-shuffle work ~nd/n_remainders times — the gap
    # that kept the kernel ~1.6x off speed of light.
    by_r: dict = {}
    for k, off in enumerate(offsets):
        q, r = divmod(lo + off, 128)
        by_r.setdefault(r, []).append((k, q))
    k0 = offsets.index(0) if (epilogue == "update" and 0 in offsets) \
        else None
    if epilogue == "update" and k0 is None:
        raise ValueError("update epilogue requires the main diagonal")

    def kernel(xp_hbm, vals_ref, *rest):
        if epilogue == "spmv":
            out_ref, xw, sem = rest
            b_ref = w_ref = None
        elif epilogue == "resid":
            b_ref, out_ref, xw, sem = rest
            w_ref = None
        else:
            b_ref, w_ref, out_ref, xw, sem = rest
        # x window is double-buffered ACROSS grid steps: step i waits on the
        # copy started at step i-1 and prefetches step i+1's window, so the
        # window DMA overlaps the previous step's compute (the synchronous
        # start/wait version stalled narrow-band operators, whose per-step
        # compute is tiny, at ~40% of HBM speed of light).
        i = pl.program_id(0)
        n_steps = pl.num_programs(0)
        slot = jax.lax.rem(i, i32(2))
        nslot = jax.lax.rem(i + i32(1), i32(2))

        @pl.when(i == 0)
        def _():
            pltpu.make_async_copy(
                xp_hbm.at[pl.ds(0, i32(wrows))], xw.at[i32(0)], sem.at[i32(0)]
            ).start()

        @pl.when(i + i32(1) < n_steps)
        def _():
            pltpu.make_async_copy(
                xp_hbm.at[pl.ds((i + i32(1)) * i32(_T128), i32(wrows))],
                xw.at[nslot], sem.at[nslot],
            ).start()

        pltpu.make_async_copy(
            xp_hbm.at[pl.ds(i * i32(_T128), i32(wrows))], xw.at[slot],
            sem.at[slot],
        ).wait()
        xwr = xw.at[slot]
        acc = jnp.zeros((_T128, 128), dtype)
        xc = None  # center x rows (offset-0 read), kept for "update"
        for r, items in by_r.items():
            if r and len(items) == 1:
                # single diagonal at this remainder (typical for narrow
                # stencils): stitch only the T128 rows it reads, not the
                # whole window
                k, q = items[0]
                xs = jnp.concatenate(
                    [xwr[q:q + _T128, r:], xwr[q + 1:q + _T128 + 1, :r]],
                    axis=1)
                if k == k0:
                    xc = xs
                if bf16_mul:
                    xs = xs.astype(jnp.bfloat16)
                    acc = acc + (vals_ref[k] * xs).astype(dtype)
                else:
                    v = vals_ref[k]
                    if vals_dtype != dtype:
                        v = v.astype(dtype)
                    acc = acc + v * xs
                continue
            if r:
                xs = jnp.concatenate([xwr[:-1, r:], xwr[1:, :r]], axis=1)
            else:
                xs = xwr[...]
            for k, q in items:
                if k == k0:
                    xc = xs[q:q + _T128]
            if bf16_mul:
                xs = xs.astype(jnp.bfloat16)
            for k, q in items:
                v = vals_ref[k]
                if bf16_mul:
                    acc = acc + (v * xs[q:q + _T128]).astype(dtype)
                    continue
                if vals_dtype != dtype:
                    v = v.astype(dtype)
                acc = acc + v * xs[q:q + _T128]
        if epilogue == "spmv":
            out_ref[:] = acc
        elif epilogue == "resid":
            out_ref[:] = b_ref[...] - acc
        else:
            out_ref[:] = xc + w_ref[...] * (b_ref[...] - acc)

    extra = [] if epilogue == "spmv" else [
        pl.BlockSpec((_T128, 128), lambda i: (i, i32(0)),
                     memory_space=pltpu.VMEM)           # b tile
    ] * (1 if epilogue == "resid" else 2)               # (+ w tile)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((pad // 128, 128), dtype),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # padded x2d in HBM
            pl.BlockSpec((nd, _T128, 128),
                         lambda i: (i32(0), i, i32(0)),
                         memory_space=pltpu.VMEM),      # vals tile
        ] + extra,
        out_specs=pl.BlockSpec((_T128, 128), lambda i: (i, i32(0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wrows, 128), dtype),         # x window (2 slots)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * nd * pad),
            bytes_accessed=int((nd + 2) * pad * dtype.itemsize),
            transcendentals=0,
        ),
        # XLA's scoped-vmem pass stages this call's in/out tensors in VMEM
        # and trips its 16MB default inside larger jitted programs (seen
        # at 10M rows with tile=81920); raise the cap so they stream
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _build_multi(offsets, pad, lo, hi, kb, dtype_name, vals_dtype_name,
                 interpret=False, tile=TILE):
    """Multi-rhs variant: the x window carries ``kb`` columns, the
    operator values stream ONCE for all of them (the whole point of the
    batched solver: SpMM-grade arithmetic intensity)."""
    dtype = jnp.dtype(dtype_name)
    vals_dtype = jnp.dtype(vals_dtype_name)
    nd = len(offsets)
    wrows = _window_rows(lo, hi, tile)
    ntiles = pad // tile
    _T128 = tile // 128
    i32 = jnp.int32
    # same wide-band gate as _build (see comment there)
    bf16_mul = (_BF16_MUL and nd >= 32 and vals_dtype == jnp.bfloat16
                and dtype == jnp.float32)

    by_r: dict = {}
    for k, off in enumerate(offsets):
        q, r = divmod(lo + off, 128)
        by_r.setdefault(r, []).append((k, q))

    def kernel(xp_hbm, vals_ref, out_ref, xw, sem):
        # double-buffered window across grid steps, as in _build
        i = pl.program_id(0)
        n_steps = pl.num_programs(0)
        slot = jax.lax.rem(i, i32(2))
        nslot = jax.lax.rem(i + i32(1), i32(2))

        @pl.when(i == 0)
        def _():
            pltpu.make_async_copy(
                xp_hbm.at[:, pl.ds(0, i32(wrows))], xw.at[i32(0)], sem.at[i32(0)]
            ).start()

        @pl.when(i + i32(1) < n_steps)
        def _():
            pltpu.make_async_copy(
                xp_hbm.at[:, pl.ds((i + i32(1)) * i32(_T128), i32(wrows))],
                xw.at[nslot], sem.at[nslot],
            ).start()

        pltpu.make_async_copy(
            xp_hbm.at[:, pl.ds(i * i32(_T128), i32(wrows))], xw.at[slot],
            sem.at[slot],
        ).wait()
        xwr = xw.at[slot]
        acc = jnp.zeros((kb, _T128, 128), dtype)
        for r, items in by_r.items():
            if r:
                xs = jnp.concatenate(
                    [xwr[:, :-1, r:], xwr[:, 1:, :r]], axis=2)
            else:
                xs = xwr[...]
            if bf16_mul:
                xs = xs.astype(jnp.bfloat16)
            for k, q in items:
                v = vals_ref[k]
                if bf16_mul:
                    acc = acc + (v[None] * xs[:, q:q + _T128]).astype(dtype)
                    continue
                if vals_dtype != dtype:
                    v = v.astype(dtype)
                acc = acc + v[None] * xs[:, q:q + _T128]
        out_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kb, pad // 128, 128), dtype),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # (kb, W, 128) in HBM
            pl.BlockSpec((nd, _T128, 128),
                         lambda i: (i32(0), i, i32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb, _T128, 128),
                               lambda i: (i32(0), i, i32(0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, kb, wrows, 128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * nd * pad * kb),
            bytes_accessed=int((nd + 2 * kb) * pad * dtype.itemsize),
            transcendentals=0,
        ),
        # XLA's scoped-vmem pass tries to park the (kb, pad) in/out
        # tensors of this call in VMEM and trips its 16MB default at
        # kb > 1; raise the cap so they stay streamable
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def spmv_multi(a, xb: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """y = A @ x for a batch: ``xb`` is (k, pad), returns (k, pad)."""
    pad = a.padded_rows
    kb = xb.shape[0]
    lo = max(-min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    tile = _pick_tile(len(a.offsets), lo, hi,
                      jnp.dtype(a.vals.dtype).itemsize,
                      jnp.dtype(xb.dtype).itemsize, pad, kb=kb) or TILE
    wrows = _window_rows(lo, hi, tile)
    xp_len = (pad // tile - 1) * tile + wrows * 128
    xp = jnp.pad(xb, ((0, 0), (lo, xp_len - lo - pad))).reshape(kb, -1, 128)
    vals3 = a.vals if a.vals.ndim == 3 \
        else a.vals.reshape(len(a.offsets), pad // 128, 128)
    fn = _build_multi(tuple(a.offsets), pad, lo, hi, kb, str(xb.dtype),
                      str(a.vals.dtype), interpret=interpret, tile=tile)
    return fn(xp, vals3).reshape(kb, pad)


def _multi_fits(a, kb, dtype) -> bool:
    lo = max(-min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    return _pick_tile(
        len(a.offsets), lo, hi, jnp.dtype(a.vals.dtype).itemsize,
        jnp.dtype(dtype).itemsize, a.padded_rows, kb=kb) is not None


# --- vmap support ---------------------------------------------------------
# Mosaic rejects the batched ANY-memspace x operand that jax.vmap would
# synthesize, so batching (the multi-rhs solver) gets a custom rule: the
# multi-rhs kernel when the batched window fits VMEM, else an unrolled
# per-column loop.
from jax import custom_batching as _custom_batching


@_custom_batching.custom_vmap
def _spmv_vmappable(a, x):
    return spmv(a, x)


@_spmv_vmappable.def_vmap
def _spmv_vmap_rule(axis_size, in_batched, a, x):
    a_batched, x_batched = in_batched
    if any(jax.tree_util.tree_leaves(a_batched)):
        raise NotImplementedError("batched DIA operators are not supported")
    if not x_batched:
        y = spmv(a, x)
        return y, False
    if _multi_fits(a, axis_size, x.dtype):
        return spmv_multi(a, x), True
    ys = [spmv(a, x[i]) for i in range(axis_size)]
    return jnp.stack(ys), True


def will_use(offsets, pad, vals_dtype, x_dtype) -> bool:
    """Backend-independent applicability + profitability of the kernel for
    an operator with these offsets/pad/dtypes (shared by ``usable`` and by
    hierarchy packing's blocked-layout decision)."""
    nd = len(offsets)
    if nd < MIN_DIAGS or not nd:
        return False
    if jnp.dtype(x_dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    if jnp.dtype(vals_dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    lo = max(-min(offsets), 0)
    hi = max(max(offsets), 0)
    vi = jnp.dtype(vals_dtype).itemsize
    xi = jnp.dtype(x_dtype).itemsize
    tile = _pick_tile(nd, lo, hi, vi, xi, pad)
    if tile is None:
        return False
    return _wins_vs_xla(nd, lo, hi, tile, vi, xi)


def usable(a, x) -> bool:
    """Kernel applicability: TPU backend, profitable band/tile combination,
    matching float dtype, VMEM fit."""
    if _platform() != "tpu":
        return False
    # single-device only for now: under GSPMD the un-annotated pallas_call
    # would force replication of its operands (a shard_map ring variant is
    # the multi-chip path)
    if jax.device_count() > 1:
        return False
    return will_use(a.offsets, a.padded_rows, a.vals.dtype, x.dtype)


def spmv(a, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """y = A @ x via the tiled window kernel (caller checked :func:`usable`)."""
    lo = max(-min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    # out-of-range band positions read zeros
    return spmv_window(a, jnp.pad(x, (lo, hi)), interpret=interpret)


def _prep(a, xw):
    """Shared window/operand staging for every kernel entry: pick the
    tile, pad the haloed x so the last tile's window read stays in
    bounds, and present the values in the kernel's blocked layout (an
    apply-time reshape of a multi-GB operand materializes fully-tiled
    copies — observed OOM at 10M rows — so hierarchy packing chooses the
    blocked layout up front for wide bands)."""
    pad = a.padded_rows
    lo = max(-min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    tile = _pick_tile(len(a.offsets), lo, hi,
                      jnp.dtype(a.vals.dtype).itemsize,
                      jnp.dtype(xw.dtype).itemsize, pad) or TILE
    wrows = _window_rows(lo, hi, tile)
    # last tile reads rows [(ntiles-1)*T128, ... + wrows)
    xp_len = (pad // tile - 1) * tile + wrows * 128
    xp = jnp.pad(xw, (0, xp_len - xw.shape[0])).reshape(-1, 128)
    vals3 = a.vals if a.vals.ndim == 3 \
        else a.vals.reshape(len(a.offsets), pad // 128, 128)
    return xp, vals3, tile, lo, hi, pad


def spmv_window(a, xw: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Same kernel, but the caller supplies the already-haloed input
    ``xw = [lo left-halo entries | x (padded_rows) | hi right-halo]`` —
    the multi-chip entry point: a shard passes its neighbors' boundary
    slices (from ``ppermute``) as the halos instead of zeros."""
    xp, vals3, tile, lo, hi, pad = _prep(a, xw)
    fn = _build(tuple(a.offsets), pad, lo, hi, str(xw.dtype),
                str(a.vals.dtype), interpret=interpret, tile=tile)
    return fn(xp, vals3).reshape(pad)


def resid(a, x: jnp.ndarray, b: jnp.ndarray,
          interpret: bool = False) -> jnp.ndarray:
    """r = b - A x in ONE kernel pass: the subtraction happens in VMEM on
    the accumulator, saving the separate XLA elementwise pass (which
    cannot fuse into a pallas_call) — ~12 B/row of HBM traffic per
    residual on the hot fine level."""
    lo0 = max(-min(a.offsets), 0)
    hi0 = max(max(a.offsets), 0)
    xp, vals3, tile, lo, hi, pad = _prep(a, jnp.pad(x, (lo0, hi0)))
    b2 = jnp.pad(b, (0, pad - b.shape[0])).reshape(pad // 128, 128) \
        if b.shape[0] < pad else b[:pad].reshape(pad // 128, 128)
    fn = _build(tuple(a.offsets), pad, lo, hi, str(x.dtype),
                str(a.vals.dtype), interpret=interpret, tile=tile,
                epilogue="resid")
    return fn(xp, vals3, b2).reshape(pad)


def gs_update(a, x: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """x_new = x + w * (b - A x) in ONE kernel pass — the masked-GS
    group update (w = group-masked inverse diagonal), weighted-Jacobi
    (w = relax * inv_diag) and L1-Jacobi (w = l1_inv) all in fused form.
    vs the unfused path (full SpMV + XLA select) this reads b and w but
    skips materializing Ax and re-reading x/gid/inv_diag: ~40% less HBM
    traffic per sweep on a 7-point level."""
    lo0 = max(-min(a.offsets), 0)
    hi0 = max(max(a.offsets), 0)
    xp, vals3, tile, lo, hi, pad = _prep(a, jnp.pad(x, (lo0, hi0)))

    def as2d(v):
        v = jnp.pad(v, (0, pad - v.shape[0])) if v.shape[0] < pad \
            else v[:pad]
        return v.reshape(pad // 128, 128)

    fn = _build(tuple(a.offsets), pad, lo, hi, str(x.dtype),
                str(a.vals.dtype), interpret=interpret, tile=tile,
                epilogue="update")
    return fn(xp, vals3, as2d(b), as2d(w)).reshape(pad)
