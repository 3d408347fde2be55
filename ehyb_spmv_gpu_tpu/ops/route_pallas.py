"""Pallas kernels for the product-routing engine (see core/route.py).

Stage A+T (ONE fused kernel since format v11): gather-multiply + transpose.
A grid step computes 1024 width-steps of products for ONE band group — each
(8,128) sub-tile serves ONE 1024-element x window (scalar-prefetched window
row, x VMEM-resident) through the proven two-stage ``tpu.dynamic_gather`` —
then writes them out through in-register (128,128)-tile transposes straight
into the band-major layout stage B consumes.  The v10 pipeline materialized
the product stream between a separate A kernel and an XLA transpose; the
transpose compiled to a relayout copy plus a band pad — with the A write
and T read, FOUR full HBM passes over 134 MB on random_1m where the fused
kernel pays one write (probe_t_hlo.py / probe_transpose2.py, round 5).

Stage B: route + reduce.  One grid step = s_b sub-tiles (searched per
matrix with the bands-per-block), all inside one
band GROUP whose transposed products are BlockSpec-streamed into VMEM
(``bands_per_block`` bands x n_win*P f32).  Each lane decodes
``(mask, sel, srow, lane)`` from the packed int16; a select chain over the
``chain`` (8,128) sub-windows at the sub-tile's band offset resolves the
sublane pick (the same relaxed two-stage-gather feasibility the SELL body
uses), and rows accumulate in-lane with the reset-cumulative scratch of the
streamed SELL kernels.

Reference parity: this is the TPU mechanism replacing the reference's
uncached phase-2 global gathers (``kernel.cu:169-194``) for matrices where
window caching has nothing to cache.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LANES
from ..core.route import RoutedMatrix, TS, WIN
from ..utils.log import get_logger

log = get_logger(__name__)

_VMEM_LIMIT = 100 * 1024 * 1024


#: q-chunk of the fused A+T output (gr % 8 == 0 always holds: n_win*P is a
#: multiple of 1024).  One grid step = T_QC*LANES = 1024 width-steps (128
#: sub-tiles) of ONE band group, transposed in-register on the way out.
T_QC = 8
#: Sub-tiles computed per fused grid step.
AT_SUB = T_QC * LANES // TS


def _route_at_kernel(win_ref, col_ref, val_ref, x_ref, out_ref, acc_ref):
    """Fused gather-multiply + transpose (stages A and T of the routed
    pipeline in one pass).

    Since format v11 the A stream is band-group-major (core/route.py), so a
    (bg, q) grid step's col/val block is a contiguous 1024-step flat_g run
    of one bg.  Products accumulate in a VMEM scratch and leave through
    T_QC (128,128)-tile transposes (Mosaic's native ``tpu.transpose``,
    562 GB/s r+w measured standalone) into the band-major layout stage B
    consumes.  Fusing kills the intermediate product stream entirely — the
    v10 pipeline wrote it (134 MB on random_1m) and re-read it for the
    transpose; XLA's own lowering of that transpose was a relayout copy
    plus a band pad, two MORE full passes (probe_t_hlo.py).
    """
    b = pl.program_id(0)
    q = pl.program_id(1)
    nq = pl.num_programs(1)
    base = (b * nq + q) * AT_SUB
    for i in range(AT_SUB):
        win = x_ref[pl.ds(win_ref[base + i], TS), :]
        idx = col_ref[i * TS:(i + 1) * TS, :].astype(jnp.int32)
        hi = jax.lax.shift_right_logical(idx, 7)
        lo = jax.lax.bitwise_and(idx, 127)
        rows = jnp.take_along_axis(win, hi, axis=0)
        g = jnp.take_along_axis(rows, lo, axis=1)
        acc_ref[i * TS:(i + 1) * TS, :] = \
            val_ref[i * TS:(i + 1) * TS, :] * g
    for j in range(T_QC):
        out_ref[0, :, j, :] = acc_ref[j * LANES:(j + 1) * LANES, :].T


def _make_route_b_kernel(chain: int, s_b: int, octet: bool):
    """Gather from the band-group block via a ``chain``-way select over
    (8,128) sub-windows at the sub-tile's dynamic band offset, then reduce.

    Two reductions (see core/route.py "dst step layout"): the slice layout
    sums the sub-tile's 8 step-rows into a (1,128) slice accumulator; the
    OCTET layout accumulates elementwise into an (8,128) scratch — each
    sublane row is a different slice, so no cross-sublane sum exists and
    the per-sub-tile output is the full accumulator."""

    def kernel(gmap_ref, boff_ref, reset_ref, idx_ref, blk_ref, y_ref,
               acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for i in range(s_b):
            k = t * s_b + i
            off = boff_ref[k]
            iv = idx_ref[i * TS:(i + 1) * TS, :].astype(jnp.int32)
            sel = jax.lax.bitwise_and(jax.lax.shift_right_logical(iv, 10), 15)
            srow = jax.lax.bitwise_and(jax.lax.shift_right_logical(iv, 7), 7)
            lane = jax.lax.bitwise_and(iv, 127)
            msk = jax.lax.shift_right_logical(iv, 14)
            rows = jnp.take_along_axis(blk_ref[pl.ds(off, TS), :], srow,
                                       axis=0)
            for j in range(1, chain):
                rows = jnp.where(
                    sel == j,
                    jnp.take_along_axis(blk_ref[pl.ds(off + j * TS, TS), :],
                                        srow, axis=0),
                    rows)
            g = jnp.take_along_axis(rows, lane, axis=1)
            g = jnp.where(msk == 1, 0.0, g)
            keep = (reset_ref[k] == 0).astype(g.dtype)
            if octet:
                acc = g + acc_ref[:] * keep
                acc_ref[:] = acc
                y_ref[0, i * TS:(i + 1) * TS, :] = acc
            else:
                acc = jnp.sum(g, axis=0) + acc_ref[0] * keep
                acc_ref[0] = acc
                y_ref[0, i, :] = acc

    return kernel


def make_routed_apply(rm: RoutedMatrix, dtype="float32",
                      interpret: bool = False,
                      maps_in_dev: bool = False,
                      vma=None) -> Callable:
    """Build ``apply(dev, x_pad) -> y_pad`` (INPUT-space rows, padded like
    x — chainable).

    ``dev`` is the dict from :meth:`RoutedMatrix.to_jax`; ``x_pad`` is the
    f32 input padded to ``rm.padded_x_rows`` (NOT permuted — the routed
    format consumes original column space).

    ``vma``: varying-mesh-axes tag for the pallas out_shapes — pass the
    shard_map axis set (e.g. ``{AXIS}``) when the apply runs inside a
    ``check_vma=True`` shard_map (pallas outputs carry no vma of their
    own); leave None single-chip.

    With ``maps_in_dev`` the per-matrix schedule maps (b_gmap/b_boff/
    b_reset/b_last/scat_src/scat_dst, the spill arrays) are read from
    ``dev`` instead of closed over — the sharded path runs ONE such apply
    under ``shard_map`` with per-shard maps of uniform (padded) shapes;
    ``rm`` then only supplies the static geometry.
    """
    vdt = np.dtype(dtype)
    if vdt != np.float32:
        raise ValueError("routed path is f32-only (MVP)")
    n_win, P, n_bg = rm.n_win, rm.P, rm.n_bg
    gr = rm.group_rows
    chain = rm.chain
    c = rm.bands_per_block
    a_steps_pad = rm.a_col.shape[0]
    b_steps_pad = rm.b_idx.shape[0]
    s_b = rm.s_b
    b_tiles = b_steps_pad // (s_b * TS)
    x_rows = rm.padded_x_rows // LANES
    a_win = jnp.asarray(rm.a_win)   # pure geometry — shard-uniform
    b_gmap = jnp.asarray(rm.b_gmap)
    b_boff = jnp.asarray(rm.b_boff)
    b_reset = jnp.asarray(rm.b_reset)
    b_last = jnp.asarray(rm.b_last)

    # ---- fused A+T: grid (band group, flat_g q-chunk) --------------------
    nq = gr // T_QC
    at_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_bg, nq),
        in_specs=[
            pl.BlockSpec((T_QC * LANES, LANES),
                         lambda b, q, w, nq=nq: (b * nq + q, 0),
                         memory_space=pltpu.VMEM),   # col
            pl.BlockSpec((T_QC * LANES, LANES),
                         lambda b, q, w, nq=nq: (b * nq + q, 0),
                         memory_space=pltpu.VMEM),   # val
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x resident
        ],
        out_specs=pl.BlockSpec((1, LANES, T_QC, LANES),
                               lambda b, q, w: (b, 0, q, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T_QC * LANES, LANES), jnp.float32)],
    )
    at_cost = pl.CostEstimate(
        flops=2 * int(rm.stats.get("nnz_routed", 1)),
        bytes_accessed=int(a_steps_pad * LANES * 10),
        transcendentals=0)
    at_call = pl.pallas_call(
        _route_at_kernel, grid_spec=at_grid,
        out_shape=jax.ShapeDtypeStruct((n_bg, LANES, gr, LANES), jnp.float32,
                                       vma=vma),
        cost_estimate=at_cost, interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT))

    spt_b = s_b * TS
    octet = bool(getattr(rm, "octet", 0))
    y_rows_per_tile = spt_b if octet else s_b   # y stream rows per grid tile
    b_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b_tiles,),
        in_specs=[
            pl.BlockSpec((spt_b, LANES), lambda t, g, o, r: (t, 0),
                         memory_space=pltpu.VMEM),   # idx
            pl.BlockSpec((c * gr, LANES), lambda t, g, o, r: (g[t], 0),
                         memory_space=pltpu.VMEM),   # T block (band group)
        ],
        out_specs=pl.BlockSpec((1, y_rows_per_tile, LANES),
                               lambda t, g, o, r: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TS if octet else 1, LANES),
                                   jnp.float32)],
    )
    b_cost = pl.CostEstimate(
        flops=int(rm.stats.get("nnz_routed", 1)),
        bytes_accessed=int(b_steps_pad * LANES * (6 if octet else 2)
                           + (0 if octet else b_steps_pad // TS * LANES * 4)
                           + b_tiles * c * gr * LANES * 4),
        transcendentals=0)
    b_call = pl.pallas_call(
        _make_route_b_kernel(chain, s_b, octet), grid_spec=b_grid,
        out_shape=jax.ShapeDtypeStruct((b_tiles, y_rows_per_tile, LANES),
                                       jnp.float32, vma=vma),
        cost_estimate=b_cost, interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT))

    real = rm.a_real_steps
    if a_steps_pad != real:
        # guaranteed by the chooser (n_win*P % 1024 == 0 makes real a
        # multiple of the fused grid quantum) — the (bg, q) block tiling
        # of the col/val streams relies on it
        raise ValueError(f"A stream padded past real ({a_steps_pad} != "
                         f"{real}); fused A+T block tiling invalid")
    n_groups = int(np.ceil(rm.n_bands / c))
    if n_groups * c * gr > rm.n_bg * LANES * gr:
        raise ValueError("stage-B grouping exceeds the T stream (rebuild "
                         "the schedule: ROUTE_FORMAT_VERSION bump)")
    # Output returns to INPUT space (original row order, padded like x), so
    # apply is layout-chainable — CG and power iteration can drive it like
    # any other model (the reference's solver loop chains its SpMV the same
    # way, kernel.cu:288-321).  Two epilogues:
    #
    # * identity dst (the builder was handed a routed_row_perm-pre-permuted
    #   matrix): dst space IS input space — a static pad/slice, free;
    # * permuted dst (legacy / externally-ordered): one element-granular
    #   permutation scatter.  Its BYTES are ~1% of the pipeline, but XLA
    #   serializes arbitrary gathers at ~5.5 cyc/element — measured 12.3 of
    #   random_1m's 14.6 ms/iter, 85% of the runtime.  The model layer
    #   pre-permutes precisely to avoid this.
    n_dst = rm.dst_rows.shape[0]
    ident = bool(np.array_equal(rm.dst_rows[:rm.dim],
                                np.arange(rm.dim, dtype=rm.dst_rows.dtype)))
    if not ident:
        keep = np.flatnonzero(rm.dst_rows < rm.dim)
        scat_src = jnp.asarray(keep.astype(np.int32))
        scat_dst = jnp.asarray(rm.dst_rows[keep].astype(np.int32))
    else:
        scat_src = scat_dst = None
    out_rows = rm.out_rows

    def stage_at(dev, x_pad: jax.Array) -> jax.Array:
        # fused A+T: products leave the kernel already band-major (the
        # (bg, bl, w, p) layout stage B consumes).  Tail band rows past
        # n_bands are only ever read through masked B slots (select to 0),
        # so the transpose output needs no pad — the group-geometry search
        # caps n_groups*c at n_bg*128 (core/route.py bands_cap).
        x2d = x_pad.reshape(x_rows, LANES)
        out4 = at_call(a_win, dev["a_col"], dev["a_val"], x2d)
        return out4.reshape(n_bg * LANES * gr, LANES)

    def stage_b(dev, t2: jax.Array) -> jax.Array:
        gm = dev["b_gmap"] if maps_in_dev else b_gmap
        bo = dev["b_boff"] if maps_in_dev else b_boff
        rs = dev["b_reset"] if maps_in_dev else b_reset
        bl = dev["b_last"] if maps_in_dev else b_last
        y3 = b_call(gm, bo, rs, dev["b_idx"], t2)
        return jnp.take(y3.reshape(-1, LANES), bl, axis=0).reshape(-1)

    # builds since round 5 emit dst-sorted spill; detect from content so
    # older cached schedules simply skip the hint
    sp_sorted = bool(rm.sp_dst.size == 0
                     or np.all(np.diff(rm.sp_dst) >= 0))

    def apply(dev, x_pad: jax.Array) -> jax.Array:
        y_dst = stage_b(dev, stage_at(dev, x_pad))
        # spill tail: the XLA gather path (role of the ER tail)
        if maps_in_dev or rm.sp_val.size:
            y_dst = y_dst.at[dev["sp_dst"]].add(
                dev["sp_val"] * x_pad[dev["sp_col"]],
                indices_are_sorted=sp_sorted and not maps_in_dev)
        if ident and not maps_in_dev:
            # dst space == input space: synthetic tail rows are exact zeros
            # (masked B slots emit 0), so pad/slice is the whole epilogue
            if out_rows <= n_dst:
                return y_dst[:out_rows]
            return jnp.concatenate(
                [y_dst, jnp.zeros(out_rows - n_dst, y_dst.dtype)])
        # back to input space (chainable with prepare_x'd vectors)
        sd = dev["scat_dst"] if maps_in_dev else scat_dst
        ss = dev["scat_src"] if maps_in_dev else scat_src
        return jnp.zeros(out_rows, y_dst.dtype).at[sd].set(
            jnp.take(y_dst, ss))

    #: stage prefixes for scripts/route_breakdown.py (fused A+T, then B)
    apply.stages = (stage_at, stage_b)

    log.info("routed apply: A+T %d tiles (%d steps), B %d tiles (%d steps), "
             "chain %d, block %d bands (%.0f KB), spill %d",
             n_bg * nq, a_steps_pad, b_tiles, b_steps_pad, chain, c,
             c * gr * LANES * 4 / 1024, rm.sp_val.size)
    return apply
