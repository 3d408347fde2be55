"""Fused Pallas TPU kernel for the EHYB SELL body.

TPU re-design of ``kernelCachedBlockedELL`` (``kernel.cu:110-195``).  Mapping of
the reference's mechanisms onto the TPU hardware model:

  * **explicit cache**: the partition's x window lives in VMEM as an (8, 128)
    f32 block, auto-DMA'd by the BlockSpec index map and *reused across grid
    steps* while consecutive tiles come from the same partition (role of the
    cooperative shared-memory load at ``kernel.cu:137-141``);
  * **work distribution**: the GPU kernel work-steals 32-row ELL blocks with a
    shared-memory atomic (``kernel.cu:164-167``); TPU has no device-side
    dynamic scheduling, so the schedule is static-uniform *by construction* —
    the density sort already made slice widths uniform, and the grid walks
    8-step tiles with a scalar-prefetched ``tile → slice`` map;
  * **the gather**: ``x[cachedVec[col]]`` (``kernel.cu:160``) becomes a
    two-stage ``tpu.dynamic_gather``: a sublane gather picks each element's
    128-wide window chunk (``hi = col >> 7``), a lane gather picks the element
    within the chunk (``lo = col & 127``).  The composition is exact because
    the chunk-sync packer (``convert._sell_pack_chunk_sync``) guarantees ``hi``
    is constant within every width-step;
  * **accumulation**: the output block (1, 128) = 128 rows' partials stays in
    VMEM while its slice's tiles stream by (revisited output index), replacing
    ``y[row] = dot`` per warp (``kernel.cu:163``).

The ER tail and long rows keep their XLA formulations (global-column gathers —
the analog of the uncached phase 2, ``kernel.cu:169-194``).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EhybConfig, LANES, SUBLANES_F32, WINDOW_ALIGN
from ..core.ehyb import EhybDevice, EhybMatrix
from ..ops.xla_ops import combine_ehyb, ehyb_er_xla, ehyb_long_xla
from ..utils.log import get_logger

log = get_logger(__name__)

#: Width-steps per grid tile (= f32 sublane count; one (8,128) vreg of nnz).
TILE_STEPS = SUBLANES_F32


def sell_body_kernel(tile_slice_ref, tile_first_ref, win_block_ref,
                     col_ref, val_ref, x_ref, y_ref):
    """One (8, 128)-nnz tile: two-stage window gather + FMA + slice accumulate.

    The accumulator is the full (8, 128) register (one sublane per width-step
    phase); the cross-sublane reduction to the 128 row sums happens once per
    slice in XLA after the kernel, not once per tile.
    """
    t = pl.program_id(0)
    col = col_ref[:].astype(jnp.int32)          # (8, 128) window-local columns
    hi = jax.lax.shift_right_logical(col, 7)    # window chunk (const per step)
    lo = jax.lax.bitwise_and(col, 127)          # offset within chunk
    rows = jnp.take_along_axis(x_ref[:], hi, axis=0)   # sublane dynamic_gather
    g = jnp.take_along_axis(rows, lo, axis=1)          # lane dynamic_gather
    partial = (val_ref[:] * g)[None]            # (1, 8, 128)

    @pl.when(tile_first_ref[t] == 1)
    def _():
        y_ref[:] = partial

    @pl.when(tile_first_ref[t] == 0)
    def _():
        y_ref[:] = y_ref[:] + partial


def build_tile_maps(e: EhybMatrix):
    """Host-side tile metadata: tile → (slice, first-of-slice, x window block).

    Requires every slice width to be a positive multiple of TILE_STEPS and
    window starts aligned to WINDOW_ALIGN (both guaranteed by the converter +
    planner for the Pallas path).
    """
    widths = np.diff(e.slice_offset.astype(np.int64))
    if not np.all(widths > 0):
        raise ValueError("Pallas path requires no empty slices")
    if not np.all(widths % TILE_STEPS == 0):
        raise ValueError(f"slice widths must be multiples of {TILE_STEPS}")
    step_win = e.step_win.astype(np.int64)
    if not np.all(step_win % WINDOW_ALIGN == 0):
        raise ValueError("window starts must be WINDOW_ALIGN-aligned")
    sw = step_win.reshape(-1, TILE_STEPS)
    if not np.all(sw == sw[:, :1]):
        raise ValueError("window must be constant within each tile")

    tiles_per_slice = widths // TILE_STEPS
    n_slices = widths.shape[0]
    tile_slice = np.repeat(np.arange(n_slices, dtype=np.int32),
                           tiles_per_slice)
    first_pos = np.zeros(int(tiles_per_slice.sum()), dtype=np.int32)
    first_pos[np.cumsum(tiles_per_slice)[:-1]] = 1
    first_pos[0] = 1
    win_block = (sw[:, 0] // WINDOW_ALIGN).astype(np.int32)
    return tile_slice, first_pos, win_block


def make_ehyb_pallas_apply(e: EhybMatrix, config: EhybConfig,
                           interpret: bool = False) -> Callable:
    """Build the fused apply: Pallas SELL body + XLA ER/long phases.

    Returns ``apply(dev: EhybDevice, x_pad) -> y_padded`` (same contract as
    ``ops.xla_ops.ehyb_apply_xla``).
    """
    if e.window_rows != WINDOW_ALIGN:
        raise ValueError(
            f"Pallas two-stage kernel requires window_rows == {WINDOW_ALIGN} "
            f"(got {e.window_rows}); use the XLA path or re-plan")
    tile_slice, tile_first, win_block = build_tile_maps(e)
    n_tiles = int(tile_slice.shape[0])
    n_slices = e.n_slices
    ts = jnp.asarray(tile_slice)
    tf = jnp.asarray(tile_first)
    wb = jnp.asarray(win_block)

    x_chunks = WINDOW_ALIGN // LANES  # 8: window is one (8,128) x block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_STEPS, LANES),
                         lambda t, ts, tf, wb: (t, 0),
                         memory_space=pltpu.VMEM),          # col
            pl.BlockSpec((TILE_STEPS, LANES),
                         lambda t, ts, tf, wb: (t, 0),
                         memory_space=pltpu.VMEM),          # val
            pl.BlockSpec((x_chunks, LANES),
                         lambda t, ts, tf, wb: (wb[t], 0),
                         memory_space=pltpu.VMEM),          # x window
        ],
        out_specs=pl.BlockSpec((1, TILE_STEPS, LANES),
                               lambda t, ts, tf, wb: (ts[t], 0, 0),
                               memory_space=pltpu.VMEM),    # y slice partials
    )

    nnz_body = e.stats.get("nnz_ell", e.ell_val.size)
    vbytes = np.dtype(config.dtype).itemsize
    cost = pl.CostEstimate(
        flops=2 * max(nnz_body, 1),
        bytes_accessed=int(e.ell_val.size * (vbytes + e.ell_col.dtype.itemsize)
                           + e.dim * 2 * vbytes),
        transcendentals=0,
    )

    body_call = pl.pallas_call(
        sell_body_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slices, TILE_STEPS, LANES),
                                       config.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )

    def apply(dev: EhybDevice, x_pad: jax.Array) -> jax.Array:
        x2d = x_pad.reshape(-1, LANES)
        y3d = body_call(ts, tf, wb, dev.ell_col, dev.ell_val, x2d)
        y_body = jnp.sum(y3d, axis=1).reshape(-1)  # cross-sublane reduce
        y_er = ehyb_er_xla(dev, x_pad)
        y_long = ehyb_long_xla(dev, x_pad)
        return combine_ehyb(dev, y_body, y_er, y_long)

    log.info("pallas SELL body: %d tiles, %d slices, window=%d",
             n_tiles, n_slices, e.window_rows)
    return apply
