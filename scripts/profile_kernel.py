#!/usr/bin/env python
"""Microbenchmark the Pallas SELL-body kernel variants on real TPU.

Key discovery (see git history): when the EHYB arrays are closure constants of
the jitted loop, XLA pre-stages them into VMEM (S(1)) before the while loop —
v5e has 128 MiB VMEM — so the steady-state SpMV loop is VPU-compute-bound, not
HBM-bound, for matrices whose EHYB fits.  This harness reproduces exactly that
regime (constants + model-style iterate loop) and attributes cycles to kernel
sub-ops and grid overhead.

Env: PROF_MATRIX (default fem3d_32), PROF_ITERS (default 500),
     EHYB_SUBTILES (tile size sweep is done in-process regardless).
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, iters=None, reps=3):
    """Min over reps of per-iteration time of a device-side loop, dispatch
    latency subtracted via the half-length-run protocol."""
    import jax
    iters = iters or int(os.environ.get("PROF_ITERS", "500"))
    jax.block_until_ready(fn(10, *args))
    best = float("inf")
    out = None
    half = max(iters // 2, 1)
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(half, *args))
        t_half = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(half + iters, *args))
        t_full = time.perf_counter() - t0
        best = min(best, max(t_full - t_half, 1e-9) / iters)
    return best, out


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import ehyb_spmv_gpu_tpu as ehyb
    from ehyb_spmv_gpu_tpu.config import EhybConfig, LANES
    from ehyb_spmv_gpu_tpu.io import generate
    from ehyb_spmv_gpu_tpu.core.coo import deterministic_x
    from ehyb_spmv_gpu_tpu.ops import ehyb_pallas as ep

    matrix = os.environ.get("PROF_MATRIX", "fem3d_32")
    m = generate.load_corpus(matrix)
    cfg = EhybConfig()
    model = ehyb.MODELS["ehyb"](cfg).setup(m)
    e = model.ehyb
    x = deterministic_x(m.dimension)
    x_dev = model.prepare_x(x)
    dev = model.dev

    n_slices = e.n_slices
    x_rows = e.padded_x_rows // LANES
    vdt = cfg.dtype
    nnz_pad = e.ell_val.size
    elem_bytes = e.ell_val.dtype.itemsize + e.ell_col.dtype.itemsize
    stream_bytes = nnz_pad * elem_bytes
    n_vregs = nnz_pad // 1024
    print(f"matrix={matrix} dim={m.dimension} nnz={m.nnz} padded={nnz_pad} "
          f"slices={n_slices} vregs={n_vregs} stream={stream_bytes/1e6:.1f} MB",
          flush=True)

    def report(name, dt):
        cyc = dt * 940e6 / max(n_vregs, 1)
        gfl = 2e-9 * m.nnz / dt
        print(f"{name:24s}: {dt*1e6:8.1f} us  {gfl:7.1f} GFLOP/s  "
              f"{cyc:6.2f} cyc/vreg", flush=True)

    # ---- reference: full model through standard iterate -------------------
    dt, _ = bench(lambda n: model.iterate(x_dev, int(n)))
    report("model_full", dt)

    # ---- kernel variants in the VMEM-resident regime ----------------------
    T = ep.TILE_STEPS
    col_h = np.asarray(e.ell_col)
    val_h = np.asarray(e.ell_val)

    def variant(subtiles, kernel_builder, label):
        spt = subtiles * T
        try:
            tile_slice, tile_first, sub_win = ep.build_tile_maps(e, spt)
        except ValueError:
            # Re-pad widths to a multiple of spt on the host.
            widths = np.diff(e.slice_offset.astype(np.int64))
            new_w = (-(-widths // spt)) * spt
            off = np.zeros(n_slices + 1, dtype=np.int64)
            np.cumsum(new_w, out=off[1:])
            tot = int(off[-1])
            col2 = np.zeros((tot, LANES), col_h.dtype)
            val2 = np.zeros((tot, LANES), val_h.dtype)
            sw2 = np.zeros(tot, dtype=np.int64)
            for s in range(n_slices):
                a, b = int(e.slice_offset[s]), int(e.slice_offset[s + 1])
                col2[off[s]:off[s] + (b - a)] = col_h[a:b]
                val2[off[s]:off[s] + (b - a)] = val_h[a:b]
                sw2[off[s]:off[s] + (b - a)] = e.step_win[a:b]
                # padding steps: window 0, col 0, val 0 (gather×0 = no-op)
            class E2: pass
            e2 = E2()
            e2.slice_offset = off.astype(np.int32)
            e2.step_win = sw2.astype(np.int32)
            tile_slice, tile_first, sub_win = ep.build_tile_maps(e2, spt)
            colv, valv = col2, val2
            tot_steps = tot
        else:
            colv, valv = col_h, val_h
            tot_steps = col_h.shape[0]
        n_tiles = int(tile_slice.shape[0])
        aux = (jnp.asarray(sub_win), jnp.asarray(tile_slice),
               jnp.asarray(tile_first))
        col_c = jnp.asarray(colv)
        val_c = jnp.asarray(valv)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((spt, LANES), lambda t, wr, ts, tf: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((spt, LANES), lambda t, wr, ts, tf: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, LANES),
                                   lambda t, wr, ts, tf: (ts[t], 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        kern = kernel_builder(subtiles)
        call = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_slices, T, LANES), vdt),
            cost_estimate=pl.CostEstimate(flops=2 * m.nnz,
                                          bytes_accessed=stream_bytes,
                                          transcendentals=0))

        from ehyb_spmv_gpu_tpu.ops.xla_ops import (combine_ehyb, ehyb_er_xla,
                                                    ehyb_long_xla)

        def papply(devm, x_pad):
            x2 = x_pad.reshape(x_rows, LANES)
            y3 = call(*aux, col_c, val_c, x2)
            y_body = jnp.sum(y3, axis=1).reshape(-1)
            return combine_ehyb(devm, y_body, ehyb_er_xla(devm, x_pad),
                                ehyb_long_xla(devm, x_pad))

        # Drive through the model's iterate loop (this is the structure XLA's
        # memory-space assignment prestages into VMEM).  Fresh shallow clone:
        # _iterate_jit is cached per (static) self, so reuse would be stale.
        import copy
        mv = copy.copy(model)
        mv._pallas_apply = papply
        mv._apply_jit = None
        dt, _ = bench(lambda n: mv.iterate(x_dev, int(n)))
        report(f"{label} ST={subtiles} tiles={n_tiles}", dt)
        return dt

    def k_full(subtiles):
        def k(win_row_ref, ts, tf, col_ref, val_ref, x_ref, y_ref):
            t = pl.program_id(0)
            acc = jnp.zeros((T, LANES), dtype=y_ref.dtype)
            for i in range(subtiles):
                win = x_ref[pl.ds(win_row_ref[t * subtiles + i], ep.WIN_ROWS), :]
                col = col_ref[i * T:(i + 1) * T, :].astype(jnp.int32)
                hi = jax.lax.shift_right_logical(col, 7)
                lo = jax.lax.bitwise_and(col, 127)
                rows = jnp.take_along_axis(win, hi, axis=0)
                g = jnp.take_along_axis(rows, lo, axis=1)
                acc = acc + val_ref[i * T:(i + 1) * T, :] * g
            prev = jnp.where(tf[t] == 0, y_ref[0], 0.0)
            y_ref[:] = (prev + acc)[None]
        return k

    def k_nosub(subtiles):
        # lane gather only (drops the sublane gather) — wrong result, for cost
        def k(win_row_ref, ts, tf, col_ref, val_ref, x_ref, y_ref):
            t = pl.program_id(0)
            acc = jnp.zeros((T, LANES), dtype=y_ref.dtype)
            for i in range(subtiles):
                win = x_ref[pl.ds(win_row_ref[t * subtiles + i], ep.WIN_ROWS), :]
                col = col_ref[i * T:(i + 1) * T, :].astype(jnp.int32)
                lo = jax.lax.bitwise_and(col, 127)
                g = jnp.take_along_axis(win, lo, axis=1)
                acc = acc + val_ref[i * T:(i + 1) * T, :] * g
            prev = jnp.where(tf[t] == 0, y_ref[0], 0.0)
            y_ref[:] = (prev + acc)[None]
        return k

    def k_nogather(subtiles):
        def k(win_row_ref, ts, tf, col_ref, val_ref, x_ref, y_ref):
            t = pl.program_id(0)
            acc = jnp.zeros((T, LANES), dtype=y_ref.dtype)
            for i in range(subtiles):
                win = x_ref[pl.ds(win_row_ref[t * subtiles + i], ep.WIN_ROWS), :]
                col = col_ref[i * T:(i + 1) * T, :].astype(y_ref.dtype)
                acc = acc + val_ref[i * T:(i + 1) * T, :] * (col + win)
            prev = jnp.where(tf[t] == 0, y_ref[0], 0.0)
            y_ref[:] = (prev + acc)[None]
        return k

    for st in (4, 8, 16):
        variant(st, k_full, "full")
    variant(4, k_nosub, "nosub")
    variant(4, k_nogather, "nogather")


if __name__ == "__main__":
    main()
