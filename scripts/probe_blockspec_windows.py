#!/usr/bin/env python
"""Probe: per-subtile x windows delivered by BlockSpec index maps (pipelined
DMA) instead of in-kernel dynamic sublane slices from a resident x.

Hypothesis (see memory notes): the resident kernel's per-subtile
``x_ref[pl.ds(win_row, 8), :]`` serializes (~240 cyc/tile overhead on the
2.1M-row scrambled case).  BlockSpec-indexed windows lose x reuse (each tile
re-reads its 4 windows from HBM) but pipeline with compute.  Requires fixed
1024-aligned windows.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ehyb_jax_cache"))
    import ehyb_spmv_gpu_tpu as ehyb
    from ehyb_spmv_gpu_tpu.config import EhybConfig, LANES
    from ehyb_spmv_gpu_tpu.io import generate
    from ehyb_spmv_gpu_tpu.core.coo import deterministic_x, oracle_spmv
    from ehyb_spmv_gpu_tpu.ops import ehyb_pallas as ep
    from ehyb_spmv_gpu_tpu.utils.timing import measure_loop
    from ehyb_spmv_gpu_tpu.utils.validate import rel_error

    n = int(os.environ.get("PROBE_N", "1450"))
    m = generate.permuted(generate.poisson2d(n), seed=7)
    cfg = EhybConfig(sliding_windows=False, artifact_cache=True)
    model = ehyb.MODELS["ehyb"](cfg).setup(m)
    e = model.ehyb
    x = deterministic_x(m.dimension)
    x_dev = model.prepare_x(x)
    dev = model.dev
    vdt = cfg.dtype

    # Baseline: current resident kernel.
    dt0 = measure_loop(lambda k: model.iterate(x_dev, int(k)), 100)
    print(f"resident-kernel baseline: {dt0*1e6:.0f} us/iter", flush=True)

    T, S = ep.TILE_STEPS, ep.SUBTILES
    spt = S * T
    tile_slice, tile_first, sub_win = ep.build_tile_maps(e, spt)
    n_tiles = int(tile_slice.shape[0])
    n_slices = e.n_slices
    x_rows = e.padded_x_rows // LANES
    wb = (sub_win // ep.WIN_ROWS).reshape(n_tiles, S)   # x2d 8-row block ids
    aux = [jnp.asarray(tile_slice), jnp.asarray(tile_first)] + \
          [jnp.asarray(np.ascontiguousarray(wb[:, i])) for i in range(S)]

    def kernel(ts_ref, tf_ref, *refs):
        wbs, rest = refs[:0], refs  # placeholder
        col_ref, val_ref = rest[S], rest[S + 1]
        y_ref = rest[S + 2]
        t = pl.program_id(0)
        acc = jnp.zeros((T, LANES), dtype=y_ref.dtype)
        for i in range(S):
            win = rest[i][...]                       # (8, 128) window block
            col = col_ref[i * T:(i + 1) * T, :].astype(jnp.int32)
            hi = jax.lax.shift_right_logical(col, 7)
            lo = jax.lax.bitwise_and(col, 127)
            rows = jnp.take_along_axis(win, hi, axis=0)
            g = jnp.take_along_axis(rows, lo, axis=1)
            acc = acc + val_ref[i * T:(i + 1) * T, :] * g
        prev = jnp.where(tf_ref[t] == 0, y_ref[0], 0.0)
        y_ref[:] = (prev + acc)[None]

    def k_wrap(ts, tf, w0, w1, w2, w3, xw0, xw1, xw2, xw3, col_ref, val_ref,
               y_ref):
        kernel(ts, tf, xw0, xw1, xw2, xw3, col_ref, val_ref, y_ref)

    win_specs = [
        pl.BlockSpec((ep.WIN_ROWS, LANES),
                     (lambda i: lambda t, ts, tf, *w: (w[i][t], 0))(i),
                     memory_space=pltpu.VMEM)
        for i in range(S)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 + S,
        grid=(n_tiles,),
        in_specs=win_specs + [
            pl.BlockSpec((spt, LANES), lambda t, ts, tf, *w: (t, 0),
                         memory_space=pltpu.VMEM),      # col
            pl.BlockSpec((spt, LANES), lambda t, ts, tf, *w: (t, 0),
                         memory_space=pltpu.VMEM),      # val
        ],
        out_specs=pl.BlockSpec((1, T, LANES),
                               lambda t, ts, tf, *w: (ts[t], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        k_wrap, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slices, T, LANES), np.dtype(vdt)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))

    col_c, val_c = dev.ell_col, dev.ell_val

    @jax.jit
    def apply_bs(ops, xp):
        c, v = ops
        x2 = xp.reshape(x_rows, LANES)
        y3 = call(*aux, x2, x2, x2, x2, c, v)
        return jnp.sum(y3, axis=1).reshape(-1)

    # Correctness vs the XLA body.
    from ehyb_spmv_gpu_tpu.ops.xla_ops import ehyb_body_xla
    want = np.asarray(jax.jit(ehyb_body_xla)(dev, x_dev))
    got = np.asarray(apply_bs((col_c, val_c), x_dev))
    err = rel_error(got[: want.shape[0]], want)
    print(f"blockspec-window body rel_error vs XLA body: {err:.2e}", flush=True)

    @jax.jit
    def run(nit, eps, ops, xp):
        def step(_, carry):
            y = apply_bs(ops, xp + eps * carry[: xp.shape[0]])
            out = jnp.zeros_like(xp)
            return out.at[: y.shape[0]].set(y[: xp.shape[0]])
        return jax.lax.fori_loop(0, nit, step, jnp.zeros_like(xp))

    eps0 = jnp.asarray(0.0, x_dev.dtype)
    dt = measure_loop(
        lambda k: run(jnp.asarray(k, jnp.int32), eps0, (col_c, val_c), x_dev),
        100)
    print(f"blockspec-window body: {dt*1e6:.0f} us/iter "
          f"(baseline full apply {dt0*1e6:.0f})", flush=True)


if __name__ == "__main__":
    main()
