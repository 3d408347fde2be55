#!/usr/bin/env python
"""De-risk probes for the product-routing engine (the gather-wall regime fix,
VERDICT r2 missing #2 follow-up; see core/route.py once it lands).

The routed pipeline is three device stages:

  A: gather-multiply products into a (window, stripe, row-block) padded layout
     (reuses the relaxed packer's election machinery, nwin=1 windows);
  T: 3D transpose (n_win, P, n_bands) -> (n_bands, n_win, P) so every
     row-block's products land contiguous;
  B: per-row-block (128, 128) VMEM block gather with a CH-way select chain
     (sel = 4 bits of the packed int16 index) + reset-cumulative row reduce.

Two costs decide the design and are measured here on the real chip:

  1. the 3D transpose rate (HBM roundtrip efficiency of XLA's transpose
     lowering at this shape);
  2. the select-chain gather cost per (8,128) vreg as the chain length grows
     (4 = the proven quad kernel, 8, 16 = the routed B kernel).
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_kernel import bench  # noqa: E402  (half-run protocol)


def probe_transpose(jax, jnp):
    n_win, P, n_bands = 1024, 16, 2048
    a = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((n_win, P, n_bands), dtype=np.float32))
    nbytes = a.size * 4

    @jax.jit
    def roundtrip(n, a):
        def body(_, y):
            t = jnp.transpose(y, (2, 0, 1))       # (n_bands, n_win, P)
            return jnp.transpose(t, (1, 2, 0))    # back — 2 transposes/iter
        return jax.lax.fori_loop(0, n, body, a)

    dt, _ = bench(roundtrip, a, iters=100)
    per_t = dt / 2
    print(f"3D transpose (1024,16,2048) f32 {nbytes/1e6:.0f} MB: "
          f"{per_t*1e3:.3f} ms/transpose -> {2*nbytes/per_t/1e9:.0f} GB/s "
          f"r+w effective", flush=True)

    # the exact shapes the routed path uses (one direction only, fori chain
    # with a traced scalar so XLA cannot hoist)
    @jax.jit
    def one(n, a, eps):
        def body(_, c):
            t = jnp.transpose(a + c * eps, (2, 0, 1))
            return t.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    dt2, _ = bench(one, a, jnp.float32(0), iters=100)
    print(f"  one-direction (with add): {dt2*1e3:.3f} ms "
          f"-> {2*nbytes/dt2/1e9:.0f} GB/s", flush=True)


def probe_chain(jax, jnp, pl, pltpu, chain: int, s_sub: int = 8):
    """B-kernel analog: per grid step, one (128,128) block (BlockSpec-DMA'd)
    and s_sub (8,128) idx sub-tiles; chain-way select over the block's 8-row
    windows; running-sum output per sub-tile."""
    LANES, TS = 128, 8
    n_rb, tiles_per_rb = 64, 8
    n_tiles = n_rb * tiles_per_rb
    rng = np.random.default_rng(1)
    T2 = rng.standard_normal((n_rb * 128, LANES)).astype(np.float32)
    sel = rng.integers(0, chain, (n_tiles * s_sub * TS, LANES))
    srow = rng.integers(0, 8, sel.shape)
    lane = rng.integers(0, LANES, sel.shape)
    idx = ((sel << 10) | (srow << 7) | lane).astype(np.int16)
    rb_map = np.repeat(np.arange(n_rb, dtype=np.int32), tiles_per_rb)

    def kernel(rb_ref, idx_ref, blk_ref, y_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for i in range(s_sub):
            iv = idx_ref[i * TS:(i + 1) * TS, :].astype(jnp.int32)
            sl = jax.lax.shift_right_logical(iv, 10)
            sr = jax.lax.bitwise_and(jax.lax.shift_right_logical(iv, 7), 7)
            ln = jax.lax.bitwise_and(iv, 127)
            rows = jnp.take_along_axis(blk_ref[0:TS, :], sr, axis=0)
            for j in range(1, chain):
                rows = jnp.where(
                    sl == j,
                    jnp.take_along_axis(blk_ref[j * TS:(j + 1) * TS, :], sr,
                                        axis=0),
                    rows)
            g = jnp.take_along_axis(rows, ln, axis=1)
            acc = jnp.sum(g, axis=0) + acc_ref[0]
            acc_ref[0] = acc
            y_ref[0, i, :] = acc

    spt = s_sub * TS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((spt, LANES), lambda t, rb: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, LANES), lambda t, rb: (rb[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_sub, LANES), lambda t, rb: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.float32)],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, s_sub, LANES), jnp.float32))
    rb_d = jnp.asarray(rb_map)
    idx_d = jnp.asarray(idx)
    T_d = jnp.asarray(T2)

    @jax.jit
    def loop(n, eps):
        def body(_, c):
            y = call(rb_d, idx_d, T_d + c * eps)
            return y[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    dt, _ = bench(loop, jnp.float32(0), iters=300)
    n_vregs = n_tiles * s_sub
    cyc = dt * 940e6 / n_vregs
    print(f"chain={chain:2d}: {dt*1e6:9.1f} us/iter  {cyc:6.1f} cyc/vreg",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"backend={jax.default_backend()}", flush=True)
    probe_transpose(jax, jnp)
    for ch in (4, 8, 16):
        probe_chain(jax, jnp, pl, pltpu, ch)


if __name__ == "__main__":
    main()
