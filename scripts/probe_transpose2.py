#!/usr/bin/env python
"""Stage-T cost on real TPU, measured with the output FULLY materialized
(the round-4 prefix-chain breakdown read one element of the transpose, which
XLA can slice through — understating T; feeding a pallas consumer forces the
real thing).

Variants:
  4d   — the shipped formulation: reshape → transpose((2,3,0,1)) → reshape
         (+ the pad-concat when n_groups*c > n_bg*128);
  2d   — the same permutation as ONE 2D transpose of the free
         (n_win*P, n_bg*128) view (reshapes on both sides are views);
  2d-pallas — a qc-chunked (128,128)-tile Pallas transpose kernel.

Each is timed through a trivial pallas "sum rows" consumer so the full
array must exist, with the consumer's own cost measured and printed too.

Usage: python scripts/probe_transpose2.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ehyb_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ehyb_spmv_gpu_tpu.utils.timing import measure_loop

    # random_1m geometry
    n_win, P, n_bg = 1024, 16, 16
    real = n_win * P * n_bg                       # 262144 steps
    gr = n_win * P // LANES                       # 128
    prod = jnp.asarray(np.random.default_rng(0).standard_normal(
        (real, LANES)).astype(np.float32))
    nbytes = real * LANES * 4

    # consumer: pallas sum over 512-row blocks (forces materialization of
    # its operand; ~HBM-read-bound)
    def red_kernel(x_ref, y_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
        y_ref[:] += jnp.sum(x_ref[:], axis=0, keepdims=True)

    rows = n_bg * LANES * gr

    def consume(t2):
        return pl.pallas_call(
            red_kernel,
            grid=(rows // 512,),
            in_specs=[pl.BlockSpec((512, LANES), lambda t: (t, 0))],
            out_specs=pl.BlockSpec((1, LANES), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        )(t2)

    def t_4d(p):
        t4 = p.reshape(n_win, P, n_bg, LANES)
        return jnp.transpose(t4, (2, 3, 0, 1)).reshape(rows, LANES)

    def t_2d(p):
        return p.reshape(n_win * P, n_bg * LANES).T.reshape(rows, LANES)

    qc = 8   # q-chunk: in block (qc*128, 1, 1, 128), out (1, 128, qc, 128)
    # (the dummy dim makes the per-bg input block legal: the lowering
    # constrains only the LAST TWO block dims)

    def tp_kernel(in_ref, out_ref):
        for j in range(qc):
            out_ref[0, :, j, :] = in_ref[j * LANES:(j + 1) * LANES, 0, 0, :].T

    def t_pallas(p):
        in4 = p.reshape(n_win * P, n_bg, 1, LANES)
        out4 = pl.pallas_call(
            tp_kernel,
            grid=(n_bg, gr // qc),
            in_specs=[pl.BlockSpec((qc * LANES, 1, 1, LANES),
                                   lambda b, q: (q, b, 0, 0))],
            out_specs=pl.BlockSpec((1, LANES, qc, LANES),
                                   lambda b, q: (b, 0, q, 0)),
            out_shape=jax.ShapeDtypeStruct((n_bg, LANES, gr, LANES),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(in4)
        return out4.reshape(rows, LANES)

    def loop(fn):
        # Chain each transpose's output back in as the next input: XLA can
        # commute a broadcast-add across a transpose and hoist the transpose
        # out of the loop (first version of this probe measured 0.015 ms),
        # but a data dependence through the permutation cannot be elided.
        def run(n):
            def body(_, p):
                return fn(p).reshape(real, LANES)
            return jax.lax.fori_loop(0, n, body, prod)
        return jax.jit(run)

    _ = consume  # kept for interactive use

    def tp_copy_kernel(in_ref, out_ref):
        for j in range(qc):
            out_ref[0, :, j, :] = in_ref[j * LANES:(j + 1) * LANES, 0, 0, :]

    def t_pallas_copy(p):
        """DMA-only control: same blocks, no in-kernel transpose (output is
        wrong — times the data movement alone)."""
        in4 = p.reshape(n_win * P, n_bg, 1, LANES)
        out4 = pl.pallas_call(
            tp_copy_kernel,
            grid=(n_bg, gr // qc),
            in_specs=[pl.BlockSpec((qc * LANES, 1, 1, LANES),
                                   lambda b, q: (q, b, 0, 0))],
            out_specs=pl.BlockSpec((1, LANES, qc, LANES),
                                   lambda b, q: (b, 0, q, 0)),
            out_shape=jax.ShapeDtypeStruct((n_bg, LANES, gr, LANES),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(in4)
        return out4.reshape(rows, LANES)

    for label, fn in [("4d transpose", t_4d), ("2d transpose", t_2d),
                      ("pallas transpose", t_pallas),
                      ("pallas DMA control", t_pallas_copy)]:
        if label == "pallas DMA control":
            dt = measure_loop(loop(fn), iters=100)
            print(f"{label:18s} {dt*1e3:8.3f} ms -> "
                  f"{2*nbytes/dt/1e9:5.0f} GB/s r+w (output wrong by design)",
                  flush=True)
            continue
        # correctness vs 4d first (tiny slice compare on device is fine)
        if label != "4d transpose":
            a = t_4d(prod)[:4096]
            b = fn(prod)[:4096]
            ok = bool(jnp.all(a == b))
            if not ok:
                print(f"{label}: MISMATCH vs 4d — skipping", flush=True)
                continue
        dt = measure_loop(loop(fn), iters=100)
        eff = 2 * nbytes / max(dt, 1e-9) / 1e9
        print(f"{label:18s} {dt*1e3:8.3f} ms/transpose -> {eff:5.0f} "
              "GB/s r+w", flush=True)


if __name__ == "__main__":
    main()
