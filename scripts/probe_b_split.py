#!/usr/bin/env python
"""Split stage B of the routed pipeline into its parts on real TPU:

  - the route-reduce pallas_call alone (on a precomputed T stream),
  - the b_last row-gather (jnp.take) that extracts slice sums,
  - the spill tail (.at[].add) and the identity-dst epilogue slice.

The round-4 breakdown (VERDICT_R3_RESPONSE.md) priced A+T+B as one prefix
chain; the +1.346 ms B delta at HEAD is ~1.8x the chain-16 probe's
25.9 cyc/vreg model, so something inside stage_b beyond the kernel is
paying — this names it.

Usage: python scripts/probe_b_split.py [corpus_name]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ehyb_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import ehyb_spmv_gpu_tpu as ehyb
    from ehyb_spmv_gpu_tpu.core.coo import deterministic_x
    from ehyb_spmv_gpu_tpu.io import generate
    from ehyb_spmv_gpu_tpu.utils.timing import measure_loop

    name = sys.argv[1] if len(sys.argv) > 1 else "random_1m"
    m = generate.load_corpus(name)
    model = ehyb.MODELS["ehyb_routed"](ehyb.EhybConfig(artifact_cache=True)
                                       ).setup(m)
    x = deterministic_x(m.dimension)
    x_dev = model.prepare_x(x)
    rm, ap, dv = model.blocks[0], model._applies[0], model.dev[0]
    stage_at, stage_b = ap.stages
    t2 = jax.block_until_ready(stage_at(dv, x_dev))
    import numpy as np

    from ehyb_spmv_gpu_tpu.config import LANES
    b_last = jnp.asarray(rm.b_last)
    n_rows_y3 = (rm.b_idx.shape[0] if rm.octet
                 else rm.b_idx.shape[0] // 8)
    y3flat = jax.block_until_ready(
        jnp.asarray(np.random.default_rng(0).standard_normal(
            (n_rows_y3, LANES)).astype(np.float32)))
    print(f"matrix={name} y3 rows={n_rows_y3} slices={rm.b_last.shape[0]}",
          flush=True)

    def loop(fn, seed):
        def run(n):
            def body(_, c):
                y = fn(seed + c)
                return y.ravel()[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return jax.jit(run)

    flops = 2 * m.nnz

    def b_kernel_only(c):
        y3 = stage_b(dv, t2 + c)       # full: kernel + take
        return y3

    # isolate: rebuild the b_call closure via ap internals is private; time
    # (kernel+take) and (take alone) and subtract.
    def take_only(c):
        return jnp.take(y3flat + c, b_last, axis=0)

    def spill_only(c):
        y = jnp.zeros(rm.out_rows, jnp.float32) + c
        return y.at[dv["sp_dst"]].add(dv["sp_val"] * (x_dev + c)[dv["sp_col"]])

    for label, fn in [("stage_b (kernel+take)", b_kernel_only),
                      ("take(b_last) alone", take_only),
                      ("spill .at[].add alone", spill_only)]:
        dt = measure_loop(loop(fn, jnp.float32(0)), iters=200)
        print(f"{label:24s} {dt*1e3:8.3f} ms/iter   "
              f"({flops/dt/1e9:7.2f} GFLOP/s-equiv)", flush=True)


if __name__ == "__main__":
    main()
