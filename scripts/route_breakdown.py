#!/usr/bin/env python
"""Per-stage timing of the routed pipeline on real TPU.

Times nested prefixes of the routed apply on the cached schedules — A
(gather-multiply), A+T (plus transpose), A+T+B (plus route-reduce) — and
the full apply with the spill tail, each under the hardened ~1 s-region
protocol.  The deltas price each stage against its bytes/VPU model and
tell the next round which stage to attack.

Usage: python scripts/route_breakdown.py [corpus_name]   (default random_1m)
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
    print(f"backend={jax.default_backend()} matrix={name} "
          f"blocks={len(model.blocks)}", flush=True)

    flops = 2 * m.nnz

    def loop(fn):
        def run(n):
            def body(_, c):
                y = fn(x_dev + c)
                return y.ravel()[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return jax.jit(run)

    # stage prefixes, summed over blocks (block mode runs them per block).
    # Since format v11 stages = (fused A+T, B): the product stream is never
    # materialized, so the old A-only prefix no longer exists.  NOTE the
    # caveat probe_b_split found on the OLD chain: a prefix that ends in
    # pure XLA ops (the v10 transpose) can be slice-eliminated when only
    # one element is read — pallas-terminated prefixes (both of these) are
    # honest.
    def pref_at(xv):
        outs = []
        for rm, ap, dv, lo in zip(model.blocks, model._applies, model.dev,
                                  model._lo):
            xs = (xv if len(model.blocks) == 1
                  else jax.lax.slice(xv, (lo,), (lo + rm.padded_x_rows,)))
            outs.append(ap.stages[0](dv, xs))
        return outs[0] if len(outs) == 1 else sum(o.ravel()[0] for o in outs)

    def pref_atb(xv):
        # per-block stage-B outputs live in per-block dst orderings with
        # per-block lengths (n_bands*R can differ) — reduce each to a
        # scalar for the timing chain instead of summing arrays
        outs = []
        for rm, ap, dv, lo in zip(model.blocks, model._applies, model.dev,
                                  model._lo):
            xs = (xv if len(model.blocks) == 1
                  else jax.lax.slice(xv, (lo,), (lo + rm.padded_x_rows,)))
            outs.append(ap.stages[1](dv, ap.stages[0](dv, xs)))
        return outs[0] if len(outs) == 1 else sum(o.ravel()[0] for o in outs)

    rows = [("A+T (fused gather-multiply-transpose)", pref_at),
            ("A+T+B (+route-reduce)", pref_atb),
            ("full (+spill+scatter)",
             lambda xv: model.apply_operands(model.dev, xv))]
    prev = 0.0
    for label, fn in rows:
        dt = measure_loop(loop(fn), iters=200)
        print(f"{label:24s} {dt*1e3:8.3f} ms/iter  (+{(dt-prev)*1e3:7.3f})  "
              f"cum {flops/dt/1e9:7.2f} GFLOP/s", flush=True)
        prev = dt

    bm = model.bytes_model()
    print(f"bytes model {bm/1e6:.0f} MB/iter -> HBM-equivalent floor "
          f"{bm/819e9*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
