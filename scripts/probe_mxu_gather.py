"""MXU one-hot gather probe — VERDICT r2 next #3 / SURVEY.md:327.

Question: can the MXU (systolic array) beat the VPU's two-stage
``tpu.dynamic_gather`` (measured ~16-17 cyc per (8,128) vreg for the lane
stage, ~22 cyc/vreg for the full SELL body) at gathering 1024 arbitrary
elements from a 1024-element x window?

The MXU formulation: flatten the window to w (1024,), build a one-hot matrix
OH (1024, 1024) with OH[p, idx[p]] = 1, gather = OH @ w.  The matmul itself
is cheap (~8 MXU passes of (128,128) tiles ≈ tens of cycles).  The cost
centers are:

  1. *on-chip construction* of OH from the packed indices — a
     (1024, 1024) iota-compare = 1024 (8,128) vreg compare+converts per
     gathered vreg (measured below);
  2. *streaming a precomputed OH* from HBM — 1024·1024 bf16 = 2 MiB per
     1024 gathers = 2 KiB/element vs the 6 B/element of the packed format:
     a 340x bandwidth inflation, DOA without measurement (reported as
     arithmetic).

Run on the real TPU: ``python scripts/probe_mxu_gather.py``.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ehyb_spmv_gpu_tpu.utils.timing import measure_loop

CLOCK_GHZ = 1.67  # v5e TensorCore clock (public spec: 394 bf16 TFLOPs / 236)
WINDOW = 1024


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ehyb_jax_cache"))
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    T = 512  # vregs (1024 gathers each) per pass
    idx = jnp.asarray(rng.integers(0, WINDOW, size=(T, WINDOW)),
                      dtype=jnp.int32)
    w = jnp.asarray(rng.standard_normal(WINDOW), dtype=jnp.float32)

    def mxu_onehot(idx, w, n):
        def body(i, acc):
            oh = (idx[i][:, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (WINDOW, WINDOW), 1)
                  ).astype(jnp.float32)
            g = oh @ w                       # (1024,) — the MXU gather
            return acc + g.sum()
        def outer(k, acc):
            return jax.lax.fori_loop(0, T, body, acc)
        return jax.lax.fori_loop(0, n, outer, 0.0)

    def mxu_onehot_bf16(idx, w, n):
        wb = w.astype(jnp.bfloat16)
        def body(i, acc):
            oh = (idx[i][:, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (WINDOW, WINDOW), 1)
                  ).astype(jnp.bfloat16)
            g = jnp.dot(oh, wb, preferred_element_type=jnp.float32)
            return acc + g.sum()
        def outer(k, acc):
            return jax.lax.fori_loop(0, T, body, acc)
        return jax.lax.fori_loop(0, n, outer, 0.0)

    results = {}
    for name, fn in (("mxu_onehot_f32", mxu_onehot),
                     ("mxu_onehot_bf16", mxu_onehot_bf16)):
        f = jax.jit(fn, static_argnames="n")
        dt = measure_loop(lambda n: f(idx, w, n), iters=4)
        per_vreg_us = dt / T * 1e6
        cyc = per_vreg_us * 1e3 * CLOCK_GHZ
        results[name] = cyc
        print(f"{name}: {per_vreg_us*1000:.1f} ns per 1024-gather vreg "
              f"≈ {cyc:.0f} cyc  (VPU two-stage: ~22 cyc/vreg full body)")

    stream_bytes_per_elem = WINDOW * 2  # bf16 one-hot row per gathered elem
    print(f"streamed precomputed one-hot: {stream_bytes_per_elem} B/element "
          f"vs 6 B/element packed — {stream_bytes_per_elem/6:.0f}x HBM "
          f"inflation (not measured; bandwidth-DOA)")
    verdict = "REJECT" if min(results.values()) > 22 else "INVESTIGATE"
    print(f"verdict: {verdict} — MXU one-hot gather costs "
          f"{min(results.values()):.0f}+ cyc/vreg vs ~22 for the VPU "
          f"two-stage dynamic_gather")


if __name__ == "__main__":
    main()
