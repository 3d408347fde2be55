#!/usr/bin/env python
"""Multi-chip scaling sanity on the virtual CPU mesh.

Real multi-chip TPU hardware is not available in this environment (one v5e
chip through a tunnel), so this script validates the DISTRIBUTED MECHANISM —
row sharding, ring ppermute halos, all-gathered ER tail, sharded DIA — and
reports per-device-count timings on an N-virtual-device CPU mesh.  CPU-mesh
timings do NOT model TPU ICI performance; they demonstrate that the SPMD
program compiles, validates, and that per-shard work shrinks with D
(the BASELINE.md scaling row is measurable only on real multi-chip hardware).

Usage: python scripts/scaling.py [dim_per_dev] [max_devs]
"""
from __future__ import annotations

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import ehyb_spmv_gpu_tpu as ehyb
    from ehyb_spmv_gpu_tpu.config import EhybConfig
    from ehyb_spmv_gpu_tpu.core.coo import deterministic_x, oracle_spmv
    from ehyb_spmv_gpu_tpu.io import generate
    from ehyb_spmv_gpu_tpu.parallel.spmv import AXIS, ShardedEhybSpmv
    from ehyb_spmv_gpu_tpu.utils.timing import measure_loop
    from ehyb_spmv_gpu_tpu.utils.validate import rel_error

    rows_per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    max_devs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    devs_avail = len(jax.devices())
    print(f"virtual devices: {devs_avail}")

    print(f"{'D':>3} {'dim':>9} {'nnz':>10} {'us/iter':>9} {'rel_err':>9} "
          f"{'weak-eff':>8}")
    t1 = None
    for d in (1, 2, 4, 8):
        if d > min(max_devs, devs_avail):
            break
        # Weak scaling: problem grows with D (same rows/device).
        n = int(np.sqrt(rows_per_dev * d))
        m = generate.permuted(generate.poisson2d(n), seed=5)
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:d]), (AXIS,))
        model = ShardedEhybSpmv(EhybConfig(window_rows=1024),
                                mesh=mesh).setup(m)
        x = deterministic_x(m.dimension)
        err = rel_error(model.matvec(x), oracle_spmv(m, x))
        x_dev = model.prepare_x(x)
        dt = measure_loop(lambda k: model.iterate(x_dev, int(k)), 50)
        if t1 is None:
            t1 = dt
        # Weak-scaling efficiency: per-iter time should stay flat as D and
        # problem size grow together.
        eff = t1 / dt
        print(f"{d:>3} {m.dimension:>9} {m.nnz:>10} {dt*1e6:>9.1f} "
              f"{err:>9.2e} {100*eff:>7.1f}%")
        assert err < 5e-6, f"validation failed at D={d}"
    print("scaling mechanism OK (CPU mesh; not a TPU ICI measurement)")

    # ---- routed engine weak scaling (gather-wall regime) ----
    from ehyb_spmv_gpu_tpu.core.coo import MatrixCOO
    from ehyb_spmv_gpu_tpu.parallel.routed import ShardedRoutedSpmv

    print(f"{'D':>3} {'dim':>9} {'nnz':>10} {'us/iter':>9} {'rel_err':>9} "
          f"{'weak-eff':>8}  (routed)")
    t1 = None
    for d in (1, 2, 4, 8):
        if d > min(max_devs, devs_avail):
            break
        dim = rows_per_dev * d
        rng = np.random.default_rng(7)
        rr = np.repeat(np.arange(dim), 6)
        cc = rng.integers(0, dim, rr.size)
        _, ui = np.unique(rr.astype(np.int64) * dim + cc, return_index=True)
        mr = MatrixCOO(dim, dim, rr[ui].astype(np.int32),
                       cc[ui].astype(np.int32),
                       rng.standard_normal(ui.size).astype(np.float32))
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:d]), (AXIS,))
        model = ShardedRoutedSpmv(EhybConfig(artifact_cache=False),
                                  mesh=mesh).setup(mr)
        x = deterministic_x(dim)
        err = rel_error(model.matvec(x), oracle_spmv(mr, x))
        assert err < 5e-6, f"routed validation failed at D={d}"
        x_dev = model.prepare_x(x)
        dt = measure_loop(lambda k: model.iterate(x_dev, int(k)), 50)
        if t1 is None:
            t1 = dt
        eff = t1 / dt
        print(f"{d:>3} {dim:>9} {mr.nnz:>10} {dt*1e6:>9.1f} "
              f"{err:>9.2e} {100*eff:>7.1f}%")
    print("routed scaling mechanism OK (CPU mesh)")

    # ---- comm/compute overlap measurement (VERDICT r2 next #8) ----
    # The interior/boundary split removes the halo-ppermute data dependency
    # from the interior pallas_call so XLA *can* overlap the exchange with
    # it.  Measure the split against the forced all-boundary control
    # (EHYB_FORCE_BOUNDARY=1: every real sub-tile waits for the halos).
    d = min(max_devs, devs_avail)
    n = int(np.sqrt(rows_per_dev * d))
    m = generate.permuted(generate.poisson2d(n), seed=5)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:d]), (AXIS,))
    x = deterministic_x(m.dimension)
    times = {}
    for label, env in (("split", ""), ("all-boundary", "1")):
        if env:
            os.environ["EHYB_FORCE_BOUNDARY"] = env
        else:
            os.environ.pop("EHYB_FORCE_BOUNDARY", None)
        model = ShardedEhybSpmv(EhybConfig(window_rows=1024),
                                mesh=mesh).setup(m)
        err = rel_error(model.matvec(x), oracle_spmv(m, x))
        assert err < 5e-6, f"overlap arm {label} failed validation: {err}"
        x_dev = model.prepare_x(x)
        times[label] = measure_loop(
            lambda k: model.iterate(x_dev, int(k)), 50)
        print(f"overlap[{label}]: {times[label]*1e6:.1f} us/iter")
    os.environ.pop("EHYB_FORCE_BOUNDARY", None)
    gain = times["all-boundary"] / times["split"] - 1.0
    print(f"overlap gain from interior/boundary split at D={d}: "
          f"{100*gain:+.1f}% (positive = split faster)")


if __name__ == "__main__":
    main()
