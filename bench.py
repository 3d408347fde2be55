#!/usr/bin/env python
"""Headline benchmark — run on real TPU hardware by the driver.

Protocol mirrors the reference's canonical run (``./spmv.out -i 2000 -m
audikw_1``, ``README.md:8-13``; timing loop ``spmv.cu:100-122``): warm-up, then
timed SpMV iterations, GFLOP/s = 2·nnz·iter/time.  The corpus matrix is a
generated audikw_1-class FEM matrix (no SuiteSparse download in this
environment — see ``io/generate.py``).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GFLOP/s", "vs_baseline": N}
where vs_baseline is the speedup over the in-repo vendor baseline
(jax.experimental.sparse BCOO — the cuSPARSE analog, ``spmv.cu:135-281``).
Everything else goes to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import traceback

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    os.environ.setdefault("EHYB_LOG", "INFO")
    import jax

    # Remote TPU compiles cost minutes; persist compiled executables.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ehyb_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import ehyb_spmv_gpu_tpu as ehyb
    from ehyb_spmv_gpu_tpu.config import EhybConfig
    from ehyb_spmv_gpu_tpu.core.coo import deterministic_x, oracle_spmv
    from ehyb_spmv_gpu_tpu.io import generate
    from ehyb_spmv_gpu_tpu.utils.timing import bench_apply, spmv_bytes_model
    from ehyb_spmv_gpu_tpu.utils.validate import rel_error

    backend = jax.default_backend()
    matrix_name = os.environ.get("EHYB_BENCH_MATRIX", "fem3d_32")
    iters = int(os.environ.get("EHYB_BENCH_ITERS", "500"))
    log(f"backend={backend} devices={jax.devices()} matrix={matrix_name} "
        f"iters={iters}")

    m = generate.CORPUS[matrix_name]()
    log(f"matrix: dim={m.dimension} nnz={m.nnz} maxCol={m.max_col()}")
    x = deterministic_x(m.dimension)
    want = oracle_spmv(m, x)

    def run(model_name: str, cfg: EhybConfig):
        model = ehyb.MODELS[model_name](cfg).setup(m)
        err = rel_error(model.matvec(x), want)
        log(f"{model_name}: rel_error={err:.3e}")
        if err > 1e-4:
            raise RuntimeError(f"{model_name} validation failed: {err}")
        x_dev = model.prepare_x(x)
        stats = getattr(model, "ehyb", None)
        bm = (spmv_bytes_model(stats.stats, dim=m.dimension)
              if stats is not None else m.nnz * 8 + 2 * m.dimension * 4)
        return bench_apply(model_name, lambda n: model.iterate(x_dev, n),
                           nnz=m.nnz, iters=iters, warmup=10, bytes_model=bm)

    # Flagship (graceful degradation so the bench always reports something).
    flagship = None
    for name in ("ehyb", "ehyb_xla", "csr"):
        try:
            flagship = run(name, EhybConfig())
            flagship_name = name
            break
        except Exception:
            log(f"flagship model {name} failed:\n{traceback.format_exc()}")
    if flagship is None:
        print(json.dumps({"metric": "spmv_gflops", "value": 0.0,
                          "unit": "GFLOP/s", "vs_baseline": 0.0}))
        return 1

    # Vendor baseline (BCOO = cuSPARSE analog).
    baseline = None
    try:
        baseline = run("bcoo", EhybConfig())
    except Exception:
        log(f"baseline bcoo failed:\n{traceback.format_exc()}")
        try:
            baseline = run("csr", EhybConfig())
        except Exception:
            log("csr baseline failed too")

    vs = flagship.gflops / baseline.gflops if baseline else 0.0
    log(f"flagship[{flagship_name}] {flagship.gflops:.2f} GFLOP/s "
        f"({100*flagship.roofline_frac:.1f}% of roofline) | "
        f"baseline {baseline.gflops if baseline else float('nan'):.2f} → "
        f"{vs:.2f}x")
    print(json.dumps({
        "metric": f"spmv_gflops_{matrix_name}_{backend}",
        "value": round(flagship.gflops, 3),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
