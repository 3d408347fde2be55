#!/usr/bin/env python
"""Real-TPU smoke of the sharded engines at D=1 with check_vma=True.

The vma-tagged pallas out_shapes (parallel/spmv.py `check_vma_enabled`)
only engage in COMPILED mode — CPU tests run the pallas interpreter, whose
hatch stays open — so this is the first hardware validation that the
shard_map bodies trace, compile, and validate under JAX's varying-mesh-axes
checking.  Exits nonzero on any failure; prints one OK line per engine.

Usage: python scripts/tpu_smoke_sharded.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

from ehyb_spmv_gpu_tpu.config import EhybConfig  # noqa: E402
from ehyb_spmv_gpu_tpu.core.coo import (  # noqa: E402
    MatrixCOO, deterministic_x, oracle_spmv)
from ehyb_spmv_gpu_tpu.io import generate  # noqa: E402
from ehyb_spmv_gpu_tpu.parallel.routed import ShardedRoutedSpmv  # noqa: E402
from ehyb_spmv_gpu_tpu.parallel.spmv import AXIS, ShardedEhybSpmv  # noqa: E402
from ehyb_spmv_gpu_tpu.utils.validate import rel_error  # noqa: E402


def main() -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    assert os.environ.get("EHYB_CHECK_VMA", "1") != "0", \
        "smoke must run with vma checking ON"
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), (AXIS,))

    m = generate.permuted(generate.poisson2d(192), seed=5)
    x = deterministic_x(m.dimension)
    model = ShardedEhybSpmv(EhybConfig(window_rows=1024), mesh=mesh).setup(m)
    err = rel_error(np.asarray(model.matvec(x)), oracle_spmv(m, x))
    assert err < 5e-6, err
    print(f"OK sharded-ehyb D=1 check_vma=True rel_error={err:.2e}",
          flush=True)

    rng = np.random.default_rng(3)
    n, k = 1 << 15, 12
    rows = np.repeat(np.arange(n), k)
    cols = rng.integers(0, n, size=n * k)
    key = rows.astype(np.int64) * n + cols
    _, idx = np.unique(key, return_index=True)
    mr = MatrixCOO(n, n, rows[idx].astype(np.int32),
                   cols[idx].astype(np.int32),
                   rng.standard_normal(len(idx)).astype(np.float32))
    xr = deterministic_x(n)
    sr = ShardedRoutedSpmv(EhybConfig(artifact_cache=False),
                           mesh=mesh).setup(mr)
    err = rel_error(np.asarray(sr.matvec(xr)), oracle_spmv(mr, xr))
    assert err < 5e-6, err
    print(f"OK sharded-routed D=1 check_vma=True rel_error={err:.2e}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
