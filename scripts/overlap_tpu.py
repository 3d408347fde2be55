"""Comm/compute overlap measurement on the real TPU (VERDICT r2 next #8).

The sharded body splits its sub-tile stream into an INTERIOR pallas_call
(fed by x_local alone) and a BOUNDARY call (fed by the halo'd x_ext), so the
halo ppermutes have no data dependency on the interior call and XLA can
schedule them concurrently.  This script measures the compiled D=1 step time
with the split enabled vs the forced all-boundary control
(``EHYB_FORCE_BOUNDARY=1`` — every real sub-tile waits for the halos).

D=1 is the only real-hardware mesh available (one v5e through the tunnel);
the ppermute pair and the exchange all_to_all still exist in the program as
self-copies, so a positive delta demonstrates XLA actually hoists them
behind the interior call.  True ICI overlap needs a multi-chip pod — see
scripts/scaling.py for the CPU-mesh mechanism check.

Usage: python scripts/overlap_tpu.py [matrix]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ehyb_jax_cache"))
    from ehyb_spmv_gpu_tpu.config import EhybConfig
    from ehyb_spmv_gpu_tpu.core.coo import deterministic_x, oracle_spmv
    from ehyb_spmv_gpu_tpu.io import generate
    from ehyb_spmv_gpu_tpu.parallel.spmv import AXIS, ShardedEhybSpmv
    from ehyb_spmv_gpu_tpu.utils.timing import bench_apply
    from ehyb_spmv_gpu_tpu.utils.validate import rel_error

    name = sys.argv[1] if len(sys.argv) > 1 else "permuted_poisson_512"
    m = generate.load_corpus(name)
    x = deterministic_x(m.dimension)
    want = oracle_spmv(m, x)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), (AXIS,))
    times = {}
    for label, env in (("split", ""), ("all-boundary", "1")):
        if env:
            os.environ["EHYB_FORCE_BOUNDARY"] = env
        else:
            os.environ.pop("EHYB_FORCE_BOUNDARY", None)
        model = ShardedEhybSpmv(EhybConfig(window_rows=1024,
                                           artifact_cache=False),
                                mesh=mesh).setup(m)
        err = rel_error(model.matvec(x), want)
        assert err < 5e-6, (label, err)
        x_dev = model.prepare_x(x)
        # bench_apply's ~1s-region protocol: short regions through the axon
        # tunnel are noise (NEVER trust <100 ms regions).
        res = bench_apply(f"overlap-{label}",
                          lambda n: model.iterate(x_dev, n),
                          nnz=m.nnz, iters=20000, warmup=10)
        times[label] = res.seconds / res.iters
        print(f"overlap[{label}] @{name} D=1: "
              f"{times[label]*1e6:.2f} us/iter ({res.gflops:.1f} GFLOP/s), "
              f"err={err:.1e}{' NOISY' if res.noisy else ''}")
    os.environ.pop("EHYB_FORCE_BOUNDARY", None)
    gain = times["all-boundary"] / times["split"] - 1.0
    print(f"overlap gain from the interior/boundary split: {100*gain:+.1f}% "
          f"(positive = split faster)")


if __name__ == "__main__":
    main()
