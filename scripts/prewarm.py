#!/usr/bin/env python
"""Verify (and if needed rebuild) every artifact the TPU sweep will touch,
on the CPU backend — conversion/reorder/route schedules and oracles are
host-side and platform-independent (core/cache.py fingerprints hash only
matrix + config), so prewarming here turns TPU time into pure measurement.

EHYB_FORCE_PALLAS=interpret is set so the flagship setup takes the SAME
config-adjustment path as on TPU (body_layout=sell_mw, int16 cols, sliding
windows) — without it the CPU setup fingerprints a plain-sell config the
hardware run never looks up, and the delegation gate sees a different
ordering (observed: permuted_poisson_4096 "prewarmed" into artifacts the
TPU run could not use).

Usage: python scripts/prewarm.py [matrix ...]    (default: the sweep list)
Prints one line per (matrix, model): setup seconds + cache HIT/MISS.
A MISS on a big matrix means a fingerprint drifted — investigate before
burning hardware time.
"""
from __future__ import annotations

import io
import logging
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("EHYB_LOG", "INFO")
os.environ.setdefault("EHYB_FORCE_PALLAS", "interpret")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon plugin's get_backend hook initializes the TPU tunnel even under
# JAX_PLATFORMS=cpu (and hangs forever when the tunnel is wedged); pin the
# config explicitly, exactly like tests/conftest.py.
jax.config.update("jax_platforms", "cpu")

#: Exact cache-load log lines (a routed HIT must not mask an EHYB miss —
#: the flagship can delegate and load only routed artifacts).
_HIT_LINES = ("loaded cached EHYB artifacts", "loaded cached routed artifacts")


def main():
    import ehyb_spmv_gpu_tpu as ehyb
    from bench import cached_oracle
    from ehyb_spmv_gpu_tpu.core.coo import deterministic_x
    from ehyb_spmv_gpu_tpu.io import generate
    from scripts.sweep import DEFAULT, ROUTED

    matrices = sys.argv[1:] or DEFAULT
    fails = 0
    for mat in matrices:
        t0 = time.time()
        m = generate.load_corpus(mat)
        t_load = time.time() - t0
        t0 = time.time()
        cached_oracle(m, deterministic_x(m.dimension))
        t_oracle = time.time() - t0
        print(f"{mat}: corpus {t_load:.1f}s oracle {t_oracle:.1f}s",
              flush=True)
        models = ["ehyb"] + (["ehyb_routed"] if mat in ROUTED else [])
        for name in models:
            buf = io.StringIO()
            h = logging.StreamHandler(buf)
            logging.getLogger("ehyb").addHandler(h)
            t0 = time.time()
            try:
                model = ehyb.MODELS[name](
                    ehyb.EhybConfig(artifact_cache=True)).setup(m)
                out = buf.getvalue()
                hit = any(s in out for s in _HIT_LINES)
                status = "HIT" if hit else "MISS(rebuilt+cached)"
                status += f" [{type(model).__name__}]"
            except Exception as exc:  # report, keep going
                status = f"ERROR {exc!r:.200}"
                fails += 1
            finally:
                logging.getLogger("ehyb").removeHandler(h)
            print(f"{mat} {name}: {time.time() - t0:.1f}s {status}",
                  flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
