#!/usr/bin/env python
"""Compiled-Mosaic validation: every Pallas body variant, oracle-checked on
REAL TPU (VERDICT r1 #6 — interpret-mode CI cannot catch Mosaic lowering
bugs; the reference exercises both of its launcher variants in its only
test, the run itself, kernel.cu:324-442).

Variants (each in a subprocess — env knobs are read at import/setup time):
  resident_v2   — per-slice tile kernel (EHYB_STREAM_BODY=0)
  stream_mw     — streamed v3, chunk-sync layout (relax_body='never')
  stream_rx     — streamed v3, relaxed dual-window layout
  stream_kahan  — streamed v3 + Neumaier compensation (both layouts)
  windowed      — non-VMEM-resident x (EHYB_X_RESIDENT_BYTES forced tiny so
                  the per-tile window-BlockSpec kernel compiles + runs; same
                  code path a >64 MB-x matrix takes)
  dia           — all-DIA matrix (Pallas DIA kernel in args mode is covered
                  by the audikw-class bench; here the const-mode path)

Prints one JSON line per variant and a final summary line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import json, os, sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax
import ehyb_spmv_gpu_tpu as ehyb
from ehyb_spmv_gpu_tpu.config import EhybConfig
from ehyb_spmv_gpu_tpu.core.coo import deterministic_x, oracle_spmv
from ehyb_spmv_gpu_tpu.io import generate
from ehyb_spmv_gpu_tpu.utils.validate import rel_error

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/ehyb_jax_cache"))
name = {name!r}
m = eval({matrix!r})
cfg = EhybConfig(**{cfg_kw!r})
model = ehyb.EhybSpmv(cfg).setup(m)
assert jax.default_backend() == "tpu", jax.default_backend()
assert model._use_pallas
x = deterministic_x(m.dimension)
err = rel_error(model.matvec(x), oracle_spmv(m, x))
expect = {expect!r}
stats = model.ehyb.stats
ok = err < 5e-6
for k, v in expect.items():
    sv = stats.get(k)
    ok = ok and ((sv is not None and sv > 0) if v == ">0" else sv == v)
print("VARIANT " + json.dumps({{
    "variant": name, "rel_error": float(err), "ok": bool(ok),
    "layout": stats.get("layout"), "ell_steps": stats.get("ell_steps"),
    "dia": stats.get("n_diagonals")}}), flush=True)
sys.exit(0 if ok else 1)
"""

_BODY_NONZERO = {"ell_steps": ">0"}

VARIANTS = [
    # (name, env, matrix expr, cfg kwargs, expectations)
    # scrambled stencil: DIA takes only the main diagonal, so the SELL body
    # is real (fem3d in natural order goes 100% DIA and would exercise
    # nothing)
    ("resident_v2", {"EHYB_STREAM_BODY": "0"},
     "generate.permuted(generate.poisson2d(128), seed=2)",
     {"relax_body": "never"}, _BODY_NONZERO),
    ("stream_mw", {},
     "generate.permuted(generate.poisson2d(128), seed=2)",
     {"relax_body": "never"}, _BODY_NONZERO),
    ("stream_rx", {},
     "generate.random_general(16384, 24, seed=3)", {},
     {"layout": "sell_rx", **_BODY_NONZERO}),
    ("stream_mw_kahan", {},
     "generate.permuted(generate.poisson2d(128), seed=2)",
     {"relax_body": "never", "compensated_sum": True}, _BODY_NONZERO),
    ("stream_rx_kahan", {},
     "generate.random_general(8192, 24, seed=3)",
     {"compensated_sum": True}, {"layout": "sell_rx"}),
    ("windowed", {"EHYB_X_RESIDENT_BYTES": str(64 * 1024),
                  "EHYB_STREAM_BODY": "0"},
     "generate.permuted(generate.poisson2d(192), seed=2)",
     {"relax_body": "never"}, {}),
    ("dia_const", {},
     "generate.poisson2d(256)", {}, {"ell_steps": 0}),
]


def main() -> int:
    results = []
    for name, env, matrix, cfg_kw, expect in VARIANTS:
        code = CHILD.format(repo=REPO, name=name, matrix=matrix,
                            cfg_kw=cfg_kw, expect=expect)
        full_env = dict(os.environ)
        full_env.pop("EHYB_FORCE_PALLAS", None)
        full_env.update(env)
        r = subprocess.run([sys.executable, "-c", code], env=full_env,
                           capture_output=True, text=True, timeout=1500)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("VARIANT ")), None)
        if r.returncode == 0 and line:
            d = json.loads(line[len("VARIANT "):])
        else:
            d = {"variant": name, "ok": False,
                 "error": (r.stdout + r.stderr)[-800:]}
        results.append(d)
        print(json.dumps(d), flush=True)
    ok = all(d.get("ok") for d in results)
    print(json.dumps({"mosaic_validate": "PASS" if ok else "FAIL",
                      "variants": len(results)}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
