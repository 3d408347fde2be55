"""Benchmark timing + throughput math.

Reproduces the reference's measurement protocol (``spmv.cu:94-122``): warm-up
iterations, then a timed loop of SpMVs, reporting
``GFLOP/s = 1e-9 · (2·nnz) · iter / seconds`` — the exact formula at
``spmv.cu:121-122`` — plus the TPU additions BASELINE.md asks for: a
bytes-moved model and the roofline fraction per run.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import numpy as np

from .log import get_logger

log = get_logger(__name__)

#: Rough per-chip HBM bandwidth (bytes/s) by TPU generation, for roofline audits.
HBM_BW = {
    "v4": 1.2e12,
    "v5 lite": 0.819e12,   # v5e
    "v5e": 0.819e12,
    "v5p": 2.765e12,
    "v6 lite": 1.64e12,    # v6e / Trillium
    "v6e": 1.64e12,
    "cpu": 0.05e12,
}


def detect_hbm_bw() -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover
        kind = "cpu"
    for k, bw in HBM_BW.items():
        if k in kind:
            return bw
    if "tpu" in kind:  # unknown TPU generation: a TPU-ish default, not 'cpu'
        log.warning("unknown TPU device_kind %r — assuming 0.8 TB/s HBM", kind)
        return 0.8e12
    return HBM_BW["cpu"]


@dataclasses.dataclass
class BenchResult:
    name: str
    nnz: int
    iters: int
    seconds: float
    gflops: float          # reference formula (spmv.cu:121)
    nnz_per_sec: float
    bytes_model: int       # modeled bytes moved per iteration
    roofline_gflops: float
    roofline_frac: float
    #: True when any measurement came from measure_loop's last-resort branch
    #: (positive diff below the noise floor after full escalation): the number
    #: may be noise-dominated and sweeps must not silently include it.
    noisy: bool = False

    def __str__(self) -> str:
        return (f"[{self.name}] {self.iters} iters in {self.seconds*1e3:.2f} ms → "
                f"{self.gflops:.2f} GFLOP/s ({self.nnz_per_sec/1e9:.2f} Gnnz/s), "
                f"roofline {self.roofline_gflops:.0f} GFLOP/s "
                f"→ {100*self.roofline_frac:.1f}%"
                + (" [NOISY — below noise floor, low confidence]"
                   if self.noisy else ""))


def spmv_bytes_model(stats: dict, value_bytes: int = 4,
                     ell_index_bytes: int = 4, dim: int = 0) -> int:
    """Modeled HBM bytes per SpMV iteration: stream values + indices (including
    padding waste), plus one x read and one y write (amortized window reloads
    ignored — windows are read W bytes per partition, ≪ nnz terms)."""
    ell = (stats.get("nnz_ell", 0) + stats.get("waste_ell", 0))
    er = (stats.get("nnz_er", 0) + stats.get("waste_er", 0))
    lng = stats.get("nnz_long", 0)
    dia = (stats.get("nnz_dia", 0) + stats.get("waste_dia", 0))
    n_bytes = ell * (value_bytes + ell_index_bytes)
    n_bytes += er * (value_bytes + 4)
    n_bytes += lng * (value_bytes + 4)
    n_bytes += dia * value_bytes          # diagonals carry no indices
    n_bytes += 2 * dim * value_bytes
    return int(n_bytes)


#: Set False at each measure_loop entry, True when it accepted a positive
#: diff below the 0.02 s noise floor after the full 256x escalation (the
#: documented CPU-under-load shape).  bench_apply folds this into
#: BenchResult.noisy so sweeps can exclude such numbers (VERDICT r2 weak #6).
last_measure_noisy: bool = False


def measure_loop(apply_iters: Callable[[int], "jax.Array"], iters: int,
                 warmup: int = 5) -> float:
    """Seconds per device-side iteration of ``apply_iters(n)``.

    The shared half-length-subtraction protocol: time n/2 and n/2+n runs and
    difference them, removing the fixed remote-dispatch cost (which is tens of
    ms through the axon tunnel and would otherwise swamp µs-scale kernels).

    Hardening (observed on the remote tunnel): the first timed call after a
    compile can absorb hundreds of ms of post-compile residue, making
    t_full − t_half go negative.  A settle run after warmup plus min-of-two
    per measurement point (min is robust to additive noise spikes) fixes it.
    """
    global last_measure_noisy
    last_measure_noisy = False
    half = max(iters // 2, 1)

    def run_and_read(n: int):
        out = jax.block_until_ready(apply_iters(n))
        # Device-to-host read of the result: on the remote tunnel,
        # block_until_ready alone does not reliably force execution of
        # repeated dispatches (observed elision in long-lived sessions);
        # reading a value does.  The D2H cost is a constant inside both
        # measurement points and cancels in the subtraction.
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf).ravel()[:1]

    run_and_read(warmup)
    run_and_read(half)  # settle: absorb post-compile residue

    def timed(n: int) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run_and_read(n)
            best = min(best, time.perf_counter() - t0)
        return best

    dt = timed(half + iters) - timed(half)
    if dt > 0:
        return dt / iters
    # Never report an absurd rate silently.  A non-positive difference means
    # the timed region is smaller than the tunnel noise (sub-ms kernels, e.g.
    # an all-DIA poisson iteration is ~2 us): escalate the region length
    # until it clears the noise floor before declaring failure.
    for mult in (4, 16, 64, 256):
        log.warning("measure_loop: non-positive difference (%.4fs) — "
                    "retrying at %dx iterations", dt, mult)
        dt = timed(half + mult * iters) - timed(half)
        if dt > 0.02:       # region comfortably above tunnel jitter
            return dt / (mult * iters)
    if dt > 0:  # positive but small at the longest region: accept (CPU runs
        # under load produce exactly this shape) — but LOUDLY, and tagged:
        # this is the class of number the hardened protocol exists to kill.
        log.warning(
            "measure_loop: accepting a LOW-CONFIDENCE measurement — diff "
            "%.4fs is below the 0.02s noise floor even at 256x iterations; "
            "the reported rate may be noise-dominated (result tagged noisy)",
            dt)
        last_measure_noisy = True
        return dt / (256 * iters)
    raise RuntimeError(
        f"measure_loop: timed region not measurable (diff {dt:.4f}s up to "
        f"{256*iters} iterations) — dispatch elision or extreme tunnel "
        "noise; see verify skill notes")


def bench_apply(name: str, apply_iters: Callable[[int], jax.Array], nnz: int,
                iters: int = 2000, warmup: int = 10,
                bytes_model: Optional[int] = None) -> BenchResult:
    """Time ``apply_iters(n)`` (a function running n chained SpMVs in a
    device-side loop and returning a device array).

    Protocol mirrors ``spmv.cu:100-119`` (warm-up, then a timed region bounded
    by ``block_until_ready``) with one amendment: the fixed dispatch cost is
    measured with a half-length run and subtracted, because on remote-attached
    TPUs the per-dispatch latency is material.  Host dispatch loops are NOT
    used at all — repeated identical dispatches can be elided by the runtime
    (see utils/timing.py history), so each measurement is one device-side
    ``fori_loop``.
    """
    jax.block_until_ready(apply_iters(warmup))
    noisy = [False]

    def measure(n_iters: int) -> float:
        dt = measure_loop(apply_iters, n_iters, warmup=0) * n_iters
        noisy[0] |= last_measure_noisy
        return dt

    # Adaptive length: per-iteration times in the microseconds are invisible
    # inside the remote-dispatch noise (observed up to ±100 ms through the
    # tunnel in degraded sessions), so grow the iteration count until the
    # measured region is ≳1 s, then take the best of three runs.  1 s costs
    # nothing on slow matrices (already past it) and a few seconds on fast
    # ones — far cheaper than reporting a 5x-noise number.
    _TARGET = 1.0
    dt = measure(iters)
    for _ in range(5):
        if dt >= _TARGET or iters >= 4_000_000:
            break
        iters = min(iters * max(2, int(1.5 * _TARGET / max(dt, 1e-6) + 1)),
                    4_000_000)
        dt = measure(iters)
    dt = min(dt, measure(iters), measure(iters))

    gflops = 1e-9 * (2.0 * nnz) * iters / dt
    nnz_rate = nnz * iters / dt
    bw = detect_hbm_bw()
    bm = bytes_model if bytes_model is not None else nnz * 8
    roofline = 1e-9 * (2.0 * nnz) * bw / bm if bm else float("inf")
    res = BenchResult(
        name=name, nnz=nnz, iters=iters, seconds=dt, gflops=gflops,
        nnz_per_sec=nnz_rate, bytes_model=bm, roofline_gflops=roofline,
        roofline_frac=gflops / roofline if roofline > 0 else 0.0,
        noisy=noisy[0])
    log.info("%s", res)
    return res
