"""Measure relaxed-packer quality against its structural lower bound.

VERDICT r2 weak #2: random_16k packs to 16.2k steps vs an 11.1k structural
floor (the per-pair max-lane occupancy, padded to whole 8-step sub-tiles) —
~1.45x headroom inside the format.  This probe reports, per matrix:

  * ell_steps as packed,
  * the structural bound: sum over pairs of max-over-lanes entry count,
    rounded up to 8 (what a perfect conflict-free schedule would reach with
    the SAME window pairing),
  * the gap ratio.

Run on CPU: ``python scripts/probe_rx_packing.py [matrix ...]``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from ehyb_spmv_gpu_tpu.config import EhybConfig  # noqa: E402
from ehyb_spmv_gpu_tpu.core.convert import coo_to_ehyb  # noqa: E402
from ehyb_spmv_gpu_tpu.core.ordering import pick_ordering  # noqa: E402
from ehyb_spmv_gpu_tpu.core.planner import make_plan  # noqa: E402
from ehyb_spmv_gpu_tpu.io import generate  # noqa: E402


def structural_bound(e) -> int:
    """Per-pair lane-occupancy floor under the as-built window pairing: a
    pair's steps can never be fewer than its busiest lane's entry count
    (one entry per lane per step), padded to whole 8-step sub-tiles.
    Pairs are identified by runs of identical (step_win, step_win_b) within
    a slice."""
    val = np.asarray(e.ell_val)
    occupied = val != 0
    # pair id per step: runs of constant (win_a, win_b) within each slice
    wa = e.step_win.astype(np.int64)
    wb = e.step_win_b.astype(np.int64) if e.step_win_b.size else wa
    sl = np.repeat(np.arange(e.n_slices),
                   np.diff(e.slice_offset.astype(np.int64)))
    key = np.stack([sl, wa, wb])
    change = np.r_[True, (np.diff(key, axis=1) != 0).any(axis=0)]
    pair_id = np.cumsum(change) - 1
    n_pairs = int(pair_id[-1]) + 1
    # per (pair, lane) occupancy
    occ = np.zeros((n_pairs, val.shape[1]), dtype=np.int64)
    np.add.at(occ, (pair_id[:, None].repeat(val.shape[1], 1),
                    np.broadcast_to(np.arange(val.shape[1]), val.shape)),
              occupied.astype(np.int64))
    per_pair = occ.max(axis=1)
    return int(np.maximum(-(-per_pair // 8) * 8, 8).sum())


def main():
    names = sys.argv[1:] or ["random_16k", "powerlaw_16k",
                             "permuted_poisson_512"]
    for name in names:
        m = generate.load_corpus(name)
        cfg = EhybConfig(window_rows=1024, body_layout="sell_rx",
                         width_align=32)
        plan = make_plan(m.dimension, cfg)
        t0 = time.time()
        r = pick_ordering(m, plan, cfg, cfg.ordering)
        m_r = r.apply_to_matrix(m)
        e = coo_to_ehyb(m_r, r, plan, cfg)
        dt = time.time() - t0
        steps = e.stats["ell_steps"]
        bound = structural_bound(e)
        print(f"{name}: ell_steps={steps} bound={bound} "
              f"gap={steps / max(bound, 1):.3f}x nnz_er={e.stats['nnz_er']} "
              f"({dt:.1f}s)")


if __name__ == "__main__":
    main()
