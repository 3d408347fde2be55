"""Degree-split hybrid — each engine takes exactly the regime it is best at.

A heavy-tailed gather-wall matrix (powerlaw_1m: power-law row degrees over
uniform random columns) defeats BOTH single engines:

* the EHYB body's (slice, window) fill is POOLED over a 128-row slice, so
  it collapses only when rows are sparse — fill ~ mean_degree * 128/1024.
  Dense rows pack beautifully (their slice pools thousands of entries per
  window); rows of degree < ~48 are the ones that leave 98% padding.
* the routed engine wants BOUNDED row degrees: its uniform (R, P) cell
  budget sizes against the mean, and degree dispersion overflows cells
  into the ~14 cyc/element spill tail (measured 27% spill on powerlaw_1m,
  vs the 0.08% Poisson floor on uniform random_1m; pre-splitting the few
  whale rows moved it only 6.79M -> 6.64M — the driver is dispersion, not
  the whales).

So split by ROW DEGREE at the point where the two collapse conditions
cross (deg >= 48 <=> pooled fill >= 6 = the delegation gate): the dense
rows form an EHYB sub-matrix (same dimension, empty rows elsewhere) whose
density-sorted body packs at high fill; the sparse remainder — now with
bounded degrees — routes at near-floor spill.  Output spaces are aligned
by building the routed sub-matrix in the EHYB reordering's PERMUTED
space: both engines then consume the same permuted x and emit permuted y,
one device add combines them, and the standard vector_recover returns to
the original order.  Rows are disjoint, so the sum is exact.

Reference parity: the reference handles its heavy tail with the long-row
kernel + density sort inside one format (kernel.cu:43-67,
reordering.c:18-39); at TPU scale the two regimes want two FORMATS, and
this model is the driver that composes them.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EhybConfig
from ..core.coo import MatrixCOO
from ..utils.log import get_logger
from .base import SpmvModel, _resize_like

log = get_logger(__name__)

#: Row-degree split point: pooled (slice, window) fill = deg * 128/1024,
#: so deg >= 48 puts a slice of such rows at fill >= 6 — exactly the
#: delegation gate's body-collapse bound.  EHYB_DEGREE_SPLIT overrides.
DEGREE_SPLIT = 48

#: Minimum nnz fraction in dense rows for the split to be worth two
#: engines (below this the routed engine alone is the right answer).
MIN_DENSE_FRAC = 0.15


def degree_split_stats(m: MatrixCOO, threshold: int = None):
    """(dense_row_mask, nnz_dense_fraction) for the gate's split decision."""
    import os

    t = threshold or int(os.environ.get("EHYB_DEGREE_SPLIT", DEGREE_SPLIT))
    counts = np.bincount(m.row, minlength=m.dimension)
    dense = counts >= t
    frac = float(counts[dense].sum()) / max(m.nnz, 1)
    return dense, frac


class DegreeSplitSpmv(SpmvModel):
    """EHYB body for rows of degree >= the split, routed engine for the
    bounded-degree remainder; one device add in the shared permuted space."""

    name = "ehyb_split"

    def setup(self, m: MatrixCOO,
              threshold: Optional[int] = None) -> "DegreeSplitSpmv":
        import dataclasses

        from .ehyb import EhybSpmv
        from .routed import RoutedSpmv

        self.m = m
        self.setup_seconds = {}
        self.ehyb = None  # bench takes the bytes_model() branch
        t0 = time.perf_counter()
        dense, frac = degree_split_stats(m, threshold)
        dmask = dense[m.row]
        log.info("degree split: %d dense rows carry %.1f%% of nnz",
                 int(dense.sum()), 100 * frac)
        md = MatrixCOO(m.n_rows, m.n_cols, m.row[dmask], m.col[dmask],
                       m.val[dmask])
        ms = MatrixCOO(m.n_rows, m.n_cols, m.row[~dmask], m.col[~dmask],
                       m.val[~dmask])
        # the sub-model must not re-enter the delegation gate
        cfg_e = dataclasses.replace(self.config, routed_delegate="never")
        self.e = EhybSpmv(cfg_e).setup(md)
        perm = self.e.reordering.old_to_new
        msp = MatrixCOO(m.n_rows, m.n_cols,
                        perm[ms.row.astype(np.int64)].astype(np.int32),
                        perm[ms.col.astype(np.int64)].astype(np.int32),
                        ms.val)
        # external_order: the hybrid's shared space IS the EHYB permutation;
        # the routed sub-engine builds identity-dst on it so both outputs
        # combine with one add and no per-iteration scatter.  (The routed
        # engine's own within-band density sort is traded away; the
        # remainder's degrees are bounded by the split, so the dispersion
        # the sort guards against is bounded too.)
        self.r = RoutedSpmv(self.config, external_order=True).setup(msp)
        for part in (self.e, self.r):
            for k, v in part.setup_seconds.items():
                self.setup_seconds[k] = self.setup_seconds.get(k, 0.0) + v
        self.setup_seconds["total"] = time.perf_counter() - t0
        log.info("%s ready: body %.1f%% of nnz (ELL waste %.0f%%), routed "
                 "%.1f%% (spill %d)", self.name, 100 * frac,
                 100 * self.e.ehyb.stats["waste_ell"]
                 / max(self.e.ehyb.stats["nnz_ell"]
                       + self.e.ehyb.stats["waste_ell"], 1),
                 100 * (1 - frac),
                 sum(b.stats.get("nnz_spill", 0) for b in self.r.blocks))
        return self

    # -- vector plumbing (shared permuted space) ----------------------------
    def prepare_x(self, x: np.ndarray):
        xp = self.e.reordering.vector_reorder(np.asarray(x))
        return (self.e.prepare_x(x), self.r.prepare_x(xp))

    def recover_y(self, y: jax.Array) -> np.ndarray:
        y_np = np.asarray(y, dtype=np.float64)[: self.m.n_rows]
        return self.e.reordering.vector_recover(y_np)

    def device_operands(self):
        return (self.e.device_operands(), self.r.device_operands())

    def apply(self, x_dev) -> jax.Array:
        return self.apply_operands(self.device_operands(), x_dev)

    def apply_operands(self, operands, x_dev) -> jax.Array:
        (e_ops, r_ops) = operands if operands is not None else (None, None)
        x_e, x_r = x_dev
        n = self.m.n_rows
        y_e = self.e.apply_operands(e_ops, x_e)
        y_r = self.r.apply_operands(r_ops, x_r)
        return y_e[:n] + y_r[:n]  # disjoint rows, shared permuted space

    # -- bench protocol ------------------------------------------------------
    def iterate(self, x_dev, n_iters: int, eps: float = 0.0) -> jax.Array:
        return self._iterate_tuple(self.device_operands(), x_dev,
                                   jnp.asarray(eps, dtype=jnp.float32),
                                   jnp.asarray(n_iters, dtype=jnp.int32))

    @partial(jax.jit, static_argnums=(0,))
    def _iterate_tuple(self, operands, x_dev, eps, n_iters):
        # base.iterate chains y back into a SINGLE x; here the chain feeds
        # both engines' x forms (same traced-eps anti-hoisting trick)
        y0 = self.apply_operands(operands, x_dev)

        def body(_, y):
            x_e, x_r = x_dev
            return self.apply_operands(
                operands, (x_e + eps * _resize_like(y, x_e),
                           x_r + eps * _resize_like(y, x_r)))

        return jax.lax.fori_loop(0, n_iters - 1, body, y0)

    def bytes_model(self) -> int:
        from ..utils.timing import spmv_bytes_model

        vb = np.dtype(self.e.config.dtype).itemsize
        ib = np.dtype(self.e.config.index_dtype).itemsize
        return spmv_bytes_model(self.e.ehyb.stats, value_bytes=vb,
                                ell_index_bytes=ib,
                                dim=self.m.dimension) + self.r.bytes_model()
