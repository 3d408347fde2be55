"""Sharded degree-split hybrid — the heavy-tail engine over a device mesh.

Composes the two already-sharded engines exactly the way the single-chip
``models/hybrid.py`` does: rows of degree >= the split form a dense
sub-matrix driven by the sharded EHYB body (``parallel/spmv.py`` — row
spans over the mesh, ppermute halos, compressed ER exchange); the
bounded-degree remainder — rebuilt in the EHYB reordering's PERMUTED space
so both engines share one output space — runs the sharded routed engine
(``parallel/routed.py`` — one routed instance per shard, x replicated).
Rows are disjoint, so one device add combines the two permuted outputs and
the standard ``vector_recover`` returns to the original order.

The two sub-engines shard rows independently (the EHYB side aligns spans
to its window grid, the routed side to LANES), so the combining add may
reshard one operand; that cost is one O(dim) vector move per step against
two O(nnz) engine phases — negligible at the scale the hybrid exists for.

Reference parity: the reference's heavy-tail story is the long-row kernel
plus density sort inside one single-GPU format (``kernel.cu:43-67``,
``reordering.c:18-39``); it has no multi-GPU path at all (SURVEY §5).
This realizes the two-format split at mesh scale.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.coo import MatrixCOO
from ..config import EhybConfig
from ..models.base import SpmvModel, _resize_like
from ..models.hybrid import degree_split_stats
from ..utils.log import get_logger
from .routed import ShardedRoutedSpmv
from .spmv import AXIS, ShardedEhybSpmv

log = get_logger(__name__)


class ShardedDegreeSplitSpmv(SpmvModel):
    """Sharded EHYB body on dense rows + sharded routed tail on the rest,
    combined by one device add in the shared permuted space."""

    name = "ehyb_split_sharded"

    def __init__(self, config: Optional[EhybConfig] = None,
                 mesh: Optional[jax.sharding.Mesh] = None):
        super().__init__(config)
        if mesh is None:
            devs = np.array(jax.devices())
            mesh = jax.sharding.Mesh(devs, (AXIS,))
        self.mesh = mesh

    def setup(self, m: MatrixCOO,
              threshold: Optional[int] = None) -> "ShardedDegreeSplitSpmv":
        self.m = m
        self.setup_seconds = {}
        self.ehyb = None  # bench takes the bytes_model() branch
        t0 = time.perf_counter()
        dense, frac = degree_split_stats(m, threshold)
        dmask = dense[m.row]
        log.info("sharded degree split: %d dense rows carry %.1f%% of nnz",
                 int(dense.sum()), 100 * frac)
        md = MatrixCOO(m.n_rows, m.n_cols, m.row[dmask], m.col[dmask],
                       m.val[dmask])
        ms = MatrixCOO(m.n_rows, m.n_cols, m.row[~dmask], m.col[~dmask],
                       m.val[~dmask])
        # the sub-model must not re-enter the delegation gate
        cfg_e = dataclasses.replace(self.config, routed_delegate="never")
        self.e = ShardedEhybSpmv(cfg_e, mesh=self.mesh).setup(md)
        perm = self.e.reordering.old_to_new
        msp = MatrixCOO(m.n_rows, m.n_cols,
                        perm[ms.row.astype(np.int64)].astype(np.int32),
                        perm[ms.col.astype(np.int64)].astype(np.int32),
                        ms.val)
        self.r = ShardedRoutedSpmv(self.config, mesh=self.mesh).setup(msp)
        for part in (self.e, self.r):
            for k, v in getattr(part, "setup_seconds", {}).items():
                self.setup_seconds[k] = self.setup_seconds.get(k, 0.0) + v
        self.setup_seconds["total"] = time.perf_counter() - t0
        log.info("%s ready: body %.1f%% of nnz, routed %.1f%% (spill %d)",
                 self.name, 100 * frac, 100 * (1 - frac),
                 self.r.template.stats.get("nnz_spill", 0))
        return self

    # -- vector plumbing (shared permuted space) ----------------------------
    def prepare_x(self, x: np.ndarray):
        xp = self.e.reordering.vector_reorder(np.asarray(x))
        return (self.e.prepare_x(x), self.r.prepare_x(xp))

    def recover_y(self, y: jax.Array) -> np.ndarray:
        y_np = np.asarray(y, dtype=np.float64)[: self.m.n_rows]
        return self.e.reordering.vector_recover(y_np)

    def apply(self, x_dev) -> jax.Array:
        x_e, x_r = x_dev
        y_e = self.e.apply(x_e)            # permuted space, D*R_e rows
        y_r = self.r.apply(x_r)            # permuted space, D*r_sh rows
        # disjoint rows; rows past m.n_rows are padding zeros on both sides
        return y_e + _resize_like(y_r, y_e)

    # -- bench protocol ------------------------------------------------------
    def iterate(self, x_dev, n_iters: int, eps: float = 0.0) -> jax.Array:
        return self._iterate_tuple(x_dev,
                                   jnp.asarray(eps, dtype=jnp.float32),
                                   jnp.asarray(n_iters, dtype=jnp.int32))

    @partial(jax.jit, static_argnums=(0,))
    def _iterate_tuple(self, x_dev, eps, n_iters):
        # base.iterate chains y back into a SINGLE x; here the chain feeds
        # both engines' x forms (same traced-eps anti-hoisting trick)
        y0 = self.apply(x_dev)

        def body(_, y):
            x_e, x_r = x_dev
            return self.apply((x_e + eps * _resize_like(y, x_e),
                               x_r + eps * _resize_like(y, x_r)))

        return jax.lax.fori_loop(0, n_iters - 1, body, y0)

    def bytes_model(self) -> int:
        from ..utils.timing import spmv_bytes_model

        # aggregate the EHYB side's per-shard conversion stats
        agg: dict = {}
        for s in self.e.sharded.stats.get("per_dev", []):
            for k, v in s.items():
                if isinstance(v, (int, np.integer)):
                    agg[k] = agg.get(k, 0) + int(v)
        vb = np.dtype(self.e.config.dtype).itemsize
        ib = np.dtype(self.e.config.index_dtype).itemsize
        return spmv_bytes_model(agg, value_bytes=vb, ell_index_bytes=ib,
                                dim=self.m.dimension) + self.r.bytes_model()
