"""RoutedSpmv — the product-routing model for the gather-wall regime.

Covers the matrices where the EHYB window machinery has nothing to cache
(fully unstructured sparsity, e.g. random_1m): the reference handles this
regime with phase-2 global-memory gathers (``kernel.cu:169-194``), the TPU
equivalent is the three-stage routed pipeline of ``core/route.py`` +
``ops/route_pallas.py``.

Scope (documented limits): f32 values, square matrices, dim <= ~2M (the
single-level router's select-chain bound), single chip.  The flagship EHYB
model remains the right tool everywhere the reorderer can recover structure;
``scripts/sweep.py`` benchmarks both on the unstructured corpus entries.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EhybConfig, LANES, round_up
from ..core.coo import MatrixCOO
from ..core.route import RoutedMatrix, build_routed
from ..utils.log import get_logger
from .base import SpmvModel

log = get_logger(__name__)

#: Bump on any route-builder semantic change.
ROUTE_FORMAT_VERSION = 4  # 4: searched (c, S_B) group geometry (group
# padding 28% -> ~2%); 3: B-slot-balancing stage-A colorer (b_steps -18%);
# 2: class-aware native stage-A colorer (spill 210k -> structural floor)


def _cache_path(m: MatrixCOO, cache_dir: Optional[str]) -> str:
    from ..core.cache import DEFAULT_CACHE_DIR, matrix_fingerprint

    d = cache_dir or DEFAULT_CACHE_DIR
    return os.path.join(
        d, f"{matrix_fingerprint(m)}-route{ROUTE_FORMAT_VERSION}.npz")


_ARRAY_FIELDS = ("a_col", "a_val", "a_win", "b_idx", "b_gmap", "b_boff",
                 "b_reset", "b_last", "sp_dst", "sp_col", "sp_val",
                 "dst_rows")
_SCALAR_FIELDS = ("dim", "n_win", "P", "R", "n_bands", "n_bg",
                  "bands_per_block", "s_b", "a_real_steps")


def _save_routed(rm: RoutedMatrix, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    np.savez(tmp, **{f: getattr(rm, f) for f in _ARRAY_FIELDS},
             **{f: np.int64(getattr(rm, f)) for f in _SCALAR_FIELDS},
             stats=np.array([repr(rm.stats)], dtype=object))
    os.replace(tmp + ".npz", path)
    log.info("cached routed artifacts → %s", path)


def _load_routed(path: str) -> Optional[RoutedMatrix]:
    if not os.path.exists(path):
        return None
    try:
        z = np.load(path, allow_pickle=True)
        import ast

        stats = ast.literal_eval(str(z["stats"][0]))
        rm = RoutedMatrix(
            **{f: int(z[f]) for f in _SCALAR_FIELDS},
            **{f: z[f] for f in _ARRAY_FIELDS}, stats=stats)
        log.info("loaded cached routed artifacts ← %s", path)
        return rm
    except Exception as exc:
        log.warning("routed cache load failed (%s); rebuilding", exc)
        return None


class RoutedSpmv(SpmvModel):
    """Three-stage routed SpMV (gather-multiply → transpose → route-reduce)."""

    name = "ehyb_routed"

    def _mode(self) -> str:
        force = os.environ.get("EHYB_FORCE_PALLAS", "").lower()
        if force in ("0", "false", "off", "no"):
            raise RuntimeError("RoutedSpmv has no non-Pallas apply")
        if force:
            return force
        return "1" if jax.default_backend() == "tpu" else "interpret"

    def setup(self, m: MatrixCOO) -> "RoutedSpmv":
        from ..ops.route_pallas import make_routed_apply

        self.m = m
        cfg = self.config
        self.setup_seconds = {}
        t0 = time.perf_counter()
        rm = None
        path = _cache_path(m, cfg.cache_dir)
        if cfg.artifact_cache:
            rm = _load_routed(path)
        if rm is None:
            rm = build_routed(m)
            if cfg.artifact_cache:
                _save_routed(rm, path)
            self.setup_seconds["convert"] = time.perf_counter() - t0
        else:
            self.setup_seconds["cache_load"] = time.perf_counter() - t0
        self.routed = rm
        self.ehyb = None  # bench introspection: no EHYB stats container
        self.dev = rm.to_jax(dtype="float32")
        self._apply = make_routed_apply(
            rm, interpret=(self._mode() == "interpret"))
        self.setup_seconds["total"] = time.perf_counter() - t0
        log.info("%s ready: setup %s", self.name,
                 {k: round(v, 2) for k, v in self.setup_seconds.items()})
        return self

    def device_operands(self):
        # the A-side streams alone exceed any VMEM prestage budget: args mode
        return self.dev

    def prepare_x(self, x: np.ndarray) -> jax.Array:
        xp = np.zeros(self.routed.padded_x_rows, dtype=np.float32)
        xp[: self.m.dimension] = np.asarray(x, dtype=np.float32)
        return jnp.asarray(xp)

    def recover_y(self, y: jax.Array) -> np.ndarray:
        # apply already returns input-space y (route_pallas scatters the
        # dst-ordered result back through dst_rows on device)
        return np.asarray(y, dtype=np.float64)[: self.m.n_rows]

    def bytes_model(self) -> int:
        """Modeled HBM bytes per iteration (roofline denominator).

        The routed pipeline's traffic is dominated by the product array
        moving through A-write, T-read, T-write, B-read — 4 passes of
        4 B/slot over the padded A stream — plus the 2 B index streams of
        both stages and x once.  This is the honest price of routing: ~5x
        the nnz bytes of a direct format, traded against the ~14
        cyc/element gather wall.
        """
        rm = self.routed
        a_slots = rm.a_col.shape[0] * LANES
        b_slots = rm.b_idx.shape[0] * LANES
        prod = rm.a_real_steps * LANES * 4
        return int(a_slots * (2 + 4)          # a_col + a_val
                   + a_slots * 4              # product write (padded)
                   + 2 * prod                 # transpose read + write
                   + prod                     # B block reads (once per group)
                   + b_slots * 2              # b_idx
                   + b_slots // 8 * 4         # y tile writes
                   + rm.padded_x_rows * 12    # x read + in-space y scatter
                   + rm.sp_val.size * 12)     # spill tail

    def apply(self, x_dev: jax.Array) -> jax.Array:
        return self._apply(self.dev, x_dev)

    def apply_operands(self, operands, x_dev):
        dev = operands if operands is not None else self.dev
        return self._apply(dev, x_dev)
