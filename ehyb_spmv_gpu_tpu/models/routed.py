"""RoutedSpmv — the product-routing model for the gather-wall regime.

Covers the matrices where the EHYB window machinery has nothing to cache
(fully unstructured sparsity, e.g. random_1m): the reference handles this
regime with phase-2 global-memory gathers (``kernel.cu:169-194``), the TPU
equivalent is the three-stage routed pipeline of ``core/route.py`` +
``ops/route_pallas.py``.

Beyond the single-level router's select-chain bound (~2M columns at
16 nnz/row) the model switches to COLUMN-BLOCK mode: the matrix splits into
1M-column vertical blocks, each block runs its own routed instance (rows
drive the band side and are unconstrained; per-block R is scaled up so the
cells stay ~half full), and the blocks' input-space outputs sum — no size
cliff, matching the reference kernel's any-size property.

Scope (documented limits): f32 values, square matrices, single chip.  The
flagship EHYB model remains the right tool everywhere the reorderer can
recover structure, and delegates HERE automatically when it cannot
(``EhybSpmv._maybe_delegate_routed``).
"""
from __future__ import annotations

import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LANES, cdiv, round_up
from ..core.coo import MatrixCOO
from ..core.route import WIN, RoutedMatrix, build_routed
from ..utils.log import get_logger
from .base import SpmvModel

log = get_logger(__name__)

#: Bump on any route-builder semantic change.
ROUTE_FORMAT_VERSION = 11  # 11: band-group-major A stream for the FUSED
# A+T kernel (products transpose in-register on the way out — the
# intermediate product stream is never materialized);
# 10: stage T as a pallas tile transpose +
# bands_cap group constraint (the 4D XLA transpose compiled to relayout-copy
# + band pad — two extra full HBM passes over the product stream);
# 9: copy-burst stall term in the group-geometry
# search (hardware A/B: padding-optimal c=52 lost ~4% to c=6 on random_1m —
# the first tile of each group stalls on the 3.3 MB block copy);
# 8: VMEM-gated stage-B block cap (bands/block
# searched up to 64 instead of 6 — less grid-quantum padding);
# 7: identity-dst pre-permuted build (the output
# epilogue was an XLA element scatter costing 85% of random_1m's runtime);
# 6: octet stage-B layout for thin widths; 5: rectangular blocks +
# out_rows field; 4: searched (c, S_B) group geometry; 3:
# B-slot-balancing stage-A colorer; 2: class-aware native stage-A colorer

#: Column width of one block in block mode (chain stays <= 16 regardless of
#: dimension; per-block R scales to keep the A cells ~half full).
BLOCK_COLS = 1 << 20


def _cache_path(m: MatrixCOO, cache_dir: Optional[str],
                block: str = "") -> str:
    from ..core.cache import DEFAULT_CACHE_DIR, matrix_fingerprint

    d = cache_dir or DEFAULT_CACHE_DIR
    # experiment env knobs change the built schedule — key them so an A/B
    # run never loads the other arm's artifact
    env = ""
    for var, tag in (("EHYB_ROUTE_SB_MAX", "sb"), ("EHYB_ROUTE_OCTET", "oc"),
                     ("EHYB_ROUTE_BANDS_MAX", "bm")):
        v = os.environ.get(var, "")
        if v:
            env += f"-{tag}{v}"
    return os.path.join(
        d,
        f"{matrix_fingerprint(m)}-route{ROUTE_FORMAT_VERSION}{env}{block}"
        ".npz")


_ARRAY_FIELDS = ("a_col", "a_val", "a_win", "b_idx", "b_gmap", "b_boff",
                 "b_reset", "b_last", "sp_dst", "sp_col", "sp_val",
                 "dst_rows")
_SCALAR_FIELDS = ("dim", "n_win", "P", "R", "n_bands", "n_bg",
                  "bands_per_block", "s_b", "out_rows", "octet",
                  "a_real_steps")


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


def _block_ranges(dim: int, block_cols: int = None) -> List[tuple]:
    """Column ranges [(lo, hi), ...] of the vertical blocks.  One
    definition for both the single-device and sharded block modes."""
    bc = block_cols or BLOCK_COLS
    n_blocks = cdiv(dim, bc)
    return [(b * bc, min((b + 1) * bc, dim)) for b in range(n_blocks)]


class RoutedSpmv(SpmvModel):
    """Three-stage routed SpMV (gather-multiply → transpose → route-reduce),
    column-blocked past the single-level chain bound.

    ``external_order=True`` skips the internal dst row permutation and
    builds identity-dst on the row order AS GIVEN — for composers (the
    degree-split hybrid) whose engines share one vector space and do their
    own ordering.  The within-band density sort is a schedule-quality
    heuristic, not a correctness requirement; external callers trade it for
    a scatter-free shared space.
    """

    name = "ehyb_routed"

    def __init__(self, config=None, external_order: bool = False):
        super().__init__(config)
        self._external_order = external_order

    def _mode(self) -> str:
        force = os.environ.get("EHYB_FORCE_PALLAS", "").lower()
        if force in ("0", "false", "off", "no"):
            raise RuntimeError("RoutedSpmv has no non-Pallas apply")
        if force:
            return force
        return "1" if jax.default_backend() == "tpu" else "interpret"

    def setup(self, m: MatrixCOO) -> "RoutedSpmv":
        from ..core.route import _choose_params

        self.m = m
        self.setup_seconds = {}
        self.ehyb = None  # bench introspection: no EHYB stats container
        dim = m.dimension
        try:
            _choose_params(dim, dim, m.nnz, None, None)
            single = True
        except ValueError:
            single = False
        if single:
            self._setup_blocks(m, [(0, dim)])
        else:
            ranges = _block_ranges(dim)
            log.info("routed: chain bound exceeded at dim=%d — COLUMN-BLOCK "
                     "mode, %d blocks of <=%d cols", dim, len(ranges),
                     BLOCK_COLS)
            self._setup_blocks(m, ranges)
        log.info("%s ready: setup %s", self.name,
                 {k: round(v, 2) for k, v in self.setup_seconds.items()})
        return self

    def _setup_blocks(self, m: MatrixCOO, ranges: List[tuple]) -> None:
        from ..core.route import _choose_params, routed_row_perm
        from ..ops.route_pallas import make_routed_apply

        cfg = self.config
        t0 = time.perf_counter()
        dim = m.dimension
        n_blocks = len(ranges)
        # artifact cache keys stay on the matrix AS GIVEN (the permuted
        # build is a deterministic function of it)
        self._cache_m = m

        # ---- pre-permute by the dst row order (identity-dst build) --------
        # The engine's dst space becomes the model's input space: x is
        # permuted ONCE on the host (prepare_x) and the per-iteration output
        # epilogue is a slice instead of an XLA element scatter (measured
        # 12.3 of 14.6 ms/iter on random_1m; 4x that on random_4m, where the
        # scatter ran per column block).  Rows and columns permute together
        # (square SpMV: y' = P·A·Pᵀ·x'), so CG/power-iteration chain in the
        # permuted space exactly like the EHYB models chain in theirs.
        if self._external_order:
            self._perm = np.arange(dim, dtype=np.int64)
            self._r_shared = None
            self._setup_blocks_inner(m, ranges, t0)
            return
        perm_path = (_cache_path(m, cfg.cache_dir, "-perm")
                     if cfg.artifact_cache else None)
        self._perm = None
        if perm_path is not None and os.path.exists(perm_path):
            try:
                z = np.load(perm_path)
                self._perm, r_shared = z["perm"], int(z["R"])
            except Exception as exc:  # pragma: no cover - corrupt cache
                log.warning("perm cache load failed (%s); rebuilding", exc)
        if self._perm is None:
            # shared row-band size: every block's bands must match the one
            # global perm, so pin the most conservative per-block choice
            r_shared = None
            col0 = np.asarray(m.col)
            for lo, hi in ranges:
                sel_n = (int(((col0 >= lo) & (col0 < hi)).sum())
                         if n_blocks > 1 else m.nnz)
                _, r_i, _ = _choose_params(m.n_rows, hi - lo, sel_n,
                                           None, None)
                r_shared = r_i if r_shared is None else min(r_shared, r_i)
            self._perm = routed_row_perm(m.row, dim, r_shared)[:dim]
            if perm_path is not None:
                os.makedirs(os.path.dirname(perm_path), exist_ok=True)
                tmp = perm_path + f".tmp{os.getpid()}"
                np.savez(tmp, perm=self._perm, R=np.int64(r_shared))
                os.replace(tmp + ".npz", perm_path)
        self._r_shared = r_shared
        inv = np.empty(dim, dtype=np.int64)
        inv[self._perm] = np.arange(dim)
        m = MatrixCOO(m.n_rows, m.n_cols,
                      inv[np.asarray(m.row, dtype=np.int64)],
                      inv[np.asarray(m.col, dtype=np.int64)],
                      np.asarray(m.val))
        self._setup_blocks_inner(m, ranges, t0)

    def _setup_blocks_inner(self, m: MatrixCOO, ranges: List[tuple],
                            t0: float) -> None:
        from ..core.route import _choose_params
        from ..ops.route_pallas import make_routed_apply

        cfg = self.config
        dim = m.dimension
        n_blocks = len(ranges)
        col = np.asarray(m.col)
        if n_blocks > 1:
            # The shared in/out vector length must cover every block's
            # padded window span (the chooser may round a block's n_win up
            # for the n_win*P % 1024 alignment) — precompute each block's
            # geometry to size it, and pin the same (R, P) at build time.
            # nnz per block from the ACTUAL ranges (callers/tests may pass
            # non-BLOCK_COLS-aligned ones).
            los = np.array([lo for lo, _ in ranges])
            nnz_b = np.bincount(
                np.searchsorted(los, col, side="right") - 1,
                minlength=n_blocks)
            geo = []
            L = round_up(dim, WIN)
            for i, (lo, hi) in enumerate(ranges):
                # R pinned to the perm's shared band size; P per block
                n_win_i, r_i, p_i = _choose_params(
                    m.n_rows, hi - lo, int(nnz_b[i]), self._r_shared, None)
                geo.append((r_i, p_i))
                L = max(L, lo + n_win_i * WIN)
            self._x_rows = L
            out_rows = L
        else:
            geo = [(self._r_shared, None)]
            self._x_rows = None
            out_rows = None  # builder default (square case)
        self.blocks: List[RoutedMatrix] = []
        self._applies = []
        self.dev = []
        self._lo = []
        interpret = self._mode() == "interpret"
        convert_s = 0.0
        ext = "-ext" if self._external_order else ""
        for i, (lo, hi) in enumerate(ranges):
            tag = ext + (f"-b{i}of{n_blocks}" if n_blocks > 1 else "")
            path = _cache_path(self._cache_m, cfg.cache_dir, tag)
            rm = _load_routed(path) if cfg.artifact_cache else None
            if rm is None:
                t1 = time.perf_counter()
                if n_blocks > 1:
                    sel = (col >= lo) & (col < hi)
                    sub = MatrixCOO(
                        n_rows=m.n_rows, n_cols=hi - lo,
                        row=np.asarray(m.row)[sel],
                        col=col[sel] - lo,
                        val=np.asarray(m.val)[sel])
                    rm = build_routed(sub, R=geo[i][0], P=geo[i][1],
                                      out_rows=out_rows, identity_dst=True)
                else:
                    rm = build_routed(m, R=geo[i][0], out_rows=out_rows,
                                      identity_dst=True)
                convert_s += time.perf_counter() - t1
                if cfg.artifact_cache:
                    _save_routed(rm, path)
            self.blocks.append(rm)
            self.dev.append(rm.to_jax(dtype="float32"))
            self._applies.append(make_routed_apply(rm, interpret=interpret))
            self._lo.append(lo)
        if convert_s:
            self.setup_seconds["convert"] = convert_s
        else:
            self.setup_seconds["cache_load"] = time.perf_counter() - t0
        self.routed = self.blocks[0]   # introspection convenience
        self.setup_seconds["total"] = time.perf_counter() - t0

    @property
    def _padded_x_rows(self) -> int:
        return (self._x_rows if self._x_rows is not None
                else self.blocks[0].padded_x_rows)

    def device_operands(self):
        # the A-side streams alone exceed any VMEM prestage budget: args mode
        return self.dev

    def prepare_x(self, x: np.ndarray) -> jax.Array:
        # into the engine's (dst-ordered) space — host-side, once, outside
        # the timed region, exactly like the EHYB models' vector_reorder
        xp = np.zeros(self._padded_x_rows, dtype=np.float32)
        xp[: self.m.dimension] = np.asarray(x, dtype=np.float32)[self._perm]
        return jnp.asarray(xp)

    def recover_y(self, y: jax.Array) -> np.ndarray:
        # apply returns dst-space y == the permuted input space: un-permute
        # on the host (the reference recovers its y the same way,
        # reordering.c:386-391)
        out = np.empty(self.m.n_rows, dtype=np.float64)
        out[self._perm] = np.asarray(y, dtype=np.float64)[: self.m.n_rows]
        return out

    def bytes_model(self) -> int:
        """Modeled HBM bytes per iteration (roofline denominator).

        Since format v11 stages A and T are ONE fused kernel (products
        transpose in-register), so the product array touches HBM twice —
        the fused write and the stage-B block read — instead of v10's four
        passes (A-write, T-read, T-write, B-read).  Plus the index streams
        of both stages and x once: ~3.5x the nnz bytes of a direct format,
        traded against the ~14 cyc/element gather wall.
        """
        total = self._padded_x_rows * (4 + 8 * len(self.blocks))
        for rm in self.blocks:
            a_slots = rm.a_col.shape[0] * LANES
            b_slots = rm.b_idx.shape[0] * LANES
            prod = rm.n_bg * LANES * rm.group_rows * LANES * 4
            total += int(a_slots * (2 + 4)     # a_col + a_val
                         + prod                # fused A+T product write
                         + prod                # B block reads (1x per group)
                         + b_slots * 2         # b_idx
                         # y stream: every row (octet) vs one row/sub-tile
                         + (b_slots * 4 if rm.octet else b_slots // 8 * 4)
                         + rm.sp_val.size * 12)  # spill tail
        return total

    def apply(self, x_dev: jax.Array) -> jax.Array:
        return self.apply_operands(self.dev, x_dev)

    def apply_operands(self, operands, x_dev):
        devs = operands if operands is not None else self.dev
        y = None
        for rm, ap, dv, lo in zip(self.blocks, self._applies, devs,
                                  self._lo):
            xs = (x_dev if len(self.blocks) == 1
                  else jax.lax.slice(x_dev, (lo,), (lo + rm.padded_x_rows,)))
            yb = ap(dv, xs)
            y = yb if y is None else y + yb
        return y
