"""Sharded routed SpMV — the gather-wall engine over a device mesh.

The routed pipeline shards trivially by ROWS: bands are row-local, so each
device runs its own complete three-stage instance (gather-multiply →
transpose → route-reduce) over its row slice with x REPLICATED (a few MB —
a fully unstructured matrix touches every window anyway, so a halo scheme
would degenerate to an all-gather; replication IS the honest communication
pattern for this regime).  Outputs are already input-space per shard, so
the global y is just the concatenation — no exchange, no combine.

SPMD uniformity (the shard_map contract): per column block, (R, P), the
group geometry (c, s_b) and the octet decision are pinned from shard 0,
making the A-side shapes identical by construction; the B-side streams and
spill tails are padded to the max across shards (padding rows are masked
and the extra grid tiles reduce zeros).  The per-shard schedule maps
travel as sharded ARGUMENTS through ``make_routed_apply(maps_in_dev=True)``.

No size cliff: past the single-level chain bound — which binds EARLIER
sharded than on one device, because r_sh < dim shrinks R and stretches the
chain — the columns split into vertical blocks like the single-device
column-block mode; each shard runs every block over its rows and sums the
r_sh-row outputs (one apply per block inside the same shard_map body).

Reference parity: the reference has no multi-GPU path at all (SURVEY §5);
this realizes its phase-2 regime (``kernel.cu:169-194``) at mesh scale.
"""
from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EhybConfig, LANES, cdiv, round_up
from ..core.coo import MatrixCOO
from ..core.route import RoutedMatrix, WIN, build_routed, _choose_params
from ..models.base import SpmvModel
from ..utils.log import get_logger
from .spmv import AXIS, check_vma_enabled

log = get_logger(__name__)


def _pad_rows(a: np.ndarray, rows: int, fill) -> np.ndarray:
    if a.shape[0] == rows:
        return a
    pad = np.full((rows - a.shape[0],) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def _stack_block(shards: List[RoutedMatrix], r_sh: int, nnz: int):
    """Pad one column-block's per-shard builds to uniform shapes and stack
    on a leading device axis; return (stacked dict, template)."""
    # pad the variable-size B-side/spill arrays to the max across shards
    bmax = max(s.b_idx.shape[0] for s in shards)
    q = shards[0].s_b * 8
    bmax = round_up(bmax, q)
    gmax = bmax // q
    smax = bmax // 8
    spmax = max(s.sp_val.shape[0] for s in shards)
    ymax = bmax if shards[0].octet else smax   # y3 rows (take source)

    stacked = {}
    per = {
        "a_col": [s.a_col for s in shards],
        "a_val": [s.a_val for s in shards],
        "b_idx": [_pad_rows(s.b_idx, bmax, np.int16(1 << 14))
                  for s in shards],
        "b_gmap": [_pad_rows(s.b_gmap, gmax, 0) for s in shards],
        "b_boff": [_pad_rows(s.b_boff, smax, 0) for s in shards],
        "b_reset": [_pad_rows(s.b_reset, smax, 1) for s in shards],
        "b_last": [np.minimum(s.b_last, ymax - 1) for s in shards],
        "sp_dst": [_pad_rows(s.sp_dst, spmax, 0) for s in shards],
        "sp_col": [_pad_rows(s.sp_col, spmax, 0) for s in shards],
        "sp_val": [_pad_rows(s.sp_val, spmax, np.float32(0))
                   for s in shards],
        # input-space scatter: every shard keeps exactly r_sh rows (the
        # builder's keep mask is vs n_rows=r_sh, incl. the last shard's
        # zero padding rows), so these are uniform without padding
        "scat_src": [np.flatnonzero(s.dst_rows < r_sh).astype(np.int32)
                     for s in shards],
        "scat_dst": [s.dst_rows[s.dst_rows < r_sh].astype(np.int32)
                     for s in shards],
    }
    for name, arrs in per.items():
        assert len({a.shape for a in arrs}) == 1, \
            (name, [a.shape for a in arrs])
        stacked[name] = np.stack(arrs)

    # template geometry for the kernel factory: shard 0 with the padded
    # B stream (all shards share these STATIC shapes)
    t = shards[0]
    template = RoutedMatrix(
        dim=r_sh, n_win=t.n_win, P=t.P, R=t.R, n_bands=t.n_bands,
        n_bg=t.n_bg, bands_per_block=t.bands_per_block, s_b=t.s_b,
        out_rows=r_sh, octet=t.octet,
        a_col=t.a_col, a_val=t.a_val, a_win=t.a_win,
        a_real_steps=t.a_real_steps,
        b_idx=stacked["b_idx"][0], b_gmap=stacked["b_gmap"][0],
        b_boff=stacked["b_boff"][0], b_reset=stacked["b_reset"][0],
        b_last=stacked["b_last"][0],
        sp_dst=stacked["sp_dst"][0], sp_col=stacked["sp_col"][0],
        sp_val=stacked["sp_val"][0], dst_rows=t.dst_rows,
        stats={"nnz": nnz,
               "nnz_spill": int(sum(s.stats["nnz_spill"] for s in shards)),
               "b_steps": bmax, "octet": t.octet,
               "per_dev": [s.stats for s in shards]})
    return stacked, template


def build_sharded_routed(m: MatrixCOO, n_devices: int,
                         block_cols: Optional[int] = None):
    """Per-(shard, column-block) routed builds with geometry pinned per
    block (uniform across shards), padded and stacked on a leading device
    axis.

    Past the single-level chain bound — which binds EARLIER here than on
    one device, since r_sh < dim shrinks R and stretches the chain — the
    columns split into vertical blocks exactly like the single-device
    column-block mode (models/routed.py `_setup_blocks`); each shard then
    runs every block over its rows and sums the r_sh-row outputs.
    ``block_cols`` overrides the split width (tests force small blocks).

    Returns (list over blocks of (stacked dict, template, col_lo),
    rows_per_shard, padded x length).
    """
    from ..models.routed import BLOCK_COLS

    dim = m.dimension
    D = n_devices
    r_sh = round_up(cdiv(dim, D), LANES)      # rows per shard
    row = np.asarray(m.row)
    col = np.asarray(m.col)
    val = np.asarray(m.val)
    order = np.argsort(row // r_sh, kind="stable")
    row, col, val = row[order], col[order], val[order]
    bounds = np.searchsorted(row // r_sh, np.arange(D + 1))

    # nnz per (shard, block); geometry per block sized for the WORST shard
    from ..models.routed import _block_ranges

    bc = block_cols or BLOCK_COLS
    single = block_cols is None
    if single:
        try:
            _choose_params(r_sh, dim, max(
                int(np.max(np.diff(bounds), initial=1)), 1), None, None)
        except ValueError:
            single = False
    if single:
        ranges = [(0, dim)]
    else:
        ranges = _block_ranges(dim, bc)
        log.info("sharded routed: chain bound at rows/shard=%d dim=%d — "
                 "COLUMN-BLOCK mode, %d blocks of <=%d cols",
                 r_sh, dim, len(ranges), bc)

    nb = len(ranges)
    if nb > 1:
        # ONE bucketing pass over nnz (the per-block mask + np.add.at loop
        # was O(nb * nnz) with the slowest scatter primitive): sort entries
        # by (shard, block) once, then every (d, i) sub-matrix is a slice
        shard_of = np.repeat(np.arange(D), np.diff(bounds))
        key = shard_of * nb + np.minimum(col // bc, nb - 1)
        order2 = np.argsort(key, kind="stable")
        row, col, val, key = row[order2], col[order2], val[order2], \
            key[order2]
        bounds_sb = np.searchsorted(key, np.arange(D * nb + 1))
        nnz_sb = np.diff(bounds_sb).reshape(D, nb)
    else:
        bounds_sb = bounds
        nnz_sb = np.diff(bounds).astype(np.int64).reshape(D, 1)

    blocks = []
    L = round_up(dim, WIN)
    for i, (lo_c, hi_c) in enumerate(ranges):
        nnz_sh = nnz_sb[:, i]
        if nb > 1 and int(nnz_sh.sum()) == 0 and len(blocks) + (
                nb - 1 - i) > 0:
            continue  # an empty block contributes nothing — skip it
            # (unless it is the only block left and none were kept)
        _, r0, p0 = _choose_params(
            r_sh, hi_c - lo_c, max(int(nnz_sh.max(initial=1)), 1),
            None, None)
        shards: List[RoutedMatrix] = []
        geo = None
        for d in range(D):
            lo, hi = (bounds_sb[d * nb + i], bounds_sb[d * nb + i + 1]) \
                if nb > 1 else (bounds[d], bounds[d + 1])
            sub = MatrixCOO(
                n_rows=r_sh, n_cols=hi_c - lo_c,
                row=(row[lo:hi] - d * r_sh).astype(np.int32),
                col=(col[lo:hi] - lo_c).astype(np.int32),
                val=val[lo:hi])
            if geo is None:
                rm = build_routed(sub, R=r0, P=p0, out_rows=r_sh)
                geo = ((rm.bands_per_block, rm.s_b), bool(rm.octet))
                # the build may round n_win up for alignment — size the
                # shared x from the realized geometry, not the chooser's
                L = max(L, lo_c + rm.n_win * WIN)
            else:
                rm = build_routed(sub, R=r0, P=p0, out_rows=r_sh,
                                  group_geometry=geo[0],
                                  octet_override=geo[1])
            shards.append(rm)
        stacked, template = _stack_block(shards, r_sh, int(nnz_sh.sum()))
        blocks.append((stacked, template, lo_c))
    return blocks, r_sh, L


class ShardedRoutedSpmv(SpmvModel):
    """Row-sharded routed SpMV: one complete routed instance per device,
    x replicated, outputs concatenated."""

    name = "ehyb_routed_sharded"

    def __init__(self, config: Optional[EhybConfig] = None,
                 mesh: Optional[jax.sharding.Mesh] = None):
        super().__init__(config)
        if mesh is None:
            devs = np.array(jax.devices())
            mesh = jax.sharding.Mesh(devs, (AXIS,))
        self.mesh = mesh

    def setup(self, m: MatrixCOO,
              block_cols: Optional[int] = None) -> "ShardedRoutedSpmv":
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops.route_pallas import make_routed_apply

        self.m = m
        self.setup_seconds = {}
        self.ehyb = None
        t0 = time.perf_counter()
        D = int(np.prod(self.mesh.devices.shape))
        blocks, r_sh, L = build_sharded_routed(m, D, block_cols=block_cols)
        self.template = blocks[0][1]
        self.templates = [b[1] for b in blocks]
        self.r_sh, self.D, self._x_rows = r_sh, D, L
        self.routed = self.template
        self.setup_seconds["convert"] = time.perf_counter() - t0

        interpret = jax.default_backend() != "tpu"
        check_vma = check_vma_enabled(interpret=interpret)
        shard_spec = NamedSharding(self.mesh, P(AXIS))
        # one apply per column block; each block's schedule arrays travel
        # as sharded args under a block prefix in ONE flat dict
        applies, self.dev = [], {}
        for i, (stacked, template, lo_c) in enumerate(blocks):
            ap = make_routed_apply(
                template, interpret=interpret, maps_in_dev=True,
                # vma-tag the pallas outputs so the compiled path runs under
                # check_vma=True; the pallas interpreter can't propagate vma
                # through its kernel evaluation, so CPU tests keep the hatch.
                vma={AXIS} if check_vma else None)
            applies.append((f"blk{i}:", ap, lo_c, template.padded_x_rows))
            for n, a in stacked.items():
                self.dev[f"blk{i}:{n}"] = jax.device_put(a, shard_spec)
        mesh = self.mesh
        n_blocks = len(blocks)

        def body(x_full, arrs):
            if check_vma:
                # x arrives replicated (P() → unvarying); the vma checker
                # requires an explicit cast before it mixes with the
                # device-varying schedule arrays (a metadata-only op).
                x_full = jax.lax.pcast(x_full, AXIS, to="varying")
            local = {n: a[0] for n, a in arrs.items()}  # drop device axis
            y = None
            for pref, ap, lo_c, xr in applies:
                blk = {n[len(pref):]: a for n, a in local.items()
                       if n.startswith(pref)}
                xs = x_full if n_blocks == 1 else \
                    jax.lax.slice(x_full, (lo_c,), (lo_c + xr,))
                yb = ap(blk, xs)
                y = yb if y is None else y + yb
            return y[None]

        def apply_impl(arrs, x_full):
            f = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), {n: P(AXIS) for n in arrs}),
                out_specs=P(AXIS, None),
                # check_vma is ON for the compiled path (pallas out_shapes
                # vma-tagged above); interpret mode keeps the hatch — the
                # pallas interpreter can't propagate vma internally.
                check_vma=check_vma)
            return f(x_full, arrs).reshape(-1)

        self._apply_fn = jax.jit(apply_impl)
        self.setup_seconds["total"] = time.perf_counter() - t0
        log.info("%s ready: D=%d rows/shard=%d blocks=%d b_steps(max)=%d "
                 "octet=%d spill=%d", self.name, D, r_sh, n_blocks,
                 max(b[1].stats["b_steps"] for b in blocks),
                 self.template.octet,
                 sum(b[1].stats["nnz_spill"] for b in blocks))
        return self

    def bytes_model(self) -> int:
        """Modeled HBM bytes per iteration, summed over the D shards.

        Per shard this is the single-device routed traffic model
        (``models/routed.py::bytes_model``): since format v11 the fused
        A+T kernel writes the product array once and stage B reads it once
        (v10 paid 4 passes), plus both stages' index streams plus the
        replicated x once per block — shard shapes are uniform by
        construction, so D x the template."""
        per_dev = self._x_rows * (4 + 8 * len(self.templates))
        for rm in self.templates:
            a_slots = rm.a_col.shape[0] * LANES
            b_slots = rm.b_idx.shape[0] * LANES
            prod = rm.n_bg * LANES * rm.group_rows * LANES * 4
            per_dev += int(a_slots * (2 + 4)     # a_col + a_val
                           + prod                # fused A+T product write
                           + prod                # B block reads
                           + b_slots * 2         # b_idx
                           + (b_slots * 4 if rm.octet
                              else b_slots // 8 * 4)
                           + rm.sp_val.size * 12)  # spill tail
        return self.D * per_dev

    def device_operands(self):
        return self.dev

    def prepare_x(self, x: np.ndarray) -> jax.Array:
        xp = np.zeros(self._x_rows, dtype=np.float32)
        xp[: self.m.dimension] = np.asarray(x, dtype=np.float32)
        return jnp.asarray(xp)

    def recover_y(self, y: jax.Array) -> np.ndarray:
        return np.asarray(y, dtype=np.float64)[: self.m.n_rows]

    def apply(self, x_dev: jax.Array) -> jax.Array:
        return self._apply_fn(self.dev, x_dev)

    def apply_operands(self, operands, x_dev):
        dev = operands if operands is not None else self.dev
        return self._apply_fn(dev, x_dev)
