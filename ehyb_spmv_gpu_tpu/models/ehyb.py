"""The EHYB model family — the framework's flagship.

Pipeline per ``setup`` (mirrors ``main`` → ``matrixReorder`` → ``spmvGPuEHYB``,
``solver_test.c:267-389``):

  1. :func:`~..core.planner.make_plan` — VMEM-window planner
     (role of ``solver_test.c:53-77``);
  2. :func:`~..partition.partition_rows` — k-way graph partition
     (role of ``MTMETIS_PartGraphKway``, ``reordering.c:280-293``);
  3. :func:`~..core.reorder.two_level_reorder` — partition grouping +
     in-partition density sort (``reordering.c:231-378``);
  4. :func:`~..core.convert.coo_to_ehyb` — format conversion
     (``COO2EHYB``, ``convert.c:316-369``);
  5. device upload (role of ``cudaMallocTransDataEHYB``, ``spmv.cu:6-60``).

Variants:
  * :class:`EhybXlaSpmv` — EHYB format, pure-XLA gather/segment-sum apply;
  * :class:`EhybSpmv`    — EHYB format, Pallas fused kernel for the SELL body
    (falls back to the XLA path on non-TPU backends);
  * :class:`HybSpmv`     — CACHE off: single whole-matrix window (plain HYB,
    the ablation the reference can express but cannot run — it hard-requires
    RODR && CACHE && BLOCK at ``solver_test.c:322-325``).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EhybConfig, cdiv, round_up, LANES
from ..core.coo import MatrixCOO
from ..core.convert import coo_to_ehyb


class _DelegateToRouted(Exception):
    """Control-flow carrier: the ordering gate decided for the routed
    engine; ``EhybSpmv.setup`` catches it and returns ``model``."""

    def __init__(self, model):
        super().__init__("gather-wall delegation")
        self.model = model
from ..core.ehyb import EhybMatrix
from ..core.planner import make_plan, Plan
from ..core.reorder import Reordering, identity_reordering, two_level_reorder
from ..partition import partition_rows
from ..ops.xla_ops import ehyb_apply_xla
from ..utils.log import get_logger
from .base import SpmvModel

log = get_logger(__name__)


#: Above this device-array footprint the matrix is passed as jit *arguments*
#: instead of closure constants: constants larger than VMEM (128 MiB on v5e)
#: cannot be pre-staged anyway, and on remote-attached TPUs they exceed the
#: compile-request size limit (HTTP 413) — see models/base.py.
VMEM_PRESTAGE_LIMIT = int(os.environ.get(
    "EHYB_PRESTAGE_LIMIT_BYTES", 100 * 1024 * 1024))

#: Measured full-apply cost per (8,128) body vreg on v5e (const mode,
#: permuted_poisson_512, fixed overheads included): chunk-sync two-stage
#: gather vs relaxed dual-window (one extra sublane gather + select) vs
#: relaxed quad-window (three extra sublane gathers + selects).
#: Used to arbitrate the relax_body='auto' switch.
_CYC_MW_VREG = 17.8
_CYC_RX_VREG = 19.9
#: Calibrated from the measured v5e rate/step ratios (random_16k: 25.8 vs
#: 33.5 GFLOP/s at 16200 vs 11728 steps → per-step cost ratio 1.063;
#: permuted_poisson_512 agrees at 1.055).
_CYC_RX4_VREG = 21.2
#: Chunk-sync padding fraction above which the relaxed conversion is tried.
_RELAX_WASTE_GATE = 0.25
#: Relaxed-body padding fraction above which the quad-window (4 windows per
#: sub-tile) conversion is tried: quads help when lane fill is low (group
#: merging raises entries/lane and amortizes the ceil-to-8 padding).
_QUAD_WASTE_GATE = 0.35


class EhybXlaSpmv(SpmvModel):
    """EHYB pipeline with the pure-XLA apply (reference semantics everywhere)."""

    name = "ehyb_xla"

    def _finish_setup(self):
        leaves = jax.tree_util.tree_leaves(self.dev)
        total = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in leaves)
        self._args_mode = total > VMEM_PRESTAGE_LIMIT
        log.info("%s device footprint %.1f MB → %s mode", self.name,
                 total / 1e6, "args" if self._args_mode else "const/VMEM")

    def device_operands(self):
        return self.dev if getattr(self, "_args_mode", False) else None

    def apply_operands(self, operands, x_dev):
        dev = operands if operands is not None else self.dev
        if getattr(self.config, "dword_values", False):
            from ..ops.dword import dword_apply

            return dword_apply(dev, self._dword_lo, x_dev)
        return ehyb_apply_xla(dev, x_dev)

    def _rx_supported(self, e_rx: "EhybMatrix") -> bool:
        """Whether this model can run the relaxed layout (the XLA model
        always can; the Pallas flagship overrides — its only rx kernel is
        the streamed one, and the XLA fallback's 2D-index gathers crash the
        TPU fusion emitter)."""
        return True

    def _upload(self, cfg):
        """Device upload; double-word mode splits the f64 host values into
        (hi, lo) f32 pairs — hi via the round-to-nearest cast, lo kept in
        a side dict consumed by ops.dword."""
        if not getattr(cfg, "dword_values", False):
            return self.ehyb.to_jax(dtype=cfg.dtype)
        from ..ops.dword import pack_long_dword, split_f64

        e = self.ehyb
        dev = e.to_jax(dtype="float32")
        self._dword_lo = {
            "ell": jnp.asarray(split_f64(np.asarray(e.ell_val))[1]),
            "er": jnp.asarray(split_f64(np.asarray(e.er_val))[1]),
            "dia": jnp.asarray(split_f64(np.asarray(e.dia_val))[1]),
        }
        if e.long_rows.size:
            # pathological rows ride the lane-chain compensated reduction
            # (ops/dword.pack_long_dword — the f64 long-row contract,
            # kernel.cu:43-67 at spmv.h:46 precision)
            col2, vh2, vl2, seg2 = pack_long_dword(
                e.long_col, np.asarray(e.long_val, dtype=np.float64),
                e.long_seg, e.long_rows.shape[0])
            self._dword_lo["long"] = (
                jnp.asarray(col2), jnp.asarray(vh2), jnp.asarray(vl2),
                jnp.asarray(seg2), jnp.asarray(e.long_rows.astype(np.int32)))
        return dev

    def _post_order_hook(self, m: MatrixCOO) -> None:
        """Called once the reordering is decided, before any conversion.
        EhybSpmv overrides it to abort into the routed engine on
        gather-wall structures (raising :class:`_DelegateToRouted`)."""

    def _pre_order_hook(self, m: MatrixCOO) -> None:
        """Called on a cache miss BEFORE the ordering chain.  EhybSpmv
        overrides it to delegate on a cached gather-wall verdict without
        paying pick_ordering for an ordering the routed engine ignores."""

    def setup(self, m: MatrixCOO) -> "EhybXlaSpmv":
        import time as _time

        self.m = m
        cfg = self.config
        if getattr(cfg, "dword_values", False):
            # Double-word precision mode (ops/dword.py): convert with f64
            # host values (split into f32 pairs at upload).  Long rows run
            # the lane-chain compensated reduction (pack_long_dword); hub
            # splitting stays off (its combine re-sums through plain f32).
            self.config = cfg = dataclasses.replace(
                cfg, dtype="float64",
                row_split_threshold=0, relax_body="never")
        dim = m.dimension
        #: Host preprocessing wall-times (the reference prints its partition
        #: time at reordering.c:298; bench.py forwards these to the JSON).
        self.setup_seconds = {}
        _t0 = _time.perf_counter()

        self.plan: Plan = make_plan(dim, cfg)

        # The cache is keyed by the config AS GIVEN: the relax auto-switch is
        # deterministic for (matrix, config), so artifacts converted after a
        # switch are saved under the pre-switch fingerprint — the one the next
        # run's load (which happens before any switch) computes (advisor
        # finding r2: keying by the mutated config made every run a miss).
        cfg_key = cfg
        # Cached gather-wall verdict fires BEFORE the EHYB artifact load: a
        # pre-delegation run may have left EHYB artifacts for a matrix the
        # gate has since judged gather-wall, and loading a 16M-nnz npz just
        # to throw it away cost random_1m ~70 s of warm setup.
        self._pre_order_hook(m)
        if cfg.artifact_cache:
            from ..core.cache import load_artifacts

            hit = load_artifacts(m, cfg, cfg.cache_dir)
            if hit is not None:
                self.ehyb, self.reordering = hit
                # the routed-delegation gate must see cache hits too: a
                # pre-delegation (or routed_delegate='never') run may have
                # cached EHYB artifacts for a gather-wall matrix, and the
                # warm-cache path must not silently keep the collapsed body
                self._post_order_hook(m)
                if self.ehyb.step_win_b.size and cfg.body_layout != "sell_rx":
                    # artifact was converted after the auto-switch: mirror it
                    # on the config so apply-time logic agrees with the layout
                    self.config = cfg = dataclasses.replace(
                        cfg, body_layout="sell_rx")
                if self.ehyb.step_win_c.size \
                        and getattr(cfg, "windows_per_subtile", 2) != 4:
                    self.config = cfg = dataclasses.replace(
                        cfg, windows_per_subtile=4)
                self.dev = self._upload(cfg)
                self.setup_seconds["cache_load"] = _time.perf_counter() - _t0
                self._finish_setup()
                return self
        if cfg.body_layout in ("sell_mw", "sell_rx") and cfg.features.reorder:
            from ..core.ordering import pick_ordering

            self.reordering: Reordering = pick_ordering(
                m, self.plan, cfg, cfg.ordering)
        elif cfg.features.reorder and self.plan.n_parts > 1:
            labels = partition_rows(m, self.plan.n_parts, cfg.partitioner,
                                    cfg.partition_imbalance)
            self.reordering = two_level_reorder(
                m, labels, self.plan, sort_rows=cfg.features.sort_rows,
                sort_mode=cfg.features.sort_mode)
        else:
            bounds = np.arange(self.plan.n_parts + 1) * self.plan.window_rows
            bounds = np.minimum(bounds, dim)
            bounds[-1] = dim
            self.reordering = identity_reordering(dim, bounds)
            if cfg.features.sort_rows and self.plan.n_parts > 1:
                # Density sort still applies on top of identity grouping.
                labels = np.searchsorted(bounds, np.arange(dim), side="right") - 1
                self.reordering = two_level_reorder(
                    m, labels.astype(np.int32), self.plan, sort_rows=True)

        self.setup_seconds["order"] = _time.perf_counter() - _t0
        self._post_order_hook(m)   # EhybSpmv's routed-delegation gate
        _t1 = _time.perf_counter()
        m_r = self.reordering.apply_to_matrix(m)
        if (cfg.body_layout == "sell_mw" and cfg.relax_body == "auto"
                and m.nnz > 2_000_000):
            # Pre-decide mw vs rx from the sampled estimator instead of
            # paying a full chunk-sync conversion that the waste gate will
            # discard (a conversion of an 80M-nnz matrix is minutes of the
            # setup budget; permuted_poisson_4096's auto chain converted
            # three times).  Skip mw only when its padding is predicted
            # FAR over the trial gate (est/ideal > 2.2 ~ waste > 55%).
            from ..core.ordering import SAMPLE_CAP, estimate_mw_steps

            rr, cc, frac = m_r.row, m_r.col, 1.0
            if m.nnz > SAMPLE_CAP:
                frac = SAMPLE_CAP / m.nnz
                keep_s = np.random.default_rng(0).random(m.nnz) < frac
                rr, cc = rr[keep_s], cc[keep_s]
            est = estimate_mw_steps(
                rr, cc, dim, cfg.slice_rows,
                max(1, int(round(cfg.min_window_group_nnz * frac))))
            if est > 2.2 * (rr.size / 128.0):
                log.info("mw conversion skipped: sampled estimate %.1fx the "
                         "ideal step count — converting relaxed directly",
                         est / (rr.size / 128.0))
                self.config = cfg = dataclasses.replace(
                    cfg, body_layout="sell_rx")
        self.ehyb: EhybMatrix = coo_to_ehyb(m_r, self.reordering, self.plan, cfg)
        if cfg.body_layout == "sell_mw" and cfg.relax_body == "auto":
            st = self.ehyb.stats
            cells = st["nnz_ell"] + st["waste_ell"]
            if st["nnz_ell"] > 0 and st["waste_ell"] > _RELAX_WASTE_GATE * cells:
                cfg_rx = dataclasses.replace(cfg, body_layout="sell_rx")
                e_rx = coo_to_ehyb(m_r, self.reordering, self.plan, cfg_rx)
                # Keep the cheaper body by the measured per-vreg cycle model
                # (relaxed pays one extra sublane gather + select per vreg).
                if (e_rx.stats["ell_steps"] * _CYC_RX_VREG
                        < st["ell_steps"] * _CYC_MW_VREG
                        and self._rx_supported(e_rx)):
                    log.info("relaxed body wins: %d → %d ell steps",
                             st["ell_steps"], e_rx.stats["ell_steps"])
                    self.ehyb = e_rx
                    self.config = cfg = cfg_rx
        if (cfg.body_layout == "sell_rx" and cfg.relax_body == "auto"
                and getattr(cfg, "windows_per_subtile", 2) == 2):
            # Quad-window upgrade: when the dual-window body still pads
            # heavily (low lane fill), merging 4 windows per sub-tile
            # tightens the lane bound and amortizes the ceil-to-8 padding
            # (measured -28% steps on random_16k) at ~+13% per-vreg cost.
            st = self.ehyb.stats
            cells = st["nnz_ell"] + st["waste_ell"]
            if st["nnz_ell"] > 0 and st["waste_ell"] > _QUAD_WASTE_GATE * cells:
                cfg4 = dataclasses.replace(cfg, windows_per_subtile=4)
                e4 = coo_to_ehyb(m_r, self.reordering, self.plan, cfg4)
                if (e4.stats["ell_steps"] * _CYC_RX4_VREG
                        < st["ell_steps"] * _CYC_RX_VREG
                        and self._rx_supported(e4)):
                    log.info("quad windows win: %d → %d ell steps",
                             st["ell_steps"], e4.stats["ell_steps"])
                    self.ehyb = e4
                    self.config = cfg = cfg4
        self.setup_seconds["convert"] = _time.perf_counter() - _t1
        if cfg.artifact_cache:
            from ..core.cache import save_artifacts

            save_artifacts(m, cfg_key, self.ehyb, self.reordering,
                           cfg.cache_dir)
        self.dev = self._upload(cfg)
        self.setup_seconds["total"] = _time.perf_counter() - _t0
        self._finish_setup()
        log.info("%s ready: %s | setup %s | stats=%s", self.name,
                 self.plan.describe(),
                 {k: round(v, 2) for k, v in self.setup_seconds.items()},
                 self.ehyb.stats)
        return self

    # x/y move through the reordered space (vectorReorder / vectorRecover,
    # solver_test.c:376,383) — outside the timed region, like the reference.
    def prepare_x(self, x: np.ndarray) -> jax.Array:
        xr = self.reordering.vector_reorder(np.asarray(x))
        if getattr(self.config, "dword_values", False):
            from ..ops.dword import split_f64

            xp = self.ehyb.pad_x(xr.astype(np.float64))
            hi, lo = split_f64(xp)
            return jnp.asarray(np.stack([hi, lo]))
        return jnp.asarray(self.ehyb.pad_x(xr.astype(self.config.dtype)))

    def recover_y(self, y: jax.Array) -> np.ndarray:
        y_np = np.asarray(y, dtype=np.float64)
        if y_np.ndim == 2:  # dword (hi, lo) pair: exact f64 recombine
            y_np = y_np[0] + y_np[1]
        y_np = y_np[: self.m.n_rows]
        return self.reordering.vector_recover(y_np)

    def apply(self, x_dev: jax.Array) -> jax.Array:
        return self.apply_operands(None, x_dev)


class EhybSpmv(EhybXlaSpmv):
    """Flagship: EHYB with the fused Pallas SELL-body kernel on TPU.

    On TPU (or with ``EHYB_FORCE_PALLAS=interpret`` for CPU testing) the model
    pins the Pallas-kernel preconditions: 1024-row windows and the
    chunk-synchronized SELL packing.  On other backends it degrades to the XLA
    apply with whatever plan the config requests.
    """

    name = "ehyb"

    def _pallas_mode(self) -> str:
        if getattr(self.config, "dword_values", False):
            return ""  # precision mode runs the XLA dword formulation
        force = os.environ.get("EHYB_FORCE_PALLAS", "").lower()
        if force in ("0", "false", "off", "no"):
            return ""  # explicit disable
        if force:
            return force  # "1" (compiled) or "interpret"
        return "1" if jax.default_backend() == "tpu" else ""

    def _rx_supported(self, e_rx) -> bool:
        if not self._pallas_mode():
            return True  # XLA apply handles rx on CPU
        # The Pallas flagship's rx kernels are the streamed ones (resident or
        # the HBM window-cache variant — residency no longer gates rx): they
        # need the streamed path enabled (EHYB_STREAM_BODY=0 turns it off)
        # and the SMEM prefetch budget.  Without them the rx apply would fall
        # back to the XLA body on TPU — kept working by an optimization
        # barrier around its 2D-index gathers (xla_ops), but the chunk-sync
        # resident/windowed kernels are faster there.
        if os.environ.get("EHYB_STREAM_BODY", "") == "0":
            return False  # advisor finding r2: the gate at apply time must
            # be mirrored here or auto-relax selects a layout it cannot run
        from ..ops.ehyb_pallas import stream_body_fits

        return stream_body_fits(e_rx, np.dtype(self.config.dtype).itemsize)

    #: Post-reorder (slice, window) group fill below which EVERY
    #: window-cached layout has collapsed (a gathered window serves a
    #: handful of entries) and the routed engine takes over — the
    #: reference's phase-2 global-gather regime (kernel.cu:169-194).
    _ROUTED_FILL_GATE = 6.0

    def _post_order_hook(self, m: MatrixCOO) -> None:
        routed = self._maybe_delegate_routed(m)
        if routed is not None:
            raise _DelegateToRouted(routed)

    def _pre_order_hook(self, m: MatrixCOO) -> None:
        """Cached-verdict fast path BEFORE the ordering chain: a matrix the
        gate already judged gather-wall delegates immediately instead of
        re-paying pick_ordering's partition + RCM only to throw them away
        (random_4m: ~280 s of warm setup for an ordering the routed engine
        never uses)."""
        if not self._gate_preconditions(m):
            return
        verdict = self._load_gate_decision(m)
        if verdict in ("routed", "split"):
            log.info("cached gate verdict: %s — delegating without paying "
                     "the ordering chain", verdict)
            try:
                if verdict == "split":
                    from .hybrid import DegreeSplitSpmv

                    raise _DelegateToRouted(
                        DegreeSplitSpmv(self.config).setup(m))
                from .routed import RoutedSpmv

                raise _DelegateToRouted(RoutedSpmv(self.config).setup(m))
            except ValueError as exc:
                # the gate contract: keep the EHYB body when routed cannot
                # run, never crash setup (a stale marker — e.g. a build
                # killed mid-way — must not wedge every warm run)
                log.warning("cached %s verdict but the build failed (%s); "
                            "keeping the EHYB body", verdict, exc)
                self._save_gate_decision(m, False)

    def _gate_preconditions(self, m: MatrixCOO) -> bool:
        cfg = self.config
        if cfg.routed_delegate != "auto":
            return False
        if (np.dtype(cfg.dtype) != np.float32 or cfg.dword_values
                or cfg.compensated_sum or m.n_rows != m.n_cols):
            return False
        if os.environ.get("EHYB_FORCE_PALLAS", "").lower() in (
                "0", "false", "off", "no"):
            return False                     # routed has no XLA apply
        if m.dimension < self._SMALL_GATE_DIM and (
                m.dimension < (1 << 13) or m.nnz < (1 << 18)):
            return False  # tiny matrices: any engine is microseconds
        if m.nnz < (1 << 18):
            return False
        return True

    def _gate_decision_path(self, m: MatrixCOO) -> Optional[str]:
        if not self.config.artifact_cache:
            return None
        from ..core.cache import DEFAULT_CACHE_DIR, matrix_fingerprint

        d = self.config.cache_dir or DEFAULT_CACHE_DIR
        sp = os.environ.get("EHYB_ROUTE_SPILL_MAX", "0.10")
        # v3: int32 column stream + native greedy packer changed the BODY's
        # measured rate — small-gate A/B verdicts taken against the int16
        # election body are stale;
        # v2: verdicts became modes ("routed"/"split"/False) when the
        # degree-split hybrid landed — pre-hybrid booleans must not block it
        return os.path.join(
            d, f"{matrix_fingerprint(m)}"
               f"-gate{self._ROUTED_FILL_GATE:g}v3-sp{sp}.json")

    def _load_gate_decision(self, m: MatrixCOO):
        """Cached gate verdict: "routed" / "split" = delegate to that
        engine, False = keep the EHYB body, None = not decided yet (or
        caching disabled).  Legacy boolean True maps to "routed"."""
        path = self._gate_decision_path(m)
        if path is None or not os.path.exists(path):
            return None
        import json

        try:
            with open(path) as f:
                v = json.load(f)["delegate"]
            return "routed" if v is True else v
        except Exception:
            return None

    def _save_gate_decision(self, m: MatrixCOO, delegate: bool) -> None:
        path = self._gate_decision_path(m)
        if path is None:
            return
        import json

        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"delegate": delegate}, f)
        os.replace(tmp, path)  # atomic vs concurrent sweep children

    #: Below this dimension x is VMEM-resident for every engine, so the
    #: structural bytes argument that justifies immediate delegation on big
    #: matrices does not apply — the body reads x from VMEM either way and
    #: neither engine dominates (sweep r4: random_16k routed 48.0 vs body
    #: 35.8 GFLOP/s, powerlaw_16k body 22.2 vs split 15.0).  The gate there
    #: decides by a measured A/B at setup time instead (both builds are
    #: seconds at this scale), cached by matrix fingerprint.
    _SMALL_GATE_DIM = 1 << 16
    #: Estimated body cost (ordering cost model, core/ordering.py) over the
    #: perfect-fill floor above which a small matrix counts as scattered and
    #: the A/B runs.  Structured matrices sit ≤1.5x (pick_ordering's early
    #: stop); scattered ones sit ≳4x (padding + the ~14 cyc/vreg two-stage
    #: gather are both in the estimate's rate constants).
    _SMALL_EST_K = 3.0

    def _measured_gflops(self, model, m: MatrixCOO) -> float:
        """Short timed run under the production protocol (device-side
        iterate loop, utils/timing.py), escalated past the noise floor."""
        from ..core.coo import deterministic_x
        from ..utils.timing import measure_loop

        x_dev = model.prepare_x(deterministic_x(m.dimension))
        it = 512
        while True:
            per = measure_loop(lambda n: model.iterate(x_dev, n), it,
                               warmup=1)
            if per * it >= 0.05 or it >= (1 << 16):
                return 2.0 * m.nnz / max(per, 1e-12) / 1e9
            it *= 4

    def _maybe_delegate_small(self, m: MatrixCOO):
        """VMEM-resident-scale gate: measured A/B instead of the structural
        fill signal.

        The big-matrix gate's (slice, window) fill measures how much x-reuse
        a window cache gets — meaningless when the whole x sits in VMEM (the
        fill on random_16k is ~190, far above the gate, yet the routed
        engine measures 48.0 vs the body's 35.8 GFLOP/s because the body is
        VPU-gather-bound, not window-bound).  Here the discriminator is the
        ordering cost model's estimate vs the perfect-fill floor: structured
        matrices skip out cheaply, scattered ones pay a one-time two-build
        A/B whose verdict is cached by matrix fingerprint.
        """
        cfg = self.config
        if self._load_gate_decision(m) is not None:
            # "routed"/"split" delegate in _pre_order_hook; False = a
            # measured body win — keep the body without re-measuring
            return None
        from ..core.ordering import (_CYC_DIA_VREG, _CYC_SELL_VREG,
                                     estimate_cost, estimate_mw_steps)

        o2n = self.reordering.old_to_new
        r_new = o2n[m.row.astype(np.int64)]
        c_new = o2n[m.col.astype(np.int64)]
        if cfg.features.dia:
            est = estimate_cost(r_new, c_new, m.dimension, cfg)
            floor = m.nnz / 1024.0 * _CYC_DIA_VREG
        else:
            est = (estimate_mw_steps(r_new, c_new, m.dimension,
                                     cfg.slice_rows,
                                     cfg.min_window_group_nnz,
                                     sliding=bool(cfg.sliding_windows))
                   / 8.0 * _CYC_SELL_VREG)
            floor = m.nnz / 1024.0 * _CYC_SELL_VREG
        if est <= self._SMALL_EST_K * floor:
            return None  # structured — the body is the right engine
        if self._pallas_mode() != "1":
            return None  # the A/B is a hardware measurement
        # Budget guard (VERDICT r4 weak #8): the A/B pays two engine builds
        # + two short hardware runs inside setup().  Estimated build cost
        # scales with nnz (~4 µs/nnz of host packing, measured on the 16k
        # corpus); when the estimate exceeds the budget, keep the body and
        # cache the verdict so the estimate itself is paid once.
        budget_s = float(os.environ.get("EHYB_SMALL_GATE_BUDGET", "60"))
        est_build_s = 2 * m.nnz * 4e-6 + 2.0
        if est_build_s > budget_s:
            log.info("small gate: estimated A/B cost %.1f s exceeds budget "
                     "%.0f s (EHYB_SMALL_GATE_BUDGET); keeping the body",
                     est_build_s, budget_s)
            self._save_gate_decision(m, False)
            return None
        _t_gate = time.perf_counter()
        from ..core.route import _choose_params
        from .hybrid import (DegreeSplitSpmv, MIN_DENSE_FRAC,
                             degree_split_stats)
        from .routed import RoutedSpmv

        try:
            _choose_params(m.dimension, min(m.dimension, 1 << 20),
                           m.nnz // max(cdiv(m.dimension, 1 << 20), 1),
                           None, None)
            _, dense_frac = degree_split_stats(m)
            if dense_frac >= MIN_DENSE_FRAC:
                cand, kind = DegreeSplitSpmv(cfg).setup(m), "split"
            else:
                cand, kind = RoutedSpmv(cfg).setup(m), "routed"
                nnz_spill = sum(b.stats.get("nnz_spill", 0)
                                for b in cand.blocks)
                spill_max = float(
                    os.environ.get("EHYB_ROUTE_SPILL_MAX", "0.10"))
                if nnz_spill > spill_max * max(m.nnz, 1):
                    self._save_gate_decision(m, False)
                    return None
        except ValueError as exc:
            log.info("small gate: candidate infeasible (%s); body", exc)
            self._save_gate_decision(m, False)
            return None
        body = EhybSpmv(dataclasses.replace(
            cfg, routed_delegate="never")).setup(m)
        try:
            g_cand = self._measured_gflops(cand, m)
            g_body = self._measured_gflops(body, m)
        except Exception as exc:  # measurement must never wedge setup
            log.warning("small-gate A/B measurement failed (%s); body", exc)
            return body
        gate_s = time.perf_counter() - _t_gate
        self.setup_seconds["small_gate"] = round(gate_s, 3)
        log.info("small-gate A/B (est %.1fx floor, %.1f s): %s %.2f vs body "
                 "%.2f GFLOP/s", est / floor, gate_s, kind, g_cand, g_body)
        # 5% hysteresis: ties keep the body (the simpler engine, and the one
        # every downstream mode — dword, sharding, solver — supports)
        if g_cand > 1.05 * g_body:
            self._save_gate_decision(m, kind)
            return cand
        self._save_gate_decision(m, False)
        return body  # already built + artifact-cached; reuse it

    def _maybe_delegate_routed(self, m: MatrixCOO):
        """Return a routed model when the post-reorder structure shows the
        gather-wall regime, else None (keep the EHYB body).

        Runs right after the ordering is decided and BEFORE any conversion
        (a scrambled stencil recovers under RCM and must NOT delegate; a
        truly random matrix must not pay the EHYB conversion chain it will
        never use).
        """
        cfg = self.config
        if not self._gate_preconditions(m):
            return None
        if m.dimension < self._SMALL_GATE_DIM:
            return self._maybe_delegate_small(m)
        # The structural signal, mode-independent: mean fill of the
        # post-reorder (128-row slice, 1024-col window) groups — what a
        # window-gather sub-tile can hope to serve.  Sampled; the XLA
        # path's stats can't be used (its plain-sell waste has no window
        # component), and the Pallas quad body amortizes up to 4 windows,
        # so the gate sits well below 1024/4/waste-gate ~ its break-even.
        # Sample whole SLICES (not entries — per-entry strides bias the
        # fill toward empty on large matrices): every 97th slice, all of
        # its entries.
        def sampled_fill(o2n):
            r_new = o2n[m.row.astype(np.int64)]
            pick = (r_new // LANES) % 97 == 0
            r_s = r_new[pick]
            c_s = o2n[m.col[pick].astype(np.int64)]
            gkey = (r_s // LANES) * (m.dimension // 1024 + 1) + c_s // 1024
            return r_s.shape[0] / max(np.unique(gkey).shape[0], 1)

        fill = sampled_fill(self.reordering.old_to_new)
        if fill > self._ROUTED_FILL_GATE:
            # on the pick_ordering path this verdict is final (the sample
            # already saw a bandwidth-recovered ordering) — cache it so
            # warm runs skip even the fill sample
            if cfg.body_layout in ("sell_mw", "sell_rx"):
                self._save_gate_decision(m, False)
            return None
        if cfg.body_layout in ("sell_mw", "sell_rx") \
                and self._load_gate_decision(m) is False:
            # cached keep-body verdict (schedule-quality veto or a prior
            # high-fill sample) — skip re-probing the routed build; the
            # pick_ordering path needs no RCM recovery (it already ran)
            return None
        if cfg.body_layout not in ("sell_mw", "sell_rx"):
            # The XLA path's ordering (partition grouping, no bandwidth
            # recovery) makes a PERMUTED STENCIL look gather-wall — the
            # gate's own contract forbids delegating those.  Re-sample
            # under the RCM ordering the Pallas flagship would have
            # considered before concluding; the verdict is cached by
            # matrix fingerprint so warm runs never re-pay the RCM BFS
            # (on a 16.7M-row matrix it costs ~45 s).
            # the cached verdict is consulted only for True (known
            # gather-wall): a False verdict must NOT skip the re-check —
            # on a cold XLA-path conversion the recovered RCM ordering is
            # ADOPTED below, and skipping would silently pack the body
            # under the collapsed partition ordering (warm runs never get
            # here: the artifact-hit path samples the cached RCM-adopted
            # ordering and returns early on its high fill)
            if not self._load_gate_decision(m):
                from ..core.ordering import rcm_order, reordering_from_order

                rcm = reordering_from_order(
                    rcm_order(m).astype(np.int64), m.dimension)
                fill_rcm = sampled_fill(rcm.old_to_new)
                recovered = fill_rcm > self._ROUTED_FILL_GATE
                if recovered:
                    self._save_gate_decision(m, False)
                    log.info(
                        "group fill %.1f under the partition ordering but "
                        "%.1f under RCM — structure recovered, keeping the "
                        "EHYB body", fill, fill_rcm)
                    if getattr(self, "ehyb", None) is None:
                        # cold path: the conversion has not run yet — adopt
                        # the recovered ordering (the RCM work is not
                        # wasted; the body packs under it)
                        self.reordering = rcm
                    return None
        from ..core.route import _choose_params
        from .routed import RoutedSpmv

        try:
            # block-width feasibility — column-block mode lifts the dim cap,
            # so only the per-row density can disqualify the router.  The
            # probe uses MEAN per-block density; the real per-block build
            # below can still fail on column-skewed matrices, so it is
            # guarded too (the gate's contract is "keep the EHYB body when
            # routed cannot run", never to crash setup).
            _choose_params(m.dimension, min(m.dimension, 1 << 20),
                           m.nnz // max(cdiv(m.dimension, 1 << 20), 1),
                           None, None)
            # Heavy tail → degree-split hybrid: dense rows pack the EHYB
            # body at pooled-slice fill while the bounded-degree remainder
            # routes at the Poisson floor (powerlaw_1m: routed-alone spill
            # 6.79M vs 3.8k for the split's sparse side; models/hybrid.py).
            from .hybrid import (DegreeSplitSpmv, MIN_DENSE_FRAC,
                                 degree_split_stats)

            _, dense_frac = degree_split_stats(m)
            if dense_frac >= MIN_DENSE_FRAC:
                log.info("gather-wall with a heavy tail (fill %.1f, %.0f%% "
                         "of nnz in dense rows): degree-split hybrid",
                         fill, 100 * dense_frac)
                model = DegreeSplitSpmv(cfg).setup(m)
                self._save_gate_decision(m, "split")
                return model
            log.info("gather-wall structure (post-reorder (slice,window) "
                     "group fill %.1f): delegating to the routed engine",
                     fill)
            routed = RoutedSpmv(cfg).setup(m)
            # Schedule-quality veto: spilled entries ride the same ~14
            # cyc/element XLA gather the routed engine exists to avoid, so
            # a heavy-tailed matrix whose hub rows blow the stage-B color
            # budget (powerlaw_1m: 27% spill) is better served by the EHYB
            # body absorbing hubs via long-row extraction + density sort.
            # 10% is a conservative provisional bound (the crossover needs
            # hardware measurement); EHYB_ROUTE_SPILL_MAX overrides.
            nnz_spill = sum(b.stats.get("nnz_spill", 0)
                            for b in routed.blocks)
            spill_max = float(os.environ.get("EHYB_ROUTE_SPILL_MAX", "0.10"))
            if nnz_spill > spill_max * max(m.nnz, 1):
                log.info("routed schedule spills %.1f%% of nnz (> %.0f%% "
                         "veto) — keeping the EHYB body",
                         100 * nnz_spill / m.nnz, 100 * spill_max)
                self._save_gate_decision(m, False)
                return None
            # verdict saved only once the build SUCCEEDED: a True marker
            # written before a minutes-long build that then dies (timeout,
            # per-block infeasibility) would wedge every warm run
            self._save_gate_decision(m, "routed")
            return routed
        except ValueError as exc:            # too dense for the router
            log.info("gather-wall structure (group fill %.1f) but routed "
                     "infeasible (%s); keeping the EHYB body", fill, exc)
            self._save_gate_decision(m, False)
            return None

    def setup(self, m: MatrixCOO) -> "EhybSpmv":
        mode = self._pallas_mode()
        if mode:
            from ..config import WINDOW_ALIGN

            # Multi-window layout: per-tile window selection subsumes the
            # partition-window constraint; window_rows stays at the native
            # 1024-span for planner/reorder purposes.
            layout = self.config.body_layout \
                if self.config.body_layout in ("sell_cs", "sell_rx") \
                else "sell_mw"
            feats = self.config.features
            if layout == "sell_mw" and feats.sort_mode == "density":
                feats = dataclasses.replace(feats, sort_mode="pattern")
            from ..ops.ehyb_pallas import SUBTILES, TILE_STEPS

            # Column stream dtype: window-local columns fit int16 (the
            # reference's own choice, spmv.h:46), halving the index stream.
            # MEASURED round 5 (VERDICT r4 next #2): probe_gather2 at
            # production tile geometry times the ISOLATED int16→int32 widen
            # at ~8.75 cyc/vreg (i16col 18.26 vs i32col 9.51 cyc/1024nnz,
            # the i32 stream saturating HBM at 809 GB/s) — but the
            # end-to-end production A/B is a wash (random_16k 50.7 vs 50.1,
            # pp512 67.1 vs 67.9 GFLOP/s): the widen hides behind the rx
            # select chain and accumulator work on the other VPU ports.
            # int16 stays (fewer bytes at equal rate); EHYB_IDX32=1 flips
            # for re-measurement.
            idx_dtype = self.config.index_dtype
            if (idx_dtype == "int32" and WINDOW_ALIGN <= 32768
                    and os.environ.get("EHYB_IDX32", "") != "1"):
                idx_dtype = "int16"
            # Sliding 128-aligned windows need the VMEM-resident kernel (the
            # windowed-BlockSpec fallback requires 1024-aligned windows).
            from ..ops.ehyb_pallas import X_RESIDENT_BYTES

            sliding = self.config.sliding_windows
            if sliding is None:
                x_bytes = (round_up(m.dimension, LANES) + WINDOW_ALIGN) \
                    * np.dtype(self.config.dtype).itemsize
                # Resident: every streamed/tile kernel takes 128-aligned
                # windows.  Non-resident: the HBM window-cache body does too
                # — allow sliding when its packed slot map will fit SMEM
                # (estimated pre-conversion; ~1.5x nnz/1024 sub-tiles).
                est_sub_bytes = 4 * int(1.5 * m.nnz / (LANES * 8))
                sliding = (x_bytes <= X_RESIDENT_BYTES
                           or est_sub_bytes <= 800 * 1024)
            self.config = dataclasses.replace(
                self.config, window_rows=WINDOW_ALIGN, body_layout=layout,
                width_align=SUBTILES * TILE_STEPS, index_dtype=idx_dtype,
                sliding_windows=sliding, features=feats)
        try:
            super().setup(m)
        except _DelegateToRouted as d:
            return d.model
        self._use_pallas = bool(mode)
        if self._use_pallas:
            from ..ops.ehyb_pallas import (X_RESIDENT_BYTES,
                                           make_ehyb_pallas_apply,
                                           pad_stream_arrays,
                                           stream_body_fits)

            # The v3 streamed body (256-step tiles + partials/segment-sum) is
            # the default whenever it applies: measured +35-68% over the
            # per-slice tile path across the scattered corpus in const mode
            # and 2.6x in the HBM-streaming regime (flat ~240ns/grid-step at
            # 24KB tiles — see scripts/probe_blockspec_windows.py).
            # EHYB_STREAM_BODY=0 selects the per-slice v2 path.
            # stream_body_fits MUST gate the padding: if the streamed path
            # were declined after padding, the fallback applies would index
            # unpadded step maps against padded ell arrays and crash at trace
            # time (advisor finding, round 1).
            # Residency no longer gates streaming: beyond X_RESIDENT_BYTES
            # the HBM window-cache variant serves the same padded stream
            # (make_ehyb_pallas_apply picks resident vs hbm by x size).
            streaming = (os.environ.get("EHYB_STREAM_BODY", "") != "0"
                         and self.ehyb.stats.get("nnz_ell", 0) > 0
                         and stream_body_fits(
                             self.ehyb,
                             np.dtype(self.config.dtype).itemsize))
            if streaming:
                col_p, val_p = pad_stream_arrays(
                    self.ehyb, np.dtype(self.config.dtype).itemsize)
                self.dev = dataclasses.replace(
                    self.dev, ell_col=jax.numpy.asarray(col_p),
                    ell_val=jax.numpy.asarray(val_p, dtype=self.config.dtype))

            dia_apply = None
            if self._args_mode and len(self.dev.dia_offsets):
                # HBM-streaming regime: the XLA shifted-slice DIA materializes
                # every term through HBM (measured 11% of roofline on
                # audikw_1-class) — use the Pallas DIA kernel with x resident
                # in VMEM and the packed blocked dval layout.
                from ..ops.dia_pallas import make_dia_pallas_apply, pack_dia

                try:
                    dia_apply = make_dia_pallas_apply(
                        self.dev.dia_offsets, self.ehyb.dia_val.shape[1],
                        self.config.dtype, interpret=(mode == "interpret"))
                except ValueError as exc:
                    # e.g. streamed DIA with offset span > block_rows: keep
                    # the XLA shifted-slice fallback
                    log.warning("pallas DIA unavailable (%s); XLA DIA", exc)
                    dia_apply = None
                if dia_apply is not None:
                    packed, _ = pack_dia(np.asarray(self.ehyb.dia_val))
                    self.dev = dataclasses.replace(
                        self.dev, dia_val=jax.numpy.asarray(packed))
                    self._dia_apply = dia_apply  # phase_breakdown introspection
            self._pallas_apply = make_ehyb_pallas_apply(
                self.ehyb, self.config, interpret=(mode == "interpret"),
                dia_apply=dia_apply, streaming=streaming)
        return self

    def apply(self, x_dev: jax.Array) -> jax.Array:
        return self.apply_operands(None, x_dev)

    def apply_operands(self, operands, x_dev):
        if getattr(self, "_use_pallas", False):
            dev = operands if operands is not None else self.dev
            return self._pallas_apply(dev, x_dev)
        return super().apply_operands(operands, x_dev)


class HybSpmv(EhybXlaSpmv):
    """Plain HYB ablation: no windows (single whole-matrix window), optional
    density sort.  Equivalent to CACHE=off in the reference's flag scheme
    (``spmv.h:10``)."""

    name = "hyb"

    def setup(self, m: MatrixCOO) -> "HybSpmv":
        cfg = dataclasses.replace(
            self.config,
            window_rows=round_up(m.dimension, 1024),
            min_parts=1,
            features=dataclasses.replace(self.config.features,
                                         reorder=False, cache=False),
        )
        self.config = cfg
        return super().setup(m)
