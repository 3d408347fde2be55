"""Routing-engine tests (core/route.py + ops/route_pallas.py + models/routed).

The routed format covers the gather-wall regime — fully unstructured
matrices where the EHYB window machinery has nothing to cache and the
reference leans on hardware global-memory gathers
(``/root/reference/kernel.cu:169-194``).  Strategy mirrors the EHYB
conversion tests: structural invariants on the host-side schedules, then
oracle parity through the interpret-mode Pallas kernels.
"""
import os

import numpy as np
import pytest

from ehyb_spmv_gpu_tpu.config import EhybConfig
from ehyb_spmv_gpu_tpu.core.coo import MatrixCOO, deterministic_x, oracle_spmv
from ehyb_spmv_gpu_tpu.core.route import (
    MAX_COLORS, TS, WIN, build_routed, _choose_params)
from ehyb_spmv_gpu_tpu.io import generate


def _random_coo(dim, k, seed=11):
    rng = np.random.default_rng(seed)
    row = np.repeat(np.arange(dim), k)
    col = rng.integers(0, dim, dim * k)
    key = row.astype(np.int64) * dim + col
    _, ui = np.unique(key, return_index=True)
    row, col = row[ui], col[ui]
    val = rng.standard_normal(row.size)
    return MatrixCOO(n_rows=dim, n_cols=dim, row=row.astype(np.int32),
                     col=col.astype(np.int32), val=val)


class TestChooseParams:
    def test_random_1m_geometry_feasible(self):
        # the adversarial corpus entry: 2^20 rows, ~16 nnz/row
        n_win, R, P = _choose_params(1 << 20, 1 << 20, 16 << 20, None, None)
        assert n_win * P % WIN == 0
        assert n_win * P // WIN <= 16
        assert n_win >= (1 << 20) // WIN

    def test_non_multiple_dim_pads_windows(self):
        # dim = 1e6 -> 977 raw windows; padding must make n_win*P % 1024 == 0
        n_win, R, P = _choose_params(1_000_000, 1_000_000, 16_000_000,
                                     None, None)
        assert n_win * P % WIN == 0
        assert n_win >= 977

    def test_too_dense_raises(self):
        with pytest.raises(ValueError):
            _choose_params(1 << 20, 1 << 20, 200 << 20, None, None)

    def test_block_geometry_scales_r_up(self):
        # column-block instance: 16.7M rows x 1M cols, 1 nnz/row — the cells
        # stay ~half full only with a large R
        n_win, R, P = _choose_params(1 << 24, 1 << 20, 1 << 24, None, None)
        assert n_win * P // WIN <= 16
        mu = R * 1.0 / n_win
        assert mu >= 0.4 * P, (R, P, mu)


class TestBuildInvariants:
    @pytest.fixture(scope="class")
    def rm_and_m(self):
        m = _random_coo(16384, 8)
        return build_routed(m), m

    def test_nnz_conserved(self, rm_and_m):
        rm, m = rm_and_m
        assert rm.stats["nnz_routed"] + rm.stats["nnz_spill"] == m.nnz

    def test_low_spill(self, rm_and_m):
        # the edge colorer should route essentially everything on a random
        # matrix (König: Δ colors suffice; budget is MAX_COLORS=64)
        rm, m = rm_and_m
        assert rm.stats["nnz_spill"] <= 0.01 * m.nnz

    def test_stage_b_schedule_is_proper_coloring(self, rm_and_m):
        # decode b_idx back: per dst step no source lane may carry two
        # different (sel, srow) attributions, and every non-masked dst lane
        # names a source lane
        rm, _ = rm_and_m
        bi = rm.b_idx.astype(np.int32)
        mask = (bi >> 14) & 1
        assert mask.shape == (rm.b_idx.shape[0], 128)
        # masked positions may still carry slot attrs; unmasked = dst lanes
        assert (mask == 0).sum() == rm.stats["nnz_routed"]

    def test_values_conserved(self, rm_and_m):
        # the invariant a_val + sp_val == total holds only without stage-B
        # spill: B-spilled entries keep their (masked, never-accumulated)
        # product in the A stream AND ride the tail — assert the
        # precondition so a future fixture change fails loudly, not
        # mysteriously
        rm, m = rm_and_m
        assert rm.stats["spill_b"] == 0, rm.stats
        total = np.float64(rm.a_val.sum()) + np.float64(rm.sp_val.sum())
        assert np.isclose(total, np.float64(np.sum(m.val)), rtol=1e-5)

    def test_dst_rows_is_permutation(self, rm_and_m):
        rm, _ = rm_and_m
        assert np.array_equal(np.sort(rm.dst_rows),
                              np.arange(rm.n_dst_rows))

    def test_widths_within_budget(self, rm_and_m):
        rm, _ = rm_and_m
        # every slice's sub-tile count is bounded by the color budget
        assert rm.b_idx.shape[0] % TS == 0


class TestGroupGeometry:
    def test_search_bounds(self):
        from ehyb_spmv_gpu_tpu.core.route import (
            MAX_BANDS_PER_BLOCK, _choose_group_geometry)

        rng = np.random.default_rng(3)
        for steps in (np.full(100, 88), rng.integers(4, 40, 500) * 8,
                      np.array([8]), np.array([4000, 8, 8, 8])):
            c, s_b = _choose_group_geometry(np.asarray(steps, dtype=np.int64))
            assert 1 <= c <= MAX_BANDS_PER_BLOCK
            assert s_b % 8 == 0 and 8 <= s_b <= 96


class TestColorerQuality:
    def test_stage_a_spill_near_poisson_floor(self):
        # random_1m regime scaled down (dim 2^17, k=16; R=128 keeps the cell
        # occupancy mu=16 under P=32 — the same 2x Poisson slack as the 1M
        # geometry): the class-aware colorer must leave only the structural
        # cell overflow (~0.1%), where the round election left ~8x that
        m = _random_coo(1 << 17, 16, seed=21)
        rm = build_routed(m, R=128, P=32)
        assert rm.stats["chain"] <= 16
        assert rm.stats["nnz_spill"] <= 0.003 * m.nnz, rm.stats


class TestOracleParity:
    @pytest.mark.parametrize("dim,k,seed", [(4096, 8, 3), (8192, 4, 5)])
    def test_random_matrix(self, dim, k, seed):
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = _random_coo(dim, k, seed)
        x = deterministic_x(dim)
        y_ref = oracle_spmv(m, x)
        model = RoutedSpmv(EhybConfig(artifact_cache=False)).setup(m)
        y = model.recover_y(model.apply(model.prepare_x(x)))
        rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel

    def test_structured_matrix_also_correct(self, poisson_mid):
        # the router is built for unstructured matrices but must stay
        # correct on anything square
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = poisson_mid
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        model = RoutedSpmv(EhybConfig(artifact_cache=False)).setup(m)
        y = model.recover_y(model.apply(model.prepare_x(x)))
        rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel

    def test_powerlaw_rows_spill_but_stay_correct(self):
        # heavy rows exceed the MAX_COLORS lane budget -> spill tail must
        # absorb them exactly
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = generate.random_general(4096, 12, seed=9, power_law=0.8)
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        model = RoutedSpmv(EhybConfig(artifact_cache=False)).setup(m)
        y = model.recover_y(model.apply(model.prepare_x(x)))
        rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel


class TestOddGeometries:
    @pytest.mark.parametrize("dim,k,seed,empty_frac", [
        (1000, 4, 1, 0.0),      # tiny non-pow2 dim (single window)
        (5000, 7, 2, 0.3),      # empty rows
        (131072, 3, 4, 0.5),    # very sparse, half-empty
    ])
    def test_oracle_parity(self, dim, k, seed, empty_frac):
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        rng = np.random.default_rng(seed)
        rows = np.repeat(np.arange(dim), k)
        if empty_frac:
            live = rng.random(dim) > empty_frac
            rows = rows[np.repeat(live, k)]
        col = rng.integers(0, dim, rows.size)
        _, ui = np.unique(rows.astype(np.int64) * dim + col,
                          return_index=True)
        m = MatrixCOO(n_rows=dim, n_cols=dim, row=rows[ui].astype(np.int32),
                      col=col[ui].astype(np.int32),
                      val=rng.standard_normal(ui.size))
        model = RoutedSpmv(EhybConfig(artifact_cache=False)).setup(m)
        x = deterministic_x(dim)
        y_ref = oracle_spmv(m, x)
        rel = np.linalg.norm(model.matvec(x) - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel


class TestOctetLayout:
    def test_octet_engages_and_matches_oracle(self):
        # thin widths + >=8 slices/band: the octet B layout (8 slices per
        # sub-tile) must engage and stay exact
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        # ~1 nnz/row -> balanced widths ~2-3; with 4 octets per band the
        # octet maxes track the local quantiles (dim large enough that the
        # grid-quantum padding amortizes over 32 bands; P<=64 keeps the
        # native balance colorer engaged — its mask is one uint64)
        m = _random_coo(1 << 17, 1, seed=41)
        rm = build_routed(m, R=4096, P=64)
        assert rm.octet == 1, rm.stats
        # stream must be well below the slice layout's 8-step floor
        assert rm.stats["b_steps"] < 0.7 * (m.dimension // 128) * 8, rm.stats
        model = RoutedSpmv(EhybConfig(artifact_cache=False))
        model.m = m
        model.setup_seconds = {}
        model.ehyb = None
        model.blocks = [rm]
        # hand-assembled (no setup()): rm was built WITHOUT identity_dst, so
        # the scatter epilogue handles the dst mapping and the model-level
        # perm is identity
        model._perm = np.arange(m.dimension, dtype=np.int64)
        from ehyb_spmv_gpu_tpu.ops.route_pallas import make_routed_apply

        model.dev = [rm.to_jax()]
        model._applies = [make_routed_apply(rm, interpret=True)]
        model._lo = [0]
        model._x_rows = None
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        y = model.recover_y(model.apply(model.prepare_x(x)))
        rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel

    def test_wide_widths_keep_slice_layout(self):
        m = _random_coo(1 << 14, 30, seed=43)      # widths ~40+
        rm = build_routed(m, R=1024, P=512)
        assert rm.octet == 0, rm.stats


class TestColumnBlocks:
    def test_block_mode_oracle_parity(self):
        # drive the column-block machinery directly with small ranges (the
        # auto trigger needs multi-million dims): two vertical blocks, each
        # its own routed instance, input-space outputs summed
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = _random_coo(1 << 15, 8, seed=17)
        model = RoutedSpmv(EhybConfig(artifact_cache=False))
        model.m = m
        model.setup_seconds = {}
        model.ehyb = None
        model._setup_blocks(m, [(0, 1 << 14), (1 << 14, 1 << 15)])
        assert len(model.blocks) == 2
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        y = model.recover_y(model.apply(model.prepare_x(x)))
        rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel

    def test_big_dim_triggers_block_mode(self):
        # 2^22 cols x 16/row is past the single-level chain bound
        from ehyb_spmv_gpu_tpu.core.route import _choose_params

        with pytest.raises(ValueError):
            _choose_params(1 << 22, 1 << 22, 16 << 22, None, None)
        # ...but its 1M-col block slices are feasible with an upscaled R
        n_win, R, P = _choose_params(1 << 22, 1 << 20, 4 << 20, None, None)
        assert n_win * P // WIN <= 16
        assert R >= 2048


class TestShardedRouted:
    @pytest.mark.parametrize("n_dev,dim,k", [(8, 1 << 15, 4), (4, 20000, 6)])
    def test_oracle_parity_on_virtual_mesh(self, n_dev, dim, k):
        # one complete routed instance per device, x replicated, outputs
        # concatenated — validated on the virtual CPU mesh like the EHYB
        # sharded path
        import jax

        from ehyb_spmv_gpu_tpu.parallel.routed import ShardedRoutedSpmv
        from ehyb_spmv_gpu_tpu.parallel.spmv import AXIS

        devs = np.array(jax.devices()[:n_dev])
        mesh = jax.sharding.Mesh(devs, (AXIS,))
        m = _random_coo(dim, k, seed=51)
        model = ShardedRoutedSpmv(
            EhybConfig(artifact_cache=False), mesh=mesh).setup(m)
        x = deterministic_x(dim)
        y_ref = oracle_spmv(m, x)
        y = model.recover_y(model.apply(model.prepare_x(x)))
        rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel

    def test_column_block_mode_on_virtual_mesh(self):
        # Past the chain bound (which binds EARLIER sharded: r_sh < dim
        # shrinks R), columns split into vertical blocks; every shard runs
        # every block over its rows and sums the outputs.  block_cols
        # forces the split small enough to exercise on a CPU mesh.
        import jax

        from ehyb_spmv_gpu_tpu.parallel.routed import ShardedRoutedSpmv
        from ehyb_spmv_gpu_tpu.parallel.spmv import AXIS

        dim = 1 << 15
        devs = np.array(jax.devices()[:4])
        mesh = jax.sharding.Mesh(devs, (AXIS,))
        m = _random_coo(dim, 5, seed=77)
        model = ShardedRoutedSpmv(
            EhybConfig(artifact_cache=False), mesh=mesh
        ).setup(m, block_cols=1 << 13)
        assert len([k for k in model.dev if k.startswith("blk3:")]) > 0
        x = deterministic_x(dim)
        y_ref = oracle_spmv(m, x)
        y = model.recover_y(model.apply(model.prepare_x(x)))
        rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel

    def test_column_block_matches_single_block(self):
        # the block split is a pure reorganization: same matrix, same x,
        # identical result up to f32 summation order
        import jax

        from ehyb_spmv_gpu_tpu.parallel.routed import ShardedRoutedSpmv
        from ehyb_spmv_gpu_tpu.parallel.spmv import AXIS

        dim = 1 << 14
        devs = np.array(jax.devices()[:2])
        mesh = jax.sharding.Mesh(devs, (AXIS,))
        m = _random_coo(dim, 6, seed=13)
        x = deterministic_x(dim)
        y1 = ShardedRoutedSpmv(EhybConfig(artifact_cache=False), mesh=mesh
                               ).setup(m)
        y2 = ShardedRoutedSpmv(EhybConfig(artifact_cache=False), mesh=mesh
                               ).setup(m, block_cols=1 << 12)
        a = y1.recover_y(y1.apply(y1.prepare_x(x)))
        b = y2.recover_y(y2.apply(y2.prepare_x(x)))
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)
        assert rel < 1e-6, rel


class TestChainable:
    def test_cg_solves_with_routed_model(self):
        # apply returns input-space y, so the CG loop can chain it like any
        # other model (kernel.cu:288-321 analog)
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv
        from ehyb_spmv_gpu_tpu.models.solver import CgSolver

        rng = np.random.default_rng(13)
        dim = 4096
        # SPD: strictly diagonally dominant symmetric random matrix
        k = 6
        row = np.repeat(np.arange(dim), k)
        col = rng.integers(0, dim, dim * k)
        keep = row != col
        r2 = np.concatenate([row[keep], col[keep], np.arange(dim)])
        c2 = np.concatenate([col[keep], row[keep], np.arange(dim)])
        v2 = np.concatenate([np.full(keep.sum(), -0.1),
                             np.full(keep.sum(), -0.1),
                             np.full(dim, 4.0)])
        key = r2.astype(np.int64) * dim + c2
        o = np.argsort(key, kind="stable")
        key, r2, c2, v2 = key[o], r2[o], c2[o], v2[o]
        first = np.r_[True, key[1:] != key[:-1]]
        seg = np.cumsum(first) - 1
        vals = np.zeros(seg[-1] + 1)
        np.add.at(vals, seg, v2)
        m = MatrixCOO(n_rows=dim, n_cols=dim, row=r2[first].astype(np.int32),
                      col=c2[first].astype(np.int32), val=vals)
        model = RoutedSpmv(EhybConfig(artifact_cache=False)).setup(m)
        b = deterministic_x(dim)
        res = CgSolver(model).solve(b, tol=1e-6, max_iters=300)
        assert res.converged, res
        assert np.linalg.norm(oracle_spmv(m, res.x) - b) \
            <= 1e-5 * np.linalg.norm(b)


class TestDelegation:
    def test_flagship_delegates_on_gather_wall(self):
        # fully unstructured: the flagship's own conversion shows >97% body
        # waste and setup returns the routed engine (reference parity: one
        # driver covers every regime, kernel.cu:169-194)
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = _random_coo(1 << 17, 3, seed=31)
        model = EhybSpmv(EhybConfig(artifact_cache=False)).setup(m)
        assert isinstance(model, RoutedSpmv), type(model)
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        rel = np.linalg.norm(model.matvec(x) - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel

    def test_structured_matrix_keeps_ehyb_body(self, poisson_mid):
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        model = EhybSpmv(EhybConfig(artifact_cache=False)).setup(poisson_mid)
        assert not isinstance(model, RoutedSpmv)

    def test_delegation_fires_on_warm_ehyb_cache(self, tmp_path):
        # a pre-delegation run (routed_delegate='never') leaves cached EHYB
        # artifacts; the next 'auto' run must still delegate from the
        # cache-hit path, not silently keep the collapsed body
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = _random_coo(1 << 17, 3, seed=31)
        cold = EhybSpmv(EhybConfig(
            artifact_cache=True, cache_dir=str(tmp_path),
            routed_delegate="never")).setup(m)
        assert not isinstance(cold, RoutedSpmv)
        warm = EhybSpmv(EhybConfig(
            artifact_cache=True, cache_dir=str(tmp_path))).setup(m)
        assert isinstance(warm, RoutedSpmv), type(warm)

    def test_permuted_stencil_on_xla_path_keeps_ehyb_body(self):
        # On the XLA path (body_layout stays plain — no pick_ordering), the
        # partition ordering makes a permuted stencil look gather-wall
        # (observed fill 2.0 on permuted_poisson_4096 where the RCM ordering
        # gives 91.8); the gate must re-sample under RCM and keep the EHYB
        # body — its contract says a recoverable stencil never delegates.
        from ehyb_spmv_gpu_tpu.io import generate
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = generate.permuted(generate.poisson2d(512), seed=11)
        assert m.dimension >= (1 << 16) and m.nnz >= (1 << 18)  # gate-sized
        model = EhybSpmv(EhybConfig(artifact_cache=False)).setup(m)
        assert not isinstance(model, RoutedSpmv), type(model)
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        rel = np.linalg.norm(model.matvec(x) - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel

    def test_gate_decision_cached_by_matrix(self, tmp_path, monkeypatch):
        # The RCM re-check verdict is cached by matrix fingerprint: the
        # second setup must not re-pay the RCM BFS — its artifact hit
        # carries the RCM-adopted ordering, whose high fill returns early
        # (asserted by making rcm_order explode on the warm run).
        from ehyb_spmv_gpu_tpu.io import generate
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv
        import ehyb_spmv_gpu_tpu.core.ordering as co

        m = generate.permuted(generate.poisson2d(512), seed=11)
        cfg = EhybConfig(artifact_cache=True, cache_dir=str(tmp_path))
        model = EhybSpmv(cfg).setup(m)
        assert not isinstance(model, RoutedSpmv)
        markers = [p for p in os.listdir(tmp_path) if "-gate" in p]
        assert markers, os.listdir(tmp_path)

        def boom(*a, **k):
            raise AssertionError("RCM BFS re-paid on warm run")

        monkeypatch.setattr(co, "rcm_order", boom)
        model2 = EhybSpmv(cfg).setup(m)
        assert not isinstance(model2, RoutedSpmv)

    def test_cached_gate_verdict_skips_ordering(self, tmp_path, monkeypatch):
        # a matrix the gate already judged gather-wall delegates from the
        # PRE-order hook on warm runs — pick_ordering/partition must not
        # run (random_4m paid ~280 s of warm setup for an ordering the
        # routed engine never uses)
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv
        import ehyb_spmv_gpu_tpu.models.ehyb as me
        import ehyb_spmv_gpu_tpu.core.ordering as co

        m = _random_coo(1 << 17, 3, seed=31)
        cfg = EhybConfig(artifact_cache=True, cache_dir=str(tmp_path))
        cold = EhybSpmv(cfg).setup(m)
        assert isinstance(cold, RoutedSpmv)

        def boom(*a, **k):
            raise AssertionError("ordering chain paid on warm delegation")

        monkeypatch.setattr(co, "pick_ordering", boom)
        monkeypatch.setattr(me, "partition_rows", boom)
        warm = EhybSpmv(cfg).setup(m)
        assert isinstance(warm, RoutedSpmv)

    def test_never_flag_disables_delegation(self):
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = _random_coo(1 << 17, 3, seed=31)
        model = EhybSpmv(EhybConfig(
            artifact_cache=False, routed_delegate="never")).setup(m)
        assert not isinstance(model, RoutedSpmv)


class TestIdentityDst:
    """The model pre-permutes by routed_row_perm and builds identity-dst:
    the apply's epilogue is a slice, not an element scatter (the scatter
    was 85% of random_1m's measured runtime on v5e)."""

    def test_setup_builds_identity_dst(self):
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = _random_coo(8192, 6, seed=13)
        model = RoutedSpmv(EhybConfig(artifact_cache=False)).setup(m)
        rm = model.blocks[0]
        assert np.array_equal(rm.dst_rows[: m.dimension],
                              np.arange(m.dimension))
        # the model's perm is a bijection and matches the builder's order
        assert np.array_equal(np.sort(model._perm), np.arange(m.dimension))

    def test_identity_build_matches_permuted_scatter_build(self):
        # same matrix through both epilogues must agree to fp tolerance
        from ehyb_spmv_gpu_tpu.core.route import build_routed
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv
        from ehyb_spmv_gpu_tpu.ops.route_pallas import make_routed_apply

        m = _random_coo(4096, 8, seed=21)
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        model = RoutedSpmv(EhybConfig(artifact_cache=False)).setup(m)
        y_new = model.recover_y(model.apply(model.prepare_x(x)))
        rm_old = build_routed(m)            # legacy: internal sort + scatter
        ap = make_routed_apply(rm_old, interpret=True)
        xp = np.zeros(rm_old.padded_x_rows, dtype=np.float32)
        xp[: m.dimension] = x.astype(np.float32)
        import jax.numpy as jnp
        y_old = np.asarray(ap(rm_old.to_jax(), jnp.asarray(xp)),
                           dtype=np.float64)[: m.dimension]
        assert np.linalg.norm(y_new - y_ref) / np.linalg.norm(y_ref) < 1e-6
        assert np.linalg.norm(y_old - y_ref) / np.linalg.norm(y_ref) < 1e-6

    def test_external_order_keeps_given_space(self):
        # hybrid contract: external_order output space == the given row
        # order (no internal perm), still oracle-exact
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = _random_coo(8192, 6, seed=29)
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        model = RoutedSpmv(EhybConfig(artifact_cache=False),
                           external_order=True).setup(m)
        assert np.array_equal(model._perm, np.arange(m.dimension))
        y = model.recover_y(model.apply(model.prepare_x(x)))
        assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-6


class TestCache:
    def test_roundtrip(self, tmp_path):
        from ehyb_spmv_gpu_tpu.models.routed import (
            RoutedSpmv, _load_routed, _save_routed, _cache_path)

        m = _random_coo(4096, 8, seed=2)
        cfg = EhybConfig(artifact_cache=True, cache_dir=str(tmp_path))
        model = RoutedSpmv(cfg).setup(m)
        path = _cache_path(m, str(tmp_path))
        rm2 = _load_routed(path)
        assert rm2 is not None
        assert np.array_equal(rm2.b_idx, model.routed.b_idx)
        assert np.array_equal(rm2.a_col, model.routed.a_col)
        # second setup must hit the cache
        model2 = RoutedSpmv(cfg).setup(m)
        assert "cache_load" in model2.setup_seconds


class TestDegreeSplitHybrid:
    def _heavy_tail(self, dim, seed=4):
        from ehyb_spmv_gpu_tpu.io import generate
        return generate.random_general(dim, 24, seed=seed, power_law=0.7)

    def test_matches_oracle(self):
        from ehyb_spmv_gpu_tpu.models.hybrid import DegreeSplitSpmv

        m = self._heavy_tail(1 << 14)
        model = DegreeSplitSpmv(EhybConfig(artifact_cache=False)).setup(m)
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        rel = np.linalg.norm(model.matvec(x) - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel
        # iterate (bench protocol) must agree bit-for-bit at eps=0
        y_it = model.recover_y(model.iterate(model.prepare_x(x), 3))
        assert np.array_equal(y_it, model.matvec(x))

    def test_gate_picks_split_on_heavy_tail(self, tmp_path):
        # gather-wall + heavy tail → the flagship returns the hybrid, and
        # the cached verdict delegates the warm run the same way.  Two
        # explicit degree classes: the mean must be low enough that the
        # pooled (slice, window) fill is under the gate at this dimension
        # (fill ~ 128 * mean_deg / (dim/1024)), while the dense class
        # carries enough nnz to justify the split.
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv
        from ehyb_spmv_gpu_tpu.models.hybrid import DegreeSplitSpmv

        dim = 1 << 18
        rng = np.random.default_rng(9)
        deg = np.where(rng.random(dim) < 0.05, 64, 4)
        row = np.repeat(np.arange(dim), deg)
        col = rng.integers(0, dim, row.size)
        _, ui = np.unique(row.astype(np.int64) * dim + col,
                          return_index=True)
        m = MatrixCOO(dim, dim, row[ui].astype(np.int32),
                      col[ui].astype(np.int32),
                      rng.standard_normal(ui.size).astype(np.float32))
        cfg = EhybConfig(artifact_cache=True, cache_dir=str(tmp_path))
        cold = EhybSpmv(cfg).setup(m)
        assert isinstance(cold, DegreeSplitSpmv), type(cold)
        warm = EhybSpmv(cfg).setup(m)
        assert isinstance(warm, DegreeSplitSpmv), type(warm)
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        for mod in (cold, warm):
            rel = np.linalg.norm(mod.matvec(x) - y_ref) \
                / np.linalg.norm(y_ref)
            assert rel < 1e-6, rel

    def test_uniform_random_still_routes(self):
        # no heavy tail → the gate keeps choosing the plain routed engine
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = _random_coo(1 << 17, 3, seed=31)
        model = EhybSpmv(EhybConfig(artifact_cache=False)).setup(m)
        assert isinstance(model, RoutedSpmv), type(model)

    def test_sparse_side_spill_at_floor(self):
        # the split's raison d'etre: the bounded-degree remainder routes
        # near the Poisson floor where routed-alone spills heavily
        from ehyb_spmv_gpu_tpu.models.hybrid import DegreeSplitSpmv

        m = self._heavy_tail(1 << 15)
        model = DegreeSplitSpmv(EhybConfig(artifact_cache=False)).setup(m)
        spill = sum(b.stats.get("nnz_spill", 0) for b in model.r.blocks)
        assert spill < 0.01 * m.nnz, (spill, m.nnz)


class TestSmallGate:
    """VMEM-resident-scale delegation gate: measured A/B instead of the
    structural fill signal (sweep r4: random_16k routed 48.0 vs body 35.8
    GFLOP/s — the old hard size floor left that on the table)."""

    def _small_random(self):
        return _random_coo(1 << 14, 26, seed=7)   # nnz ~ 4.2e5 >= 1<<18

    def _patched(self, cfg, fake_gflops):
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv

        model = EhybSpmv(cfg)
        # instance-only patches: the nested body build inside the A/B is a
        # fresh EhybSpmv and must keep the real (CPU/XLA) mode
        model._pallas_mode = lambda: "1"
        model._measured_gflops = fake_gflops
        return model

    def test_scattered_small_runs_ab_and_picks_winner(self, tmp_path):
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = self._small_random()
        cfg = EhybConfig(artifact_cache=True, cache_dir=str(tmp_path))
        fake = lambda mdl, mm: 48.0 if isinstance(mdl, RoutedSpmv) else 35.8
        out = self._patched(cfg, fake).setup(m)
        assert isinstance(out, RoutedSpmv), type(out)
        # verdict cached: the warm run delegates from the pre-order hook
        # without re-measuring
        def boom(*a, **k):
            raise AssertionError("A/B re-measured on warm run")

        warm = self._patched(cfg, boom).setup(m)
        assert isinstance(warm, RoutedSpmv), type(warm)
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        rel = np.linalg.norm(out.matvec(x) - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel

    def test_body_win_returns_built_body(self, tmp_path):
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv, EhybXlaSpmv
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = self._small_random()
        cfg = EhybConfig(artifact_cache=True, cache_dir=str(tmp_path))
        fake = lambda mdl, mm: 10.0 if isinstance(mdl, RoutedSpmv) else 22.2
        out = self._patched(cfg, fake).setup(m)
        assert isinstance(out, EhybXlaSpmv), type(out)
        assert not isinstance(out, RoutedSpmv)

        def boom(*a, **k):
            raise AssertionError("A/B re-measured on warm run")

        warm = self._patched(cfg, boom).setup(m)
        assert not isinstance(warm, RoutedSpmv), type(warm)
        x = deterministic_x(m.dimension)
        y_ref = oracle_spmv(m, x)
        rel = np.linalg.norm(out.matvec(x) - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, rel

    def test_structured_small_skips_measurement(self):
        # est <= K*floor: the body is kept without ever building/measuring
        from ehyb_spmv_gpu_tpu.io import generate
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = generate.stencil3d(24, points=27)   # dim 13824, nnz 343k
        def boom(*a, **k):
            raise AssertionError("structured matrix measured")

        out = self._patched(EhybConfig(artifact_cache=False), boom).setup(m)
        assert not isinstance(out, RoutedSpmv), type(out)

    def test_cpu_backend_keeps_body(self):
        # without hardware the A/B cannot run; small matrices keep the body
        from ehyb_spmv_gpu_tpu.models.ehyb import EhybSpmv
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = self._small_random()
        out = EhybSpmv(EhybConfig(artifact_cache=False)).setup(m)
        assert not isinstance(out, RoutedSpmv), type(out)

    def test_budget_guard_skips_ab(self, tmp_path, monkeypatch):
        """EHYB_SMALL_GATE_BUDGET below the estimated A/B cost: the gate
        keeps the body WITHOUT building/measuring the candidate, and caches
        the verdict so the estimate is paid once (VERDICT r4 weak #8)."""
        from ehyb_spmv_gpu_tpu.models.routed import RoutedSpmv

        m = self._small_random()
        monkeypatch.setenv("EHYB_SMALL_GATE_BUDGET", "0.001")

        def boom(*a, **k):
            raise AssertionError("A/B measured despite budget guard")

        cfg = EhybConfig(artifact_cache=True, cache_dir=str(tmp_path))
        model = self._patched(cfg, boom)
        out = model.setup(m)
        assert not isinstance(out, RoutedSpmv), type(out)
        # verdict cached as a body win: the warm run skips the estimate too
        assert model._load_gate_decision(m) is False
        warm = self._patched(cfg, boom).setup(m)
        assert not isinstance(warm, RoutedSpmv), type(warm)
