"""Multi-chip sharded EHYB tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from ehyb_spmv_gpu_tpu.config import EhybConfig
from ehyb_spmv_gpu_tpu.core.coo import deterministic_x, oracle_spmv
from ehyb_spmv_gpu_tpu.io import generate
from ehyb_spmv_gpu_tpu.parallel.spmv import ShardedEhybSpmv, AXIS
from ehyb_spmv_gpu_tpu.utils.validate import rel_error


def make_mesh(n):
    devs = np.array(jax.devices()[:n])
    return jax.sharding.Mesh(devs, (AXIS,))


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_matches_oracle(n_dev, poisson_mid):
    m = poisson_mid
    cfg = EhybConfig(window_rows=1024)
    model = ShardedEhybSpmv(cfg, mesh=make_mesh(n_dev)).setup(m)
    x = deterministic_x(m.dimension)
    y = model.matvec(x)
    assert rel_error(y, oracle_spmv(m, x)) < 5e-6


def test_sharded_scrambled_with_er(scrambled):
    cfg = EhybConfig(window_rows=1024)
    model = ShardedEhybSpmv(cfg, mesh=make_mesh(8)).setup(scrambled)
    x = deterministic_x(scrambled.dimension)
    y = model.matvec(x)
    assert rel_error(y, oracle_spmv(scrambled, x)) < 5e-6
    # sanity: multiple devices actually carry ER entries
    per_dev = model.sharded.stats["per_dev"]
    assert sum(s["nnz_er"] for s in per_dev) > 0


def test_sharded_powerlaw_long_rows():
    m = generate.with_dense_rows(
        generate.random_general(4000, 8, seed=7), 2, density=0.7, seed=8)
    cfg = EhybConfig(window_rows=1024, long_row_threshold=64)
    model = ShardedEhybSpmv(cfg, mesh=make_mesh(4)).setup(m)
    x = deterministic_x(m.dimension)
    y = model.matvec(x)
    assert rel_error(y, oracle_spmv(m, x)) < 1e-5
    per_dev = model.sharded.stats["per_dev"]
    assert sum(s["n_long_rows"] for s in per_dev) >= 1


def test_sharded_dim_not_multiple_of_devices():
    m = generate.poisson2d(45)  # dim 2025, awkward vs 8 devices * 128
    cfg = EhybConfig(window_rows=1024)
    model = ShardedEhybSpmv(cfg, mesh=make_mesh(8)).setup(m)
    x = deterministic_x(m.dimension)
    assert rel_error(model.matvec(x), oracle_spmv(m, x)) < 5e-6


def test_sharded_iterate(poisson_small):
    cfg = EhybConfig(window_rows=1024)
    model = ShardedEhybSpmv(cfg, mesh=make_mesh(2)).setup(poisson_small)
    x = model.prepare_x(deterministic_x(poisson_small.dimension))
    y1 = model.apply(x)
    y3 = model.iterate(x, 3, eps=0.0)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y3))


def test_sharded_sell_mw_layout(scrambled_mesh_4=None):
    """Regression (code review): sell_mw under sharding crashed or silently
    packed body windows outside the ±W halo because shard-local negative
    columns produced negative window chunks.  body_col_range now forces
    off-halo columns to the globally-gathered ER tail."""
    import numpy as np
    import jax
    import ehyb_spmv_gpu_tpu as ehyb
    from ehyb_spmv_gpu_tpu.config import EhybConfig
    from ehyb_spmv_gpu_tpu.core.coo import deterministic_x, oracle_spmv
    from ehyb_spmv_gpu_tpu.io import generate
    from ehyb_spmv_gpu_tpu.parallel.spmv import AXIS, ShardedEhybSpmv
    from ehyb_spmv_gpu_tpu.utils.validate import rel_error

    m = generate.permuted(generate.poisson2d(48), seed=11)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), (AXIS,))
    for cfg in (EhybConfig(window_rows=1024, body_layout="sell_mw"),
                EhybConfig(window_rows=1024, er_slice_rows=64)):
        model = ShardedEhybSpmv(cfg, mesh=mesh).setup(m)
        x = deterministic_x(m.dimension)
        err = rel_error(model.matvec(x), oracle_spmv(m, x))
        assert err < 5e-6, (cfg.body_layout, cfg.er_slice_rows, err)


def test_exchange_bytes_proportional_to_cut(scrambled, poisson_mid):
    """VERDICT r1 #4 done-criterion: the ER/long collective moves bytes
    proportional to the actual cut, not the dimension."""
    # banded matrix kept in natural order: every column is within the +-W
    # halo -> NO exchange (the partition reorder may scatter a few rows, so
    # pin identity ordering for the zero-cut case)
    import dataclasses
    cfg0 = EhybConfig(window_rows=1024)
    cfg0 = dataclasses.replace(
        cfg0, features=dataclasses.replace(cfg0.features, reorder=False))
    banded = ShardedEhybSpmv(cfg0, mesh=make_mesh(8)).setup(poisson_mid)
    assert banded.sharded.exchange_slots == 0
    cfg = EhybConfig(window_rows=1024)

    # scrambled matrix: exchange sized by the worst per-pair request list,
    # far below the all_gather's per-device R*(D-1) payload
    scr = ShardedEhybSpmv(cfg, mesh=make_mesh(8)).setup(scrambled)
    sh = scr.sharded
    D, R, S = sh.n_dev, sh.rows_per_dev, sh.exchange_slots
    req = np.array(sh.stats["req_sizes"])
    assert S == req.max()
    # every request must be covered (correctness already checked elsewhere)
    # and the payload must be a small fraction of the all_gather volume
    allgather_floats = (D - 1) * R
    exchange_floats = D * S
    assert exchange_floats < 0.5 * allgather_floats, (
        exchange_floats, allgather_floats)
    # received floats bounded by the true off-halo column count per device
    per_dev = sh.stats["per_dev"]
    total_er_long = sum(s["nnz_er"] + s["nnz_long"] for s in per_dev)
    assert req.sum() <= total_er_long


def test_exchange_collective_does_not_scale_with_dim():
    """Growing dim with a fixed scrambled cut pattern must not grow the
    collective payload the way all_gather's D*R does."""
    cfg = EhybConfig(window_rows=1024)
    sizes = {}
    for k in (32, 64):
        m = generate.permuted(generate.poisson2d(k), seed=5)
        model = ShardedEhybSpmv(cfg, mesh=make_mesh(4)).setup(m)
        sh = model.sharded
        sizes[k] = (sh.rows_per_dev, sh.exchange_slots)
    (r32, s32), (r64, s64) = sizes[32], sizes[64]
    assert r64 >= 4 * r32  # dim grew 4x
    # a scrambled stencil's cut grows ~linearly in nnz; what matters is the
    # exchange stays well under the shard span the all_gather would move
    assert s64 < r64, sizes


def test_sharded_pallas_body_interpret(poisson_mid, monkeypatch):
    """VERDICT r1 #3: the fused Pallas streamed body runs inside the SPMD
    shard (interpret mode on the CPU mesh) and matches the oracle."""
    monkeypatch.setenv("EHYB_FORCE_PALLAS", "interpret")
    cfg = EhybConfig(window_rows=1024)
    # shards must span >= one full 1024-row window: dim 4096 over 2 devices
    model = ShardedEhybSpmv(cfg, mesh=make_mesh(2)).setup(poisson_mid)
    assert model._body_mode == "interpret"
    assert model.sharded.stream is not None
    # the overlap split actually has both parts on a banded matrix
    st = model.sharded.stream
    assert st["maskA"].sum() > 0 and st["maskB"].sum() > 0
    x = deterministic_x(poisson_mid.dimension)
    assert rel_error(model.matvec(x), oracle_spmv(poisson_mid, x)) < 5e-6


def test_sharded_pallas_body_scrambled(scrambled, monkeypatch):
    monkeypatch.setenv("EHYB_FORCE_PALLAS", "interpret")
    cfg = EhybConfig(window_rows=1024)
    model = ShardedEhybSpmv(cfg, mesh=make_mesh(2)).setup(scrambled)
    assert model._body_mode == "interpret"
    x = deterministic_x(scrambled.dimension)
    assert rel_error(model.matvec(x), oracle_spmv(scrambled, x)) < 5e-6


def test_multiprocess_two_hosts():
    """SURVEY §4 / VERDICT r1 #5: two OS processes under jax.distributed
    drive the full distributed pipeline and validate against the oracle.
    Runs scripts/multihost.py (subprocess isolation: jax.distributed can
    only initialize once per process)."""
    import subprocess
    import sys
    import os

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "multihost.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    r = subprocess.run(
        [sys.executable, script, "--procs", "2", "--devs-per-proc", "2"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "MULTIHOST OK" in r.stdout, r.stdout[-2000:]


def test_sharded_pallas_body_kahan(poisson_mid, monkeypatch):
    monkeypatch.setenv("EHYB_FORCE_PALLAS", "interpret")
    cfg = EhybConfig(window_rows=1024, compensated_sum=True)
    model = ShardedEhybSpmv(cfg, mesh=make_mesh(2)).setup(poisson_mid)
    assert model._body_mode == "interpret"
    x = deterministic_x(poisson_mid.dimension)
    assert rel_error(model.matvec(x), oracle_spmv(poisson_mid, x)) < 5e-6


def test_sharded_rx_auto_switch(scrambled, monkeypatch):
    """The sharded path mirrors the flagship's relaxed auto-switch (must be
    SPMD-uniform) and runs the rx streamed kernel in-shard."""
    monkeypatch.setenv("EHYB_FORCE_PALLAS", "interpret")
    model = ShardedEhybSpmv(EhybConfig(window_rows=1024),
                            mesh=make_mesh(2)).setup(scrambled)
    assert model.config.body_layout == "sell_rx"
    assert model.sharded.stream["nwin"] > 1  # dual or quad windows in-shard
    x = deterministic_x(scrambled.dimension)
    assert rel_error(model.matvec(x), oracle_spmv(scrambled, x)) < 5e-6


def test_sharded_rx_xla_fallback(scrambled):
    """Explicit sell_rx without Pallas (CPU): the XLA body decodes the
    packed lo-slot indices through the sharded path."""
    model = ShardedEhybSpmv(EhybConfig(window_rows=1024,
                                       body_layout="sell_rx"),
                            mesh=make_mesh(4)).setup(scrambled)
    assert model.sharded.stats["layout"] == "sell_rx"
    x = deterministic_x(scrambled.dimension)
    assert rel_error(model.matvec(x), oracle_spmv(scrambled, x)) < 5e-6


def test_sharded_row_split_disabled_per_shard():
    """Regression (advisor r2): sell_rx + row_split_threshold > 0 through the
    sharded path silently dropped the synthetic overflow rows' partial sums
    (_shard_body carries no fold-back maps).  build_sharded now forces
    row_split_threshold=0 per shard; the result must match the oracle."""
    m = generate.with_dense_rows(
        generate.random_general(3000, 10, seed=13), 2, density=0.5, seed=14)
    cfg = EhybConfig(window_rows=1024, body_layout="sell_rx",
                     row_split_threshold=4)
    model = ShardedEhybSpmv(cfg, mesh=make_mesh(4)).setup(m)
    for s in model.sharded.stats["per_dev"]:
        assert s.get("n_split_rows", 0) == 0
    x = deterministic_x(m.dimension)
    assert rel_error(model.matvec(x), oracle_spmv(m, x)) < 1e-5


def test_sharded_d16_virtual():
    """VERDICT r2 next #9: the vectorized owner-major exchange-plan build
    validated on a 16-device virtual mesh (subprocess: the suite's own
    process is pinned to 8 virtual devices)."""
    import os
    import subprocess
    import sys

    code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from ehyb_spmv_gpu_tpu.config import EhybConfig
from ehyb_spmv_gpu_tpu.core.coo import deterministic_x, oracle_spmv
from ehyb_spmv_gpu_tpu.io import generate
from ehyb_spmv_gpu_tpu.parallel.spmv import ShardedEhybSpmv, AXIS
from ehyb_spmv_gpu_tpu.utils.validate import rel_error
m = generate.permuted(generate.poisson2d(128), seed=5)  # 16384 rows
mesh = jax.sharding.Mesh(np.array(jax.devices()), (AXIS,))
model = ShardedEhybSpmv(EhybConfig(window_rows=1024), mesh=mesh).setup(m)
assert model.sharded.n_dev == 16
x = deterministic_x(m.dimension)
err = rel_error(model.matvec(x), oracle_spmv(m, x))
assert err < 5e-6, err
print("D16 OK", err)
"""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=420, env=env, cwd=repo)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "D16 OK" in r.stdout


def test_sharded_quad_windows(monkeypatch):
    """Quad (4-window) sub-tiles through the sharded streamed kernels: a
    random matrix that spreads over many windows upgrades per shard
    (SPMD-uniform) and validates against the oracle."""
    m = generate.random_general(8192, 24, seed=3)
    monkeypatch.setenv("EHYB_FORCE_PALLAS", "interpret")
    model = ShardedEhybSpmv(EhybConfig(window_rows=1024),
                            mesh=make_mesh(4)).setup(m)
    assert model.config.windows_per_subtile == 4
    assert model.sharded.stream["nwin"] == 4
    x = deterministic_x(m.dimension)
    assert rel_error(model.matvec(x), oracle_spmv(m, x)) < 5e-6


def test_check_vma_enabled_gating(monkeypatch):
    """The vma escape hatch is scoped: compiled paths verify collectives
    (check_vma=True), the pallas interpreter keeps the hatch, and
    EHYB_CHECK_VMA=0 force-disables (hardware insurance knob)."""
    from ehyb_spmv_gpu_tpu.parallel.spmv import check_vma_enabled
    monkeypatch.delenv("EHYB_CHECK_VMA", raising=False)
    assert check_vma_enabled(interpret=False) is True
    assert check_vma_enabled(interpret=True) is False
    monkeypatch.setenv("EHYB_CHECK_VMA", "0")
    assert check_vma_enabled(interpret=False) is False


def test_sharded_xla_body_runs_under_check_vma(poisson_mid):
    """The XLA-body sharded apply (pallas_meta=None → check_vma=True) must
    trace and validate with vma checking on: every collective in the halo
    exchange names AXIS (VERDICT r2 weak #7 — this is the compiled-path
    verification the escape hatch used to skip)."""
    import os
    assert os.environ.get("EHYB_CHECK_VMA", "1") != "0"
    m = poisson_mid
    model = ShardedEhybSpmv(EhybConfig(window_rows=1024),
                            mesh=make_mesh(8)).setup(m)
    x = deterministic_x(m.dimension)
    assert rel_error(model.matvec(x), oracle_spmv(m, x)) < 5e-6


def test_sharded_degree_split_matches_oracle():
    """VERDICT r3 next #9: the degree-split hybrid composed over the mesh —
    sharded EHYB body on dense rows + sharded routed tail on the remainder,
    one device add in the shared permuted space."""
    from ehyb_spmv_gpu_tpu.parallel.hybrid import ShardedDegreeSplitSpmv

    m = generate.random_general(6144, 24, seed=4, power_law=0.7)
    model = ShardedDegreeSplitSpmv(
        EhybConfig(window_rows=1024, artifact_cache=False),
        mesh=make_mesh(4)).setup(m, threshold=32)
    # both sub-engines actually carry work
    assert model.e.m.nnz > 0 and model.r.m.nnz > 0
    assert model.e.m.nnz + model.r.m.nnz == m.nnz
    x = deterministic_x(m.dimension)
    assert rel_error(model.matvec(x), oracle_spmv(m, x)) < 1e-5
    assert model.bytes_model() > 0


def test_sharded_degree_split_iterate():
    """The tuple-x chained-iteration path (bench protocol) does not drift
    at eps=0 and agrees with the one-shot apply.

    Chained repeats of the SAME compiled program must be bit-identical
    (n=2 vs n=3: the fori body reruns on bit-identical input).  apply()
    vs iterate() are two separately compiled XLA programs, and XLA's
    fusion-context-dependent FMA contraction may differ between them at
    the last ulp (observed on the CPU interpret path when the routed
    kernel's inlined graph changed shape in round 5) — across programs
    the contract is fp tolerance, not bit equality."""
    from ehyb_spmv_gpu_tpu.parallel.hybrid import ShardedDegreeSplitSpmv

    m = generate.random_general(4096, 24, seed=6, power_law=0.7)
    model = ShardedDegreeSplitSpmv(
        EhybConfig(window_rows=1024, artifact_cache=False),
        mesh=make_mesh(2)).setup(m, threshold=32)
    x_dev = model.prepare_x(deterministic_x(m.dimension))
    y2 = model.iterate(x_dev, 2, eps=0.0)
    y3 = model.iterate(x_dev, 3, eps=0.0)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y3))
    y1 = np.asarray(model.apply(x_dev), dtype=np.float64)
    d = np.abs(y1 - np.asarray(y3, dtype=np.float64))
    denom = max(float(np.abs(y1).max()), 1e-30)
    assert float(d.max()) / denom < 1e-6
