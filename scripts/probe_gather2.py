"""Probe the VPU gather bound itself (VERDICT r3 next #6).

README "The VPU-gather bound": every scattered-but-VMEM-resident matrix sits
at ~46-55% of HBM-frac because the two-stage dynamic_gather body floors at
~14 cyc per (8,128) vreg (1024 nnz), with the stream+FMA floor alone ~5.6.
That bound has untried levers; this probe measures them under one protocol
(same NTILES, same device loop, same measure_loop) and renders an
accept/reject verdict exactly like the MXU probe did:

  * ``i32col``  — f32 values + int32 column stream (the naive layout);
  * ``i16col``  — f32 values + int16 columns (PRODUCTION baseline: the
    converter already emits int16 ell_col, 6 B/nnz);
  * ``bf16val`` — bf16 value stream + int16 columns (4 B/nnz): in-kernel
    bf16→f32 widen, f32 FMA.  Costs ~2^-9 multiplicand rounding (within the
    validator's 1% contract, ``solver_test.c:7-29``, but far above the f32
    pipeline's ~1e-7 — opt-in only);
  * ``packed2`` — TWO nnz per 32-bit lane: columns as 2×u16 fields, values
    as 2×bf16 fields, one (8,128) i32 vreg per stream carrying 2048 nnz
    (3 B/nnz).  Streams halve; the crossbar gathers do NOT (two per packed
    vreg) — this measures whether unpack ALU + halved streams beat the
    baseline once the gather is the floor.

Each variant runs in a subprocess (Mosaic failures can SIGABRT).  Reports
cyc per 1024 nnz (comparable across packings) + effective GB/s of stream
traffic.  Reference analog: the warp-shared-memory gather at
``kernel.cu:160`` costs ~1 cyc/element on GPU hardware; these variants are
the TPU's menu.
"""
import subprocess
import sys

BODY = r'''
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/ehyb_jax_cache")
VARIANT = "{variant}"
W = 8            # window sublanes: x window = (8,128) = 1024 rows
# geometry env-tunable: the default (SUB=8, 24 KB tiles) inflates absolute
# cyc/vreg with flat per-grid-step cost; PROBE_SUB=32 matches the production
# streamed body's 192 KB tiles (STREAM_SUBTILES) for production-relevant
# absolute numbers.  Relative ordering across variants held at both sizes.
SUB = int(__import__("os").environ.get("PROBE_SUB", "8"))
NTILES = int(__import__("os").environ.get("PROBE_NTILES", "2048"))
spt = SUB * 8

rng = np.random.default_rng(0)
x = rng.standard_normal((W, 128)).astype(np.float32)

if VARIANT == "packed2":
    # two nnz per lane: u16 col fields, bf16 val fields
    c0 = rng.integers(0, W * 128, size=(NTILES * spt, 128)).astype(np.uint32)
    c1 = rng.integers(0, W * 128, size=(NTILES * spt, 128)).astype(np.uint32)
    cols = (c1 << 16 | c0).astype(np.int32)
    v0 = rng.standard_normal((NTILES * spt, 128)).astype(np.float32)
    v1 = rng.standard_normal((NTILES * spt, 128)).astype(np.float32)
    vb0 = (v0.view(np.uint32) >> 16).astype(np.uint32)      # bf16 truncate
    vb1 = (v1.view(np.uint32) >> 16).astype(np.uint32)
    vals = (vb1 << 16 | vb0).astype(np.int32)
    val_dt, col_dt = jnp.int32, jnp.int32
    nnz_per_call = NTILES * spt * 128 * 2
    stream_bytes = cols.nbytes + vals.nbytes
else:
    cols32 = rng.integers(0, W * 128, size=(NTILES * spt, 128)).astype(np.int32)
    v = rng.standard_normal((NTILES * spt, 128)).astype(np.float32)
    if VARIANT == "i32col":
        cols, col_dt = cols32, jnp.int32
    else:
        cols, col_dt = cols32.astype(np.int16), jnp.int16
    if VARIANT == "bf16val":
        vals = v.astype(np.float32)  # host side f32; device stream bf16
        val_dt = jnp.bfloat16
        vals = v.astype(jnp.bfloat16)
    else:
        vals, val_dt = v, jnp.float32
    nnz_per_call = NTILES * spt * 128
    stream_bytes = (cols32.nbytes // (2 if col_dt == jnp.int16 else 1)
                    + (v.nbytes // (2 if VARIANT == "bf16val" else 1)))


def gather(win, idx):
    hi = jax.lax.shift_right_logical(idx, 7)
    lo = jax.lax.bitwise_and(idx, 127)
    rows = jnp.take_along_axis(win, hi, axis=0)
    return jnp.take_along_axis(rows, lo, axis=1)


def kernel(col_ref, val_ref, x_ref, y_ref):
    acc = jnp.zeros((8, 128), dtype=jnp.float32)
    win = x_ref[:]
    for i in range(SUB):
        sl = slice(i * 8, (i + 1) * 8)
        if VARIANT == "packed2":
            packed = col_ref[sl, :]
            pv = val_ref[sl, :]
            g0 = gather(win, packed & 0xFFFF)
            g1 = gather(win, jax.lax.shift_right_logical(packed, 16))
            v0 = jax.lax.bitcast_convert_type(pv << 16, jnp.float32)
            v1 = jax.lax.bitcast_convert_type(pv & jnp.int32(-65536),
                                              jnp.float32)
            acc = acc + v0 * g0 + v1 * g1
        else:
            idx = col_ref[sl, :].astype(jnp.int32)
            g = gather(win, idx)
            v = val_ref[sl, :].astype(jnp.float32)
            acc = acc + v * g
    y_ref[:] = acc[None]


grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=0,
    grid=(NTILES,),
    in_specs=[
        pl.BlockSpec((spt, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((spt, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                           memory_space=pltpu.VMEM),
)
call = pl.pallas_call(
    kernel, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((NTILES, 8, 128), jnp.float32),
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024))

colj, valj, xj = jnp.asarray(cols, col_dt), jnp.asarray(vals, val_dt), \
    jnp.asarray(x)

# correctness spot-check (tile 0).  NB the kernel's two-stage gather has
# the TPU semantics g[i,l] = x[hi[i, lo[i,l]], lo[i,l]] — the sublane pick
# at lane lo[i,l] uses THAT position's hi field.  Production layouts elect
# indices so this equals the direct gather (the packer's consistency
# condition); the probe streams RANDOM indices purely for timing, so the
# reference below follows the kernel's semantics, not the direct gather.
def two_stage_np(idx):
    hi, lo = idx >> 7, idx & 127
    hi_at_lo = np.take_along_axis(hi, lo, axis=1)
    return x[hi_at_lo, lo]


out = np.asarray(jax.jit(call)(colj, valj, xj))
acc = np.zeros((8, 128), np.float64)
for i in range(SUB):
    s = i * 8
    if VARIANT == "packed2":
        for (cc, vv) in ((c0, vb0), (c1, vb1)):
            g = two_stage_np(cc[s:s + 8].astype(np.int64))
            acc += (vv[s:s + 8] << 16).view(np.float32) * g
    else:
        g = two_stage_np(cols32[s:s + 8].astype(np.int64))
        vv = (v[s:s + 8].astype(jnp.bfloat16).astype(np.float32)
              if VARIANT == "bf16val" else v[s:s + 8])
        acc += vv * g
rel = np.abs(out[0] - acc).max() / max(np.abs(acc).max(), 1e-30)
assert rel < 1e-5, rel
print("CORRECT", rel)

def loop(n):
    def body(_, a):
        return call(colj, valj, xj + a[0, 0, 0] * 0)
    return jax.lax.fori_loop(0, n, body,
                             jnp.zeros((NTILES, 8, 128), jnp.float32))
lj = jax.jit(loop, static_argnums=0)
import sys as _s
_s.path.insert(0, "/root/repo")
from ehyb_spmv_gpu_tpu.utils.timing import measure_loop
sec = measure_loop(lambda n: lj(n), 60)
cyc_knnz = sec * 0.94e9 / (nnz_per_call / 1024)
gbs = stream_bytes / sec / 1e9
print("RESULT {{}} {{:.1f}} us/iter  {{:.2f}} cyc/1024nnz  "
      "{{:.0f}} GB/s stream  {{:.2f}} Gnnz/s".format(
          VARIANT, sec * 1e6, cyc_knnz, gbs, nnz_per_call / sec / 1e9))
'''


def main():
    variants = sys.argv[1:] or ["i32col", "i16col", "bf16val", "packed2"]
    for variant in variants:
        code = BODY.format(variant=variant)
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=1200)
        print(f"--- {variant}: rc={r.returncode}")
        for ln in r.stdout.strip().splitlines()[-3:]:
            print("   ", ln)
        if r.returncode != 0:
            print("    " + r.stderr[-1500:].replace("\n", "\n    "))


if __name__ == "__main__":
    main()
