"""Probe wide-window two-stage gathers on real TPU: can Mosaic lower
take_along_axis over (W,128) operands for W in {8,16,32}, and at what VPU
cost per (8,128) result vreg?

Design driver for the relaxed-packing SELL body: a (W,128) window spans
W*128 rows of x; hi = col >> 7 needs log2(W)+... bits, lo = col & 127.
Semantics verified here: g[s,l] = win[hi[s, lo[s,l]], lo[s,l]] — the
"lo-slot" relaxed constraint (hi stored per lo-slot, not per entry).

Each probe runs in a subprocess (Mosaic failures can SIGABRT).
"""
import subprocess
import sys
import textwrap

HEAD = """
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = {W}          # window sublanes (window spans W*128 x rows)
SUB = {SUB}      # sub-tiles (of 8 steps) per grid step
NTILES = 2048    # grid steps

def kernel(col_ref, val_ref, x_ref, y_ref):
    acc = jnp.zeros((8, 128), dtype=jnp.float32)
    for i in range(SUB):
        win = x_ref[pl.ds(0, W), :]   # static window for the probe
        idx = col_ref[i*8:(i+1)*8, :].astype(jnp.int32)
        hi = jax.lax.shift_right_logical(idx, 7)
        lo = jax.lax.bitwise_and(idx, 127)
        rows = jnp.take_along_axis(win, hi, axis=0)   # (8,128) from (W,128)?
        g = jnp.take_along_axis(rows, lo, axis=1)
        acc = acc + val_ref[i*8:(i+1)*8, :] * g
    y_ref[:] = acc[None][:, :8, :]

# hi must be (8,128) for rows to be (8,128)... with W>8 the operand/idx shapes
# differ: take_along_axis(win (W,128), hi (8,128), axis=0) -> (8,128).
rng = np.random.default_rng(0)
spt = SUB * 8
cols = rng.integers(0, W * 128, size=(NTILES * spt, 128)).astype(np.int32)
vals = rng.standard_normal((NTILES * spt, 128)).astype(np.float32)
x = rng.standard_normal((W, 128)).astype(np.float32)

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
call = pl.pallas_call(kernel, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((NTILES, 8, 128), jnp.float32),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))

colj, valj, xj = jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(x)

# correctness vs numpy relaxed semantics: g[s,l] = x[hi[s,lo[s,l]], lo[s,l]]
out = np.asarray(jax.jit(call)(colj, valj, xj))
hi = cols >> 7; lo = cols & 127
g = np.zeros_like(vals)
for s in range(64):  # spot-check first 64 steps
    g[s] = x[hi[s, lo[s]], lo[s]]
want = (vals[:64].reshape(-1, 8, 128) * g[:64].reshape(-1, 8, 128)).sum(1) \
    if SUB == 8 else None
got = out.reshape(NTILES, 8, 128)
# check accumulate semantics per tile for the first 64//spt tiles
ok = True
for t in range(max(1, 64 // spt)):
    acc = np.zeros((8,128), np.float32)
    for i in range(SUB):
        s = t*spt + i*8
        gg = np.zeros((8,128), np.float32)
        for r in range(8):
            gg[r] = x[hi[s+r, lo[s+r]], lo[s+r]]
        acc += vals[s:s+8] * gg
    if not np.allclose(got[t], acc, rtol=1e-5):
        ok = False
print("CORRECT" if ok else "WRONG")

# timing: device loop
def loop(n):
    def body(_, a):
        return call(colj, valj, xj + a[0,0,0]*0)
    return jax.lax.fori_loop(0, n, body, jnp.zeros((NTILES,8,128), jnp.float32))
lj = jax.jit(loop, static_argnums=0)
import sys as _s; _s.path.insert(0, "{repo}")
from ehyb_spmv_gpu_tpu.utils.timing import measure_loop
sec = measure_loop(lambda n: lj(n), 60)
n_vregs = NTILES * SUB
cyc = sec * 0.94e9 / n_vregs
print(f"W={{W}} SUB={{SUB}}: {{sec*1e6:.1f}} us/iter, {{cyc:.2f}} cyc/vreg")
"""


def main():
    for W, SUB in [(8, 8), (16, 8), (32, 8), (32, 4)]:
        code = HEAD.format(W=W, SUB=SUB, repo="/root/repo")
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=900)
        tail = (r.stdout.strip().splitlines() or [""])[-2:]
        print(f"--- W={W} SUB={SUB}: rc={r.returncode}")
        for ln in tail:
            print("   ", ln)
        if r.returncode != 0:
            print(textwrap.indent(r.stderr[-2000:], "    "))


if __name__ == "__main__":
    main()
