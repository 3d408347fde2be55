"""Probe which gather formulations compile and run on TPU (XLA + Pallas/Mosaic).

Each probe runs in a subprocess (TPU compile failures can SIGABRT the process).
Results drive the EHYB kernel design: the SELL body needs
  gathered[i,j] = window[idx[i,j]]  for idx in [0, W).
"""
import subprocess, sys, textwrap

PROBES = {
    # --- plain XLA on TPU ---
    "xla_take_1d": """
import jax, jax.numpy as jnp
x = jnp.arange(1024, dtype=jnp.float32)
idx = jnp.arange(512, dtype=jnp.int32)[::-1]
y = jax.jit(lambda x, i: jnp.take(x, i, axis=0))(x, idx)
assert float(y[0]) == 511.0
""",
    "xla_take_2d_idx": """
import jax, jax.numpy as jnp
x = jnp.arange(1024, dtype=jnp.float32)
idx = jnp.arange(256, dtype=jnp.int32).reshape(2,128)
y = jax.jit(lambda x, i: jnp.take(x, i, axis=0))(x, idx)
assert y.shape == (2,128)
""",
    "xla_segment_sum": """
import jax, jax.numpy as jnp
v = jnp.ones((1024,), jnp.float32)
seg = jnp.repeat(jnp.arange(8, dtype=jnp.int32), 128)
y = jax.jit(lambda v, s: jax.ops.segment_sum(v, s, num_segments=8))(v, seg)
assert float(y[0]) == 128.0
""",
    "xla_scatter_add": """
import jax, jax.numpy as jnp
y = jnp.zeros(1024, jnp.float32)
idx = jnp.arange(256, dtype=jnp.int32) * 2
v = jnp.ones(256, jnp.float32)
r = jax.jit(lambda y, i, v: y.at[i].add(v))(y, idx, v)
assert float(r[2]) == 1.0
""",
    # --- pallas ---
    "pl_lane_gather_take_along_axis1": """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def k(d_ref, i_ref, o_ref):
    d = d_ref[:]                       # (8,128)
    idx = i_ref[:]                     # (8,128) in [0,128)
    o_ref[:] = jnp.take_along_axis(d, idx, axis=1)
d = jnp.tile(jnp.arange(128, dtype=jnp.float32)[None,:], (8,1))
i = (127 - jnp.tile(jnp.arange(128, dtype=jnp.int32)[None,:], (8,1)))
o = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(d, i)
assert float(o[0,0]) == 127.0, o[0,:3]
""",
    "pl_sublane_gather_take_along_axis0": """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def k(d_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=0)
d = jnp.tile(jnp.arange(8, dtype=jnp.float32)[:,None], (1,128))
i = jnp.full((8,128), 3, jnp.int32)
o = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(d, i)
assert float(o[0,0]) == 3.0
""",
    "pl_flat_take_big_window": """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
W = 2048
def k(d_ref, i_ref, o_ref):
    d = d_ref[:].reshape(-1)           # (W,)
    o_ref[:] = jnp.take(d, i_ref[:], axis=0)   # (8,128) arbitrary gather
d = jnp.arange(W, dtype=jnp.float32).reshape(W//128, 128)
i = (W - 1 - jnp.arange(8*128, dtype=jnp.int32)).reshape(8,128) % W
o = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(d, i)
assert float(o[0,0]) == float((W-1) % W)
""",
    "pl_chunked_lane_gather_select": """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
W, S = 1024, 8
def k(d_ref, i_ref, o_ref):
    idx = i_ref[:]
    lo = idx & 127
    hi = idx >> 7
    acc = jnp.zeros((8,128), jnp.float32)
    for s in range(S):
        chunk = d_ref[s, :]                     # (128,)
        c2 = jnp.broadcast_to(chunk[None, :], (8,128))
        g = jnp.take_along_axis(c2, lo, axis=1)
        acc = jnp.where(hi == s, g, acc)
    o_ref[:] = acc
d = jnp.arange(W, dtype=jnp.float32).reshape(S, 128)
i = (W - 1 - jnp.arange(8*128, dtype=jnp.int32)).reshape(8,128)
o = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(d, i)
assert float(o[0,0]) == float(W-1), o[0,:3]
""",
    "pl_one_hot_mxu": """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def k(d_ref, i_ref, o_ref):
    oh = jax.nn.one_hot(i_ref[:], 128, dtype=jnp.float32)  # (8,128,128)?
    d = d_ref[:]          # (128,128) window chunk... use first row
    o_ref[:] = jax.lax.dot_general(oh.reshape(8*128,128), d[:, :128],
        dimension_numbers=(((1,),(0,)), ((),())),
        preferred_element_type=jnp.float32).reshape(8,128,128)[:, :, 0]
d = jnp.arange(128*128, dtype=jnp.float32).reshape(128,128)
i = jnp.zeros((8,128), jnp.int32)
o = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(d, i)
""",
    "pl_dynamic_slice_rows": """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
# dynamic row slice from VMEM ref with traced scalar start
def k(d_ref, s_ref, o_ref):
    s = s_ref[0]
    o_ref[:] = d_ref[pl.ds(s, 8), :]
d = jnp.arange(64*128, dtype=jnp.float32).reshape(64,128)
s = jnp.array([16], jnp.int32)
o = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(d, s)
assert float(o[0,0]) == float(16*128)
""",
}

if __name__ == "__main__":
    sel = sys.argv[1:] or list(PROBES)
    for name in sel:
        code = "import warnings; warnings.filterwarnings('ignore')\n" + PROBES[name]
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=560)
        status = "OK" if p.returncode == 0 else f"FAIL({p.returncode})"
        print(f"{name:40s} {status}")
        if p.returncode != 0:
            tail = (p.stderr or p.stdout).strip().splitlines()[-6:]
            for ln in tail:
                print(f"    {ln}")
