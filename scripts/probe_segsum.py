"""Probe faster formulations of the per-subtile partial reduction
y[slice] = sum of partials whose sub_slice == slice (sorted segments).

The streamed body emits (n_sub, 128) partials; XLA segment_sum costs ~16 us
for n_sub=2048 (measured) — a third of the body kernel itself.  Candidates:
  a) jax.ops.segment_sum (baseline)
  b) one-hot matmul (MXU) — S (n_seg, n_sub) @ partials
  c) cumsum + boundary row gather diff
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ehyb_spmv_gpu_tpu.utils.timing import measure_loop  # noqa: E402


def bench_fn(fn, x0, iters=400):
    def loop(n, x, eps):
        def body(_, carry):
            y = fn(x + eps * carry[0])
            return y.reshape(-1)[:1].astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.zeros(1, x.dtype))
    lj = jax.jit(loop, static_argnums=0)
    z = jnp.asarray(0.0, x0.dtype)
    return measure_loop(lambda n: lj(n, x0, z), iters)


def main():
    for n_sub, n_seg in [(2048, 129), (3968, 2049), (65536, 2049)]:
        rng = np.random.default_rng(0)
        # sorted segment ids with random contiguous run lengths
        cuts = np.sort(rng.choice(n_sub, size=n_seg - 1, replace=False))
        seg = np.zeros(n_sub, dtype=np.int32)
        seg[cuts] = 1
        seg = np.cumsum(seg).astype(np.int32)
        parts = rng.standard_normal((n_sub, 128)).astype(np.float32)
        pj = jnp.asarray(parts)
        segj = jnp.asarray(seg)

        def f_segsum(p):
            return jax.ops.segment_sum(p, segj, num_segments=n_seg,
                                       indices_are_sorted=True)

        S = (seg[None, :] == np.arange(n_seg)[:, None]).astype(np.float32)
        Sj = jnp.asarray(S)

        def f_matmul(p):
            return Sj @ p

        starts = np.zeros(n_seg, dtype=np.int32)
        starts[seg[cuts]] = cuts + 0  # start row of each segment (first=0)
        # compute boundaries properly
        start_of = np.searchsorted(seg, np.arange(n_seg), side="left")
        end_of = np.searchsorted(seg, np.arange(n_seg), side="right")
        s_j = jnp.asarray(start_of.astype(np.int32))
        e_j = jnp.asarray(end_of.astype(np.int32))

        def f_cumsum(p):
            c = jnp.cumsum(p, axis=0)
            c = jnp.concatenate([jnp.zeros((1, 128), p.dtype), c], axis=0)
            hi = jnp.take(c, e_j, axis=0)
            lo = jnp.take(c, s_j, axis=0)
            return hi - lo

        want = np.asarray(jax.jit(f_segsum)(pj))
        for name, fn in [("segsum", f_segsum), ("matmul", f_matmul),
                         ("cumsum", f_cumsum)]:
            if name == "matmul" and n_seg * n_sub > 4_000_000:
                print(f"  n_sub={n_sub} n_seg={n_seg} {name}: skipped (S too big)")
                continue
            got = np.asarray(jax.jit(fn)(pj))
            ok = np.allclose(got, want, rtol=1e-4, atol=1e-4)
            sec = bench_fn(fn, pj)
            print(f"  n_sub={n_sub} n_seg={n_seg} {name:7s} "
                  f"{sec*1e6:8.2f} us/iter {'OK' if ok else 'WRONG'}")


if __name__ == "__main__":
    main()
