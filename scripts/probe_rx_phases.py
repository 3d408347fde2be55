"""Phase breakdown of the rx flagship on the scattered corpus (real TPU):
where do the iteration microseconds go once the body shrinks?"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ehyb_spmv_gpu_tpu as ehyb  # noqa: E402
from ehyb_spmv_gpu_tpu.io import generate  # noqa: E402
from ehyb_spmv_gpu_tpu.utils.timing import measure_loop  # noqa: E402


def bench_fn(fn, x0, iters=400):
    """Device-loop timing with a traced-eps carry (models/base.py pattern)."""
    def loop(n, x, eps):
        def body(_, carry):
            y = fn(x + eps * carry[0])
            return y.reshape(-1)[:1].astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.zeros(1, x.dtype))
    lj = jax.jit(loop, static_argnums=0)
    z = jnp.asarray(0.0, x0.dtype)
    return measure_loop(lambda n: lj(n, x0, z), iters)


def main():
    mat = sys.argv[1] if len(sys.argv) > 1 else "random_16k"
    m = generate.load_corpus(mat)
    model = ehyb.EhybSpmv(ehyb.EhybConfig()).setup(m)
    x = ehyb.deterministic_x(m.dimension)
    x_dev = model.prepare_x(x)
    st = model.ehyb.stats
    print(f"{mat}: layout={st.get('layout')} ell_steps={st['ell_steps']} "
          f"er_steps={st['er_steps']} dia={st['n_diagonals']}")

    from ehyb_spmv_gpu_tpu.ops import xla_ops
    dev = model.dev

    phases = {
        "full_apply": lambda xx: model.apply_operands(
            model.device_operands(), xx),
        "er": lambda xx: xla_ops.ehyb_er_xla(dev, xx),
    }
    dia_pallas = getattr(model, "_dia_apply", None)
    if dia_pallas is not None and getattr(dev.dia_val, "ndim", 2) == 3:
        phases["dia"] = lambda xx: dia_pallas(dev.dia_val, xx)
    elif len(dev.dia_offsets):
        phases["dia"] = lambda xx: xla_ops.ehyb_dia_xla(dev, xx)

    # body alone (stream call + segment sum, no combine/er/dia)
    pa = getattr(model, "_pallas_apply", None)
    if pa is not None and st.get("layout") in ("sell_rx", "sell_mw"):
        # re-build a body-only apply by monkeypatching the phases to zeros
        import ehyb_spmv_gpu_tpu.ops.ehyb_pallas as ep
        from ehyb_spmv_gpu_tpu.config import LANES

        e = model.ehyb
        (sub_wins, sub_slice, reset, last_sub,
         n_tiles) = ep.build_stream_maps(e)
        sub_win = sub_wins[0]
        sub_win_b = sub_wins[1] if len(sub_wins) > 1 else None
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        spt = ep.STREAM_SUBTILES * ep.TILE_STEPS
        rx = sub_win_b is not None
        if rx:
            aux = (jnp.asarray(sub_win), jnp.asarray(sub_win_b),
                   jnp.asarray(reset))
            idx_map = lambda t, wa, wb, rs: (t, 0)  # noqa: E731
            out_map = lambda t, wa, wb, rs: (t, 0, 0)  # noqa: E731
            kf = ep._sell_body_kernel_stream_rx
        else:
            aux = (jnp.asarray(sub_win), jnp.asarray(reset))
            idx_map = lambda t, wr, rs: (t, 0)  # noqa: E731
            out_map = lambda t, wr, rs: (t, 0, 0)  # noqa: E731
            kf = ep._sell_body_kernel_stream
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(aux), grid=(n_tiles,),
            in_specs=[pl.BlockSpec((spt, LANES), idx_map,
                                   memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, ep.STREAM_SUBTILES, LANES), out_map,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, LANES), jnp.float32)])
        call = pl.pallas_call(kf, grid_spec=gs,
                              out_shape=jax.ShapeDtypeStruct(
                                  (n_tiles, ep.STREAM_SUBTILES, LANES),
                                  jnp.float32),
                              compiler_params=pltpu.CompilerParams(
                                  vmem_limit_bytes=ep._VMEM_LIMIT))
        x_rows = e.padded_x_rows // LANES
        last_sub_dev = jnp.asarray(last_sub)

        def body_only(xx):
            x2d = xx.reshape(x_rows, LANES)
            return call(*aux, dev.ell_col, dev.ell_val, x2d)

        def body_plus_seg(xx):
            y3 = body_only(xx)
            return jnp.take(y3.reshape(-1, LANES), last_sub_dev, axis=0)

        phases["body_kernel"] = body_only
        phases["body+gather"] = body_plus_seg
        n_vregs = n_tiles * ep.STREAM_SUBTILES

    for name, fn in phases.items():
        sec = bench_fn(fn, x_dev)
        extra = ""
        if name in ("body_kernel", "body+gather"):
            extra = f" ({sec * 0.94e9 / n_vregs:.1f} cyc/vreg over " \
                    f"{n_vregs} vregs)"
        print(f"  {name:14s} {sec * 1e6:9.2f} us/iter{extra}")


if __name__ == "__main__":
    main()
