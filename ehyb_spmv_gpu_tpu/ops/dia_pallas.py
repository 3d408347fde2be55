"""Pallas TPU kernel for the DIA body — the HBM-streaming regime.

Two regimes for the DIA body (diagonals extracted by ``convert.extract_diagonals``):

  * **VMEM-resident** (working set ≲ 100 MB): the XLA formulation
    (``ops.xla_ops.ehyb_dia_xla`` — unrolled static shifted slices) compiles to
    near-optimal VPU code because XLA pre-stages everything into VMEM
    (measured ~3.6 cyc/vreg on v5e).
  * **HBM-streaming** (audikw_1-class, dia_val hundreds of MB): XLA
    materializes every diagonal term through HBM (measured 11% of roofline).
    This kernel fixes that: x stays fully VMEM-resident for the whole kernel,
    the (K, dim) diagonal values stream through VMEM in row blocks, and each
    diagonal's shifted x window is assembled in-register with a static lane
    roll + two-sublane select (offsets are compile-time constants).

Layout: the packed device array has shape (nb, K*Brows, LANES) — block b
carries diagonal k's values for rows [b·B, (b+1)·B) at sublane rows
[k·Brows, (k+1)·Brows), so the per-k slice inside the kernel is static and
tile-aligned (no relayout).  ``pack_dia`` builds it from the (K, dim_r) form.

Role in the reference's terms: this is still "phase 1 regular work" — the
blockELL idea (``kernel.cu:150-168``) taken to its TPU extreme, where the
regular structure is so regular that even the int16 column indices disappear.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LANES, cdiv, round_up
from ..utils.log import get_logger

log = get_logger(__name__)

#: Rows of y produced per grid step (must be a multiple of 1024; 8192 rows
#: keeps the streamed dval block (K·Brows·512 B) comfortably double-buffered).
BLOCK_ROWS = 8192
#: Above this x footprint the kernel streams x block pairs instead of
#: keeping it VMEM-resident (see make_dia_pallas_apply).
X_RESIDENT_DIA_BYTES = 32 * 1024 * 1024


def pack_dia(dia_val: np.ndarray, block_rows: int = BLOCK_ROWS
             ) -> Tuple[np.ndarray, int]:
    """(K, dim_r) → (nb, K*Brows, LANES) blocked layout (see module doc).

    Returns (packed, dim_padded).  Zero-pads rows to a multiple of block_rows.
    """
    K, dim_r = dia_val.shape
    dim_p = round_up(max(dim_r, 1), block_rows)
    nb = dim_p // block_rows
    brows = block_rows // LANES
    out = np.zeros((nb, K * brows, LANES), dtype=dia_val.dtype)
    v = np.zeros((K, dim_p), dtype=dia_val.dtype)
    v[:, :dim_r] = dia_val
    # v[k, b*B : (b+1)*B] → out[b, k*brows:(k+1)*brows, :]
    v4 = v.reshape(K, nb, brows, LANES)
    out[:] = v4.transpose(1, 0, 2, 3).reshape(nb, K * brows, LANES)
    return out, dim_p


def make_dia_pallas_apply(offsets: Sequence[int], dim_r: int, dtype,
                          block_rows: int = BLOCK_ROWS,
                          interpret: bool = False) -> Callable:
    """Build ``apply(dval_packed, x_pad) -> y_dia`` (length dim_r).

    ``offsets`` are the static diagonal offsets; ``x_pad`` is the padded
    reordered x (any length ≥ dim; the kernel pads/aligns internally).
    """
    offsets = [int(d) for d in offsets]
    K = len(offsets)
    assert K > 0
    brows = block_rows // LANES
    dim_p = round_up(max(dim_r, 1), block_rows)
    nb = dim_p // block_rows
    lo = min(min(offsets), 0)
    hi = max(max(offsets), 0)
    # Extended x rows: block b, diag k reads sublane rows
    # [b*brows + (d-lo)//128, +brows+1); keep one extra tile row of slack.
    x_rows_ext = nb * brows + cdiv(hi - lo, LANES) + 2
    # x streaming: beyond ~32 MB a fully-resident x OOMs VMEM at compile
    # once the surrounding program stages its own operands (observed on
    # permuted_poisson_4096's 67 MB x) — stream x as per-block PAIRS
    # (block b and b+1 cover every shifted window when the offset span
    # ≤ block_rows, which extract_diagonals' ±window bound guarantees).
    x_stream = x_rows_ext * LANES * np.dtype(dtype).itemsize \
        > X_RESIDENT_DIA_BYTES
    if x_stream and hi - lo + LANES > block_rows:
        raise ValueError("streamed DIA needs offset span <= block_rows")

    def body_acc(xs_at, dval_ref, y_dtype, lane):
        acc = jnp.zeros((brows, LANES), dtype=y_dtype)
        for k, d in enumerate(offsets):
            s = d - lo
            s_hi, s_lo = s // LANES, s % LANES
            v = dval_ref[0, k * brows:(k + 1) * brows, :]
            if s_lo == 0:
                xs = xs_at(s_hi, brows)
            else:
                a = xs_at(s_hi, brows + 1)
                # want xs[r, l] = a_flat[r*128 + l + s_lo]
                rolled = pltpu.roll(a, LANES - s_lo, 1)  # [l] ← [(l+s_lo)%128]
                xs = jnp.where(lane < LANES - s_lo, rolled[:brows, :],
                               rolled[1:brows + 1, :])
            acc = acc + v * xs
        return acc

    if x_stream:
        def kernel(dval_ref, xa_ref, xb_ref, y_ref):
            lane = jax.lax.broadcasted_iota(jnp.int32, (brows, LANES), 1)
            xcat = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)
            y_ref[0] = body_acc(lambda s_hi, n: xcat[s_hi:s_hi + n, :],
                                dval_ref, y_ref.dtype, lane)

        in_specs = [
            pl.BlockSpec((1, K * brows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # dval block (streamed)
            pl.BlockSpec((1, brows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # x block b
            pl.BlockSpec((1, brows, LANES), lambda b: (b + 1, 0, 0),
                         memory_space=pltpu.VMEM),   # x block b+1 (halo)
        ]
        x_blocks = nb + 1
    else:
        def kernel(dval_ref, x_ref, y_ref):
            b = pl.program_id(0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (brows, LANES), 1)
            y_ref[0] = body_acc(
                lambda s_hi, n: x_ref[pl.ds(b * brows + s_hi, n), :],
                dval_ref, y_ref.dtype, lane)

        in_specs = [
            pl.BlockSpec((1, K * brows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # dval block (streamed)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x_ext resident
        ]
        x_blocks = 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, brows, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    cost = pl.CostEstimate(
        flops=2 * K * dim_p,
        bytes_accessed=int(K * dim_p + 2 * dim_p) * np.dtype(dtype).itemsize,
        transcendentals=0)
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, brows, LANES), np.dtype(dtype)),
        cost_estimate=cost, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))

    def apply(dval_packed: jax.Array, x_pad: jax.Array) -> jax.Array:
        # x_ext[j] = x[j + lo]  (zeros outside [0, len(x)))
        rows = max(x_rows_ext, (x_blocks or 0) * brows)
        n_ext = rows * LANES
        start = -lo  # ≥ 0
        x_ext = jnp.zeros(n_ext, dtype=x_pad.dtype)
        take = min(x_pad.shape[0], n_ext - start)
        x_ext = x_ext.at[start:start + take].set(x_pad[:take])
        if x_stream:
            x3 = x_ext.reshape(x_blocks, brows, LANES)
            y = call(dval_packed, x3, x3)
        else:
            y = call(dval_packed, x_ext.reshape(rows, LANES))
        return y.reshape(-1)[:dim_r]

    log.info("pallas DIA body: K=%d diagonals, %d blocks of %d rows "
             "(dval stream %.1f MB/iter%s)", K, nb, block_rows,
             K * dim_p * np.dtype(dtype).itemsize / 1e6,
             ", x streamed" if x_stream else "")
    return apply
