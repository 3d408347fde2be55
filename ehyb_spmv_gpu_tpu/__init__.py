"""ehyb_spmv_gpu_tpu — a TPU-native explicit-caching hybrid (EHYB) SpMV framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
``Chong-Chen-UNLV/EHYB_SPMV_GPU`` (arXiv:2204.06666): Matrix Market I/O, a
VMEM-window planner, a multilevel k-way graph partitioner (C++), two-level row
reordering, COO→EHYB conversion (SELL-128 body + ER tail + long-row stream),
fused Pallas SpMV kernels with VMEM-cached x windows, golden-oracle validation,
benchmarking with roofline audits, and multi-chip sharding over a device mesh.

See SURVEY.md for the structural analysis of the reference this design is built
from.  Nothing here is a translation: layouts, scheduling, and parallelism are
re-designed for TPU (see module docstrings for file:line parity citations).
"""
from .config import EhybConfig, Features
from .core.coo import MatrixCOO, MatrixCSR, deterministic_x, oracle_spmv
from .core.planner import make_plan, Plan
from .core.reorder import two_level_reorder, Reordering
from .core.convert import coo_to_ehyb
from .core.ehyb import EhybMatrix, EhybDevice
from .models.csr import CsrSpmv, BcooSpmv
from .models.ehyb import EhybSpmv, EhybXlaSpmv, HybSpmv
from .models.hybrid import DegreeSplitSpmv
from .models.routed import RoutedSpmv
from .utils.validate import compare, rel_error

__version__ = "0.1.0"

MODELS = {m.name: m for m in
          (CsrSpmv, BcooSpmv, EhybXlaSpmv, EhybSpmv, HybSpmv, RoutedSpmv,
           DegreeSplitSpmv)}
