from .coo import MatrixCOO, MatrixCSR, deterministic_x, oracle_spmv
from .planner import make_plan, Plan
from .reorder import two_level_reorder, Reordering, identity_reordering
from .ehyb import EhybMatrix, EhybDevice
