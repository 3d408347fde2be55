from .xla_ops import coo_spmv, ehyb_apply_xla, bcoo_spmv_baseline
