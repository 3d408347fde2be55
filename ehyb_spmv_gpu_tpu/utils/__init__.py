from .log import get_logger
from .validate import compare, rel_error
from .timing import bench_apply, BenchResult, spmv_bytes_model
