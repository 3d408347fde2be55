from .base import SpmvModel
from .csr import CsrSpmv, BcooSpmv
from .ehyb import EhybSpmv, EhybXlaSpmv, HybSpmv
