from .cbf import cbf_qp_analytic, di_exp_cbf_filter
from .hj import HjValueData, airtaxi_hj_filter, make_synthetic_airtaxi_hj

__all__ = [
    "cbf_qp_analytic",
    "di_exp_cbf_filter",
    "HjValueData",
    "airtaxi_hj_filter",
    "make_synthetic_airtaxi_hj",
]
