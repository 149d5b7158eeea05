from qec_ldpc_tpu.sampling.classify import (
    NUM_COUNTERS,
    C_CONV_X,
    C_CONV_Z,
    C_CORRECTED,
    C_LOGICAL,
    C_SYN_X,
    C_SYN_Z,
    C_TESTED,
    C_X_TESTED,
    C_Z_TESTED,
    RankBasisTest,
    classify_batch,
    classify_batch_np,
    logical_error_mask,
    logical_error_mask_basis,
    make_rank_basis_test,
    rank_basis_test,
)
from qec_ldpc_tpu.sampling.errors import (
    sample_depolarizing_errors,
    sample_weight_w_errors,
)

__all__ = [
    "sample_weight_w_errors",
    "sample_depolarizing_errors",
    "classify_batch",
    "classify_batch_np",
    "logical_error_mask",
    "logical_error_mask_basis",
    "RankBasisTest",
    "rank_basis_test",
    "make_rank_basis_test",
    "NUM_COUNTERS",
    "C_TESTED", "C_X_TESTED", "C_Z_TESTED", "C_CORRECTED",
    "C_SYN_X", "C_SYN_Z", "C_LOGICAL", "C_CONV_X", "C_CONV_Z",
]
