from qec_ldpc_tpu.harness import debug
from qec_ldpc_tpu.harness.config import (
    RunConfig,
    format_result_filename,
    load_init_file,
)
from qec_ldpc_tpu.harness.journal import Journal
from qec_ldpc_tpu.harness.stats import (
    CodeStatistics,
    parse_code_params,
    parse_reference_text,
)

__all__ = [
    "debug",
    "RunConfig",
    "load_init_file",
    "format_result_filename",
    "CodeStatistics",
    "parse_code_params",
    "parse_reference_text",
    "Journal",
]
