"""lesv_tpu — a TPU-native structural-variant calling framework.

A from-scratch JAX/XLA/Pallas rebuild of the lesv Nanopore SV-calling
pipeline (DEL/INS): subread splitting, seed-chain-extend reference mapping,
SV-read selection, indel-signature extraction, signature clustering, group
consensus, realignment, and native VCF calling.

Reference behavior contract: xiaochuanle/lesv (see SURVEY.md / DESIGN.md).
"""

__version__ = "0.1.0"

from lesv_tpu.config import LesvConfig  # noqa: F401
