from .blocked_spmm import (
    adj_matmul_reference,
    blocked_adj_matmul,
    fused_motif_combine,
    fused_motif_combine_reference,
    motif_combine,
)

__all__ = [
    "blocked_adj_matmul",
    "adj_matmul_reference",
    "fused_motif_combine",
    "fused_motif_combine_reference",
    "motif_combine",
]
