from .similarity import KERNELS, pairwise_similarity, with_kernel_column

__all__ = ["KERNELS", "pairwise_similarity", "with_kernel_column"]
