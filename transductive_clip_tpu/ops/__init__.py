from .common import get_one_hot, EPS
from .distances import sq_euclidean, kl_divergence_to_centroids
from .dirichlet import (
    TRIGAMMA_1,
    dirichlet_log_pdf,
    mm_update_alpha,
)
from .matching import (
    hungarian_matching,
    basic_matching,
    cluster_prototypes,
)

__all__ = [
    "get_one_hot",
    "EPS",
    "sq_euclidean",
    "kl_divergence_to_centroids",
    "TRIGAMMA_1",
    "dirichlet_log_pdf",
    "mm_update_alpha",
    "hungarian_matching",
    "basic_matching",
    "cluster_prototypes",
]
