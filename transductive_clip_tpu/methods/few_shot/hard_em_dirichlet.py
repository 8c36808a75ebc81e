"""Few-shot Hard EM-Dirichlet (reference: src/methods/few_shot/hard_em_dirichlet.py)."""

from .em_dirichlet import EM_DIRICHLET


class HARD_EM_DIRICHLET(EM_DIRICHLET):
    hard = True
