"""Hard EM-Dirichlet: EM-Dirichlet with hard (argmax one-hot) assignments
each iteration (reference: src/methods/zero_shot/hard_em_dirichlet.py:254-258).
Shares the jitted scan with the soft variant; `hard=True` swaps the softmax
for a one-hot scatter inside the compiled loop.
"""

from .em_dirichlet import EM_DIRICHLET


class HARD_EM_DIRICHLET(EM_DIRICHLET):
    hard = True
