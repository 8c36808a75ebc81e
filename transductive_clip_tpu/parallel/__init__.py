from .mesh import make_mesh, choose_layout
from .task_parallel import shard_task_batch, distributed_em_dirichlet

__all__ = [
    "make_mesh",
    "choose_layout",
    "shard_task_batch",
    "distributed_em_dirichlet",
]
