from .synthetic import make_zero_shot_tasks, make_few_shot_tasks

__all__ = ["make_zero_shot_tasks", "make_few_shot_tasks"]
