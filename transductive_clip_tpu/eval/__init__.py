from .zero_shot import EvaluatorZeroShot
from .few_shot import EvaluatorFewShot

__all__ = ["EvaluatorZeroShot", "EvaluatorFewShot"]
