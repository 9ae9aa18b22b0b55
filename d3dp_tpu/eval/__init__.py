from d3dp_tpu.eval.evaluator import Evaluator, EvalResult

__all__ = ["Evaluator", "EvalResult"]
