from mdvalidate_ray.evaluate.evaluator import evaluate_spans, EvalResult

__all__ = ["evaluate_spans", "EvalResult"]
