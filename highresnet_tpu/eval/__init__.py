from highresnet_tpu.eval.evaluator import Model, benchmark, evaluate, get_sr_and_score, load_data
from highresnet_tpu.eval.submission import generate_submission_file

__all__ = [
    "Model",
    "benchmark",
    "evaluate",
    "get_sr_and_score",
    "load_data",
    "generate_submission_file",
]
