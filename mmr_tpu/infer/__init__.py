from mmr_tpu.infer.sliding_window import sliding_window_inference, make_sliding_window_fn  # noqa: F401
from mmr_tpu.infer.evaluator import run_inference, evaluate_checkpoint  # noqa: F401
