from otto_tpu.eval.recall import evaluate_topk, recall_at_k  # noqa: F401
