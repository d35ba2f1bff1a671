from sequoia_tpu.evaluation import correlation_stats, evaluate_model  # noqa: F401
