def evaluate(config):
    """Returns the configured evaluator (reference evaluation/__init__.py:4-5)."""
    from dpft_tpu.evaluation.evaluator import build_evaluator
    return build_evaluator(config)
