def train(config):
    """Returns the configured trainer (reference training/__init__.py:4-5)."""
    from dpft_tpu.training.trainer import build_trainer
    return build_trainer(config)
