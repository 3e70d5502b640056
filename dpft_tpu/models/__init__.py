"""Model zoo: config-driven builder registry and checkpoint IO."""

from dpft_tpu.models.registry import build, load, save  # noqa: F401
