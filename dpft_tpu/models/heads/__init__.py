from typing import Any, Dict

from dpft_tpu.models.heads.detection import (  # noqa: F401
    LinearDetectionHead, UnaryDetectionHead, build_detection_head,
)


def build_head(name: str, config: Dict[str, Any]):
    """Head registry (reference src/dprt/models/heads/__init__.py)."""
    return build_detection_head(name, config)
