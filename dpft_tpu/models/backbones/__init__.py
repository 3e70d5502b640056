from typing import Any, Dict

from dpft_tpu.models.backbones.resnet import ResNetBackbone, build_resnet  # noqa: F401


def build_backbone(name: str, config: Dict[str, Any]):
    """Backbone registry, substring dispatch like the reference
    (src/dprt/models/backbones/__init__.py:7-15)."""
    lname = name.lower()
    if "resnet" in lname:
        return build_resnet(name, config)
    if "convnext" in lname:
        from dpft_tpu.models.backbones.convnext import build_convnext
        return build_convnext(name, config)
    if "regnet" in lname:
        from dpft_tpu.models.backbones.regnet import build_regnet
        return build_regnet(name, config)
    if "swin" in lname:
        from dpft_tpu.models.backbones.swin import build_swin
        return build_swin(name, config)
    raise ValueError(f"Unknown backbone: {name}")
