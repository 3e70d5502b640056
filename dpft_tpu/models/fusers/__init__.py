from typing import Any, Dict

from dpft_tpu.models.fusers.mpfusion import (  # noqa: F401
    MLFusion, MPFusion, IMPFusion, build_mpfusion,
)


def build_fuser(name: str, config: Dict[str, Any], head=None):
    """Fuser registry (reference src/dprt/models/fusers/__init__.py)."""
    if "fusion" in name.lower():
        return build_mpfusion(config, head=head)
    raise ValueError(f"Unknown fuser: {name}")
