"""CLI + library: serialize the frozen inference forward to StableHLO.

Deployment path with no reference counterpart (the reference ships pickled
torch checkpoints that need the full Python stack at serving time;
src/dprt/evaluate.py:10-46 reloads them through torch): ``jax.export``
lowers the jitted forward — weights baked in as constants — to a portable
StableHLO artifact that a serving runtime (TF Serving via jax2tf, Pathways,
or plain `jax.export.deserialize(...).call`) can execute without the model
code, flax, or the config system. Cross-platform lowering lets a CPU host
emit TPU artifacts (``--platforms tpu``).

Usage:
    python -m dpft_tpu.export --src .../processed --cfg cfg.json \
        --checkpoint .../<ts>_checkpoint_NNNN --dst model.stablehlo \
        [--batch 1] [--platforms tpu,cpu]
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional, Sequence

import jax
import jax.export
import jax.numpy as jnp


def export_forward(model, variables: Dict[str, Any],
                   example_batch: Dict[str, jnp.ndarray],
                   platforms: Optional[Sequence[str]] = None
                   ) -> jax.export.Exported:
    """Exports ``model.apply(variables, batch, train=False)`` with the
    variables baked in as constants (a self-contained serving artifact)."""
    fwd = jax.jit(lambda batch: model.apply(variables, batch, train=False))
    # Read dtypes without device transfers (jnp.asarray would device_put
    # every leaf over the tunneled link just to inspect .dtype).
    import numpy as np
    args = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            jnp.shape(x), getattr(x, "dtype", None) or np.asarray(x).dtype),
        example_batch)
    return jax.export.export(
        fwd, platforms=list(platforms) if platforms else None)(args)


def save_exported(exported: jax.export.Exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str) -> jax.export.Exported:
    """Loads a serialized artifact; run it with ``.call(batch)``."""
    with open(path, "rb") as f:
        return jax.export.deserialize(bytearray(f.read()))


def main(src: str, cfg: str, checkpoint: str, dst: str, batch: int,
         platforms: Optional[str]) -> None:
    from dpft_tpu.data import init as init_dataset
    from dpft_tpu.data import load as load_dataset
    from dpft_tpu.utils.config import load_config
    from dpft_tpu.models import registry

    # The model AND the example batch must come from the config the
    # checkpoint was trained with (its inputs define the serving
    # signature); --cfg is only the fallback when no snapshot survives.
    config = registry.checkpoint_config(checkpoint,
                                        fallback=load_config(cfg))
    model, variables, epoch, timestamp = registry.load(checkpoint,
                                                       config=config)
    variables = registry.model_collections(variables)

    dataset = init_dataset(config["dataset"], src=src, split="test",
                           config=config)
    # The artifact freezes one (serving) batch size / jit signature.
    config = dict(config, train=dict(config.get("train", {}),
                                     batch_size=batch))
    loader = load_dataset(dataset, config=config, shuffle=False,
                          pad_last=True)
    example_batch, _ = next(iter(loader))

    plats = [p.strip() for p in platforms.split(",")] if platforms else None
    exported = export_forward(model, variables, example_batch, plats)
    save_exported(exported, dst)
    print(f"exported {timestamp} epoch {epoch} -> {dst} "
          f"(platforms={exported.platforms}, batch={batch})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser("DPFT StableHLO export")
    parser.add_argument("--src", type=str, default="/data/kradar/processed",
                        help="Path to the processed dataset folder "
                             "(supplies the input-shape contract).")
    parser.add_argument("--cfg", type=str, default="config/kradar.json",
                        help="Configuration file (fallback if the "
                             "checkpoint carries none).")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Checkpoint directory to freeze.")
    parser.add_argument("--dst", type=str, default="model.stablehlo",
                        help="Output artifact path.")
    parser.add_argument("--batch", type=int, default=1,
                        help="Serving batch size baked into the artifact.")
    parser.add_argument("--platforms", type=str, default=None,
                        help="Comma-separated lowering platforms, e.g. "
                             "'tpu' or 'tpu,cpu' (default: current).")
    args = parser.parse_args()
    main(src=args.src, cfg=args.cfg, checkpoint=args.checkpoint,
         dst=args.dst, batch=args.batch, platforms=args.platforms)
