"""Evaluator: checkpoint restore, metric evaluation, export, benchmarks.

Parity: reference src/dprt/evaluation/evaluator.py:19-215
(CentralizedEvaluator): loads a checkpoint, runs the metric + exporter over
the test loader, then measures inference latency (300 reps after 10 warm-up,
mean/std ms) and model complexity. TPU equivalents: latency via
block_until_ready timing of the jitted forward (instead of CUDA events);
FLOPs/params via XLA HLO cost analysis (instead of the DeepSpeed profiler).
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dpft_tpu.evaluation.exporters import build as build_exporter
from dpft_tpu.evaluation.metric import Metric, build_metric
from dpft_tpu.models import registry as model_registry


def _to_jnp(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


class CentralizedEvaluator:
    def __init__(self,
                 metric: Optional[Metric] = None,
                 exporter=None,
                 logging: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None):
        self.eval_fn = metric
        self.export_fn = exporter
        self.logging = logging
        # Fallback model config for checkpoints without an embedded
        # snapshot (e.g. a bare reference .pt file): the CLI's --cfg.
        self.config = config

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "CentralizedEvaluator":
        metric = build_metric(config.get("evaluate", {}))
        exporter = None
        if "exporter" in config.get("evaluate", {}):
            exporter = build_exporter(
                config["evaluate"]["exporter"]["name"], config)
        return cls(metric=metric, exporter=exporter,
                   logging=config.get("train", {}).get("logging"),
                   config=config)

    def __call__(self, *args, **kwargs):
        return self.evaluate(*args, **kwargs)

    @staticmethod
    def _log_scalars(writer, scalars, step, prefix=None):
        if writer is None:
            return
        prefix = f"{prefix}/" if prefix else ""
        for name, value in scalars.items():
            writer.add_scalar(prefix + name, float(value), step)

    # ------------------------------------------------------------------

    def _forward(self, model, variables, mesh=None):
        """Jitted eval forward; ``fwd.place`` stages a host batch with its
        final device layout.

        With a multi-device mesh the variables are replicated and batches
        laid over the 'data' axis, so evaluation data-parallelizes the same
        way the train step does (GSPMD inserts the collectives); the metric
        then runs on the sharded outputs. Single device keeps default
        placement (reference evaluates on one GPU, evaluator.py:19-215 —
        the mesh path is a TPU-native extension)."""
        from dpft_tpu.parallel import (data_sharding, make_global_batch,
                                       replicated_sharding)

        if mesh is not None and mesh.size > 1:
            variables = jax.device_put(variables,
                                       replicated_sharding(mesh))
            shard = data_sharding(mesh)

            def place(tree):
                return make_global_batch(tree, shard)
        else:
            place = _to_jnp

        @jax.jit
        def fwd(batch):
            return model.apply(variables, batch, train=False)

        fwd.place = place
        return fwd

    def evaluate_one_epoch(self, epoch, fwd, data_loader, writer=None,
                           dst=None) -> Dict[str, float]:
        from tqdm import tqdm

        scalars: Dict[str, float] = {}
        n = 0
        sample_step = 0
        # One compiled metric program instead of per-batch eager dispatches
        # (the metric's clipping/AP math is hundreds of small ops).
        metric_jit = jax.jit(self.eval_fn) if self.eval_fn else None
        place = getattr(fwd, "place", _to_jnp)
        with tqdm(total=len(data_loader)) as pbar:
            for i, (batch, targets) in enumerate(data_loader):
                jt = place(targets)
                out = fwd(place(batch))
                metrics = metric_jit(out, jt) if metric_jit else {}
                n += 1
                if self.logging == "step":
                    self._log_scalars(writer, metrics,
                                      i + epoch * len(data_loader), "test")
                for k, v in metrics.items():
                    scalars[k] = scalars.get(k, 0.0) + float(v)
                if self.export_fn is not None and dst is not None:
                    self.export_fn(
                        {k: np.asarray(v) for k, v in out.items()},
                        targets, sample_step, dst)
                if "sample_mask" in targets:  # loader pad_last policy
                    sample_step += int(np.sum(targets["sample_mask"]))
                else:
                    sample_step += next(iter(batch.values())).shape[0]
                pbar.update()

        avg = {k: v / max(n, 1) for k, v in scalars.items()}
        if self.logging == "epoch":
            self._log_scalars(writer, avg, epoch, "test")
        return avg

    def evaluate_inference_time(self, epoch, fwd, data_loader, writer=None,
                                repetitions: int = 300,
                                warmup: int = 10) -> Dict[str, float]:
        """Latency benchmark: blocking timing of the jitted forward
        (utils.profiling.benchmark; reference evaluator.py:96-135 did
        this with CUDA events)."""
        from dpft_tpu.utils.profiling import benchmark

        batch, _ = next(iter(data_loader))
        batch = getattr(fwd, "place", _to_jnp)(batch)
        mean_ms, std_ms = benchmark(fwd, batch,
                                    repetitions=repetitions, warmup=warmup)
        stats = {
            "Inference_time_mean_ms": mean_ms,
            "Inference_time_std_ms": std_ms,
        }
        self._log_scalars(writer, stats, epoch, "test")
        return stats

    def evaluate_complexity(self, epoch, model, variables, data_loader,
                            writer=None) -> Dict[str, float]:
        """FLOPs / params via XLA cost analysis (utils.profiling;
        DeepSpeed-flops-profiler replacement)."""
        from dpft_tpu.utils.profiling import cost_analysis, parameter_count

        batch, _ = next(iter(data_loader))
        cost = cost_analysis(
            lambda b: model.apply(variables, b, train=False),
            _to_jnp(batch))
        stats = {"FLOPS": cost["flops"],
                 "Parameters": float(parameter_count(variables["params"]))}
        self._log_scalars(writer, stats, epoch, "test")
        return stats

    # ------------------------------------------------------------------

    def evaluate(self, checkpoint: str, data_loader: Iterable,
                 dst: Optional[str] = None) -> Dict[str, float]:
        model, variables, epoch, timestamp = model_registry.load(
            checkpoint, config=self.config)
        # Checkpoints written with train.save_optimizer carry trainer state
        # beside the model collections; model.apply must not see it.
        variables = model_registry.model_collections(variables)

        writer = None
        if self.logging is not None and dst is not None:
            dst = osp.join(dst, timestamp)
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(log_dir=dst)

        # Data-parallel evaluation when a multi-device mesh is available
        # (batches are padded to a fixed batch_size by the loader's
        # pad_last policy, so every batch lays out over the 'data' axis).
        mesh = None
        batch_size = getattr(data_loader, "batch_size", None)
        if jax.device_count() > 1 and batch_size:
            from dpft_tpu.parallel import create_mesh, data_parallel_size
            mesh = create_mesh(data=data_parallel_size(batch_size))

        fwd = self._forward(model, variables, mesh)
        metrics = self.evaluate_one_epoch(epoch, fwd, data_loader, writer,
                                          dst)
        latency = self.evaluate_inference_time(epoch, fwd, data_loader,
                                               writer)
        complexity = self.evaluate_complexity(epoch, model, variables,
                                              data_loader, writer)

        if writer is not None:
            writer.flush()
            writer.close()
        return {**metrics, **latency, **complexity}


def build_evaluator(config: Dict[str, Any]) -> CentralizedEvaluator:
    return CentralizedEvaluator.from_config(config)


def evaluate(config: Dict[str, Any]) -> CentralizedEvaluator:
    return build_evaluator(config)
