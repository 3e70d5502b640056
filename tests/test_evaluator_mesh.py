"""Data-parallel evaluation (CentralizedEvaluator mesh path): the metric
epoch over an 8-device CPU mesh equals the single-device epoch.

The reference evaluates on one GPU (reference evaluator.py:19-215); the
mesh path is a TPU-native extension that lays eval batches over the
'data' axis with replicated variables.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from dpft_tpu.evaluation.evaluator import CentralizedEvaluator
from dpft_tpu.evaluation.metric import Metric
from dpft_tpu.parallel import create_mesh

from test_partial_batch import _random_detections

N_PRED = 6


class _ToyDetector(nn.Module):
    @nn.compact
    def __call__(self, batch, train=False):
        x = nn.Dense(16)(batch["x"])           # (B, N, 16)
        ang = nn.Dense(2)(x)
        ang = ang / jnp.linalg.norm(ang, axis=-1, keepdims=True)
        return {
            "class": nn.Dense(3)(x),
            "center": 5.0 + 45.0 * nn.sigmoid(nn.Dense(3)(x)),
            "size": 1.0 + 3.0 * nn.sigmoid(nn.Dense(3)(x)),
            "angle": ang,
        }


class _Loader:
    batch_size = 8

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def test_mesh_eval_epoch_equals_single_device():
    rng = np.random.default_rng(3)
    batches = []
    for _ in range(2):
        _, targets = _random_detections(rng, B=8)
        batch = {"x": rng.normal(size=(8, N_PRED, 4)).astype(np.float32)}
        batches.append((batch, targets))
    loader = _Loader(batches)

    model = _ToyDetector()
    variables = model.init(jax.random.PRNGKey(0), batches[0][0])
    evaluator = CentralizedEvaluator(
        metric=Metric({"mAP": "mAP3D", "mGIoU": "mGIoU3D"}))

    fwd_single = evaluator._forward(model, variables, mesh=None)
    want = evaluator.evaluate_one_epoch(0, fwd_single, loader)

    mesh = create_mesh(data=8)
    fwd_mesh = evaluator._forward(model, variables, mesh=mesh)
    got = evaluator.evaluate_one_epoch(0, fwd_mesh, loader)

    assert want.keys() == got.keys() and want
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, err_msg=k)
