"""Partial-batch policy (VERDICT round-1 item 4): train loaders drop the
short tail batch, eval loaders pad it to batch_size with a sample_mask, and
loss/metric/exporter weight or skip the padded rows so results equal the
unpadded computation."""

import os.path as osp

import numpy as np
import pytest

import jax.numpy as jnp

from dpft_tpu.data.loader import DataLoader
from dpft_tpu.evaluation.exporters.kradar import KRadarExporter
from dpft_tpu.evaluation.metric import Metric
from dpft_tpu.training.loss import Loss

import test_exporter


class _ToyDataset:
    """n samples of fixed-shape inputs/targets with identifiable values."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        inputs = {"x": np.full((4,), float(i), np.float32)}
        targets = {"gt_mask": np.array([True, False]),
                   "idx": np.full((1,), float(i), np.float32)}
        return inputs, targets


def test_loader_pads_last_batch_and_masks():
    loader = DataLoader(_ToyDataset(5), batch_size=2, pad_last=True)
    batches = list(loader)
    assert len(batches) == 3
    for inputs, targets in batches:
        assert inputs["x"].shape == (2, 4)
        assert targets["sample_mask"].shape == (2,)
    # Full batches: all-true mask.
    assert batches[0][1]["sample_mask"].tolist() == [True, True]
    # Tail batch: sample 4 + one padded copy of it, masked out.
    tail_in, tail_tgt = batches[2]
    assert tail_tgt["sample_mask"].tolist() == [True, False]
    np.testing.assert_array_equal(tail_in["x"][0], tail_in["x"][1])
    assert float(tail_in["x"][0, 0]) == 4.0


def test_loader_pad_last_threaded_matches():
    seq = list(DataLoader(_ToyDataset(5), batch_size=2, pad_last=True))
    thr = list(DataLoader(_ToyDataset(5), batch_size=2, pad_last=True,
                          num_workers=2))
    assert len(seq) == len(thr)
    for (i1, t1), (i2, t2) in zip(seq, thr):
        np.testing.assert_array_equal(i1["x"], i2["x"])
        np.testing.assert_array_equal(t1["sample_mask"], t2["sample_mask"])


def test_loader_drop_last():
    loader = DataLoader(_ToyDataset(5), batch_size=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert all(i["x"].shape == (2, 4) for i, _ in batches)


def _random_detections(rng, B, N=6, M=3, C=3):
    ang = rng.uniform(-np.pi, np.pi, (B, N))
    gang = rng.uniform(-np.pi, np.pi, (B, M))
    cls = np.zeros((B, M, C), np.float32)
    cls[..., 1] = 1.0
    outputs = {
        "class": rng.normal(size=(B, N, C)).astype(np.float32),
        "center": rng.uniform(5, 50, (B, N, 3)).astype(np.float32),
        "size": rng.uniform(1, 4, (B, N, 3)).astype(np.float32),
        "angle": np.stack([np.sin(ang), np.cos(ang)], -1).astype(np.float32),
    }
    targets = {
        "gt_class": cls,
        "gt_center": rng.uniform(5, 50, (B, M, 3)).astype(np.float32),
        "gt_size": rng.uniform(1, 4, (B, M, 3)).astype(np.float32),
        "gt_angle": np.stack([np.sin(gang), np.cos(gang)],
                             -1).astype(np.float32),
        "gt_mask": np.ones((B, M), bool),
    }
    return outputs, targets


def _pad_rows(tree, n_pad):
    return {k: np.concatenate([v, np.repeat(v[-1:], n_pad, axis=0)])
            for k, v in tree.items()}


def test_metric_masked_mean_equals_unpadded():
    rng = np.random.default_rng(0)
    outputs, targets = _random_detections(rng, B=3)
    metric = Metric({"mAP": "mAP3D", "mGIoU": "mGIoU3D"})
    want = metric({k: jnp.asarray(v) for k, v in outputs.items()},
                  {k: jnp.asarray(v) for k, v in targets.items()})

    padded_out = _pad_rows(outputs, 2)
    padded_tgt = _pad_rows(targets, 2)
    padded_tgt["sample_mask"] = np.array([True, True, True, False, False])
    got = metric({k: jnp.asarray(v) for k, v in padded_out.items()},
                 {k: jnp.asarray(v) for k, v in padded_tgt.items()})
    for k in want:
        np.testing.assert_allclose(float(got[k]), float(want[k]),
                                   rtol=1e-6, err_msg=k)


def test_loss_masked_mean_equals_unpadded():
    rng = np.random.default_rng(1)
    outputs, targets = _random_detections(rng, B=3)
    loss = Loss(
        loss_weights={"total_class": 1.0, "center": 1.0, "size": 1.0,
                      "angle": 1.0},
        use_assigner=True,
    )
    jout = {k: jnp.asarray(v) for k, v in outputs.items()}
    jtgt = {k: jnp.asarray(v) for k, v in targets.items()}
    want_total, want_losses = loss(jout, jtgt)

    padded_out = _pad_rows(outputs, 1)
    padded_tgt = _pad_rows(targets, 1)
    padded_tgt["sample_mask"] = np.array([True, True, True, False])
    jpout = {k: jnp.asarray(v) for k, v in padded_out.items()}
    jptgt = {k: jnp.asarray(v) for k, v in padded_tgt.items()}

    # Both the embedded-matcher path and the split-matcher path.
    got_total, got_losses = loss(jpout, jptgt)
    np.testing.assert_allclose(float(got_total), float(want_total),
                               rtol=1e-5)
    indices = loss.match(jpout, jptgt)
    got_total2, _ = loss(jpout, jptgt, indices=indices)
    np.testing.assert_allclose(float(got_total2), float(want_total),
                               rtol=1e-5)
    for k in want_losses:
        np.testing.assert_allclose(float(got_losses[k]),
                                   float(want_losses[k]), rtol=1e-5,
                                   err_msg=k)


def test_exporter_skips_padded_rows(tmp_path):
    outputs, targets = test_exporter.make_batch()
    outputs2 = {k: np.concatenate([v, v]) for k, v in outputs.items()}
    targets2 = {k: np.concatenate([v, v]) for k, v in targets.items()}
    targets2["sample_mask"] = np.array([True, False])

    exporter = KRadarExporter(conf_thrs=[0.0])
    exporter.export(outputs2, targets2, step=0, dst=str(tmp_path))
    base = osp.join(str(tmp_path), "exports", "kradar", "0.0", "all")
    assert osp.exists(osp.join(base, "preds", "000000.txt"))
    assert not osp.exists(osp.join(base, "preds", "000001.txt"))
    with open(osp.join(base, "val.txt")) as f:
        assert f.read().split() == ["000000"]


@pytest.mark.slow
def test_eval_with_ragged_dataset_on_mesh():
    """End-to-end: evaluating a dataset with len % batch_size != 0 on the
    8-device CPU mesh produces the unpadded metrics, no error."""
    import jax

    from dpft_tpu.parallel import create_mesh, data_sharding

    rng = np.random.default_rng(2)
    outputs, targets = _random_detections(rng, B=8)
    metric = Metric({"mAP": "mAP3D"})
    want = metric(
        {k: jnp.asarray(v[:5]) for k, v in outputs.items()},
        {k: jnp.asarray(v[:5]) for k, v in targets.items()})

    padded_out = {k: np.concatenate(
        [v[:5], np.repeat(v[4:5], 3, axis=0)]) for k, v in outputs.items()}
    padded_tgt = {k: np.concatenate(
        [v[:5], np.repeat(v[4:5], 3, axis=0)]) for k, v in targets.items()}
    padded_tgt["sample_mask"] = np.arange(8) < 5

    mesh = create_mesh(data=8)
    shard = data_sharding(mesh)
    jout = jax.device_put(padded_out, shard)
    jtgt = jax.device_put(padded_tgt, shard)
    got = jax.jit(metric.__call__)(jout, jtgt)
    np.testing.assert_allclose(float(got["mAP"]), float(want["mAP"]),
                               rtol=1e-6)
