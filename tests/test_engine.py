"""Integration test — the reference's notebook smoke run on a synthetic
mini-dataset (SURVEY.md §4: ``How_To-Run...ipynb`` cell 9 trains 2 epochs at
batch 2; here on the emulated 8-device mesh with all artifacts checked)."""

import json
import pickle

import numpy as np
import pytest

from mmr_tpu.config import get_default_config
from mmr_tpu.data import make_synthetic_dataset, PatchSampler
from mmr_tpu.data.zarr_io import list_dataset_stores


@pytest.fixture(scope="module")
def smoke_run(tmp_path_factory):
    from mmr_tpu.train.engine import Trainer

    root = tmp_path_factory.mktemp("ds")
    results = tmp_path_factory.mktemp("results")
    make_synthetic_dataset(root, n_videos=3, frames_per_video=3,
                           height=64, width=80, n_classes=2, patch_size=(32, 32))
    stores = list_dataset_stores(root)

    config = get_default_config(2, [32, 32])
    config.update({
        "results_path": str(results),
        "dataset_path": str(root),
        "patch_size": [32, 32],
        "n_epochs": 2,
        "batch_size": 8,
        "grad_accumulate_step": 2,
        "steps_per_epoch": 4,
        "val_steps_per_epoch": 2,
        "val_plot_interval": 2,
        "precision": "fp32",  # fast CPU compile in tests
    })
    config["model"]["encoder_weights"] = None

    trainer = Trainer(config)
    train_sampler = PatchSampler(stores[:2], (32, 32), 8, 4, seed=0)
    val_sampler = PatchSampler(stores[2:], (32, 32), 8, 2,
                               oversample_foreground_percent=0.0, seed=1)
    history = trainer.train(train_sampler, val_sampler)
    return trainer, history, results, (train_sampler, val_sampler), config


def test_device_batches_uint8_store_passthrough(tmp_path):
    """uint8-store batches are ALREADY raw bytes: the engine's compact
    device transfer must pass them through unchanged — the f32-path
    ``round(x*255)`` rescale applied to uint8 inputs corrupts every pixel
    (v*255 mod 256 = 256-v)."""
    from mmr_tpu.train.engine import Trainer

    root = tmp_path / "ds_u8"
    make_synthetic_dataset(root, n_videos=2, frames_per_video=2,
                           height=64, width=80, n_classes=2,
                           patch_size=(32, 32), image_dtype=np.uint8)
    stores = list_dataset_stores(root)
    config = get_default_config(2, [32, 32])
    config.update({"results_path": str(tmp_path / "res"),
                   "dataset_path": str(root), "patch_size": [32, 32],
                   "batch_size": 8, "steps_per_epoch": 1,
                   "val_steps_per_epoch": 1, "precision": "fp32",
                   "model": {**config["model"], "encoder_weights": None}})
    trainer = Trainer(config)
    sampler = PatchSampler(stores, (32, 32), batch_size=8, steps_per_epoch=1)
    # epoch 0 validation draws epoch_seed = 0*104729 + 2 (engine.py)
    raw_imgs, _ = next(iter(sampler.epoch(epoch_seed=2)))
    assert raw_imgs.dtype == np.uint8
    sampler2 = PatchSampler(stores, (32, 32), batch_size=8, steps_per_epoch=1)
    d_imgs, _ = next(iter(trainer._device_batches(sampler2, epoch=0,
                                                  train=False)))
    got = np.asarray(d_imgs)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, raw_imgs)  # no inversion/rescale


def test_mixed_store_dtypes_rejected(tmp_path):
    a = make_synthetic_dataset(tmp_path / "a", n_videos=1, frames_per_video=2,
                               height=64, width=80, n_classes=2,
                               patch_size=(32, 32), image_dtype=np.uint8)
    b = make_synthetic_dataset(tmp_path / "b", n_videos=1, frames_per_video=2,
                               height=64, width=80, n_classes=2,
                               patch_size=(32, 32))
    stores = list_dataset_stores(a) + list_dataset_stores(b)
    with pytest.raises(ValueError, match="mix image dtypes"):
        PatchSampler(stores, (32, 32), batch_size=2, steps_per_epoch=1)


def test_engine_trains_and_logs(smoke_run):
    trainer, history, results, _, _ = smoke_run
    assert len(history["epoch"]) == 2
    assert all(np.isfinite(history["train_loss"]))
    assert history["samples_per_sec"][0] > 0


def test_engine_artifacts(smoke_run):
    _, _, results, _, _ = smoke_run
    assert (results / "plots" / "loss.png").exists()
    assert (results / "training_dashboard.png").exists()
    assert (results / "plots" / "epoch_2.png").exists()  # val_plot_interval=2
    metrics = json.loads((results / "training_metrics.json").read_text())
    assert len(metrics["epoch"]) == 2
    loss_dict = pickle.loads((results / "loss_dict.pkl").read_bytes())
    assert len(loss_dict["train"]) == 2
    assert (results / "checkpoints" / "last_model").exists()
    assert (results / "checkpoints" / "best_model").exists()


def test_engine_resume_continues_epochs(smoke_run):
    from mmr_tpu.train.engine import Trainer

    trainer, history, results, samplers, config = smoke_run
    config2 = dict(config, n_epochs=3)
    t2 = Trainer(config2)
    t2.init_state()
    assert t2.maybe_resume() is True
    assert t2.start_epoch == 3
    t2.train(*samplers)
    loss_dict = pickle.loads((results / "loss_dict.pkl").read_bytes())
    assert len(loss_dict["train"]) == 3  # history stayed continuous


def test_architecture_diagram(smoke_run, tmp_path):
    """cli.visualize --architecture surface: layer summary + block diagram
    (the reference's Visualization_Segment_Prediction.py:233-305)."""
    from mmr_tpu.cli.visualize import save_architecture_diagram

    trainer, _, _, _, _ = smoke_run
    out = save_architecture_diagram(trainer, tmp_path)
    assert out.exists() and out.stat().st_size > 1000
