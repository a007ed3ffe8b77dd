"""CLI integration tests (arg validation fast paths + a Path-A smoke train)."""

import numpy as np
import pytest
import cv2

from mmr_tpu.cli.train_model import parse_args


def test_train_model_arg_validation(tmp_path):
    ds, res = str(tmp_path / "ds"), str(tmp_path / "res")
    args, unknown = parse_args([ds, res, "train-val-test", "9", "[64,64]",
                                "--batch_size", "2"])
    assert args.n_classes == 9 and unknown == ["--batch_size", "2"]
    with pytest.raises(SystemExit):  # fold required for 5-fold
        parse_args([ds, res, "5-fold", "9", "[64,64]"])
    with pytest.raises(SystemExit):  # fold invalid without 5-fold
        parse_args([ds, res, "train-val-test", "9", "[64,64]", "-f", "0"])
    (tmp_path / "res").mkdir()
    (tmp_path / "res" / "something").touch()
    with pytest.raises(SystemExit):  # refuses non-empty results dir w/o -c
        parse_args([ds, res, "train-val-test", "9", "[64,64]"])


@pytest.fixture
def png_root(tmp_path):
    rng = np.random.RandomState(1)
    for split in ("train", "val"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "groundtruth").mkdir(parents=True)
        for i in range(8):
            mask = np.zeros((48, 48), np.uint8)
            mask[8:24, 8:40] = 1
            mask[30:40, 5:20] = 2
            img = (np.eye(3, dtype=np.uint8)[mask] * 200 + 20)
            img = img + rng.randint(0, 30, img.shape, dtype=np.uint8)
            cv2.imwrite(str(tmp_path / split / "images" / f"f{i}.png"), img)
            cv2.imwrite(str(tmp_path / split / "groundtruth" / f"f{i}.png"), mask)
    return tmp_path


@pytest.mark.slow
def test_train_path_a_smoke(png_root, tmp_path):
    """2-epoch Path-A run on a tiny PNG dataset: trains, logs, checkpoints,
    writes curves (the argparse-surface analog of the notebook smoke run)."""
    from mmr_tpu.cli.train_path_a import main

    save = tmp_path / "run"
    rc = main(["--data_dir", str(png_root), "--model", "unet",
               "--epochs", "2", "--trainBatchSize", "8", "--valBatchSize", "8",
               "--lr", "1e-3", "--optimizer", "Adam", "--dice_loss_factor", "0.5",
               "--resizedHeight", "48", "--resizedWidth", "48", "--cropSize", "-1",
               "--save_dir", str(save), "--heavy_metric_interval", "1"])
    assert rc == 0
    assert (save / "train.log").exists()
    assert (save / "loss.png").exists()
    assert (save / "accuracy.png").exists()
    assert (save / "checkpoints" / "best_f1").exists()
    assert (save / "epoch_2_samples.png").exists()
    log = (save / "train.log").read_text()
    assert "heavy metrics" in log  # dice+hausdorff cadence ran


@pytest.mark.slow
def test_train_model_5fold_and_heavy_aug(tmp_path):
    """5-fold splitting and the heavy (nnU-Net) augmentation regime through
    the real CLI: the sampler must feed enlarged initial patches that the
    on-device spatial transform crops back to patch size."""
    import jax

    from mmr_tpu.cli.train_model import main
    from mmr_tpu.data import make_synthetic_dataset

    ds = tmp_path / "ds"
    make_synthetic_dataset(ds, n_videos=5, frames_per_video=2,
                           height=64, width=80, n_classes=2,
                           patch_size=(32, 32), seed=2)
    rc = main([str(ds), str(tmp_path / "res"), "5-fold", "2", "[32,32]",
               "-f", "1",
               "--batch_size", "8", "--n_epochs", "1", "--steps_per_epoch", "2",
               "--val_steps_per_epoch", "1", "--precision", "fp32",
               "--transformations_heavy_augmentation", "true",
               "--model_encoder_weights", "none"])
    assert rc == 0
    assert (ds / "crossval_split.json").exists()
    assert (tmp_path / "res" / "checkpoints" / "best_model").exists()
