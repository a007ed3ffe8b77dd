"""Statistical / behavioral tests of the augmentation pipelines and the
PNG-folder dataset + pretrained weight store."""

import numpy as np
import pytest
import cv2
import jax
import jax.numpy as jnp

from mmr_tpu.data.augment import AugmentConfig, augment_train_batch
from mmr_tpu.data.png_dataset import PngFolderDataset
from mmr_tpu.data.classes import (
    sarrarp50_key, sarrarp50_names, write_class_json, load_class_json,
)
from mmr_tpu.models.pretrained import (
    save_weight_store, load_weight_store, load_encoder_weights,
)


def test_mirror_rate_near_half():
    """Soft regime mirrors the W axis with p=0.5 per sample."""
    cfg = AugmentConfig(patch_size=(16, 16), rotation=False, scaling=False,
                        gaussian_noise=False, gaussian_blur=False,
                        brightness=False, contrast=False, low_resolution=False,
                        gamma=False, mirror=True)
    img = jnp.asarray(np.tile(np.arange(16, dtype=np.float32)[None, None, :, None],
                              (256, 16, 1, 3)))
    mask = jnp.zeros((256, 16, 16), jnp.int32)
    out, _ = augment_train_batch(jax.random.key(0), img, mask, cfg)
    flipped = np.asarray(out[:, 0, 0, 0] > out[:, 0, -1, 0])
    rate = flipped.mean()
    assert 0.35 < rate < 0.65, rate


def test_all_off_is_identity_crop():
    cfg = AugmentConfig(patch_size=(16, 16), rotation=False, scaling=False,
                        gaussian_noise=False, gaussian_blur=False,
                        brightness=False, contrast=False, low_resolution=False,
                        gamma=False, mirror=False)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 3, (4, 16, 16)))
    out_i, out_m = augment_train_batch(jax.random.key(1), img, mask, cfg)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(img), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(mask))


def test_per_sample_spatial_mode_runs():
    cfg = AugmentConfig(patch_size=(16, 16), per_sample_spatial=True)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 3, (4, 16, 16)))
    out_i, out_m = augment_train_batch(jax.random.key(1), img, mask, cfg)
    assert out_i.shape == (4, 16, 16, 3) and out_m.shape == (4, 16, 16)


# ------------------------------------------------------------- PNG dataset

@pytest.fixture
def png_root(tmp_path):
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "groundtruth").mkdir(parents=True)
        for i in range(4):
            img = rng.randint(0, 255, (40, 50, 3), dtype=np.uint8)
            mask = rng.randint(0, 10, (40, 50), dtype=np.uint8)
            cv2.imwrite(str(tmp_path / split / "images" / f"f{i}.png"), img)
            cv2.imwrite(str(tmp_path / split / "groundtruth" / f"f{i}.png"), mask)
    return tmp_path


def test_png_dataset(png_root):
    ds = PngFolderDataset(png_root, "train", (32, 32), -1, 10)
    assert len(ds) == 4
    img, ids = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert ids.shape == (32, 32) and ids.max() <= 9
    batches = list(ds.epoch(2, seed=1))
    assert len(batches) == 2 and batches[0][0].shape == (2, 32, 32, 3)
    # full-res mode keeps original size
    ds_full = PngFolderDataset(png_root, "test", (32, 32), -1, 10, full_res=True)
    img, ids = ds_full[0]
    assert img.shape == (40, 50, 3)
    # RAM cache returns identical data (deterministic path: no random crop)
    ds_cache = PngFolderDataset(png_root, "test", (32, 32), 256, 10, cache_in_ram=True)
    a = ds_cache[1][0]
    b = ds_cache[1][0]
    np.testing.assert_array_equal(a, b)
    with pytest.raises(FileNotFoundError):
        PngFolderDataset(png_root, "val", (32, 32), -1, 10)


def test_class_json_roundtrip(tmp_path):
    path = write_class_json(tmp_path / "classes.json")
    key, names = load_class_json(path)
    np.testing.assert_array_equal(key, sarrarp50_key())
    assert names == sarrarp50_names()
    assert names[4] == "Suturing needle"
    assert tuple(key[3]) == (0, 0, 255)


# -------------------------------------------------------- pretrained store

def test_weight_store_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("MMR_TPU_WEIGHTS_DIR", str(tmp_path))
    params = {"conv1": {"kernel": np.ones((3, 3, 3, 8), np.float32)},
              "bn1": {"scale": np.ones(8), "bias": np.zeros(8)}}
    stats = {"bn1": {"mean": np.zeros(8), "var": np.ones(8)}}
    save_weight_store("resnet18", params, stats)
    p2, s2 = load_weight_store("resnet18")
    np.testing.assert_array_equal(p2["conv1"]["kernel"], params["conv1"]["kernel"])
    np.testing.assert_array_equal(s2["bn1"]["var"], stats["bn1"]["var"])
    with pytest.raises(FileNotFoundError):
        load_weight_store("resnet34")


def test_factory_missing_weights_falls_back(tmp_path, monkeypatch, caplog):
    import logging
    from mmr_tpu.models import create_model

    monkeypatch.setenv("MMR_TPU_WEIGHTS_DIR", str(tmp_path / "empty"))
    m, hook = create_model("Unet", encoder_name="resnet18",
                           encoder_weights="imagenet", classes=3,
                           dtype=jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)), train=False)
    with caplog.at_level(logging.WARNING):
        out = hook(vs)
    assert out is vs  # unchanged fallback
    assert any("random init" in r.message for r in caplog.records)


def test_png_train_random_crop(png_root):
    """cropSize == -1 semantics: train items resize to the fixed train size
    (540x960, clamped to >= target) then random-crop to the target
    (SegNetDataLoaderV1_SAR.py:153-156,210-213)."""
    ds = PngFolderDataset(png_root, "train", (32, 32), -1, 10)
    rng = np.random.RandomState(0)
    a = ds._load(0, crop_rng=rng)[0]
    b = ds._load(0, crop_rng=rng)[0]
    assert a.shape == (32, 32, 3) and b.shape == (32, 32, 3)
    assert not np.array_equal(a, b)  # different random crops
    # test split: deterministic plain resize
    ds_t = PngFolderDataset(png_root, "test", (32, 32), -1, 10)
    t1 = ds_t._load(0)[0]
    t2 = ds_t._load(0)[0]
    np.testing.assert_array_equal(t1, t2)
