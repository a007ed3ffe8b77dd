"""Data layer tests: Zarr schema, splits, fg-oversampled sampler, augment."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmr_tpu.data import (
    VideoStore,
    make_synthetic_dataset,
    PatchSampler,
    VideoFrameDataset,
)
from mmr_tpu.data.zarr_io import list_dataset_stores
from mmr_tpu.data.splits import create_split_files, get_data_ids, generate_crossval_split
from mmr_tpu.data.augment import (
    AugmentConfig,
    augment_train_batch,
    augment_path_a_batch,
    center_crop_batch,
)
from mmr_tpu.data.pipeline import PrefetchIterator, microbatch_stacker


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    return make_synthetic_dataset(
        tmp_path_factory.mktemp("ds"), n_videos=4, frames_per_video=4,
        height=80, width=96, n_classes=3, patch_size=(48, 48), seed=3)


def test_store_schema_roundtrip(tmp_path):
    store = VideoStore.create(tmp_path / "v.zarr", 2, 32, 40, (16, 16))
    img = np.random.rand(3, 32, 40).astype(np.float32)
    mask = np.random.randint(0, 4, (32, 40)).astype(np.uint8)
    store.write_frame(0, img, mask)
    store.set_properties({"class_locations": {"1": [(0, 3, 4)]}})

    re = VideoStore(tmp_path / "v.zarr")
    assert re.shape == (2, 32, 40)
    np.testing.assert_allclose(np.asarray(re.image[:, 0]), img, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(re.mask[0]), mask)
    assert re.class_locations == {1: [[0, 3, 4]]}
    # schema details the reference tooling depends on
    meta = json.loads((tmp_path / "v.zarr" / "image" / "zarr.json").read_text())
    assert meta["shape"] == [3, 2, 32, 40]
    assert meta["chunk_grid"]["configuration"]["chunk_shape"] == [3, 1, 16, 16]
    assert any(c.get("name") == "blosc" for c in meta["codecs"])


def test_windowed_reads_pad_out_of_bounds(dataset):
    store = VideoStore(list_dataset_stores(dataset)[0])
    win = store.read_image_window(0, -8, -8, 32, 32)
    assert win.shape == (32, 32, 3)
    np.testing.assert_array_equal(win[:8, :8], 0.0)
    m = store.read_mask_window(0, 70, 90, 32, 32)
    assert m.shape == (32, 32)
    np.testing.assert_array_equal(m[-22:, -26:], 0)


def test_split_files(tmp_path):
    make_synthetic_dataset(tmp_path, n_videos=10, frames_per_video=1,
                           height=32, width=32, n_classes=2, patch_size=(16, 16))
    (tmp_path / "train_val_test_split.json").unlink()
    path = create_split_files(tmp_path, "train-val-test")
    data = json.loads(path.read_text())
    assert len(data["train"]) == 7 and len(data["val"]) == 1 and len(data["test"]) == 2
    assert not set(data["train"]) & set(data["test"])
    # idempotent
    before = path.read_text()
    create_split_files(tmp_path, "train-val-test")
    assert path.read_text() == before
    # 5-fold: each id in val exactly once
    folds = generate_crossval_split([f"d{i}" for i in range(10)])
    vals = [v for f in folds for v in f["val"]]
    assert sorted(vals) == sorted(f"d{i}" for i in range(10))
    create_split_files(tmp_path, "5-fold")
    assert get_data_ids(tmp_path, "5-fold", "train", fold=0)
    with pytest.raises(ValueError):
        create_split_files(tmp_path, "bogus")


def test_sampler_fixed_steps_and_fg_forcing(dataset):
    stores = list_dataset_stores(dataset)
    ps = PatchSampler(stores, (48, 48), batch_size=6, steps_per_epoch=4,
                      oversample_foreground_percent=0.33, seed=0)
    batches = list(ps.epoch())
    assert len(batches) == 4
    # deterministic strategy: positions >= round(6*(1-0.33)) = 4 are fg-forced
    fg_fracs = []
    for imgs, masks in batches:
        assert imgs.shape == (6, 48, 48, 3) and masks.shape == (6, 48, 48)
        fg_fracs.append([(masks[i] > 0).mean() for i in range(6)])
    fg = np.asarray(fg_fracs)
    # forced positions must actually contain foreground every time
    assert (fg[:, 4:] > 0).all()


def test_sampler_visits_all_before_repeat(dataset):
    stores = list_dataset_stores(dataset)
    ps = PatchSampler(stores[:1], (48, 48), batch_size=2, steps_per_epoch=2, seed=0)
    # store has 4 frames; 2 batches × 2 = 4 draws must cover all 4 samples
    idxs = ps._next_sample_indices(4)
    assert sorted(idxs) == [0, 1, 2, 3]


def test_video_dataset_windows(dataset):
    stores = list_dataset_stores(dataset)
    vd = VideoFrameDataset(stores[:2], infer_batch_size=3)
    items = list(vd)
    # 4 frames per video, window 3 → windows (0,3),(3,4) per video
    assert len(items) == 4
    assert items[0]["t0"] == 0 and items[0]["t1"] == 3
    assert items[1]["t0"] == 3 and items[1]["t1"] == 4
    assert items[0]["image"].shape == (3, 80, 96, 3)
    assert items[0]["mask"].shape == (3, 80, 96)


def test_augment_shapes_and_determinism(rng):
    imgs = jnp.asarray(rng.rand(3, 48, 48, 3).astype(np.float32))
    masks = jnp.asarray(rng.randint(0, 4, (3, 48, 48)))
    cfg = AugmentConfig(patch_size=(48, 48))
    a1 = augment_train_batch(jax.random.key(7), imgs, masks, cfg)
    a2 = augment_train_batch(jax.random.key(7), imgs, masks, cfg)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    assert a1[0].shape == (3, 48, 48, 3) and a1[1].shape == (3, 48, 48)
    # masks stay valid class ids
    assert set(np.unique(np.asarray(a1[1]))) <= {0, 1, 2, 3}


def test_heavy_augment_crops_initial_patch(rng):
    cfg = AugmentConfig(patch_size=(48, 48), heavy=True)
    iph, ipw = cfg.initial_patch_size
    assert iph > 48 and ipw > 48
    imgs = jnp.asarray(rng.rand(2, iph, ipw, 3).astype(np.float32))
    masks = jnp.asarray(rng.randint(0, 3, (2, iph, ipw)))
    ai, am = augment_train_batch(jax.random.key(0), imgs, masks, cfg)
    assert ai.shape == (2, 48, 48, 3) and am.shape == (2, 48, 48)


def test_center_crop_batch(rng):
    imgs = jnp.asarray(rng.rand(2, 60, 70, 3).astype(np.float32))
    masks = jnp.asarray(rng.randint(0, 3, (2, 60, 70)))
    ci, cm = center_crop_batch(imgs, masks, (48, 48))
    np.testing.assert_array_equal(np.asarray(ci[0]), np.asarray(imgs)[0, 6:54, 11:59])


def test_path_a_augment(rng):
    imgs = jnp.asarray(rng.rand(2, 40, 40, 3).astype(np.float32))
    gts = jnp.asarray(rng.rand(2, 40, 40, 3).astype(np.float32))
    masks = jnp.asarray(rng.randint(0, 3, (2, 40, 40)))
    ai, ag, am = augment_path_a_batch(jax.random.key(1), imgs, gts, masks)
    assert ai.shape == imgs.shape and am.shape == masks.shape
    assert float(ai.min()) >= 0.0 and float(ai.max()) <= 1.0


def test_prefetch_iterator_and_stacker():
    src = [(np.full((2, 4, 4, 3), i, np.float32), np.full((2, 4, 4), i, np.int32))
           for i in range(4)]
    stacked = list(microbatch_stacker(iter(src), 2))
    assert len(stacked) == 2
    assert stacked[0][0].shape == (2, 2, 4, 4, 3)
    out = list(PrefetchIterator(iter(src), lambda x: (x[0] * 2, x[1]), depth=2))
    assert len(out) == 4
    np.testing.assert_array_equal(out[1][0], src[1][0] * 2)

    def boom():
        yield src[0]
        raise RuntimeError("worker failed")

    with pytest.raises(RuntimeError, match="worker failed"):
        list(PrefetchIterator(boom(), lambda x: x))


def test_sampler_probabilistic_oversampling(dataset):
    """probabilistic strategy (Pre_Process.py:808-826): each batch position is
    fg-forced i.i.d. with p=oversample_ratio, independent of position."""
    stores = list_dataset_stores(dataset)
    ps = PatchSampler(stores, (48, 48), batch_size=6, steps_per_epoch=40,
                      oversample_foreground_percent=0.5,
                      oversample_strategy="probabilistic", seed=0)
    decisions = np.asarray([[ps._force_fg(pos) for pos in range(6)]
                            for _ in range(200)])
    rate = decisions.mean()
    assert 0.4 < rate < 0.6                       # matches p=0.5
    per_pos = decisions.mean(axis=0)
    assert per_pos.std() < 0.1                    # position-independent
    assert decisions[:, -1].mean() < 1.0          # not the deterministic rule
    # and batches still come out well-formed
    imgs, masks = next(iter(ps.epoch()))
    assert imgs.shape == (6, 48, 48, 3) and masks.shape == (6, 48, 48)


def test_uint8_store_roundtrip_and_sampler_dtype(tmp_path):
    """The compact uint8 store variant (VideoStore.create image_dtype=uint8):
    lossless round trip for 8-bit-origin (k/255) pixels, f32 sync-read
    contract preserved, and the sampler yields uint8 batches end-to-end
    (the train step divides by 255 on device)."""
    from mmr_tpu.data.patch_dataset import PatchSampler
    from mmr_tpu.data.zarr_io import VideoStore

    rng = np.random.RandomState(3)
    store = VideoStore.create(tmp_path / "v.zarr", 2, 64, 96, (32, 32),
                              image_dtype=np.uint8)
    k = rng.randint(0, 256, (3, 64, 96)).astype(np.float32)
    store.write_frame(0, k / 255.0, np.zeros((64, 96), np.uint8))
    store.write_frame(1, k / 255.0, np.ones((64, 96), np.uint8))
    store.set_properties({"class_locations": {"1": [[1, 5, 5]]}})

    # sync read contract: f32 in [0,1], exact for k/255 sources
    img = store.read_image_window(0, 0, 0, 64, 96)
    np.testing.assert_allclose(img, (k / 255.0).transpose(1, 2, 0),
                               atol=1e-7)
    # async path delivers raw uint8
    finish = store.read_windows_async(0, 0, 0, 64, 96)
    img_u8, mask = finish()
    assert img_u8.dtype == np.uint8
    np.testing.assert_array_equal(img_u8,
                                  k.transpose(1, 2, 0).astype(np.uint8))
    # whole-frame read contract: STORE dtype (compact uint8 stays raw so
    # inference H2D is 1 byte/px; the sliding-window fn divides on device)
    frames, masks = store.read_frames(0, 2)
    assert frames.dtype == store.image_dtype

    sampler = PatchSampler([tmp_path / "v.zarr"], patch_size=(32, 32),
                           batch_size=4, steps_per_epoch=2)
    for imgs, msks in sampler.epoch(0):
        assert imgs.dtype == np.uint8
        assert msks.dtype == np.uint8


@pytest.mark.slow
def test_host_pipeline_sustained_rate(tmp_path):
    """The threaded sampler + prefetch stack must sustain a healthy patch
    rate from full-HD zarr stores (VERDICT r2 missing #4; the full
    measurement lives in benchmarks/bench_pipeline.py + docs/PERF.md).
    Floor is conservative for a single-core CI host."""
    import time

    from mmr_tpu.data.patch_dataset import PatchSampler
    from mmr_tpu.data.synthetic import make_synthetic_dataset

    root = make_synthetic_dataset(tmp_path, n_videos=1, frames_per_video=4,
                                  height=1080, width=1920, n_classes=9,
                                  patch_size=(512, 512), seed=0,
                                  image_dtype=np.uint8)
    stores = list_dataset_stores(root)
    sampler = PatchSampler(stores, patch_size=(512, 512), batch_size=8,
                           steps_per_epoch=4)
    for _ in sampler.epoch(0):
        pass  # warm page cache / pools
    t0 = time.perf_counter()
    n = 0
    for imgs, _ in sampler.epoch(1):
        n += imgs.shape[0]
    rate = n / (time.perf_counter() - t0)
    assert rate > 30.0, rate
