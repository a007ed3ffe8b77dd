"""ZIP→Zarr converter round trip on a synthetic video (the
``mmr_create_dataset`` capability, Data_Loader.py:402-695)."""

import io
import zipfile

import cv2
import numpy as np
import pytest

from mmr_tpu.data.convert import (
    convert_zip_dataset,
    calculate_dataset_statistics,
    _mask_frame_mapping,
)
from mmr_tpu.data.zarr_io import VideoStore, list_dataset_stores


def _make_video_zip(tmp_path, name, n_frames=8, h=48, w=64, annotated=(0, 3, 6)):
    vdir = tmp_path / "vsrc"
    vdir.mkdir(exist_ok=True)
    avi = vdir / "video_left.avi"
    writer = cv2.VideoWriter(str(avi), cv2.VideoWriter_fourcc(*"MJPG"), 5, (w, h))
    frames = []
    for t in range(n_frames):
        f = np.full((h, w, 3), t * 20 % 255, np.uint8)
        f[10:20, 10:30] = (255, 0, 0)
        frames.append(f)
        writer.write(f)
    writer.release()

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.write(avi, "video_left.avi")
        for t in annotated:
            mask = np.zeros((h, w), np.uint8)
            mask[10:20, 10:30] = 1
            mask[30:40, 40:50] = 2
            ok, png = cv2.imencode(".png", mask)
            assert ok
            zf.writestr(f"segmentation/{t:09d}.png", png.tobytes())
    zip_path = tmp_path / name
    zip_path.write_bytes(buf.getvalue())
    return zip_path


def test_mask_frame_mapping():
    names = ["segmentation/000000012.png", "segmentation/000000000.png",
             "video.avi", "._junk.png"]
    m = _mask_frame_mapping(names)
    assert m == {12: "segmentation/000000012.png", 0: "segmentation/000000000.png"}


def test_convert_nested_zip(tmp_path):
    inner = _make_video_zip(tmp_path, "video_01.zip")
    outer = tmp_path / "train.zip"
    with zipfile.ZipFile(outer, "w") as zf:
        zf.write(inner, "video_01.zip")

    out = convert_zip_dataset(outer, tmp_path / "ds", n_classes=2,
                              patch_size=(32, 32))
    stores = list_dataset_stores(out)
    assert len(stores) == 1
    vs = VideoStore(stores[0])
    assert vs.shape == (3, 48, 64)  # 3 annotated frames
    assert tuple(vs.image.shape) == (3, 3, 48, 64)
    img0 = np.asarray(vs.image[:, 0])
    assert img0.dtype == np.float32 and 0.0 <= img0.min() and img0.max() <= 1.0
    mask0 = np.asarray(vs.mask[0])
    assert set(np.unique(mask0)) == {0, 1, 2}
    locs = vs.class_locations
    assert len(locs[1]) > 0 and len(locs[2]) > 0
    assert all(len(v) <= 50 * 3 for v in locs.values())  # ≤50/class/frame
    # coords actually point at the class
    t, y, x = locs[1][0]
    assert np.asarray(vs.mask[t])[y, x] == 1


def test_dataset_statistics(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(5):
        cv2.imwrite(str(d / f"{i}.png"), np.full((8, 8, 3), 128, np.uint8))
    mean, std = calculate_dataset_statistics(d)
    np.testing.assert_allclose(mean, 128 / 255, atol=1e-3)
    np.testing.assert_allclose(std, 0.0, atol=1e-3)
    with pytest.raises(FileNotFoundError):
        calculate_dataset_statistics(tmp_path / "nope")


def test_extract_frames_dataset(tmp_path):
    """Path-A offline tooling: video folders → <split>/{images,groundtruth}
    PNG dataset with an 80/20 video split (data_preprocessing.py:57-157)."""
    from mmr_tpu.data.convert import extract_frames_dataset

    raw = tmp_path / "raw"
    for v in range(3):
        vdir = raw / f"video_{v:02d}"
        seg = vdir / "segmentation"
        seg.mkdir(parents=True)
        writer = cv2.VideoWriter(str(vdir / "video_left.avi"),
                                 cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 48))
        for t in range(6):
            writer.write(np.full((48, 64, 3), 40 * t, np.uint8))
        writer.release()
        for t in (0, 2, 4):
            mask = np.zeros((48, 64), np.uint8)
            mask[10:20, 10:30] = 1
            cv2.imwrite(str(seg / f"{t:09d}.png"), mask)

    out = extract_frames_dataset(raw, tmp_path / "png", val_fraction=0.34, seed=0)
    train_imgs = sorted((out / "train" / "images").glob("*.png"))
    val_imgs = sorted((out / "val" / "images").glob("*.png"))
    assert len(train_imgs) + len(val_imgs) == 9  # 3 videos × 3 annotated frames
    assert len(val_imgs) == 3                    # 1 of 3 videos held out
    gt = sorted((out / "train" / "groundtruth").glob("*.png"))
    assert len(gt) == len(train_imgs)
    # matching names between images and groundtruth
    assert {p.name for p in gt} == {p.name for p in train_imgs}


def test_mini_dataset_builder(tmp_path):
    """--n_videos + split writer: the Mini_Dataset_ZarrFile.ipynb workflow
    (VERDICT r1 missing #5) as a first-class tool."""
    import json
    from mmr_tpu.data.convert import write_mini_split
    from mmr_tpu.data.splits import get_data_ids
    from mmr_tpu.data.synthetic import make_synthetic_dataset

    make_synthetic_dataset(tmp_path, n_videos=5, frames_per_video=2,
                           height=40, width=48, n_classes=3, patch_size=(16, 16))
    (tmp_path / "train_val_test_split.json").unlink()
    path = write_mini_split(tmp_path)
    split = json.loads(path.read_text())
    assert len(split["train"]) == 4 and len(split["val"]) == 1
    assert split["test"] == split["val"]
    assert not set(split["train"]) & set(split["val"])
    # consumable by the standard split reader
    assert get_data_ids(tmp_path, "train-val-test", "train") == split["train"]
