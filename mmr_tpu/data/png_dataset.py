"""PNG-folder dataset (Path A's ``SegNetDataset``,
``SegNetDataLoaderV1_SAR.py``).

Directory convention: ``<root>/<split>/{images,groundtruth}/*.png`` with
matching filenames (``:39-41,117-127``). Per item:

- image: PNG → RGB float32 [0,1], resized (train: 540×960 in the reference's
  full pipeline; here the CLI's ``resizedHeight/Width``) with bilinear
- mask: grayscale id-coded PNG (sarrarp50 convention: pixel value = class id,
  clamped to [0, n_classes-1], ``:172-176``) or RGB color-coded (matched
  against the class key, ``:178-183``), resized nearest
- optional in-RAM caching (the ``SegNetDataLoaderV2`` capability — the
  reference ships that variant only as a compiled .pyc; here it's a flag)

Augmentation (flips/rot90/brightness/contrast/random-crop) runs **on device**
via :func:`mmr_tpu.data.augment.augment_path_a_batch`; this class only loads
and resizes. Batches come from :meth:`epoch` as NHWC numpy arrays.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from mmr_tpu.data.classes import sarrarp50_key


class PngFolderDataset:
    def __init__(
        self,
        root: str | Path,
        split: str = "train",
        resized_hw: tuple[int, int] = (256, 256),
        crop_size: int = 256,
        num_classes: int = 10,
        color_key: np.ndarray | None = None,
        id_coded_masks: bool = True,
        cache_in_ram: bool = False,
        full_res: bool = False,
    ):
        self.root = Path(root) / split
        self.img_dir = self.root / "images"
        self.gt_dir = self.root / "groundtruth"
        if not self.img_dir.is_dir():
            raise FileNotFoundError(str(self.img_dir))
        self.files = sorted(p.name for p in self.img_dir.glob("*.png"))
        if not self.files:
            raise FileNotFoundError(f"no PNGs under {self.img_dir}")
        self.split = split
        self.resized_hw = resized_hw
        self.crop_size = crop_size
        self.num_classes = num_classes
        self.key = color_key if color_key is not None else sarrarp50_key()
        self.id_coded = id_coded_masks
        self.full_res = full_res
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] | None = (
            {} if cache_in_ram else None)

    def __len__(self):
        return len(self.files)

    # train images resize to 540×960 before the random crop — the reference's
    # fixed train-time size (SegNetDataLoaderV1_SAR.py:153-156)
    TRAIN_RESIZE_HW = (540, 960)

    def _load(self, i: int, crop_rng: np.random.RandomState | None = None
              ) -> tuple[np.ndarray, np.ndarray]:
        random_crop = (self.split == "train" and self.crop_size == -1
                       and not self.full_res)
        if self._cache is not None and i in self._cache and not random_crop:
            return self._cache[i]
        if random_crop and self._cache is not None and i in self._cache:
            # cache holds the RESIZED pre-crop pair; only the (cheap)
            # random crop runs per access — without this, cache_in_ram was
            # silently bypassed for the cropSize == -1 training regime
            # (full PNG decode + resize per epoch per image)
            img, gt = self._cache[i]
            return self._random_crop(img, gt, crop_rng)
        name = self.files[i]
        img = cv2.cvtColor(cv2.imread(str(self.img_dir / name)), cv2.COLOR_BGR2RGB)
        gt = cv2.imread(str(self.gt_dir / name), cv2.IMREAD_UNCHANGED)
        if gt is None:
            raise FileNotFoundError(str(self.gt_dir / name))
        if random_crop:
            # resize to the fixed train size, then random-crop to target
            # (cropSize == -1 semantics, SegNetDataLoaderV1_SAR.py:210-213)
            th, tw = self.resized_hw
            rh = max(self.TRAIN_RESIZE_HW[0], th)
            rw = max(self.TRAIN_RESIZE_HW[1], tw)
            img = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR)
            gt = cv2.resize(gt, (rw, rh), interpolation=cv2.INTER_NEAREST)
            if self._cache is not None:
                self._cache[i] = (img, gt)
            return self._random_crop(img, gt, crop_rng)
        elif not self.full_res:
            h, w = self.resized_hw
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
            gt = cv2.resize(gt, (w, h), interpolation=cv2.INTER_NEAREST)
        out = self._finish(img, gt)
        if self._cache is not None:
            self._cache[i] = out
        return out

    def _finish(self, img: np.ndarray, gt: np.ndarray):
        if gt.ndim == 3:  # RGB color-coded → ids via the key
            eq = (gt[..., None, :] == self.key[None, None]).all(-1)
            ids = np.where(eq.any(-1), eq.argmax(-1), 0)
        else:  # id-coded grayscale (sarrarp50), clamp like :172-176
            ids = np.clip(gt, 0, self.num_classes - 1)
        return (img.astype(np.float32) / 255.0, ids.astype(np.int32))

    def _random_crop(self, img: np.ndarray, gt: np.ndarray,
                     crop_rng: np.random.RandomState | None):
        th, tw = self.resized_hw
        rh, rw = img.shape[0], img.shape[1]
        rng = crop_rng or np.random
        y0 = int(rng.randint(0, rh - th + 1))
        x0 = int(rng.randint(0, rw - tw + 1))
        return self._finish(img[y0:y0 + th, x0:x0 + tw],
                            gt[y0:y0 + th, x0:x0 + tw])

    def __getitem__(self, i: int):
        return self._load(i)

    def epoch(self, batch_size: int, shuffle: bool | None = None,
              seed: int = 0, drop_last: bool = True):
        """Yield (images NHWC f32, masks NHW i32) batches."""
        rng = np.random.RandomState(seed)
        order = np.arange(len(self))
        if shuffle if shuffle is not None else self.split == "train":
            rng.shuffle(order)
        n = len(order) - (len(order) % batch_size if drop_last else 0)
        for s in range(0, max(n, 1 if not drop_last else 0), batch_size):
            idx = order[s:s + batch_size]
            if len(idx) == 0:
                return
            items = [self._load(int(i), crop_rng=rng) for i in idx]
            yield (np.stack([x[0] for x in items]),
                   np.stack([x[1] for x in items]))
