"""Foreground-oversampled patch sampling over Zarr video stores.

Rebuilds the training-distribution semantics of the reference's
``SegTrainingDataset`` + ``CustomBatchSampler`` (``Pre_Process.py:538-1082``)
as one host-side sampler feeding the device pipeline:

- fixed ``steps_per_epoch`` regardless of dataset size (250 train / 50 val,
  ``Pre_Process.py:1131-1134``)
- every sample is visited once before any repeats (``:1032-1062``)
- foreground forcing is positional: the **last 33%** of each batch is centered
  on a stored foreground voxel of a random class (nnU-Net style,
  ``:787-806``); a probabilistic variant is also available (``:808-826``)
- bbox math matches ``get_bbox`` (``:828-885``): pad-aware uniform corner
  sampling, fg-centered clamped into bounds
- patch reads are lazy windowed Zarr reads (only touched chunks decoded)

The sampler emits whole NHWC numpy batches; normalization/augmentation run
jitted on device (SURVEY.md §7.1(4)).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mmr_tpu.data.zarr_io import VideoStore


class PatchSampler:
    def __init__(
        self,
        store_paths: list[str | Path],
        patch_size: tuple[int, int],
        batch_size: int,
        steps_per_epoch: int,
        oversample_foreground_percent: float = 0.33,
        oversample_strategy: str = "deterministic",  # | 'probabilistic'
        initial_patch_size: tuple[int, int] | None = None,
        seed: int = 6210,
    ):
        if not store_paths:
            raise ValueError("no stores given")
        self.stores = [VideoStore(p) for p in store_paths]
        dtypes = {np.dtype(s.image_dtype) for s in self.stores}
        if len(dtypes) > 1:
            # the batch buffer takes stores[0]'s dtype — a mixed f32/uint8
            # dataset (e.g. converted partly before and partly after
            # switching to --image_dtype uint8) would silently truncate or
            # mis-scale the minority-dtype stores
            raise ValueError(
                f"stores mix image dtypes {sorted(map(str, dtypes))}; "
                "reconvert the dataset with one --image_dtype")
        self.patch_size = tuple(int(p) for p in patch_size)
        self.initial_patch_size = tuple(int(p) for p in (initial_patch_size or patch_size))
        self.batch_size = int(batch_size)
        self.steps_per_epoch = int(steps_per_epoch)
        self.oversample_foreground_percent = float(oversample_foreground_percent)
        self.oversample_strategy = oversample_strategy
        self.rng = np.random.RandomState(seed)
        # (store_idx, frame_idx) global sample index
        self.samples = [
            (si, t) for si, s in enumerate(self.stores) for t in range(s.shape[0])
        ]
        self._perm: list[int] = []
        # per-store class_locations grouped by frame ONCE here: coords are
        # (t, y, x) tuples; a per-sample linear rescan of the whole store's
        # list (~150k tuples on a real video) on the prefetch thread can
        # outrun the device step and starve the pipeline
        self._class_locs: list[dict[int, dict[int, list]]] = []
        for s in self.stores:
            by_frame: dict[int, dict[int, list]] = {}
            for c, coords in s.class_locations.items():
                for (tt, y, x) in coords:
                    by_frame.setdefault(int(tt), {}).setdefault(
                        int(c), []).append((y, x))
            # class iteration order feeds an rng.randint choice — keep it
            # sorted so the draw sequence is independent of coord order
            self._class_locs.append(
                {t: dict(sorted(d.items())) for t, d in by_frame.items()})

    # --------------------------------------------------------------- sampler
    def _next_sample_indices(self, n: int) -> list[int]:
        """Every sample used once before repetition (Pre_Process.py:1032-1062)."""
        out = []
        while len(out) < n:
            if not self._perm:
                self._perm = list(self.rng.permutation(len(self.samples)))
            out.append(self._perm.pop())
        return out

    def _force_fg(self, position_in_batch: int) -> bool:
        if self.oversample_foreground_percent <= 0:
            return False
        if self.oversample_strategy == "probabilistic":
            return bool(self.rng.uniform() < self.oversample_foreground_percent)
        # deterministic: last 33% of batch positions (Pre_Process.py:787-806)
        return position_in_batch >= round(
            self.batch_size * (1 - self.oversample_foreground_percent))

    def _get_bbox(self, data_shape, force_fg: bool, frame_locs) -> tuple[int, int]:
        """2-D version of nnU-Net ``get_bbox`` (Pre_Process.py:828-885)."""
        dim = 2
        patch = self.initial_patch_size
        need_to_pad = [max(0, patch[d] - data_shape[d]) for d in range(dim)]
        lbs = [-need_to_pad[i] // 2 for i in range(dim)]
        ubs = [data_shape[i] + need_to_pad[i] // 2 + need_to_pad[i] % 2 - patch[i]
               for i in range(dim)]
        bbox = [int(self.rng.randint(lbs[i], ubs[i] + 1)) for i in range(dim)]
        if force_fg and frame_locs:
            eligible = [c for c, v in frame_locs.items() if len(v) > 0]
            if eligible:
                cls = eligible[self.rng.randint(len(eligible))]
                voxels = frame_locs[cls]
                vy, vx = voxels[self.rng.randint(len(voxels))]
                for i, v in enumerate((vy, vx)):
                    bbox[i] = max(lbs[i], min(int(v) - patch[i] // 2, ubs[i]))
        return bbox[0], bbox[1]

    def _frame_locations(self, store_idx: int, t: int) -> dict[int, list]:
        """class_locations restricted to frame t (O(1) — grouped in init)."""
        return self._class_locs[store_idx].get(int(t), {})

    # ----------------------------------------------------------------- epoch
    def epoch(self, epoch_seed: int | None = None, num_workers: int = 8):
        """Yield ``steps_per_epoch`` batches of (images NHWC in the STORE
        dtype — uint8 0..255 for compact stores, f32 [0,1] for the
        reference schema; the train/eval steps divide uint8 by 255 on
        device — masks NHW u8).

        All of a batch's Zarr window reads are issued as tensorstore FUTURES
        up front and decoded in parallel on tensorstore's C++ thread pool —
        the reference's ``num_workers`` DataLoader processes
        (``Pre_Process.py:1137-1145``) collapse into this plus the on-device
        augmentation. ``num_workers`` caps the assembly thread pool (the
        numpy pad/transpose epilogues, which do hold the GIL briefly)."""
        from concurrent.futures import ThreadPoolExecutor

        if epoch_seed is not None:
            self.rng = np.random.RandomState(epoch_seed)
        iph, ipw = self.initial_patch_size

        with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
            for _ in range(self.steps_per_epoch):
                idxs = self._next_sample_indices(self.batch_size)
                # all RNG-dependent decisions happen here, in order, on the
                # caller thread — reads themselves are deterministic
                finishers = []
                for pos, sample_idx in enumerate(idxs):
                    si, t = self.samples[sample_idx]
                    frame_locs = (self._frame_locations(si, t)
                                  if self._force_fg(pos) else None)
                    y0, x0 = self._get_bbox(self.stores[si].shape[1:],
                                            frame_locs is not None, frame_locs)
                    finishers.append(self.stores[si].read_windows_async(
                        t, y0, x0, iph, ipw))
                # uint8 stores flow through as uint8 (the train/eval steps
                # divide by 255 on device); f32 stores stay f32 [0,1]
                imgs = np.empty((self.batch_size, iph, ipw, 3),
                                self.stores[0].image_dtype)
                masks = np.empty((self.batch_size, iph, ipw), np.uint8)
                for pos, (img, mask) in enumerate(
                        pool.map(lambda f: f(), finishers)):
                    imgs[pos] = img
                    masks[pos] = mask
                yield imgs, masks

    def __len__(self):
        return self.steps_per_epoch
