"""Zarr-format video stores, tensorstore-backed (host-side IO).

Keeps the reference's on-disk schema byte-compatible (zarr v3, as written by
``Data_Loader.py:303-397`` with zarr-python 3.1.1):

    <dataset>/data/data_NNN.zarr/
        zarr.json            (group; attrs: properties.class_locations)
        image/               (3, T, H, W) float32, chunks (3, 1, *patch),
                             blosc-zstd clevel 3 bitshuffle (Data_Loader.py:664-666)
        mask/                (T, H, W) uint8, chunks (1, *patch)

``class_locations``: {class_id (1..n): [(t, y, x), ...]} — ≤50 sampled
foreground coords per class per frame (``Data_Loader.py:330-397``), consumed
by the foreground-oversampling patch sampler.

TPU decisions: decode stays on host CPU (blosc is C); reads are windowed
(`center_pad_bbox_crop`) so only the training patch's chunks are touched;
arrays hand to JAX via the prefetching pipeline, never through torch.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import tensorstore as ts

_BLOSC = {
    "name": "blosc",
    "configuration": {"cname": "zstd", "clevel": 3, "shuffle": "bitshuffle"},
}


def _array_spec(path: Path, *, shape=None, chunks=None, dtype=None, create=False):
    spec = {
        "driver": "zarr3",
        "kvstore": {"driver": "file", "path": str(path)},
    }
    if create:
        typesize = np.dtype(dtype).itemsize
        blosc = dict(_BLOSC)
        blosc["configuration"] = dict(blosc["configuration"], typesize=typesize)
        spec["metadata"] = {
            "shape": list(shape),
            "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": list(chunks)}},
            "data_type": np.dtype(dtype).name,
            "codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}},
                blosc,
            ],
        }
        spec["create"] = True
        spec["delete_existing"] = True
    return spec


class VideoStore:
    """One per-video Zarr store (the reference's ``data_NNN.zarr``)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._image = None
        self._mask = None

    # ------------------------------------------------------------- creation
    @classmethod
    def create(cls, path: str | Path, n_frames: int, height: int, width: int,
               patch_size: tuple[int, int],
               image_dtype=np.float32) -> "VideoStore":
        """``image_dtype=np.uint8`` selects the compact store variant: the
        source pixels are 8-bit video (``k/255`` floats in the reference
        schema, ``Data_Loader.py:359-361``), so uint8 storage is LOSSLESS
        while quartering the decode bytes per patch read and the host→HBM
        transfer (the train/eval steps accept uint8 batches natively and
        divide by 255 on device). float32 (default) is the reference's
        byte-compatible schema."""
        self = cls(path)
        self.path.mkdir(parents=True, exist_ok=True)
        (self.path / "zarr.json").write_text(json.dumps({
            "zarr_format": 3, "node_type": "group", "attributes": {},
        }))
        ph, pw = int(patch_size[0]), int(patch_size[1])
        self._image = ts.open(_array_spec(
            self.path / "image", shape=(3, n_frames, height, width),
            chunks=(3, 1, ph, pw), dtype=image_dtype, create=True)).result()
        self._mask = ts.open(_array_spec(
            self.path / "mask", shape=(n_frames, height, width),
            chunks=(1, ph, pw), dtype=np.uint8, create=True)).result()
        return self

    @property
    def image_dtype(self):
        return np.dtype(self.image.dtype.name)

    def write_frame(self, i: int, image_chw: np.ndarray, mask_hw: np.ndarray) -> None:
        if self.image_dtype == np.uint8:
            img = np.clip(np.rint(np.asarray(image_chw, np.float32) * 255.0),
                          0, 255).astype(np.uint8)
        else:
            img = image_chw.astype(np.float32)
        self.image[:, i].write(img).result()
        self.mask[i].write(mask_hw.astype(np.uint8)).result()

    def set_properties(self, properties: dict) -> None:
        meta = json.loads((self.path / "zarr.json").read_text())
        meta.setdefault("attributes", {})["properties"] = properties
        (self.path / "zarr.json").write_text(json.dumps(meta))

    # -------------------------------------------------------------- reading
    @property
    def image(self):
        if self._image is None:
            self._image = ts.open(_array_spec(self.path / "image")).result()
        return self._image

    @property
    def mask(self):
        if self._mask is None:
            self._mask = ts.open(_array_spec(self.path / "mask")).result()
        return self._mask

    @property
    def properties(self) -> dict:
        meta = json.loads((self.path / "zarr.json").read_text())
        return meta.get("attributes", {}).get("properties", {})

    @property
    def class_locations(self) -> dict[int, list]:
        return {int(k): v for k, v in self.properties.get("class_locations", {}).items()}

    @property
    def shape(self):
        """(T, H, W) of the mask array."""
        return tuple(self.mask.shape)

    def read_image_window(self, t: int, y0: int, x0: int, h: int, w: int,
                          pad_value: float = 0.0) -> np.ndarray:
        """Windowed read of frame ``t`` → (h, w, 3) float32 NHWC, zero-padded
        outside bounds (the ``crop_from_zarr`` contract, Pre_Process.py:466-535)."""
        from mmr_tpu.ops.padcrop import center_pad_bbox_crop

        chw = center_pad_bbox_crop(self.image[:, t], (y0, x0), (h, w), pad_value)
        if chw.dtype == np.uint8:
            chw = chw.astype(np.float32) / 255.0
        return np.ascontiguousarray(chw.transpose(1, 2, 0))

    def read_mask_window(self, t: int, y0: int, x0: int, h: int, w: int) -> np.ndarray:
        from mmr_tpu.ops.padcrop import center_pad_bbox_crop

        return center_pad_bbox_crop(self.mask[t], (y0, x0), (h, w), 0)

    def read_windows_async(self, t: int, y0: int, x0: int, h: int, w: int):
        """Issue the image+mask window reads as tensorstore FUTURES (decode
        runs on tensorstore's C++ thread pool, fully parallel across a
        batch's windows — the Python-thread read path serializes on per-call
        latency). Returns ``finish() -> (img_hwc, mask_hw_u8)`` where the
        image keeps the STORE dtype — uint8 0..255 for compact stores, f32
        [0,1] for reference-schema stores (unlike :meth:`read_image_window`,
        which converts to f32 [0,1]; the train/eval steps divide uint8
        batches by 255 on device)."""
        from mmr_tpu.ops.padcrop import assemble_window, window_slices

        spatial = self.shape[1:]
        src, before = window_slices((y0, x0), (h, w), spatial)
        img_fut = self.image[(slice(None), t) + src].read()
        mask_fut = self.mask[(t,) + src].read()

        def finish():
            chw = assemble_window(np.asarray(img_fut.result()), before,
                                  (h, w), 1, 0.0)
            img = np.ascontiguousarray(chw.transpose(1, 2, 0))
            mask = assemble_window(np.asarray(mask_fut.result()), before,
                                   (h, w), 0, 0)
            return img, mask

        return finish

    def read_frames(self, t0: int, t1: int) -> tuple[np.ndarray, np.ndarray]:
        """Whole frames [t0, t1) → image (T, H, W, 3) in the STORE dtype
        (uint8 0..255 for compact stores — kept raw so the inference path
        uploads 1 byte/px over the ~0.04 GB/s tunnel and divides by 255 on
        device, like training batches; f32 [0,1] for reference-schema
        stores), mask (T, H, W) u8."""
        img = np.asarray(self.image[:, t0:t1]).transpose(1, 2, 3, 0)
        mask = np.asarray(self.mask[t0:t1])
        return np.ascontiguousarray(img), mask


def list_dataset_stores(dataset_path: str | Path) -> list[Path]:
    """All ``*.zarr`` stores under ``<dataset>/data/`` (or the path itself),
    sorted — the reference's discovery convention (``model_inference.py:169-194``)."""
    root = Path(dataset_path)
    data_dir = root / "data" if (root / "data").is_dir() else root
    return sorted(p for p in data_dir.glob("*.zarr") if p.is_dir())
