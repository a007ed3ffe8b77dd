"""Host-pipeline sustained-rate benchmark (VERDICT r2 missing #4).

The train bench (bench.py) times the device step with a device-resident
batch (the axon tunnel's 0.04 GB/s H2D makes per-step transfer untestable
here — production feeds through local PCIe/ICI). This benchmark answers the
other half: can the HOST side — threaded Zarr window reads + nnU-Net
foreground-biased bbox sampling + batch assembly + uint8 quantize
(``data/patch_dataset.py`` + ``data/pipeline.py``) — sustain the device
rate (~247 frames/s at the round-3 bench)?

The reference leans on 14 DataLoader worker processes for the same job
(``Pre_Process.py:1137-1145``, config.yaml ``num_workers: 14``); here Zarr's
blosc decode is C-side/GIL-free so a thread pool suffices.

Builds a full-HD synthetic dataset in the exact store schema, then drives
``PatchSampler.epoch`` through the prefetch stack and prints ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _rate(root, batch, steps, workers):
    from mmr_tpu.data.patch_dataset import PatchSampler
    from mmr_tpu.data.pipeline import PrefetchIterator

    stores = sorted((Path(root) / "data").glob("*.zarr"))
    sampler = PatchSampler(stores, patch_size=(512, 512), batch_size=batch,
                           steps_per_epoch=steps)
    ident = lambda b: b
    # warmup epoch (thread pool spin-up, OS page cache)
    for _ in PrefetchIterator(sampler.epoch(0, num_workers=workers),
                              ident, depth=2):
        pass
    t0 = time.perf_counter()
    n = 0
    for imgs, _ in PrefetchIterator(sampler.epoch(1, num_workers=workers),
                                    ident, depth=2):
        n += imgs.shape[0]
    return n / (time.perf_counter() - t0)


def main(frames_hw=(1080, 1920), batch=32, steps=20, workers=None):
    import os

    from mmr_tpu.data.synthetic import make_synthetic_dataset

    workers = workers or min(8, os.cpu_count() or 1)
    rates = {}
    for dtype in (np.uint8, np.float32):
        tmp = tempfile.mkdtemp(prefix="mmr_pipe_bench_")
        root = make_synthetic_dataset(
            tmp, n_videos=2, frames_per_video=8, height=frames_hw[0],
            width=frames_hw[1], n_classes=9, patch_size=(512, 512), seed=0,
            image_dtype=dtype)
        rates[np.dtype(dtype).name] = _rate(root, batch, steps, workers)
    fps = rates["uint8"]
    print(json.dumps({
        "metric": "host_pipeline_frames_per_sec@512x512_patches_fullHD_zarr",
        "value": round(fps, 1),
        "unit": "frames/s",
        "f32_store_value": round(rates["float32"], 1),
        "host_cores": os.cpu_count(),
        "vs_device_step_rate": round(fps / 247.0, 2),
    }))


if __name__ == "__main__":
    main()
