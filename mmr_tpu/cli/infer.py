"""``mmr_infer`` — Path B inference CLI (parity with
``MMR_EN:DE_CODER/MMR_Segmentation/model_inference.py``).

Positional: ``test_dataset_path results_path``; overrides restricted to the
inference allow-list (``model_inference.py:78-93``). Mode detection
(``:169-194``): if the test dataset path equals the training dataset path,
the saved test split is used; otherwise every ``*.zarr`` under the path is
processed as a new dataset.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from mmr_tpu.config import check_and_convert_user_config_args, get_config


def main(argv=None):
    parser = argparse.ArgumentParser(description="MMR-TPU sliding-window inference")
    parser.add_argument("test_dataset_path", type=str)
    parser.add_argument("results_path", type=str)
    args, unknown = parser.parse_known_args(argv)
    config_args = check_and_convert_user_config_args(unknown, "testing")
    config = get_config(args.test_dataset_path, args.results_path, "testing",
                        config_args=config_args)

    import json

    from mmr_tpu.data.splits import get_data_ids
    from mmr_tpu.data.video_dataset import VideoFrameDataset
    from mmr_tpu.data.zarr_io import list_dataset_stores
    from mmr_tpu.infer.evaluator import run_inference
    from mmr_tpu.models.factory import get_preprocessing
    from mmr_tpu.train.engine import Trainer

    trainer = Trainer(config)
    trainer.init_state()
    state, meta = trainer.checkpoints.load(trainer.state, "best_model")
    trainer.state = state
    print(f"Loaded best model from epoch {meta['epoch']} "
          f"(val loss {meta['validation_loss']:.4f})")

    test_path = Path(args.test_dataset_path)
    train_path = Path(config.get("dataset_path", ""))
    if test_path.resolve() == train_path.resolve() and (
            test_path / "train_val_test_split.json").exists():
        ids = get_data_ids(test_path, "train-val-test", "test")
        stores = [test_path / "data" / f"{i}.zarr" for i in ids]
        print(f"Using saved test split: {len(stores)} videos")
    else:
        stores = list_dataset_stores(test_path)
        print(f"New dataset: {len(stores)} videos")

    dataset = VideoFrameDataset(stores, int(config.get("infer_batch_size", 6)))
    pre = get_preprocessing(trainer.encoder_name) if trainer.encoder_name else None
    report = run_inference(trainer.model, trainer.state.variables, dataset,
                           config, preprocess=pre)
    out = Path(args.results_path) / "inference_report.json"
    out.write_text(json.dumps(report, indent=2))
    print(f"Report written to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
