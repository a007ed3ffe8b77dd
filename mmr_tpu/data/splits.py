"""Dataset split management — semantics of ``Pre_Process.py:95-275``.

- ``train-val-test``: 70/10/20 via two ``train_test_split`` passes
  (``test_size=0.2`` then ``0.125`` on the remainder), seed 12345, persisted
  idempotently to ``<dataset>/train_val_test_split.json``.
- ``5-fold``: sklearn ``KFold(5, shuffle=True, random_state=seed)`` persisted
  to ``<dataset>/crossval_split.json``.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from sklearn.model_selection import KFold, train_test_split

from mmr_tpu.data.zarr_io import list_dataset_stores

DEFAULT_SEED = 12345


def generate_crossval_split(identifiers: list[str], seed: int = DEFAULT_SEED,
                            n_splits: int = 5) -> list[dict]:
    splits = []
    kfold = KFold(n_splits=n_splits, shuffle=True, random_state=seed)
    ids = np.asarray(identifiers)
    for train_idx, val_idx in kfold.split(ids):
        splits.append({"train": list(ids[train_idx]), "val": list(ids[val_idx])})
    return splits


def create_split_files(dataset_path: str | Path, splitting: str,
                       seed: int = DEFAULT_SEED) -> Path:
    dataset_path = Path(dataset_path)
    identifiers = sorted(p.name.replace(".zarr", "") for p in list_dataset_stores(dataset_path))
    if not identifiers:
        raise FileNotFoundError(f"no .zarr stores under {dataset_path}")

    if splitting == "train-val-test":
        out = dataset_path / "train_val_test_split.json"
        if out.exists():
            return out
        trainval, test = train_test_split(identifiers, test_size=0.2, random_state=seed)
        train, val = train_test_split(trainval, test_size=0.125, random_state=seed)
        out.write_text(json.dumps({"train": list(train), "val": list(val),
                                   "test": list(test)}, indent=2))
    elif splitting == "5-fold":
        out = dataset_path / "crossval_split.json"
        if out.exists():
            return out
        out.write_text(json.dumps(generate_crossval_split(identifiers, seed), indent=2))
    else:
        raise ValueError(f"splitting must be 'train-val-test' or '5-fold', got {splitting!r}")
    return out


def get_data_ids(dataset_path: str | Path, splitting: str, section: str,
                 fold: int | None = None) -> list[str]:
    """ids for ``section`` in {'train','val','test'} (``Pre_Process.py:214-275``)."""
    dataset_path = Path(dataset_path)
    if splitting == "train-val-test":
        data = json.loads((dataset_path / "train_val_test_split.json").read_text())
        return data[section]
    if splitting == "5-fold":
        folds = json.loads((dataset_path / "crossval_split.json").read_text())
        if fold is None:
            raise ValueError("fold required for 5-fold splitting")
        if section == "test":
            return folds[fold]["val"]
        return folds[fold][section]
    raise ValueError(f"unknown splitting {splitting!r}")
