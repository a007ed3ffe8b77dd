"""YAML config system — schema- and grammar-compatible with the reference's
``common_utils.py:147-606`` so existing ``config.yaml`` files and CLI override
habits carry over unchanged.

- :func:`get_default_config` reproduces the exact default schema/values
  (``common_utils.py:147-244``), plus TPU-native extras under keys the
  reference ignores (``mesh``, ``precision``, ``seed``).
- Override grammar: ``--batch_size 16 --optimizer_lr 1e-3 --model_arch Unet``
  with allow-list validation per mode and ``prefix_key`` nesting for the
  ``transformations`` / ``lr_scheduler`` / ``optimizer`` / ``model`` groups
  (``common_utils.py:395-490``), values parsed with ``safe_eval`` literal
  semantics (``:344-392``).
- Modes (``:493-606``): ``training`` creates+saves config.yaml;
  ``continue_training`` loads it, asserts overrides unchanged, resumes from
  ``last_model``; ``testing`` loads it, allows only inference overrides, and
  selects ``best_model``.
- Dependent-field sync: ``n_epochs`` → ``lr_scheduler.total_iters``
  (``:337-339``).
"""

from __future__ import annotations

import ast
import copy
from pathlib import Path

import yaml

ALLOWED_TRAINING_ARGS = [
    "transformations_scaling", "transformations_rotation",
    "transformations_gaussian_noise", "transformations_gaussian_blur",
    "transformations_low_resolution", "transformations_brightness",
    "transformations_contrast", "transformations_gamma",
    "transformations_mirror", "transformations_dummy_2d",
    "transformations_heavy_augmentation", "transformations_per_sample_spatial",
    "oversample_ratio", "oversample_strategy", "batch_size", "num_workers", "n_epochs",
    "val_plot_interval", "grad_clip_max_norm", "grad_accumulate_step",
    # TPU-native extras
    "seed", "precision", "mesh_data", "steps_per_epoch", "val_steps_per_epoch",
    "profile_epochs",
]
ALLOWED_TESTING_ARGS = [
    "infer_batch_size", "infer_num_workers", "sw_batch_size", "sw_overlap",
    "sw_fp32_blend", "sw_chunked",
]
FLEXIBLE_ARGS = ["lr_scheduler", "optimizer", "model"]
PREFIX_ARGS = ["transformations", "lr_scheduler", "optimizer", "model", "mesh"]


def get_default_config(n_classes: int, patch_size) -> dict:
    n_epochs = 200
    transformations = {
        "patch_size": list(patch_size),
        "scaling": True,
        "rotation": True,
        "gaussian_noise": True,
        "gaussian_blur": True,
        "low_resolution": False,
        "brightness": True,
        "contrast": True,
        "gamma": True,
        "mirror": True,
        "dummy_2d": False,
        "heavy_augmentation": False,  # Pre_Process.py:597 hard-codes False
        # reference distribution: rotation/scale drawn per sample
        # (Pre_Process.py:339-366); False shares spatial params per
        # microbatch (TPU-fast path, see data/augment.py)
        "per_sample_spatial": False,
    }
    return {
        "n_classes": n_classes,
        "transformations": transformations,
        "oversample_ratio": 0.33,
        # 'deterministic' (last 33% of each batch fg-forced,
        # Pre_Process.py:787-806) | 'probabilistic' (:808-826)
        "oversample_strategy": "deterministic",
        "batch_size": 8,
        "num_workers": 8,
        "infer_batch_size": 6,
        "infer_num_workers": 4,
        "sw_batch_size": 24,
        "sw_overlap": 0.5,
        "n_epochs": n_epochs,
        "val_plot_interval": 10,
        "grad_clip_max_norm": 12,
        "grad_accumulate_step": 1,
        "lr_scheduler": {"name": "PolynomialLR", "total_iters": n_epochs, "power": 0.9},
        "optimizer": {"name": "AdamW", "lr": 1e-4},
        "model": {
            "arch": "UnetPlusPlus",
            "encoder_name": "tu-mobilenetv3_small_100",
            "encoder_weights": "imagenet",
            "in_channels": 3,
            "classes": n_classes + 1,
        },
        # fixed steps/epoch semantics (Pre_Process.py:1131-1134)
        "steps_per_epoch": 250,
        "val_steps_per_epoch": 50,
        # ---- TPU-native extras (ignored by the reference schema) ----
        "seed": 6210,
        "precision": "bf16",
        "mesh": {"data": -1, "model": 1},
    }


def safe_eval(value: str):
    """Literal parsing (``common_utils.py:344-392``): python literals pass
    through, everything else stays a string; 'true'/'false'/'none' normalize."""
    if not isinstance(value, str):
        return value
    low = value.strip().lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("none", "null"):
        return None
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def check_and_convert_user_config_args(args: list[str] | None, mode: str) -> dict | None:
    """``['--batch_size','16','--optimizer_lr','0.001']`` →
    ``{'batch_size':16,'optimizer':{'lr':0.001}}`` with allow-list
    validation (``common_utils.py:395-490``)."""
    if not args:
        return None
    stripped = [a.lstrip("-") for a in args]
    if len(stripped) % 2 != 0:
        raise ValueError(f"override args must come in --key value pairs, got {args}")
    flat = {stripped[i]: safe_eval(stripped[i + 1]) for i in range(0, len(stripped), 2)}

    out: dict = {}
    for arg, value in flat.items():
        wrong_for_training = (
            mode == "training" and arg not in ALLOWED_TRAINING_ARGS
            and not any(item in arg for item in FLEXIBLE_ARGS)
        )
        wrong_for_testing = mode == "testing" and arg not in ALLOWED_TESTING_ARGS
        if wrong_for_training or wrong_for_testing:
            raise KeyError(
                f"Argument '{arg}' is not an allowed argument. "
                f"Valid training arguments: {ALLOWED_TRAINING_ARGS}. "
                f"Valid inference arguments: {ALLOWED_TESTING_ARGS}. "
                f"Valid flexible arguments: {[i + '_*' for i in FLEXIBLE_ARGS]}.")
        for prefix in PREFIX_ARGS:
            if arg.startswith(prefix + "_"):
                out.setdefault(prefix, {})[arg[len(prefix) + 1:]] = value
                break
        else:
            out[arg] = value
    return out


def add_user_config_args(config: dict, config_args: dict | None) -> dict:
    if not config_args:
        return config
    for key, value in config_args.items():
        if isinstance(value, dict):
            config.setdefault(key, {})
            config[key].update(value)
        else:
            config[key] = value
    # dependent-field sync (common_utils.py:337-339)
    if "n_epochs" in config_args and config.get("lr_scheduler", {}).get("name") == "PolynomialLR":
        config["lr_scheduler"]["total_iters"] = config["n_epochs"]
    return config


class _FlowListDumper(yaml.SafeDumper):
    pass


_FlowListDumper.add_representer(
    list, lambda d, data: d.represent_sequence(
        "tag:yaml.org,2002:seq", data, flow_style=True))


def create_config(config: dict, results_path: str | Path) -> Path:
    """Persist config.yaml with flow-style lists (``common_utils.py:247-295``)."""
    path = Path(results_path)
    path.mkdir(parents=True, exist_ok=True)
    out = path / "config.yaml"
    out.write_text(yaml.dump(config, Dumper=_FlowListDumper, sort_keys=False))
    return out


def get_config(
    dataset_path: str,
    results_path: str,
    mode: str,
    config_args: dict | None = None,
    n_classes: int | None = None,
    patch_size=None,
    progress_bar: bool = False,
) -> dict:
    config_path = Path(results_path) / "config.yaml"
    if mode == "training":
        config = get_default_config(n_classes, patch_size)
        config["dataset_path"] = str(dataset_path)
        config["results_path"] = str(results_path)
        config["progress_bar"] = bool(progress_bar)
        config["patch_size"] = list(patch_size)
        config = add_user_config_args(config, config_args)
        config["load_model_path"] = None
        create_config(config, results_path)
        return config

    if not config_path.exists():
        raise FileNotFoundError(str(config_path))
    config = yaml.safe_load(config_path.read_text())
    print(f"Using configuration file: {config_path}")
    config["results_path"] = str(results_path)

    if mode == "continue_training":
        user_config = add_user_config_args(copy.deepcopy(config), config_args)
        different = [(k, config.get(k), user_config.get(k))
                     for k in user_config if config.get(k) != user_config.get(k)]
        assert not different, (
            "continue_training forbids config changes "
            f"(common_utils.py:556-572); differing: {different}")
        config["load_model_path"] = str(Path(results_path) / "checkpoints" / "last_model")
        return config

    if mode == "testing":
        user_config = add_user_config_args(copy.deepcopy(config), config_args)
        changed = [(k, config.get(k), user_config.get(k))
                   for k in user_config if config.get(k) != user_config.get(k)]
        for key, _, new in changed:
            print(f"Overriding {key} -> {new}")
        config = user_config
        config["load_model_path"] = str(Path(results_path) / "checkpoints" / "best_model")
        return config

    raise ValueError(f"mode must be training/continue_training/testing, got {mode!r}")
