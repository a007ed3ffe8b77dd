"""Training engine — the ``SegModel`` orchestrator rebuilt
(``Main_MMR_SegModel.py:520-1203``), one engine serving both reference paths.

Epoch loop parity (``train()``, ``:1076-1203``): train epoch → validate →
monitor (throughput/ETA/memory) → loss plot + metrics JSON + dashboard →
last/best checkpointing → ``loss_dict.pkl`` → per-``val_plot_interval``
prediction triptychs. LR schedules step per epoch. ``continue_training``
restores params/opt-state/epoch and the loss history so curves stay
continuous (``:596-604,958-1001``).

TPU design: one jitted sharded step per optimizer update (grad accumulation
inside), async dispatch (metrics fetched once per epoch), background host
prefetch, on-device augmentation.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmr_tpu.core.mesh import create_mesh, shard_batch
from mmr_tpu.core.prng import RngStream, seed_everything
from mmr_tpu.data.augment import AugmentConfig
from mmr_tpu.data.pipeline import PrefetchIterator, microbatch_stacker
from mmr_tpu.losses import dice_ce_loss
from mmr_tpu.models import create_model
from mmr_tpu.models.factory import get_preprocessing
from mmr_tpu.monitor import TrainingMonitor, save_losses, save_dashboard, save_triptychs, ProfilerTrace, model_summary
from mmr_tpu.train.checkpoint import CheckpointManager
from mmr_tpu.train.optim import build_optimizer
from mmr_tpu.train.schedules import build_lr_schedule
from mmr_tpu.train.state import TrainState
from mmr_tpu.train.steps import make_eval_step, make_train_step


class Trainer:
    def __init__(self, config: dict, mesh=None, loss_fn=None):
        self.config = config
        self.mesh = mesh if mesh is not None else create_mesh()
        self.results_path = Path(config["results_path"])
        self.results_path.mkdir(parents=True, exist_ok=True)
        self.n_classes = int(config["n_classes"]) + 1  # + background (common_utils.py:236)
        self.n_epochs = int(config["n_epochs"])
        self.patch_size = tuple(config["patch_size"])
        self.n_accum = int(config.get("grad_accumulate_step", 1))

        model_cfg = dict(config["model"])
        arch = model_cfg.pop("arch")
        self.encoder_name = model_cfg.pop("encoder_name", None)
        encoder_weights = model_cfg.pop("encoder_weights", None)
        model_cfg.pop("in_channels", None)
        model_cfg.pop("classes", None)
        from mmr_tpu.core.precision import resolve as resolve_precision

        precision = resolve_precision(config.get("precision"))
        if (arch.lower().replace("_", "").replace("+", "p") in
                ("unetplusplus", "unetpp", "smpunetpp") or
                arch.lower() in ("unetplusplus", "unet++")) and \
                jax.default_backend() in ("tpu", "axon") and \
                min(self.patch_size) >= 128:
            # run the UNet++ decoder through the packed-halo fused kernels on
            # TPU (same params; ops/pallas/packed_chain.py). Gated on patch
            # size: below 128² the deep decoder levels degenerate to 1-2-block
            # rows where the fused kernels buy nothing, and the ~30 Mosaic
            # kernel compiles dominate a smoke run (measured: a 32² CLI run
            # spent >40 min compiling over the dev tunnel; the XLA lowering
            # compiles in seconds and is equally fast at these sizes)
            model_cfg.setdefault("packed", True)
            if (model_cfg.get("packed")
                    and "mobilenetv3" in str(self.encoder_name)
                    and self.patch_size[1] % 128 == 0
                    and self.patch_size[0] % 4 == 0):
                # the benched flagship config: mbv3 stem + b0_0 as fused
                # stride-2 packed kernels (models/packed_encoder.py). Gated
                # on the image-packing geometry (w multiple of 128) — every
                # tensor the model sees in Path B is patch-shaped (train
                # patches, val patches, sliding-window roi windows)
                model_cfg.setdefault("packed_frontend", True)
        self.model, self._weights_hook = create_model(
            arch, encoder_name=self.encoder_name, encoder_weights=encoder_weights,
            classes=self.n_classes, dtype=precision.compute_dtype, **model_cfg)
        self.preprocess = get_preprocessing(self.encoder_name) if self.encoder_name else None

        self.loss_fn = loss_fn or dice_ce_loss
        opt_cfg = dict(config.get("optimizer", {"name": "AdamW", "lr": 1e-4}))
        opt_name = opt_cfg.pop("name", "AdamW")
        self.base_lr = float(opt_cfg.pop("lr", 1e-4))
        self.optimizer = build_optimizer(
            opt_name,
            clip_grad_norm=float(config.get("grad_clip_max_norm", 12.0)),
            differential_lr=bool(config.get("differential_lr", False)),
            **opt_cfg)
        self.lr_schedule = build_lr_schedule(
            config.get("lr_scheduler"), self.base_lr, self.n_epochs)

        aug_cfg = config.get("transformations", {})
        self.augment = AugmentConfig(
            patch_size=self.patch_size,
            rotation=aug_cfg.get("rotation", True),
            scaling=aug_cfg.get("scaling", True),
            gaussian_noise=aug_cfg.get("gaussian_noise", True),
            gaussian_blur=aug_cfg.get("gaussian_blur", True),
            brightness=aug_cfg.get("brightness", True),
            contrast=aug_cfg.get("contrast", True),
            low_resolution=aug_cfg.get("low_resolution", True),
            gamma=aug_cfg.get("gamma", True),
            mirror=aug_cfg.get("mirror", True),
            heavy=aug_cfg.get("heavy_augmentation", False),
            per_sample_spatial=aug_cfg.get("per_sample_spatial", False),
        )

        self.rng = RngStream(seed_everything(int(config.get("seed", 6210))))
        self.monitor = TrainingMonitor(self.results_path, self.n_epochs)
        if (aug_cfg.get("heavy_augmentation")
                and not aug_cfg.get("per_sample_spatial")):
            # documented semantic divergence from the reference: the default
            # batch-shared spatial draw (fast TPU path) vs the reference's
            # per-sample rotation/scale parameters (Pre_Process.py:278-463).
            # A reproduction attempt with heavy augmentation should not
            # inherit it silently.
            self.monitor.log_message(
                "transformations.heavy_augmentation=True with the default "
                "batch-shared spatial draws — for the reference's exact "
                "per-sample spatial distribution add "
                "--transformations_per_sample_spatial true (slower on TPU)",
                level="WARNING")
        if aug_cfg.get("dummy_2d"):
            # The reference's dummy_2d wraps SpatialTransform in
            # Convert3DTo2D/2DTo3D so rotation/scaling act in-plane on
            # pseudo-3D (1,H,W) volumes (Pre_Process.py:339-366). This
            # pipeline is natively 2D — spatial transforms are in-plane by
            # construction — so the flag is satisfied trivially; surfaced
            # here so it is never a silently-dead knob.
            self.monitor.log_message(
                "transformations.dummy_2d=True: in-plane spatial transforms "
                "are native on this 2D pipeline (no-op by construction)")
        self.checkpoints = CheckpointManager(self.results_path / "checkpoints")
        self.loss_dict: dict[str, list] = {"train": [], "val": []}
        self.start_epoch = 1
        self.state: Optional[TrainState] = None

        self._train_step = make_train_step(
            self.model, self.optimizer, self.loss_fn, self.n_classes,
            mesh=self.mesh, n_accum=self.n_accum, augment=self.augment,
            preprocess=self.preprocess)
        self._eval_step = make_eval_step(
            self.model, self.loss_fn, self.n_classes, mesh=self.mesh,
            preprocess=self.preprocess)

    # ----------------------------------------------------------------- setup
    def init_state(self) -> TrainState:
        # param shapes are independent of spatial size: init at a small
        # resolution (≥64 for the SegNet bottleneck; ≥128-wide for the
        # packed front-end's image-packing geometry) to keep init cheap
        min_w = 128 if self.config.get("model", {}).get("packed_frontend") \
            or getattr(self.model, "packed_frontend", False) else 64
        init_hw = (min(self.patch_size[0], min_w),
                   min(self.patch_size[1], min_w))
        x = jnp.zeros((1, *init_hw, 3), jnp.float32)
        # Initialize on the host CPU backend: on the remote-TPU (axon) path,
        # init's thousands of tiny ops would each pay tunnel RPC latency
        # (~4 min for the default model); one bulk device_put is cheap.
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = self.model.init(
                {"params": self.rng.named("init"), "dropout": self.rng.named("drop")},
                x, train=False)
            variables = self._weights_hook(variables)
        self.state = TrainState.create(
            jax.tree_util.tree_map(jnp.asarray, variables), self.optimizer)
        return self.state

    def maybe_resume(self) -> bool:
        """continue_training: restore last checkpoint + loss history."""
        if not self.checkpoints.exists("last_model"):
            return False
        if self.state is None:
            self.init_state()
        self.state, meta = self.checkpoints.load(self.state, "last_model")
        self.start_epoch = meta["epoch"] + 1
        pkl = self.results_path / "loss_dict.pkl"
        if pkl.exists():
            self.loss_dict = pickle.loads(pkl.read_bytes())
        self.monitor.log_message(f"Resumed from epoch {meta['epoch']}")
        return True

    # ----------------------------------------------------------------- train
    def _device_batches(self, sampler, epoch: int, train: bool):
        batch_axis = 1 if train else 0

        def transfer(item):
            imgs, masks = item
            if jax.process_count() > 1:
                # hosts sample identical global batches (deterministic epoch
                # seeds); each host transfers only its slice and
                # make_array_from_process_local_data assembles the global
                # array (SURVEY.md §5.8 host-local loading)
                from mmr_tpu.core.mesh import local_batch_slice

                sl = local_batch_slice(imgs.shape[batch_axis])
                take = (slice(None),) * batch_axis + (sl,)
                imgs, masks = imgs[take], masks[take]
            # transfer compactly: float images are k/255 values, so uint8 is
            # a lossless 4x smaller copy (the remote-TPU tunnel moves ~0.04
            # GB/s; real pods also save PCIe); steps convert back on device.
            # uint8-store batches (compact datasets) are ALREADY raw bytes —
            # rescaling those would corrupt every pixel (v*255 mod 256).
            # train batches are stacked (n_accum, B, ...) → shard axis 1
            if imgs.dtype != np.uint8:
                imgs = np.round(imgs * 255.0).astype(np.uint8)
            return shard_batch(
                self.mesh,
                (imgs,
                 masks.astype(np.uint8 if int(self.n_classes) <= 255 else np.int32)),
                axis=batch_axis)

        if train:
            source = microbatch_stacker(
                sampler.epoch(epoch_seed=epoch * 7919 + 1), self.n_accum)
        else:
            source = sampler.epoch(epoch_seed=epoch * 104729 + 2)
        return PrefetchIterator(source, transfer, depth=2)

    def train_one_epoch(self, sampler, epoch: int, lr: float):
        losses, ious = [], []
        n_samples = 0
        batches = self._device_batches(sampler, epoch, train=True)
        if self.config.get("progress_bar"):
            from tqdm import tqdm

            batches = tqdm(batches, total=len(sampler) // max(self.n_accum, 1),
                           desc=f"epoch {epoch}", leave=False)
        for images, masks in batches:
            self.state, met = self._train_step(
                self.state, images, masks, jnp.float32(lr),
                self.rng.step("train", epoch, len(losses)))
            losses.append(met["loss"])
            ious.append(met["iou"])
            n_samples += int(np.prod(images.shape[:2]))
        return (float(np.mean([float(l) for l in losses])),
                float(np.mean([float(i) for i in ious])), n_samples)

    def validate_one_epoch(self, sampler, epoch: int, want_samples: bool = False):
        losses, ious = [], []
        tp = fp = fn = 0.0
        sample = None
        for images, masks in self._device_batches(sampler, epoch, train=False):
            met = self._eval_step(self.state, images, masks)
            losses.append(met["loss"])
            ious.append(met["iou"])
            tp = tp + np.asarray(met["tp"])
            fp = fp + np.asarray(met["fp"])
            fn = fn + np.asarray(met["fn"])
            if want_samples and sample is None:
                logits = self.predict(images)
                sample = (np.asarray(images), np.asarray(masks),
                          np.asarray(jnp.argmax(logits, -1)))
        per_class_iou = tp / np.maximum(tp + fp + fn, 1e-15)
        return (float(np.mean([float(l) for l in losses])),
                float(np.mean([float(i) for i in ious])), per_class_iou, sample)

    def predict(self, images):
        imgs = self.preprocess(images) if self.preprocess else images
        return self.model.apply(self.state.variables, imgs, train=False)

    def train(self, train_sampler, val_sampler) -> dict:
        if self.state is None:
            self.init_state()
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(self.state.params))
        self.monitor.log_message(
            f"Model: {self.config['model']} — {n_params / 1e6:.2f}M params")
        # layer-wise summary — the reference's torchinfo surface
        # (Main_MMR_SegModel.py:1130-1132)
        self.monitor.log_message(
            "Model Architecture Summary:\n"
            + model_summary(self.model, {"params": self.state.params}))
        # flag-gated jax.profiler capture (SURVEY.md §5.1)
        profile_epochs = self.config.get("profile_epochs") or ()
        self._tracer = ProfilerTrace(self.results_path, epochs=profile_epochs,
                                     enabled=bool(profile_epochs))
        self.monitor.start_training()
        val_plot_interval = int(self.config.get("val_plot_interval", 5))
        plots_dir = self.results_path / "plots"

        for epoch in range(self.start_epoch, self.n_epochs + 1):
            self.monitor.start_epoch(epoch)
            if self._tracer.maybe_start(epoch):
                self.monitor.log_message(
                    f"jax.profiler trace capturing epoch {epoch} -> "
                    f"{self._tracer.dir}")
            lr = self.lr_schedule(epoch - 1)
            train_loss, train_iou, n_samples = self.train_one_epoch(
                train_sampler, epoch, lr)
            self._tracer.maybe_stop(epoch)
            want_plot = val_plot_interval > 0 and epoch % val_plot_interval == 0
            val_loss, val_iou, per_class_iou, sample = self.validate_one_epoch(
                val_sampler, epoch, want_samples=want_plot)

            self.loss_dict["train"].append(train_loss)
            self.loss_dict["val"].append(val_loss)
            self.monitor.end_epoch(epoch, train_loss, val_loss, train_iou,
                                   val_iou, lr, n_samples)
            save_losses(self.loss_dict["train"], self.loss_dict["val"], plots_dir)
            self.monitor.save_metrics()
            save_dashboard(self.monitor.history, self.results_path)
            if sample is not None:
                imgs = sample[0].reshape(-1, *sample[0].shape[-3:]) \
                    if sample[0].ndim == 5 else sample[0]
                save_triptychs(imgs, sample[1].reshape(-1, *sample[1].shape[-2:]),
                               sample[2].reshape(-1, *sample[2].shape[-2:]),
                               plots_dir / f"epoch_{epoch}.png")
            is_best = self.checkpoints.save(self.state, epoch, val_loss)
            (self.results_path / "loss_dict.pkl").write_bytes(
                pickle.dumps(self.loss_dict))
            if is_best:
                self.monitor.log_message(f"New best model (val loss {val_loss:.4f})")
        self.monitor.log_message("Training complete")
        return self.monitor.history
