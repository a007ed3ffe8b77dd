"""MMR-TPU: TPU-native surgical-tool semantic segmentation framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
``AliakbarMzadeh/MMR_semantic-segmentation_v1`` (SAR-RARP50 surgical-tool
segmentation: background + 9 tool classes), redesigned TPU-first:

- NHWC layouts, bf16 compute / f32 params mixed precision
- ``jax.sharding.Mesh`` data parallelism (pjit-style, gradient allreduce via
  sharding constraints), multi-host ready
- on-device (jitted) preprocessing/augmentation
- Pallas kernels for hot reductions (confusion-matrix stats, dice stats)
- sliding-window full-resolution inference with sharded window batches

Subpackages
-----------
core      meshes, precision policy, PRNG discipline
ops       resize/one-hot/pad/blur primitives + Pallas kernels
models    UNet, SegNet, ResNetUNet, UNet++ (default), DeepLabV3+, MANet,
          generic ``create_model`` factory with swappable encoders
losses    Dice (eps/ignore-index semantics of the reference), CE, DiceCE
metrics   streaming IoU/P/R/F1, macro-IoU, binary dice, Hausdorff
data      Zarr-schema video stores (tensorstore-backed), PNG-folder datasets,
          foreground-oversampled patch sampling, augmentation pipelines
train     jitted/sharded train+eval steps, optimizers, schedules, checkpoints
infer     whole-image eval and sliding-window inference
config    YAML config system (reference config.yaml-compatible schema)
monitor   training monitor: logs, metrics JSON, dashboard, plots
cli       console entry points (mmr_create_dataset / mmr_train_model / mmr_infer
          and the Path-A style argparse trainer)
"""

__version__ = "0.1.0"
