from mmr_tpu.ops.pallas.confusion import confusion_stats  # noqa: F401
