from mmr_tpu.metrics.confusion import segmentation_stats  # noqa: F401
from mmr_tpu.metrics.iou import iou_score, f1_score, precision, recall  # noqa: F401
from mmr_tpu.metrics.evaluate import Evaluate  # noqa: F401
from mmr_tpu.metrics.dice import binary_dice  # noqa: F401
from mmr_tpu.metrics.hausdorff import hausdorff_distance  # noqa: F401
