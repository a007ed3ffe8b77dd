from mmr_tpu.ops.resize import resize_bilinear, resize_nearest, resize  # noqa: F401
from mmr_tpu.ops.onehot import one_hot, rgb_to_ids, ids_to_rgb  # noqa: F401
from mmr_tpu.ops.padcrop import pad_to, center_pad_bbox_crop  # noqa: F401
