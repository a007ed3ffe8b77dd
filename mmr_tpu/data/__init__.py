from mmr_tpu.data.zarr_io import VideoStore, list_dataset_stores  # noqa: F401
from mmr_tpu.data.splits import create_split_files, get_data_ids  # noqa: F401
from mmr_tpu.data.patch_dataset import PatchSampler  # noqa: F401
from mmr_tpu.data.video_dataset import VideoFrameDataset  # noqa: F401
from mmr_tpu.data.synthetic import make_synthetic_dataset  # noqa: F401
