from mmr_tpu.models.factory import create_model, get_preprocessing, list_models  # noqa: F401
from mmr_tpu.models.unet import UNet  # noqa: F401
from mmr_tpu.models.segnet import SegNet  # noqa: F401
from mmr_tpu.models.resnet_unet import ResNetUNet  # noqa: F401
from mmr_tpu.models.decoders import UnetDecoderModel, UnetPlusPlusModel, DeepLabV3PlusModel, MAnetModel  # noqa: F401
