from mmr_tpu.losses.dice import dice_loss, soft_dice_score  # noqa: F401
from mmr_tpu.losses.ce import cross_entropy_loss  # noqa: F401
from mmr_tpu.losses.dice_ce import dice_ce_loss, blended_ce_dice_loss  # noqa: F401
