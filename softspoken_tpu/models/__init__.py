from .fold import fold_batch_norm
from .unet import ResBlock, ResBlock1D, SpecUNet2D, init_variables, param_count

__all__ = [
    "ResBlock",
    "ResBlock1D",
    "SpecUNet2D",
    "init_variables",
    "param_count",
    "fold_batch_norm",
]
