from .resize import resize, resize_matrix
from .grid_sample import grid_sample, affine_grid
from .pixel_shuffle import pixel_shuffle
from .torch_compat import (
    conv_transpose_2d,
    ConvTranspose2dTorch,
    mish,
    PReLU,
    BatchNorm,
    adaptive_avg_pool_1x1,
)
from .gru import BiGRU
