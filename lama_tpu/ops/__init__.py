from .pad import pad2d, reflection_pad2d
from .conv import Conv2d, ConvTranspose2d, conv2d, conv_transpose2d, avg_pool2d, adaptive_avg_pool2d, max_pool2d
from .norm import BatchNorm
from .resize import interpolate, resize_bilinear, resize_nearest
from .activations import get_activation
