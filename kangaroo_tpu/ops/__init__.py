"""Image-processing ops: filters, features, warps, viz."""
from . import (bilateral, blur, convert, convolution, elementwise, features,
               integral_image, median, resample, viz, warp)
