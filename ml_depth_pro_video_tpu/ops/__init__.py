from .resize import resize2d, resize_matrix  # noqa: F401
from .conv import conv2d, conv_transpose2x2  # noqa: F401
from .norm import layer_norm  # noqa: F401
from .attention import multi_head_attention  # noqa: F401
