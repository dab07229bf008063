from .resize import resize2d, resize_matrix  # noqa: F401
from .conv import conv2d, conv_transpose2x2, linear  # noqa: F401
from .norm import layer_norm  # noqa: F401
from .attention import attention_packed, flash_attention_packed, multi_head_attention  # noqa: F401
