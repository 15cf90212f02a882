from .style_params import StyleParamCursor, apply_style_weights, concat_implicit_weight  # noqa: F401
from .normalization import conditional_instance_norm, cin_from_cursor, instance_moments  # noqa: F401
from .image_ops import gram_matrix, mean_l2_loss_on_batch, total_variation, style_weight_mips, avg_pool_2x  # noqa: F401
from .conv import conv_s2d, conv_same_s2d, conv_transpose_2x  # noqa: F401
from .packed_conv import pack, packed_conv, packed_conv_transpose_2x, unpack  # noqa: F401
