from vadcl_tpu.ops.convs import (
    conv3d,
    conv_transpose3d,
    max_pool3d_same,
    same_pad_amounts,
)
from vadcl_tpu.ops.window import (
    compute_attn_mask,
    get_window_size,
    relative_position_index,
    window_attention,
    window_partition,
    window_reverse,
)
from vadcl_tpu.ops.cluster import (
    cdist,
    neg_soft_assign,
    pos_soft_assign,
    feature_cluster_assign,
    space_cluster_assign,
)
from vadcl_tpu.ops.memory import memory_read, memory_update, memory_losses

__all__ = [
    "conv3d",
    "conv_transpose3d",
    "max_pool3d_same",
    "same_pad_amounts",
    "compute_attn_mask",
    "get_window_size",
    "relative_position_index",
    "window_attention",
    "window_partition",
    "window_reverse",
    "cdist",
    "neg_soft_assign",
    "pos_soft_assign",
    "feature_cluster_assign",
    "space_cluster_assign",
    "memory_read",
    "memory_update",
    "memory_losses",
]
