from vadcl_tpu.viz.dumps import (
    error_heatmap,
    export_cluster_embedding,
    save_clip_frames,
)

__all__ = ["error_heatmap", "export_cluster_embedding", "save_clip_frames"]
