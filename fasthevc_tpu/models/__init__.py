"""Learned fast-partition model (SURVEY.md E8 — the FastHEVC delta).

A small CNN predicts the CU partition depth map of each CTU directly from
pixels (the partition-map approach of the retrieved papers, PAPERS.md),
trained by self-distillation on this encoder's own full-RDO decisions —
no external data needed. Inference runs on-TPU fused into the batched
search (north-star requirement), pruning the quadtree DP.
"""

from .partition_cnn import (
    PartitionCNN,
    load_params,
    predict_depth_maps,
    save_params,
    train_self_distilled,
)

__all__ = ["PartitionCNN", "load_params", "predict_depth_maps",
           "save_params", "train_self_distilled"]
