from .losses import (
    get_fed_loss_classes,
    giou_loss_xyxy,
    heatmap_focal_loss,
    iou_loss,
    sigmoid_cross_entropy_with_fed_loss,
    smooth_l1_loss,
)
from .mask_paste import paste_masks
from .nms import batched_nms_mask, nms_mask, top_scoring
from .pallas.flash_attention import (
    flash_attention,
    flash_attention_packed,
    reference_attention,
)
from .roi_align import multilevel_roi_align, roi_align
from .rotated import nms_rotated, pairwise_iou_rotated, roi_align_rotated
from .deform_conv import deform_conv2d

__all__ = [
    "get_fed_loss_classes",
    "giou_loss_xyxy",
    "heatmap_focal_loss",
    "iou_loss",
    "sigmoid_cross_entropy_with_fed_loss",
    "smooth_l1_loss",
    "paste_masks",
    "batched_nms_mask",
    "nms_mask",
    "top_scoring",
    "flash_attention",
    "flash_attention_packed",
    "reference_attention",
    "multilevel_roi_align",
    "roi_align",
    "roi_align_rotated",
    "pairwise_iou_rotated",
    "nms_rotated",
    "deform_conv2d",
]
