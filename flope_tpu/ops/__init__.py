"""Batched preprocessing ops: the compute between the detector and PoseNet.

Everything the reference did with per-box CPU loops + OpenCV
(crop/resize/erode/masked depth) expressed as fixed-shape XLA programs:
crop+resize rides the MXU as per-box sampling-matrix matmuls; erosion is a
convolution; depth pooling is a batched masked reduction; NMS is a greedy
fixed-K sweep.
"""

from flope_tpu.ops.crop_resize import (
    sampling_weights,
    crop_resize,
    crop_resize_with_mask,
    resize_image,
)
from flope_tpu.ops.morphology import ellipse_kernel, erode
from flope_tpu.ops.depth_pool import masked_depth_value
from flope_tpu.ops.nms import iou_matrix, nms
