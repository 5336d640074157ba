"""Model zoo: PoseNet rotation regressor + YOLO11-seg detector (JAX/Flax)."""

from flope_tpu.models.resnet import ResNet18, BasicBlock
from flope_tpu.models.posenet import PoseNet, init_posenet
from flope_tpu.models.torch_convert import (
    posenet_variables_from_torch,
    posenet_state_dict_to_torch,
)
