"""Shim for `torchvision` (not installed): just enough for the reference's
PoseResNet (sunflower/models/posenet.py:10 uses models.resnet18) and the
module-scope imports in utils/image_manipulation.py / datasets."""
