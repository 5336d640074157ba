"""The fused per-frame pose pipeline (detector tail -> 6-DoF poses)."""

from flope_tpu.pipeline.types import FramePrediction
from flope_tpu.pipeline.predictor import (
    PipelineConfig,
    predict_frame,
    predict_frames,
    PosePredictor,
)
