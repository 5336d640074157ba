"""Multi-view fusion: the reference ships three algorithms, we ship all three.

1. Online Kalman tracker (FlowerModel / flower_model.py) -> tracker.py
2. Score-weighted running average (Env3D / align_measurements.py) -> running_average.py
3. Offline per-flower quaternion smoothing (kalman_filter.py) -> offline.py
"""

from flope_tpu.tracking.kalman import KF_Q, KF_R, kf_update, kf_init_variance
from flope_tpu.tracking.tracker import (
    TrackState,
    init_tracks,
    tracker_step,
    track_sequence,
)
from flope_tpu.tracking.running_average import (
    AverageState,
    init_average_state,
    average_step,
    average_sequence,
)
from flope_tpu.tracking.offline import smooth_quaternions
from flope_tpu.tracking.live_view import LiveStatePlot
from flope_tpu.tracking.fusion import (
    world_measurements,
    fused_tracker_step,
    fused_track_sequence,
    fuse_stream_predictions,
)
