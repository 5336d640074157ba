"""Browser-based GT pose annotator (reference: pose_annotator/, a Dash app).

Dash/plotly are not in this environment, so the same capability is built on
the Python stdlib http.server plus a self-contained canvas 3-D viewer: orbit
the plant point cloud, select/add/delete flower poses, nudge translation
(world axes) and rotation (local frame, pose @ R_delta — the reference's
annotator.py:244-270 convention), adjustable step sizes (x10 / /10), save to
flower_poses.npy.
"""

from flope_tpu.annotator.server import AnnotatorState, serve
