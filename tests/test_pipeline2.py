"""Two-stage pipeline parallelism: correctness vs the fused per-frame graph.

The ('stage','stream') scan+ppermute pipeline (parallel/pipeline2.py) must
produce exactly what vmapped detect_and_pose produces for every frame — the
pipelining only reorders WHEN stages run, never what they compute.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flope_tpu.data.synthetic import SyntheticScene, orbit_camera, render_frame
from flope_tpu.models import init_posenet
from flope_tpu.models.yolo import init_yolo
from flope_tpu.parallel import make_mesh
from flope_tpu.parallel.pipeline2 import two_stage_detect_pose
from flope_tpu.pipeline import PipelineConfig
from flope_tpu.pipeline.detector import detect_and_pose


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig(max_det=4, crop_size=48, erode_ksize=3,
                         min_depth_pixels=10, crop_region=None)
    det_size = 96
    rng = np.random.default_rng(0)
    scene = SyntheticScene.random(rng, n_flowers=3, height=96, width=128)
    t_steps, s_lanes = 3, 4
    frames = [[render_frame(scene, orbit_camera(scene, 0.2 * (t * s_lanes + s)),
                            max_det=cfg.max_det)
               for s in range(s_lanes)] for t in range(t_steps)]
    rgb = jnp.asarray(np.stack([[f.rgb for f in row] for row in frames]),
                      jnp.float32)
    depth = jnp.asarray(np.stack([[f.depth_mm for f in row] for row in frames]),
                        jnp.float32)
    _, pvars = init_posenet(jax.random.PRNGKey(0), image_size=cfg.crop_size)
    _, yvars = init_yolo(jax.random.PRNGKey(1), image_size=det_size)
    K = jnp.asarray(scene.K, jnp.float32)
    return cfg, det_size, rgb, depth, pvars, yvars, K


def test_pipeline_matches_fused_graph(setup):
    cfg, det_size, rgb, depth, pvars, yvars, K = setup
    mesh = make_mesh({"stage": 2, "stream": 4})
    with mesh:
        piped = two_stage_detect_pose(mesh, yvars, pvars, rgb, depth, K,
                                      det_size=det_size, score_th=0.0,
                                      config=cfg)

    f = lambda r, d: detect_and_pose(yvars, pvars, r, d, K, det_size=det_size,
                                     score_th=0.0, config=cfg)
    fused = jax.vmap(jax.vmap(f))(rgb, depth)

    np.testing.assert_array_equal(np.asarray(piped.valid),
                                  np.asarray(fused.valid))
    np.testing.assert_array_equal(np.asarray(piped.boxes),
                                  np.asarray(fused.boxes))
    np.testing.assert_allclose(np.asarray(piped.poses),
                               np.asarray(fused.poses), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(piped.depth),
                               np.asarray(fused.depth), rtol=1e-4, atol=1e-5)
    # rotmats are computed for EVERY slot (pre-validity), so this comparison
    # exercises the whole crop+PoseNet path even when the random-weight
    # detector's boxes fail depth-reliability filtering.
    np.testing.assert_allclose(np.asarray(piped.rotmats),
                               np.asarray(fused.rotmats), rtol=2e-4, atol=2e-4)
    boxes = np.asarray(fused.boxes)
    assert not (boxes == boxes.reshape(-1, 4)[0]).all(), \
        "degenerate detector output; test exercises nothing"
    assert int(piped.num_valid.sum()) == int(fused.num_valid.sum())
