"""TeacherDetector driven through the REAL transformers API with tiny models.

The mocks in test_teacher_detector.py verify the adapter's logic; this module
verifies the adapter against actual HF GroundingDINO + SAM code paths —
processor -> model forward -> post_process_grounded_object_detection ->
SamProcessor box prompts -> post_process_masks -> channel-0 OR-union — using
randomly-initialized tiny configs saved/loaded via save_pretrained /
from_pretrained (the exact loading path the real checkpoints use; reference:
models/grounding_dino.py:17-44, models/sam.py:13-49). No network egress is
needed: weights are random, so only API correctness (shapes, dtypes,
contracts) is asserted, not detection quality.
"""

import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_ckpts(tmp_path_factory):
    import torch
    from transformers import (BertConfig, BertTokenizerFast,
                              GroundingDinoConfig,
                              GroundingDinoForObjectDetection,
                              GroundingDinoImageProcessor,
                              GroundingDinoProcessor, SamConfig,
                              SamImageProcessor, SamMaskDecoderConfig,
                              SamModel, SamProcessor, SamPromptEncoderConfig,
                              SamVisionConfig, SwinConfig)

    torch.manual_seed(0)
    root = tmp_path_factory.mktemp("tiny_teacher")
    gdir, sdir = str(root / "gdino"), str(root / "sam")

    # Tiny GroundingDINO: d_model must be a multiple of 32 (hard-coded
    # GroupNorm(32, d_model) in the input projection); 3 feature levels so
    # no extra stride-2 level collapses the 64 px input to 1x1.
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "white", "flower", ".", "a", "the"]
    os.makedirs(gdir, exist_ok=True)
    vpath = os.path.join(gdir, "vocab.txt")
    with open(vpath, "w") as f:
        f.write("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=vpath)
    cfg = GroundingDinoConfig(
        backbone_config=SwinConfig(
            image_size=64, patch_size=4, embed_dim=8, depths=[1, 1, 1, 1],
            num_heads=[1, 1, 1, 1], window_size=4,
            out_features=["stage2", "stage3", "stage4"]),
        text_config=BertConfig(
            vocab_size=len(vocab), hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=64),
        d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_ffn_dim=32, num_queries=10,
        num_feature_levels=3, max_text_len=32,
        encoder_n_points=2, decoder_n_points=2)
    GroundingDinoForObjectDetection(cfg).save_pretrained(gdir)
    GroundingDinoProcessor(
        image_processor=GroundingDinoImageProcessor(
            size={"shortest_edge": 64, "longest_edge": 64}),
        tokenizer=tok).save_pretrained(gdir)

    # Tiny SAM: the prompt encoder's positional embedding dim comes from
    # vision_config.num_pos_feats (2*16 = prompt hidden 32).
    os.makedirs(sdir, exist_ok=True)
    scfg = SamConfig(
        vision_config=SamVisionConfig(
            image_size=64, patch_size=8, hidden_size=16, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=32, output_channels=32,
            num_pos_feats=16, global_attn_indexes=[1], window_size=2),
        prompt_encoder_config=SamPromptEncoderConfig(
            hidden_size=32, image_size=64, patch_size=8,
            image_embedding_size=8),
        mask_decoder_config=SamMaskDecoderConfig(
            hidden_size=32, num_attention_heads=2, mlp_dim=64,
            iou_head_hidden_dim=32))
    SamModel(scfg).save_pretrained(sdir)
    SamProcessor(SamImageProcessor(
        size={"longest_edge": 64}, pad_size={"height": 64, "width": 64},
        mask_size={"longest_edge": 16},
        mask_pad_size={"height": 16, "width": 16})).save_pretrained(sdir)
    return gdir, sdir


@pytest.fixture(scope="module")
def detector(tiny_ckpts):
    from flope_tpu.pipeline.detector import TeacherDetector
    gdir, sdir = tiny_ckpts
    # Thresholds near zero: random weights must still produce detections so
    # the SAM branch executes.
    return TeacherDetector(gdir, sdir, max_det=8, box_th=0.05, text_th=0.0)


class TestTeacherRealAPI:
    def test_detect_contract(self, detector):
        rgb = (np.random.default_rng(0).random((96, 128, 3)) * 255
               ).astype(np.uint8)
        boxes, valid, mask = detector.detect(rgb)
        assert boxes.shape == (8, 4) and boxes.dtype == np.int32
        assert valid.shape == (8,) and valid.dtype == bool
        assert mask.shape == (96, 128) and mask.dtype == np.uint8
        assert set(np.unique(mask)) <= {0, 255}
        # Random tiny weights at threshold ~0 must detect something — the
        # point of this test is that the SAM path actually ran.
        assert valid.any()
        # Valid boxes sit inside the frame with non-negative extent.
        b = boxes[valid]
        assert (b[:, 0] <= b[:, 2]).all() and (b[:, 1] <= b[:, 3]).all()
        assert (b >= 0).all()
        assert (b[:, 2] <= 128).all() and (b[:, 3] <= 96).all()

    def test_no_detection_frame_contract(self, tiny_ckpts):
        # Thresholds high enough that nothing passes -> zeroed fixed-shape
        # outputs, never None (the masked null-object contract).
        from flope_tpu.pipeline.detector import TeacherDetector
        gdir, sdir = tiny_ckpts
        det = TeacherDetector(gdir, sdir, max_det=4, box_th=0.999,
                              text_th=0.999)
        rgb = np.zeros((64, 64, 3), np.uint8)
        boxes, valid, mask = det.detect(rgb)
        assert not valid.any()
        assert (boxes == 0).all() and (mask == 0).all()

    def test_detect_matches_pipeline_protocol(self, detector):
        # The teacher's outputs must be consumable by the fused pose tail
        # exactly like the student's (pipeline detector protocol).
        import jax.numpy as jnp
        from flope_tpu.pipeline import PipelineConfig, predict_frame
        from flope_tpu.models import init_posenet
        import jax

        rgb = (np.random.default_rng(1).random((96, 128, 3)) * 255
               ).astype(np.uint8)
        boxes, valid, mask = detector.detect(rgb)
        depth = np.full((96, 128), 1500, np.uint16)
        cfg = PipelineConfig(max_det=8, crop_size=32)
        _, variables = init_posenet(jax.random.PRNGKey(0), image_size=32)
        K = jnp.asarray([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
        pred = predict_frame(variables, jnp.asarray(rgb, jnp.float32),
                             jnp.asarray(depth), jnp.asarray(boxes),
                             jnp.asarray(valid), jnp.asarray(mask), K, cfg)
        assert pred.poses.shape == (8, 4, 4)
        assert bool(jnp.all(jnp.isfinite(pred.poses)))
