"""TeacherDetector adapter logic under mocked HF models.

The GroundingDINO+SAM teacher (pipeline/detector.py::TeacherDetector) is
weight-gated in this zero-egress environment, so its assembly logic —
label filtering ('flower' in label, grounding_dino.py:38-43), max_det
clipping, fixed-shape box/valid padding, SAM channel-0 mask union
(sam.py:36-39) — is exercised here with mock processors/models that
reproduce the exact HF call surface the adapter touches.
"""

import numpy as np
import pytest
import torch


class _Batch(dict):
    """Mock processor output: dict with .to(device) and attr access."""

    def to(self, _device):
        return self

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


class _FakeGdinoProcessor:
    def __init__(self, results):
        self._results = results

    def __call__(self, images=None, text=None, return_tensors=None):
        assert text.endswith(".")
        return _Batch(input_ids=torch.zeros((1, 4), dtype=torch.long))

    def post_process_grounded_object_detection(self, _out, _ids, threshold,
                                               text_threshold, target_sizes):
        assert threshold == 0.3 and text_threshold == 0.3
        return [self._results]


class _FakeModel:
    def to(self, _device):
        return self

    def __call__(self, **_kw):
        return object()


class _FakeSamProcessor:
    def __init__(self, h, w):
        self._h, self._w = h, w
        self.image_processor = self
        self.seen_boxes = None

    def __call__(self, img, input_boxes=None, return_tensors=None):
        self.seen_boxes = input_boxes
        return _Batch({
            "original_sizes": torch.tensor([[self._h, self._w]]),
            "reshaped_input_sizes": torch.tensor([[self._h, self._w]]),
        })


class _FakeSam:
    def __init__(self, masks):
        self._masks = masks

    def to(self, _device):
        return self

    def __call__(self, **_kw):
        class Out:
            pred_masks = torch.zeros(1)
        return Out()


def _install(monkeypatch, gdino_results, masks, h, w):
    import transformers

    sam_proc = _FakeSamProcessor(h, w)

    def post_process_masks(_pred, _orig, _reshaped):
        return [masks]

    sam_proc.post_process_masks = post_process_masks

    monkeypatch.setattr(transformers.AutoProcessor, "from_pretrained",
                        staticmethod(lambda p: _FakeGdinoProcessor(gdino_results)))
    monkeypatch.setattr(transformers.AutoModelForZeroShotObjectDetection,
                        "from_pretrained", staticmethod(lambda p: _FakeModel()))
    monkeypatch.setattr(transformers.SamProcessor, "from_pretrained",
                        staticmethod(lambda p: sam_proc))
    monkeypatch.setattr(transformers.SamModel, "from_pretrained",
                        staticmethod(lambda p: _FakeSam(masks)))
    return sam_proc


def _make_detector(max_det=4):
    from flope_tpu.pipeline.detector import TeacherDetector

    return TeacherDetector("gdino-path", "sam-path", max_det=max_det)


class TestTeacherDetector:
    def test_label_filter_and_union_mask(self, monkeypatch):
        h, w = 32, 48
        results = {
            "boxes": torch.tensor([[1.0, 2, 10, 12], [20, 5, 30, 15],
                                   [3, 3, 9, 9]]),
            "labels": ["white flower", "leaf", "flower bud"],
            "scores": torch.tensor([0.9, 0.8, 0.7]),
        }
        # Per-box 3-channel masks; channel 0 is the one SAM keeps (sam.py:36).
        masks = torch.zeros((2, 3, h, w), dtype=torch.bool)
        masks[0, 0, 2:10, 1:10] = True
        masks[0, 1, 20:30, 20:30] = True  # non-channel-0: must be ignored
        masks[1, 0, 5:15, 20:30] = True
        sam_proc = _install(monkeypatch, results, masks, h, w)

        det = _make_detector(max_det=4)
        rgb = np.zeros((h, w, 3), np.uint8)
        boxes, valid, mask = det.detect(rgb)

        assert boxes.shape == (4, 4) and valid.shape == (4,)
        assert valid.tolist() == [True, True, False, False]  # 'leaf' dropped
        np.testing.assert_array_equal(boxes[0], [1, 2, 10, 12])
        np.testing.assert_array_equal(boxes[1], [3, 3, 9, 9])
        # Union of channel-0 masks only, uint8 {0,255}.
        assert mask.dtype == np.uint8
        assert mask[5, 5] == 255 and mask[10, 25] == 255
        assert mask[25, 25] == 0  # channel-1 region not in the union
        # SAM prompted with the filtered boxes as floats.
        assert sam_proc.seen_boxes == [[[1.0, 2, 10, 12], [3, 3, 9, 9]]]

    def test_max_det_clipping(self, monkeypatch):
        h, w = 16, 16
        n = 5
        results = {
            "boxes": torch.arange(n * 4, dtype=torch.float32).reshape(n, 4),
            "labels": ["flower"] * n,
            "scores": torch.ones(n),
        }
        masks = torch.zeros((2, 1, h, w), dtype=torch.bool)
        _install(monkeypatch, results, masks, h, w)

        det = _make_detector(max_det=2)
        boxes, valid, _ = det.detect(np.zeros((h, w, 3), np.uint8))
        assert valid.sum() == 2
        assert boxes.shape == (2, 4)

    def test_no_flowers_detected(self, monkeypatch):
        h, w = 16, 16
        results = {"boxes": torch.zeros((0, 4)), "labels": [],
                   "scores": torch.zeros(0)}
        masks = torch.zeros((0, 1, h, w), dtype=torch.bool)
        _install(monkeypatch, results, masks, h, w)

        det = _make_detector(max_det=3)
        boxes, valid, mask = det.detect(np.zeros((h, w, 3), np.uint8))
        assert not valid.any()
        assert (mask == 0).all()
        assert boxes.shape == (3, 4)
