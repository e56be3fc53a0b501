"""Metric math tests: classification parity vs reference, detection hand-cases,
WKT parsing/rasterization."""

import numpy as np
import pytest

from teochat_tpu.eval.classification import classification_metrics
from teochat_tpu.eval.detection import (
    Evaluator,
    change_detection_classification,
    detection_metrics,
    evaluate_masks,
    parse_predicted_boxes,
)
from teochat_tpu.eval.geometry import boxes_to_wkt, create_mask, wkt_exteriors
from teochat_tpu.eval.inference import extract_bboxes, replace_video_token

from tests.ref_loader import HAS_REFERENCE, load_ref_module


# ---------- classification ----------

OUTPUTS = [
    {"response": "Residential!", "ground_truth": "residential", "task": "cls"},
    {"response": "commercial", "ground_truth": "residential", "task": "cls"},
    {"response": "Yes, it is", "ground_truth": "yes", "task": "qa"},
    {"response": "no", "ground_truth": "no", "task": "qa"},
]


def test_classification_exact_match():
    m = classification_metrics(OUTPUTS)
    assert m["cls_accuracy"] == 0.5
    assert m["qa_accuracy"] == 0.5


def test_classification_keywords():
    m = classification_metrics(OUTPUTS, keywords=["yes", "no"])
    assert m["qa_accuracy"] == 1.0  # "yes" contained in both


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_classification_parity():
    ref = load_ref_module(
        "videollava/eval/classification.py", "videollava.eval.classification"
    ).classification_metrics
    for kws in [None, ["yes", "no"], ["residential"]]:
        assert classification_metrics(OUTPUTS, keywords=kws) == ref(OUTPUTS, keywords=kws)


# ---------- geometry ----------

def test_wkt_polygon():
    rings = wkt_exteriors("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert len(rings) == 1 and len(rings[0]) == 5


def test_wkt_polygon_with_hole_uses_exterior_only():
    rings = wkt_exteriors(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
    )
    assert len(rings) == 1
    assert rings[0][1] == (10.0, 0.0)


def test_wkt_multipolygon_and_collection():
    r = wkt_exteriors("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((2 2, 3 2, 3 3, 2 2)))")
    assert len(r) == 2
    r2 = wkt_exteriors(
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 0)), POINT (5 5))"
    )
    assert len(r2) == 1


def test_wkt_list_input():
    r = wkt_exteriors(boxes_to_wkt([[0, 0, 2, 2], [3, 3, 5, 5]]))
    assert len(r) == 2


def test_create_mask_matches_pil_semantics():
    mask = create_mask("POLYGON ((1 1, 4 1, 4 4, 1 4, 1 1))", (8, 8))
    assert mask.shape == (8, 8)
    assert mask[2, 2] == 1 and mask[0, 0] == 0
    # PIL polygon fills boundary inclusive
    assert mask[1, 1] == 1 and mask[4, 4] == 1


# ---------- Evaluator ----------

def test_evaluator_binary_metrics():
    ev = Evaluator(2)
    gt = np.array([[1, 1, 0, 0]])
    pred = np.array([[1, 0, 1, 0]])
    ev.add_batch(gt, pred)
    # cm = [[1 tn, 1 fp], [1 fn, 1 tp]]
    assert ev.confusion_matrix.tolist() == [[1, 1], [1, 1]]
    assert ev.Pixel_Precision_Rate() == 0.5
    assert ev.Pixel_Recall_Rate() == 0.5
    assert ev.Pixel_F1_score() == 0.5
    assert ev.Intersection_over_Union() == pytest.approx(1 / 3)
    assert ev.Pixel_Accuracy() == 0.5


def test_evaluate_masks_perfect_prediction():
    # GT polygon == predicted box (100x100 percent space onto 256x256)
    poly = "POLYGON ((25.6 25.6, 128 25.6, 128 128, 25.6 128, 25.6 25.6))"
    results = [
        {
            "ground_truth": "[10, 10, 50, 50]",
            "response": "[10, 10, 50, 50]",
            "polygon": poly,
        }
    ]
    m = evaluate_masks(results, "xbd_loc")
    assert m["f1"] > 0.97  # rounding at raster edges only


def test_evaluate_masks_no_boxes():
    results = [{"ground_truth": "no change", "response": "no change", "polygon": None}]
    m = evaluate_masks(results, "s2_det")
    assert m["oa"] == 1.0


def test_parse_predicted_boxes_malformed():
    assert parse_predicted_boxes("[1, 2, 3, 4], [bad], [5,6,7,8]") == [
        [1, 2, 3, 4],
        [5, 6, 7, 8],
    ]


# ---------- change detection classification ----------

def _cdc_outputs():
    poly = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    return [
        {"response": "No damage", "ground_truth": "no damage", "polygon": poly},
        {"response": "destroyed", "ground_truth": "destroyed", "polygon": poly},
        {"response": "minor damage", "ground_truth": "destroyed", "polygon": poly},
    ]


def test_change_detection_classification_scores():
    classes = ["no damage", "minor damage", "major damage", "destroyed"]
    m = change_detection_classification(_cdc_outputs(), classes)
    assert 0 < m["f1"] < 1
    assert m["w_f1"] > 0 and m["inv_w_f1"] > 0


def test_change_detection_skip_classes():
    poly = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    outs = [{"response": "x", "ground_truth": "unclassified", "polygon": poly}]
    m = change_detection_classification(outs, ["no damage"], skip_classes=["unclassified"])
    assert m["f1"] == 0.0


# ---------- dispatch ----------

def test_detection_metrics_dispatch_xbd_loc():
    poly = "POLYGON ((25.6 25.6, 128 25.6, 128 128, 25.6 128, 25.6 25.6))"
    outs = [
        {
            "task": "change_detection_localization",
            "response": "[10, 10, 50, 50]",
            "ground_truth": "[10, 10, 50, 50]",
            "polygon": poly,
        }
    ]
    m = detection_metrics(outs, "xbd_loc")
    assert "change_detection_localization_f1" in m


def test_detection_metrics_unknown_dataset():
    with pytest.raises(ValueError):
        detection_metrics([{"task": "x", "response": "", "ground_truth": ""}], "nope")


# ---------- inference helpers ----------

def test_extract_bboxes():
    s = "Here [10, 20, 30, 40] and [1, 2, 3, 4]."
    assert extract_bboxes(s) == [[10, 20, 30, 40], [1, 2, 3, 4]]
    assert extract_bboxes("[1.5, 2, 3, 4]") == []  # ints only, reference regex


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_replace_video_token_parity():
    # reference inference.py imports torch at module level; replicate the logic
    # check against its documented expansion instead
    out = replace_video_token("look <video> now", ["a", "b", "c"], "interleave")
    assert out == "look Image 1: <image>Image 2: <image>Image 3: <image> now"
    out2 = replace_video_token("look <video>", ["a", "b"], None)
    assert out2 == "look <image><image>"
    with pytest.raises(ValueError):
        replace_video_token("x <video>", ["a"], "bogus")
