"""Metrics tests: AP/mAP against hand-computed cases, int8 parity report."""
import numpy as np
import pytest

from simpleinfer_tpu.zoo.metrics import (
    average_precision,
    int8_parity_report,
    match_detections,
    mean_average_precision,
    top1_accuracy,
    topk_accuracy,
)

RNG = np.random.default_rng(53)


def test_match_detections_greedy():
    gt = np.asarray([[0.0, 0, 10, 10], [20, 20, 30, 30]])
    preds = [[0.0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30],
             [50, 50, 60, 60]]
    scores = [0.9, 0.8, 0.7, 0.6]
    tp = match_detections(preds, scores, gt)
    # best-scoring match per gt wins; duplicate and far-away are FPs
    assert tp.tolist() == [True, False, True, False]


def test_average_precision_perfect_and_worst():
    assert average_precision(np.asarray([1, 1]), np.asarray([0.9, 0.8]),
                             n_gt=2) == pytest.approx(1.0)
    assert average_precision(np.asarray([0, 0]), np.asarray([0.9, 0.8]),
                             n_gt=2) == pytest.approx(0.0)


def test_average_precision_hand_case():
    # 1 TP then 1 FP then 1 TP, 2 gt:
    # ranked: TP (p=1, r=.5), FP (p=.5), TP (p=2/3, r=1)
    ap = average_precision(np.asarray([1, 0, 1]),
                           np.asarray([0.9, 0.8, 0.7]), n_gt=2)
    assert ap == pytest.approx(0.5 * 1.0 + 0.5 * (2 / 3))


def test_map_identity_predictions():
    gts = [[(np.asarray([0.0, 0, 10, 10]), 0),
            (np.asarray([20.0, 20, 30, 30]), 1)]]
    preds = [[(np.asarray([0.0, 0, 10, 10]), 0.9, 0),
              (np.asarray([20.0, 20, 30, 30]), 0.8, 1)]]
    assert mean_average_precision(preds, gts, num_classes=2) == \
        pytest.approx(1.0)


def test_map_wrong_class_is_zero():
    gts = [[(np.asarray([0.0, 0, 10, 10]), 0)]]
    preds = [[(np.asarray([0.0, 0, 10, 10]), 0.9, 1)]]
    m = mean_average_precision(preds, gts, num_classes=2)
    assert m == pytest.approx(0.0)


def test_classification_metrics():
    logits = np.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    labels = np.asarray([1, 0, 0])
    assert top1_accuracy(logits, labels) == pytest.approx(2 / 3)
    assert topk_accuracy(logits, labels, k=2) == pytest.approx(2 / 3)
    assert topk_accuracy(logits, labels, k=3) == pytest.approx(1.0)


def test_int8_parity_report_end_to_end():
    """The BASELINE.json acceptance harness: quantized engine scored
    against the fp32 engine's detections as pseudo ground truth."""
    from simpleinfer_tpu import Engine, EngineConfig
    from simpleinfer_tpu.zoo import build_yolov5

    g1, in_name, _ = build_yolov5("n", batch=2, image_size=64)
    g2, _, _ = build_yolov5("n", batch=2, image_size=64)
    fp = Engine(EngineConfig()).load_model(None, graph=g1)
    q = Engine(EngineConfig(quant="int8w")).load_model(None, graph=g2)
    x = RNG.standard_normal((2, 64, 64, 3)).astype(np.float32) / 2
    rep = int8_parity_report(fp, q, x, conf_thresh=0.6)
    assert rep.n_images == 2
    assert np.isnan(rep.map_vs_fp32) or rep.map_vs_fp32 >= 0.0
    assert rep.max_abs_logit_delta < 50.0
    assert "int8-vs-fp32" in str(rep)
