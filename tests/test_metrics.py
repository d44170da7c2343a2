import numpy as np
import pytest

from hual_tpu.utils.metrics import (batched_iou, calculate_iou,
                                    calculate_iou_accuracy, index_to_time,
                                    index_to_time_al, index_to_time_batch,
                                    rank1_metrics, time_to_index,
                                    time_to_index_al)


def test_calculate_iou_basic():
    assert calculate_iou([0, 10], [0, 10]) == 1.0
    assert calculate_iou([0, 5], [5, 10]) == 0.0
    assert calculate_iou([0, 6], [4, 10]) == pytest.approx(0.2)
    assert calculate_iou([0, 0], [0, 0]) == 0.0  # degenerate union -> 0


def test_batched_iou_matches_scalar():
    rng = np.random.default_rng(0)
    pred = np.sort(rng.uniform(0, 30, size=(50, 2)), axis=1)
    gt = np.sort(rng.uniform(0, 30, size=(50, 2)), axis=1)
    batched = batched_iou(pred, gt)
    for i in range(50):
        assert batched[i] == pytest.approx(
            calculate_iou(pred[i].tolist(), gt[i].tolist()))


def test_iou_accuracy():
    ious = [0.2, 0.5, 0.71, 0.9]
    assert calculate_iou_accuracy(ious, 0.5) == 75.0
    assert calculate_iou_accuracy(ious, 0.7) == 50.0
    m = rank1_metrics(ious)
    assert m["r1i3"] == 75.0 and m["miou"] == pytest.approx(57.75)


def test_time_to_index_exact_span():
    # a moment aligned exactly with units 2..5 of an 8-unit, 16s video
    s, e = time_to_index(4.0, 12.0, 8, 16.0)
    assert (s, e) == (2, 5)
    st, et = index_to_time(s, e, 8, 16.0)
    assert (st, et) == (4.0, 12.0)


def test_time_to_index_full_video():
    s, e = time_to_index(0.0, 20.0, 10, 20.0)
    assert (s, e) == (0, 9)


def test_index_to_time_batch_matches_scalar():
    rng = np.random.default_rng(1)
    si = rng.integers(0, 8, size=20)
    ei = si + rng.integers(0, 4, size=20)
    nu = np.full(20, 12)
    dur = rng.uniform(5, 40, size=20).astype(np.float32)
    s_b, e_b = index_to_time_batch(si, ei, nu, dur)
    for i in range(20):
        s, e = index_to_time(int(si[i]), int(ei[i]), 12, float(dur[i]))
        assert s_b[i] == pytest.approx(s, rel=1e-6)
        assert e_b[i] == pytest.approx(e, rel=1e-6)


def test_al_conventions_roundtrip():
    # AL convention: round(t/dur*(vlen-1)) and round(t/(vlen-1)*dur, 2)
    assert time_to_index_al(10.0, 20.0, 11) == 5
    assert index_to_time_al(5, 20.0, 11) == 10.0
    assert time_to_index_al([0.0, 20.0], 20.0, 11) == [0, 10]
    assert index_to_time_al([0, 10], 20.0, 11) == [0.0, 20.0]
    # banker's rounding parity with python round()
    assert time_to_index_al(2.5, 10.0, 11) == round(2.5 / 10.0 * 10)
