"""Kernel golden tests (SURVEY.md §5.2): the preprocessing tail and scoring
stub, pinned without PIL/onnxruntime."""

from __future__ import annotations

import math

import numpy as np
import pytest

from cl_tagger_batch_processing_spark.kernels.preprocess import (
    fake_decode_bytes,
    tensorize_array,
)
from cl_tagger_batch_processing_spark.kernels.scoring import StubScorer, sigmoid_clip_np


def test_tensorize_shape_and_dtype():
    img = np.zeros((10, 20, 3), dtype=np.uint8)
    out = tensorize_array(img)
    assert out.shape == (3, 10, 20)  # HWC -> CHW
    assert out.dtype == np.float32


def test_tensorize_normalization_golden():
    # 0 -> (0-0.5)/0.5 = -1 ; 255 -> (1-0.5)/0.5 = +1 ; 128 -> ~0.00392
    img = np.full((2, 2, 3), 255, dtype=np.uint8)
    assert np.allclose(tensorize_array(img), 1.0)
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    assert np.allclose(tensorize_array(img), -1.0)
    img = np.full((1, 1, 3), 128, dtype=np.uint8)
    assert np.allclose(tensorize_array(img), (128 / 255 - 0.5) / 0.5, atol=1e-6)


def test_tensorize_bgr_flip():
    # appV2.py:44 — channel 0 of the output must be the INPUT'S B channel.
    img = np.zeros((1, 1, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 0]  # pure red in RGB
    out = tensorize_array(img)
    assert out[0, 0, 0] == -1.0  # B channel: 0 -> -1
    assert out[2, 0, 0] == 1.0  # R channel moved to index 2


def test_sigmoid_clip_np_edges():
    logits = np.array([-100.0, -30.0, 0.0, 30.0, 100.0])
    probs = sigmoid_clip_np(logits)
    lo, hi = 1 / (1 + math.exp(30)), 1 / (1 + math.exp(-30))
    assert probs[0] == pytest.approx(lo)  # clipped, not underflowed
    assert probs[1] == pytest.approx(lo)
    assert probs[2] == pytest.approx(0.5)
    assert probs[4] == pytest.approx(hi)


def test_fake_decode_deterministic_and_tiled():
    a = fake_decode_bytes(b"hello world")
    b = fake_decode_bytes(b"hello world")
    assert np.array_equal(a, b)
    assert a.shape == (3, 64, 64)
    with pytest.raises(ValueError):
        fake_decode_bytes(b"xy")  # truncated payloads rejected


def test_stub_scorer_deterministic_batched():
    scorer = StubScorer(num_tags=16)
    t = fake_decode_bytes(b"payload-a")
    u = fake_decode_bytes(b"payload-b")
    one = scorer.score_batch(np.stack([t]))
    two = scorer.score_batch(np.stack([t, u]))
    assert one.shape == (1, 16)
    assert two.shape == (2, 16)
    # batch composition must not change per-row results
    assert np.allclose(one[0], two[0])
    assert not np.allclose(two[0], two[1])
