"""Serving API tests."""

import numpy as np
import pytest

import jax

from grouptraj.config import MODEL_PRESETS
from grouptraj.models import init_generator
from grouptraj.serve import Predictor


@pytest.fixture(scope="module")
def predictor():
    cfg = MODEL_PRESETS["gat"]
    params = init_generator(jax.random.PRNGKey(0), cfg)
    return Predictor(params, cfg, num_samples=4)


def _scene(n, seed=0):
    r = np.random.default_rng(seed)
    steps = r.normal(scale=0.1, size=(n, 8, 2)).astype(np.float32)
    return np.cumsum(steps, axis=1) + r.normal(size=(n, 1, 2)).astype(
        np.float32)


def test_predict_single_scene(predictor):
    xy = _scene(5)
    out = predictor.predict(xy, groups=np.array([1, 1, 0, 2, 2], np.float32))
    assert out.shape == (4, 5, 12, 2)
    assert np.isfinite(out).all()
    # futures start near the last observed position (rel decoding)
    assert np.abs(out[:, :, 0] - xy[None, :, -1]).max() < 5.0


def test_predict_batch_mixed_sizes(predictor):
    scenes = [_scene(3, 1), _scene(7, 2)]
    outs = predictor.predict_batch(scenes)
    assert outs[0].shape == (4, 3, 12, 2)
    assert outs[1].shape == (4, 7, 12, 2)


def test_bucketing_compiles_once(predictor):
    predictor.predict(_scene(3, 3))
    n_compiled = len(predictor._compiled)
    predictor.predict(_scene(5, 4))   # same bucket (<=8)
    assert len(predictor._compiled) == n_compiled


def test_scene_count_bucketing_compiles_once(predictor):
    """Varying scenes-per-call within one s_bucket reuses the executable
    (serving is dispatch-latency-bound; a recompile is ~seconds)."""
    predictor.predict_batch([_scene(3, 5), _scene(4, 6)])
    n_compiled = len(predictor._compiled)
    predictor.predict_batch([_scene(3, 7), _scene(4, 8), _scene(5, 9)])
    assert len(predictor._compiled) == n_compiled   # same (S=4, N=8) bucket


def test_pad_scenes_do_not_perturb(predictor):
    """All-invalid pad scenes (the s_bucket filler) leave real scenes'
    outputs bit-identical — scenes are independent through the model."""
    a, b, c = _scene(3, 10), _scene(4, 11), _scene(5, 12)
    key = jax.random.PRNGKey(42)
    two = predictor.predict_batch([a, b], key=key)
    three = predictor.predict_batch([a, b, c], key=key)  # same S bucket (4)
    np.testing.assert_array_equal(two[0], three[0])
    np.testing.assert_array_equal(two[1], three[1])


def test_bad_shape_raises(predictor):
    with pytest.raises(ValueError):
        predictor.predict(np.zeros((4, 5, 2), np.float32))


def test_from_checkpoint_zoo():
    import os
    path = "models/grouptraj/zara1_12_with_model.pt"
    if not os.path.exists(path):
        pytest.skip("zoo checkpoint not present")
    p = Predictor.from_checkpoint(path, num_samples=3)
    out = p.predict(_scene(4))
    assert out.shape == (3, 4, 12, 2)
