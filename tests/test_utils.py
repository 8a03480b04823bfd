"""Scheduler / config substrate parity (CEM annealing + loss schedules
depend on these exactly)."""
import math

import numpy as np

import jax.numpy as jnp

from latentfusion_tpu import utils


class TestExponentialScheduler:
    def test_endpoints(self):
        s = utils.ExponentialScheduler(1.0, 0.01, 10)
        np.testing.assert_allclose(s.get(0), 1.0)
        np.testing.assert_allclose(s.get(9), 0.01, rtol=1e-6)
        # Clamps at final value past num_steps.
        assert s.get(100) == 0.01

    def test_matches_reference_formula(self):
        """(reference: utils.py:152-163)"""
        initial, final, n = 128.0, 48.0, 10
        s = utils.ExponentialScheduler(initial, final, n)
        mean_lifetime = -(n - 1) / math.log(final / initial)
        for step in range(n):
            np.testing.assert_allclose(
                s.get(step), initial * math.exp(-step / mean_lifetime),
                rtol=1e-6)

    def test_traced_step(self):
        s = utils.ExponentialScheduler(1.0, 0.01, 10)
        out = s.get(jnp.asarray(5))
        np.testing.assert_allclose(float(out), s.get(5), rtol=1e-6)
        out = s.get(jnp.asarray(50))
        np.testing.assert_allclose(float(out), 0.01, rtol=1e-6)


class TestLinearScheduler:
    def test_interpolates(self):
        s = utils.LinearScheduler(0.0, 10.0, 10)
        np.testing.assert_allclose(s.get(5), 5.0)


class TestMultiStepMilestoneScheduler:
    def test_milestones(self):
        """(reference: utils.py:125-136; bisect_right semantics)"""
        s = utils.MultiStepMilestoneScheduler(16384, [15, 30, 45, 60], 0.5)
        assert s.get(0) == 16384
        assert s.get(15) == 8192   # bisect_right: boundary already decays
        assert s.get(29) == 8192
        assert s.get(60) == 1024
        assert utils.MultiStepMilestoneScheduler(5, None, 0.5).get(99) == 5

    def test_traced(self):
        s = utils.MultiStepMilestoneScheduler(16.0, [2, 4], 0.5)
        out = s.get(jnp.asarray(3))
        np.testing.assert_allclose(float(out), 8.0)


def test_parse_block_config():
    """(reference: utils.py:38-54)"""
    cfg = utils.parse_block_config("64,D,128:512,U,256")
    assert cfg == ((64, "D", 128), (512, "U", 256))
    assert utils.parse_block_config("none") == ()
    assert utils.parse_block_config("4,8") == (4, 8)


def test_manual_seed_scopes():
    import random

    random.seed(123)
    a = random.random()
    random.seed(123)
    with utils.manual_seed(7):
        inner = random.random()
    outer = random.random()
    assert outer == a  # state restored
    with utils.manual_seed(7):
        assert random.random() == inner


def test_list_choices_arg():
    """(reference: utils.py:32-42)"""
    import pytest

    f = utils.list_choices_arg(["a", "b"])
    assert f("a,b") == ["a", "b"]
    assert f("") == []
    with pytest.raises(ValueError):
        f("a,c")


def test_extract_features():
    """(reference: functional.py:4-10)"""
    import jax.numpy as jnp

    from latentfusion_tpu.functional import extract_features

    layers = [("a", lambda x: x + 1), ("b", lambda x: x * 2),
              ("c", lambda x: x - 3)]
    feats = extract_features(layers, jnp.zeros(()), ["a", "c"])
    assert [float(f) for f in feats] == [1.0, -1.0]
