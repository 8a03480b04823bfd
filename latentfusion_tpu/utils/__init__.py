"""Config / scheduling substrate (behavioral reference: ``latentfusion/utils.py``).

Schedulers accept traced (jnp) steps so they can run inside jitted loops.
"""
from __future__ import annotations

import json
import math
import pathlib
import random
from functools import partial

import numpy as np

import jax.numpy as jnp


def seed_all(seed: int):
    """(reference: utils.py:17-20)"""
    np.random.seed(seed)
    random.seed(seed)


import contextlib  # noqa: E402


@contextlib.contextmanager
def manual_seed(seed: int):
    """Scoped host-RNG seeding (reference: torchutils.py:32-37). JAX PRNG
    keys are explicit, so only numpy/stdlib state needs scoping."""
    np_state = np.random.get_state()
    py_state = random.getstate()
    seed_all(seed)
    try:
        yield
    finally:
        np.random.set_state(np_state)
        random.setstate(py_state)


def list_arg(cast_type=str, delimiter=","):
    """(reference: utils.py:23-29)"""

    def f(s):
        if len(s) > 0:
            return [cast_type(item) for item in s.split(delimiter)]
        return []

    return f


def list_choices_arg(choices, cast_type=str, delimiter=","):
    """Like :func:`list_arg` but validates each item against ``choices``
    (reference: utils.py:32-42)."""
    _cast = list_arg(cast_type, delimiter)

    def f(s):
        items = _cast(s)
        for item in items:
            if item not in choices:
                raise ValueError(
                    f"{item!r} is not a valid choice (choose from {choices})")
        return items

    return f


def parse_block_str(s):
    if s in {"I", "U", "D"}:
        return s
    return int(s)


def parse_block_config(s, delimiter=",", group_delimiter=":"):
    """Block-config mini-DSL: ``'64,D,128:512,U,256'`` ->
    ((64,'D',128), (512,'U',256)) (reference: utils.py:38-54). Returns tuples
    (hashable, required for flax module fields)."""
    if s.lower() == "none" or len(s) == 0:
        return ()
    _parse = list_arg(parse_block_str, delimiter=delimiter)
    if group_delimiter in s:
        return tuple(tuple(_parse(sec)) for sec in s.split(group_delimiter))
    return tuple(_parse(s))


def block_config_arg(delimiter=",", group_delimiter=":"):
    return partial(parse_block_config, delimiter=delimiter,
                   group_delimiter=group_delimiter)


def flatten_list(lst):
    import itertools

    return list(itertools.chain.from_iterable(lst))


class MyEncoder(json.JSONEncoder):
    """(reference: utils.py:105-113)"""

    def default(self, obj):
        if isinstance(obj, pathlib.PurePath):
            return str(obj)
        if isinstance(obj, (jnp.ndarray, np.ndarray)):
            return np.asarray(obj).tolist()
        return json.JSONEncoder.default(self, obj)


class MultiStepMilestoneScheduler:
    """(reference: utils.py:125-136)"""

    def __init__(self, initial_value, milestones, gamma):
        self.initial_value = initial_value
        self.milestones = milestones
        self.gamma = gamma

    def get(self, step):
        if self.milestones is None:
            return self.initial_value
        if isinstance(step, (int, float)):
            from bisect import bisect_right

            return self.initial_value * self.gamma ** bisect_right(
                self.milestones, step)
        count = sum((step > m).astype(jnp.int32)
                    for m in self.milestones)
        return self.initial_value * self.gamma ** count


class LinearScheduler:
    """(reference: utils.py:139-149)"""

    def __init__(self, initial_value, end_value, num_steps):
        self.initial_value = initial_value
        self.end_value = end_value
        self.num_steps = num_steps

    def get(self, step):
        alpha = step / self.num_steps
        return (1.0 - alpha) * self.initial_value + alpha * self.end_value


class ExponentialScheduler:
    """(reference: utils.py:152-163)"""

    def __init__(self, initial_value, final_value, num_steps):
        self.initial_value = initial_value
        self.final_value = final_value
        self.mean_lifetime = -(num_steps - 1) / math.log(
            final_value / initial_value)
        self.num_steps = num_steps

    def get(self, step):
        if isinstance(step, (int, float)):
            if step >= self.num_steps:
                return self.final_value
            return self.initial_value * math.exp(-step / self.mean_lifetime)
        return jnp.where(
            step >= self.num_steps,
            self.final_value,
            self.initial_value * jnp.exp(-step / self.mean_lifetime))
