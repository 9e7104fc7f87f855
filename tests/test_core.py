import jax
import numpy as np
import pytest

from goctr_tpu.core.config import Config
from goctr_tpu.core.meshes import MeshSpec, make_mesh, DATA_AXIS, MODEL_AXIS
from goctr_tpu.core.prng import PRNGPool
from goctr_tpu.utils import (accuracy, concat_slices, parse_int64_seq,
                             top_n_occurrences)


def test_mesh_8_devices():
    mesh = make_mesh(MeshSpec(data=4, model=2))
    assert mesh.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
    mesh_all = make_mesh()
    assert mesh_all.shape[DATA_AXIS] == len(jax.devices())


def test_mesh_bad_split():
    with pytest.raises(ValueError):
        make_mesh(MeshSpec(data=3, model=2))


def test_config_overrides():
    cfg = Config()
    rest = cfg.apply_overrides([
        "--optim.lr=0.01", "--model.hidden=200,80", "--verbose=true",
        "--model.name=din", "positional",
    ])
    assert cfg.optim.lr == 0.01
    assert cfg.model.hidden == (200, 80)
    assert cfg.verbose is True
    assert cfg.model.name == "din"
    assert rest == ["positional"]


def test_config_roundtrip():
    cfg = Config()
    cfg.optim.lr = 0.123
    cfg2 = Config.from_dict(cfg.to_dict())
    assert cfg2.optim.lr == 0.123
    assert cfg2.model.hidden == cfg.model.hidden


def test_prng_pool_streams():
    pool = PRNGPool(7)
    a, b = pool.next("drop"), pool.next("drop")
    assert not np.array_equal(jax.random.key_data(a), jax.random.key_data(b))
    # named streams are stable
    pool2 = PRNGPool(7)
    np.testing.assert_array_equal(
        jax.random.key_data(pool.named("init")),
        jax.random.key_data(pool2.named("init")))


def test_utils():
    v = concat_slices([1.0, 2.0], [3.0], [4.0, 5.0])
    np.testing.assert_array_equal(v, np.array([1, 2, 3, 4, 5], np.float32))
    assert top_n_occurrences(["a", "b", "a", "c", "a", "b"], 2) == [("a", 3), ("b", 2)]
    assert parse_int64_seq("1, 2,x, 3") == [1, 2, 3]
    assert accuracy([0.9, 0.1, 0.8], [1, 0, 0]) == pytest.approx(2 / 3)
