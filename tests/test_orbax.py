"""Optional Orbax checkpoint backend roundtrip."""

import numpy as np
import pytest

import jax.numpy as jnp

from ovmr_tpu.engine.optimizers import build_optimizer
from ovmr_tpu.engine.orbax_io import load_orbax, save_orbax
from ovmr_tpu.utils.defaults import get_cfg_default


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    params = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
    opt = build_optimizer(get_cfg_default().OPTIM)
    state = opt.init(params)

    save_orbax(str(tmp_path), "prompt_learner", 5, params, state)
    p2, s2, epoch = load_orbax(str(tmp_path), "prompt_learner", params, state)
    assert epoch == 5
    np.testing.assert_allclose(np.asarray(p2["w"]), np.arange(4.0))
    assert s2 is not None

    # explicit-epoch load
    p3, _, ep3 = load_orbax(str(tmp_path), "prompt_learner", params, state, epoch=5)
    assert ep3 == 5

    # params-only restore of a checkpoint saved WITH optimizer state
    # (inference path; was broken before params/opt_state were separated)
    p4, s4, ep4 = load_orbax(str(tmp_path), "prompt_learner", params)
    assert ep4 == 5 and s4 is None
    np.testing.assert_allclose(np.asarray(p4["w"]), np.arange(4.0))

    with pytest.raises(FileNotFoundError):
        load_orbax(str(tmp_path / "nope"), "prompt_learner", params)
