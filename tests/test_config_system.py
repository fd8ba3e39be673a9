"""CfgNode semantics: layered merge, freeze, list overrides, clone."""

import pytest

from ovmr_tpu.utils.config import CfgNode
from ovmr_tpu.utils.defaults import get_cfg_default

pytestmark = pytest.mark.quick


def test_merge_from_list_types():
    cfg = get_cfg_default()
    cfg.merge_from_list(
        ["OPTIM.LR", "0.01", "DATASET.NUM_SHOTS", "16",
         "INPUT.SIZE", "(64, 64)", "TEST.NO_TEST", "True",
         "INPUT.TRANSFORMS", "['normalize']"]
    )
    assert cfg.OPTIM.LR == 0.01 and isinstance(cfg.OPTIM.LR, float)
    assert cfg.DATASET.NUM_SHOTS == 16
    assert cfg.INPUT.SIZE == (64, 64)
    assert cfg.TEST.NO_TEST is True
    assert cfg.INPUT.TRANSFORMS == ("normalize",) or cfg.INPUT.TRANSFORMS == ["normalize"]


def test_freeze_blocks_writes():
    cfg = get_cfg_default()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SEED = 5
    with pytest.raises(AttributeError):
        cfg.OPTIM.LR = 1.0
    cfg.defrost()
    cfg.SEED = 5
    assert cfg.SEED == 5


def test_clone_is_deep():
    cfg = get_cfg_default()
    clone = cfg.clone()
    clone.OPTIM.LR = 123.0
    assert cfg.OPTIM.LR != 123.0


def test_merge_coercion_preserves_types():
    cfg = CfgNode({"A": 1.0, "B": (1, 2), "C": True})
    cfg.merge_from_other({"A": 2, "B": [3, 4], "C": "false"})
    assert cfg.A == 2.0 and isinstance(cfg.A, float)
    assert cfg.B == (3, 4) and isinstance(cfg.B, tuple)
    assert cfg.C is False


def test_dump_roundtrip(tmp_path):
    import yaml

    cfg = get_cfg_default()
    text = cfg.dump()
    loaded = yaml.safe_load(text)
    assert loaded["OPTIM"]["LR"] == cfg.OPTIM.LR
