import io

import pytest

from smallhardface_tpu.config import (
    cfg, cfg_from_list, cfg_table, cfg_dump, _merge_a_into_b)


def test_defaults_loaded():
    assert cfg.TRAIN.ITERS == 60000
    assert cfg.TEST.SCALES == [100, 300, 600, 1000, 1400]
    assert cfg.PIXEL_MEANS[0][0] == [102.9801, 115.9465, 122.7717]
    assert cfg.MODEL.DIFFERENT_DILATION.ENABLE is False
    assert cfg.TRAIN.LR.BASELR == 0.004


def test_attr_and_item_access():
    assert cfg["TRAIN"]["LR"]["BACKBONE_MULT"] == cfg.TRAIN.LR.BACKBONE_MULT


def test_merge_rejects_unknown_key():
    with pytest.raises(KeyError):
        _merge_a_into_b({"NOT_A_KEY": 1}, cfg)
    with pytest.raises(KeyError):
        _merge_a_into_b({"TRAIN": {"NOT_A_KEY": 1}}, cfg)


def test_merge_rejects_type_mismatch():
    with pytest.raises(ValueError):
        _merge_a_into_b({"TRAIN": {"ITERS": "sixty thousand"}}, cfg)


def test_merge_promotes_int_to_float():
    old = cfg.TRAIN.LR.BASELR
    try:
        _merge_a_into_b({"TRAIN": {"LR": {"BASELR": 1}}}, cfg)
        assert cfg.TRAIN.LR.BASELR == 1.0
        assert isinstance(cfg.TRAIN.LR.BASELR, float)
    finally:
        cfg.TRAIN.LR.BASELR = old


def test_cfg_from_list_dotted_amend():
    old = cfg.TEST.SCALES
    try:
        cfg_from_list(["TEST.SCALES", "[50, 100]", "TEST.DB", "afw_val"])
        assert cfg.TEST.SCALES == [50, 100]
        assert cfg.TEST.DB == "afw_val"
    finally:
        cfg.TEST.SCALES = old
        cfg.TEST.DB = "wider_val"
    with pytest.raises(AssertionError):
        cfg_from_list(["TEST.NOPE", "1"])


def test_dump_and_table_roundtrip():
    import tomllib
    buf = io.StringIO()
    cfg_dump({k: v for k, v in cfg.items() if k != "LOG"}, buf)
    parsed = tomllib.loads(buf.getvalue())
    assert parsed["TRAIN"]["ITERS"] == cfg.TRAIN.ITERS
    table = cfg_table(cfg)
    assert table.startswith("|key|value|")
    assert "|ITERS|" in table
