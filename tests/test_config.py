import pytest
import yaml

from efficient_slowfast_tpu.config import CfgNode, get_cfg, assert_and_infer_cfg


def test_defaults_clone_independent():
    a = get_cfg()
    b = get_cfg()
    a.TRAIN.BATCH_SIZE = 123
    assert b.TRAIN.BATCH_SIZE == 64


def test_merge_from_file(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("MODEL:\n  NUM_CLASSES: 27\nSOLVER:\n  BASE_LR: 0.5\n")
    cfg = get_cfg()
    cfg.merge_from_file(str(p))
    assert cfg.MODEL.NUM_CLASSES == 27
    assert cfg.SOLVER.BASE_LR == 0.5


def test_merge_from_list_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(["TRAIN.BATCH_SIZE", "16", "SOLVER.BASE_LR", "0.01",
                         "TRAIN.ENABLE", "False", "SOLVER.STEPS", "[0,10,20]"])
    assert cfg.TRAIN.BATCH_SIZE == 16 and isinstance(cfg.TRAIN.BATCH_SIZE, int)
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.TRAIN.ENABLE is False
    assert cfg.SOLVER.STEPS == [0, 10, 20]


def test_unknown_key_raises():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NO.SUCH.KEY", "1"])


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.BATCH_SIZE = 1
    cfg.defrost()
    cfg.TRAIN.BATCH_SIZE = 1


def test_dump_roundtrip():
    cfg = get_cfg()
    loaded = yaml.safe_load(cfg.dump())
    assert loaded["MODEL"]["NUM_CLASSES"] == 400


def test_static_hashable():
    s1 = get_cfg().static()
    s2 = get_cfg().static()
    assert s1 == s2 and hash(s1) == hash(s2)
    cfg = get_cfg()
    cfg.MODEL.NUM_CLASSES = 7
    assert cfg.static() != s1
    assert cfg.static().MODEL.NUM_CLASSES == 7


def test_assert_and_infer():
    cfg = get_cfg()
    cfg.TEST.NUM_SPATIAL_CROPS = 2
    with pytest.raises(AssertionError):
        assert_and_infer_cfg(cfg)
