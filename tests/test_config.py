import os

from unibev_tpu.config.config import Config, parse_cfg_option_value
from unibev_tpu.registry import Registry, build_from_cfg


def test_config_base_inheritance(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("a = 1\nmodel = dict(type='X', dim=256, sub=dict(k=1))\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = ['./base.py']\nmodel = dict(dim=128)\nb = 2\n")
    cfg = Config.fromfile(str(child))
    assert cfg.a == 1 and cfg.b == 2
    assert cfg.model.type == "X"
    assert cfg.model.dim == 128
    assert cfg.model.sub.k == 1


def test_config_merge_from_dict(tmp_path):
    f = tmp_path / "c.py"
    f.write_text("model = dict(use_lidar=True, head=dict(num_query=900))\n")
    cfg = Config.fromfile(str(f))
    cfg.merge_from_dict({"model.use_lidar": False, "model.head.num_query": 100})
    assert cfg.model.use_lidar is False
    assert cfg.model.head.num_query == 100


def test_parse_cfg_option_value():
    assert parse_cfg_option_value("1") == 1
    assert parse_cfg_option_value("true") is True
    assert tuple(parse_cfg_option_value("1,2,3")) == (1, 2, 3)
    assert parse_cfg_option_value("foo") == "foo"


def test_registry_build():
    REG = Registry("test")

    @REG.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = build_from_cfg(dict(type="Foo", a=1), REG)
    assert obj.a == 1 and obj.b == 2
    obj = build_from_cfg(dict(type="Foo", a=1, b=5), REG)
    assert obj.b == 5
