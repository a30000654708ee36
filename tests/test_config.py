"""Tests for the config/registry kernel (parity: mmcv Config + Registry
semantics used by reference tools/train.py:82-84 and builders)."""
import os
import textwrap

import pytest

from mscl_tpu import Config, ConfigDict, Registry, build_from_cfg
from mscl_tpu.config import parse_cfg_option_value


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return str(p)


class TestRegistry:

    def test_register_and_build(self):
        reg = Registry('things')

        @reg.register_module()
        class Thing:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        obj = reg.build(dict(type='Thing', a=1))
        assert obj.a == 1 and obj.b == 2
        assert 'Thing' in reg
        assert len(reg) == 1

    def test_duplicate_raises(self):
        reg = Registry('r')
        reg.register_module(name='X', module=lambda: None)
        with pytest.raises(KeyError):
            reg.register_module(name='X', module=lambda: None)
        reg.register_module(name='X', module=lambda: 42, force=True)
        assert reg.get('X')() == 42

    def test_default_args(self):
        reg = Registry('r')

        @reg.register_module()
        class Y:
            def __init__(self, a, b):
                self.a, self.b = a, b

        obj = build_from_cfg(dict(type='Y', a=1), reg, default_args=dict(b=9))
        assert obj.b == 9
        # explicit cfg wins over default_args
        obj = build_from_cfg(dict(type='Y', a=1, b=3), reg,
                             default_args=dict(b=9))
        assert obj.b == 3

    def test_unknown_type(self):
        reg = Registry('r')
        with pytest.raises(KeyError):
            build_from_cfg(dict(type='Nope'), reg)

    def test_class_as_type(self):
        reg = Registry('r')

        class Z:
            def __init__(self, v):
                self.v = v

        obj = build_from_cfg(dict(type=Z, v=5), reg)
        assert obj.v == 5


class TestConfigDict:

    def test_attr_access(self):
        cd = ConfigDict(dict(a=dict(b=1), c=[dict(d=2)]))
        assert cd.a.b == 1
        assert cd.c[0].d == 2
        cd.a.b = 7
        assert cd['a']['b'] == 7

    def test_missing_attr(self):
        cd = ConfigDict()
        with pytest.raises(AttributeError):
            _ = cd.nothing


class TestConfig:

    def test_fromfile_basic(self, tmp_path):
        f = _write(tmp_path, 'c.py', '''
            model = dict(type='R3D', depth=18)
            lr = 0.02
            steps = [14, 18]
        ''')
        cfg = Config.fromfile(f)
        assert cfg.model.type == 'R3D'
        assert cfg.lr == 0.02
        assert cfg.steps == [14, 18]
        assert cfg.filename == f

    def test_base_inheritance(self, tmp_path):
        _write(tmp_path, 'base.py', '''
            model = dict(type='R3D', depth=18, extra=dict(x=1, y=2))
            data = dict(videos_per_gpu=8)
        ''')
        f = _write(tmp_path, 'child.py', '''
            _base_ = ['./base.py']
            model = dict(depth=50, extra=dict(y=3))
            lr = 0.1
        ''')
        cfg = Config.fromfile(f)
        assert cfg.model.type == 'R3D'       # inherited
        assert cfg.model.depth == 50          # overridden
        assert cfg.model.extra.x == 1         # deep merge keeps base
        assert cfg.model.extra.y == 3         # deep merge overrides
        assert cfg.data.videos_per_gpu == 8
        assert cfg.lr == 0.1

    def test_delete_key(self, tmp_path):
        _write(tmp_path, 'base.py', 'opt = dict(type="SGD", momentum=0.9)\n')
        f = _write(tmp_path, 'child.py', '''
            _base_ = './base.py'
            opt = dict(_delete_=True, type='Adam')
        ''')
        cfg = Config.fromfile(f)
        assert cfg.opt.type == 'Adam'
        assert 'momentum' not in cfg.opt

    def test_multi_base(self, tmp_path):
        _write(tmp_path, 'b1.py', 'a = 1\n')
        _write(tmp_path, 'b2.py', 'b = 2\n')
        f = _write(tmp_path, 'c.py', "_base_ = ['./b1.py', './b2.py']\nc = 3\n")
        cfg = Config.fromfile(f)
        assert (cfg.a, cfg.b, cfg.c) == (1, 2, 3)

    def test_merge_from_dict(self, tmp_path):
        f = _write(tmp_path, 'c.py', 'model = dict(head=dict(num_classes=10))\n')
        cfg = Config.fromfile(f)
        cfg.merge_from_dict({'model.head.num_classes': 174,
                             'new_key': 'v'})
        assert cfg.model.head.num_classes == 174
        assert cfg.new_key == 'v'

    def test_dump_roundtrip(self, tmp_path):
        f = _write(tmp_path, 'c.py', '''
            model = dict(type='R3D', stages=(1, 2), names=['a', 'b'])
            flag = True
        ''')
        cfg = Config.fromfile(f)
        out = str(tmp_path / 'dumped.py')
        cfg.dump(out)
        cfg2 = Config.fromfile(out)
        assert cfg2.to_dict() == cfg.to_dict()

    def test_option_value_parsing(self):
        assert parse_cfg_option_value('true') is True
        assert parse_cfg_option_value('None') is None
        assert parse_cfg_option_value('1.5') == 1.5
        assert parse_cfg_option_value('[1,2]') == [1, 2]
        assert parse_cfg_option_value('a,b') == ('a', 'b')
        assert parse_cfg_option_value('hello') == 'hello'
