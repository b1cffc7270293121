import pytest
import yaml

from contrastyou_tpu.configure import (Config, ConfigParser,
                                       extract_params_with_key_prefix, get_config,
                                       yaml_load, yaml_write)
from contrastyou_tpu.configure.config import apply_overrides, merge, summary_table


def test_merge_hierarchy():
    base = Config({"A": {"x": 1, "y": 2}, "B": 3})
    over = Config({"A": {"y": 20, "z": 30}})
    out = merge(base, over)
    assert out.A.x == 1 and out.A.y == 20 and out.A.z == 30 and out.B == 3


def test_override_semantics():
    cfg = Config({"Trainer": {"max_epoch": 10}, "Optim": {"lr": 1e-3}})
    out = apply_overrides(cfg, ["Trainer.max_epoch=5", "+New.key=7", "~Optim"])
    assert out.Trainer.max_epoch == 5
    assert out.New.key == 7
    assert "Optim" not in out


def test_override_missing_key_strict():
    cfg = Config({"A": 1})
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["B.c=1"])


def test_override_value_types():
    cfg = Config({"a": None, "b": None, "c": None, "d": None})
    out = apply_overrides(cfg, ["a=true", "b=1e-3", "c=[1,2]", "d=null"])
    assert out.a is True and out.b == 1e-3 and out.c == [1, 2] and out.d is None


def test_parser_argv_and_registry(tmp_path):
    p1 = tmp_path / "base.yaml"
    p1.write_text(yaml.safe_dump({"Trainer": {"name": "semi", "max_epoch": 2}}))
    p2 = tmp_path / "hook.yaml"
    p2.write_text(yaml.safe_dump({"MeanTeacherParameters": {"weight": 1.0}}))
    parser = ConfigParser()
    cfg = parser.parse(["-p", str(p1), str(p2), "-o", "Trainer.max_epoch=3"],
                       scope="test_scope")
    assert cfg.Trainer.max_epoch == 3
    assert cfg.MeanTeacherParameters.weight == 1.0
    assert get_config("test_scope") is cfg
    assert "Trainer.max_epoch" in parser.summary()


def test_yaml_roundtrip(tmp_path):
    cfg = Config({"A": {"b": [1, 2]}, "c": 0.5})
    path = yaml_write(cfg, tmp_path)
    assert yaml_load(path).to_dict() == cfg.to_dict()


def test_prefix_extraction():
    cfg = Config({"Trainer": {"pre_lr": 1.0, "ft_lr": 2.0}, "pre_max_epoch": 5})
    pre = extract_params_with_key_prefix(cfg, "pre_")
    assert pre.Trainer.lr == 1.0 and pre.max_epoch == 5 and "ft_lr" not in pre.get("Trainer", {})


def test_summary_table_marks_changes():
    base = Config({"a": 1, "b": 2})
    merged = Config({"a": 1, "b": 3})
    table = summary_table(base, merged)
    assert "b" in table and "*" in table
