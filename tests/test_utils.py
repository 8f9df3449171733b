"""Config system + timing utilities."""

import dataclasses
import json
import os

import pytest

from enph459_super_resolution_tpu.utils import (
    StageTimer, apply_env, apply_overrides, from_dict, to_dict,
)


@dataclasses.dataclass(frozen=True)
class Inner:
    gain: float = 3.2
    steps: int = 15


@dataclasses.dataclass(frozen=True)
class Outer:
    name: str = "run"
    fast: bool = False
    inner: Inner = dataclasses.field(default_factory=Inner)


def test_round_trip():
    cfg = Outer(name="x", inner=Inner(gain=4.5))
    d = to_dict(cfg)
    assert d == {"name": "x", "fast": False,
                 "inner": {"gain": 4.5, "steps": 15}}
    back = from_dict(Outer, json.loads(json.dumps(d)))
    assert back == cfg


def test_unknown_key_rejected():
    with pytest.raises(KeyError, match="typo_field"):
        from_dict(Outer, {"typo_field": 1})


def test_dotted_overrides_coerce_types():
    cfg = apply_overrides(Outer(), ["inner.gain=9.5", "fast=true",
                                    "inner.steps=3"])
    assert cfg.inner.gain == 9.5 and cfg.fast is True
    assert cfg.inner.steps == 3 and isinstance(cfg.inner.steps, int)


def test_env_overlay(monkeypatch):
    monkeypatch.setenv("SRTPU_NAME", "from_env")
    monkeypatch.setenv("SRTPU_FAST", "1")
    cfg = apply_env(Outer())
    assert cfg.name == "from_env" and cfg.fast is True


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    d = t.as_dict()
    assert set(d) == {"a", "b"} and d["a"] >= 0


def test_from_dict_with_future_annotations():
    """Regression: string annotations (from __future__ import annotations)
    must still recurse into nested dataclasses."""
    import importlib.util
    import sys
    import textwrap
    import tempfile
    import os as _os

    src = textwrap.dedent("""
        from __future__ import annotations
        import dataclasses

        @dataclasses.dataclass(frozen=True)
        class In2:
            gain: float = 1.0

        @dataclasses.dataclass(frozen=True)
        class Out2:
            name: str = "x"
            inner: In2 = dataclasses.field(default_factory=In2)
    """)
    with tempfile.TemporaryDirectory() as d:
        path = _os.path.join(d, "cfgmod_future.py")
        open(path, "w").write(src)
        spec = importlib.util.spec_from_file_location("cfgmod_future", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["cfgmod_future"] = mod
        spec.loader.exec_module(mod)
        cfg = mod.Out2(inner=mod.In2(gain=7.5))
        back = from_dict(mod.Out2, to_dict(cfg))
        assert isinstance(back.inner, mod.In2)
        assert back.inner.gain == 7.5
