"""Packaging metadata tests: the framework is an installable package the
way the reference is (``/root/reference/pyproject.toml``) — every declared
console entry point must resolve to a real callable, and the dependency
split (core vs extras) must match what the package actually imports
eagerly."""

import importlib
import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def project():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]


def test_console_scripts_resolve(project):
    assert project["scripts"], "no console entry points declared"
    for name, target in project["scripts"].items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_cli_help_runs(project):
    """Every entry point must implement the argparse convention the tests
    drive everywhere else: main(['--help']) exits 0."""
    skip = {"srtpu-native-build", "srtpu-gui"}  # no argparse surface / Qt
    for name, target in project["scripts"].items():
        if name in skip:
            continue
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        with pytest.raises(SystemExit) as exc:
            fn(["--help"])
        assert exc.value.code == 0, f"{name} --help exited {exc.value.code}"


def test_core_dependencies_cover_eager_imports(project):
    """Importing the package root (and the classical-SR compute path) must
    need nothing beyond the declared core dependencies."""
    deps = {d.split("[")[0].split(">=")[0].split("==")[0].strip().lower()
            for d in project["dependencies"]}
    # names as imported
    assert {"numpy", "jax", "flax", "optax", "pillow"} <= deps
    importlib.import_module("enph459_super_resolution_tpu")
    importlib.import_module("enph459_super_resolution_tpu.sr.classical")
    importlib.import_module("enph459_super_resolution_tpu.models.zoo")


def test_optional_extras_declared(project):
    extras = project["optional-dependencies"]
    for extra in ("train", "plots", "decode", "gui", "hw", "test"):
        assert extra in extras and extras[extra]
