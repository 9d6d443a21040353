"""The examples' YAML-config shim (examples/_config.py): override semantics
mirror hydra's (file overrides defaults, explicit CLI flags override the
file; unknown keys are an error — reference examples use hydra strict mode),
and every committed YAML in examples/configs/ must bind cleanly to its
script's argparse options."""

import argparse
import importlib.util
import pathlib
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
EXAMPLES = ROOT / "examples"


def _load_config_mod():
    spec = importlib.util.spec_from_file_location("_config", EXAMPLES / "_config.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_config = _load_config_mod()


def _parser():
    p = argparse.ArgumentParser()
    p.add_argument("--n-poses", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.1)
    return p


def test_file_overrides_defaults(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("n-poses: 128\n")
    args = _config.parse_with_config(_parser(), ["--config", str(cfg)])
    assert args.n_poses == 128 and args.lr == 0.1


def test_cli_wins_over_file(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("n-poses: 128\nlr: 0.5\n")
    args = _config.parse_with_config(
        _parser(), ["--config", str(cfg), "--n-poses", "32"])
    assert args.n_poses == 32 and args.lr == 0.5


def test_underscore_keys_accepted(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("n_poses: 7\n")
    args = _config.parse_with_config(_parser(), ["--config", str(cfg)])
    assert args.n_poses == 7


def test_unknown_key_rejected(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("not-an-option: 1\n")
    with pytest.raises(SystemExit):
        _config.parse_with_config(_parser(), ["--config", str(cfg)])


def _script_for(cfg_path: pathlib.Path) -> pathlib.Path:
    # configs/pose_graph/foo.yaml -> examples/foo.py; configs/foo.yaml likewise
    return EXAMPLES / (cfg_path.stem + ".py")


@pytest.mark.parametrize(
    "cfg", sorted(EXAMPLES.glob("configs/**/*.yaml")),
    ids=lambda p: p.stem,
)
def test_committed_configs_bind(cfg, monkeypatch):
    """Every committed YAML's keys must match its script's argparse options.

    Parses the script source for add_argument option-string literals and
    checks key membership (keeps the test JAX-free and fast). Known
    limitation (accepted trade-off): a script that builds its parser through
    a helper/loop would spuriously fail here, and a config key matching a
    commented-out add_argument would spuriously pass — every current example
    declares options as literals, so source-regexing is exact today; if an
    example ever factors its parser, expose a build_parser() and import it
    here instead."""
    script = _script_for(cfg)
    assert script.exists(), f"no example script for config {cfg}"
    import re

    import yaml

    src = script.read_text()
    opts = set(re.findall(r"add_argument\(\s*[\"']--([\w-]+)[\"']", src))
    assert opts, f"{script.name} has no argparse options but ships a config"
    keys = yaml.safe_load(cfg.read_text()) or {}
    for k in keys:
        norm = k.replace("_", "-")
        assert norm in opts, (
            f"{cfg.name}: key {k!r} matches no --option in {script.name} "
            f"(options: {sorted(opts)})")
