"""YAML config support for the example scripts.

The reference's examples are driven by hydra configs
(/root/reference/examples/configs/*.yaml); here the same role is played by
plain YAML files whose keys override argparse defaults — CLI flags still win
over the file, mirroring hydra's override semantics without the framework.

Usage in an example:

    import _config
    p = argparse.ArgumentParser()
    p.add_argument("--n-poses", type=int, default=64)
    args = _config.parse_with_config(p)

Run with:  python examples/pose_graph_synthetic.py --config \
               examples/configs/pose_graph_synthetic.yaml
"""

from __future__ import annotations

import argparse
from typing import Optional


def parse_with_config(parser: argparse.ArgumentParser, argv=None):
    parser.add_argument(
        "--config", default=None,
        help="YAML file whose keys (dashes or underscores) override the "
             "defaults; explicit CLI flags still win",
    )
    pre, _ = parser.parse_known_args(argv)
    if pre.config:
        import yaml

        with open(pre.config) as f:
            cfg = yaml.safe_load(f) or {}
        known = {a.dest for a in parser._actions}
        overrides = {}
        for k, v in cfg.items():
            dest = k.replace("-", "_")
            if dest not in known:
                raise SystemExit(
                    f"config key {k!r} does not match any option "
                    f"(known: {sorted(known)})"
                )
            overrides[dest] = v
        parser.set_defaults(**overrides)
    return parser.parse_args(argv)
