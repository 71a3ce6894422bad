"""Configuration system: recursive YAML includes + literal expansion.

Parity with the reference config layer (upright_core/src/upright_core/parsing.py)
minus ROS: package paths resolve against this repository's ``configs/`` tree
(or absolute paths) instead of rospkg.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import yaml

from upright_tpu.config.arrangement import parse_control_objects  # noqa: F401

_REPO_ROOT = Path(__file__).resolve().parents[2]

# Map of "package" names (reference uses ROS packages) to local directories.
PACKAGE_PATHS = {
    "upright_tpu": _REPO_ROOT,
    "upright_cmd": _REPO_ROOT / "configs",
    "configs": _REPO_ROOT / "configs",
}


def resolve_package_path(d, as_string=True):
    """Resolve a {package, path} dict to a local path (parsing.py:109-115)."""
    pkg = d.get("package")
    if pkg is None:
        path = Path(d["path"])
    else:
        root = PACKAGE_PATHS.get(pkg)
        if root is None:
            raise KeyError(f"Unknown config package '{pkg}'.")
        path = root / d["path"]
    return path.as_posix() if as_string else path


def recursive_dict_update(default, custom):
    """Merge ``custom`` into ``default`` recursively (parsing.py:16-27)."""
    if not isinstance(default, dict) or not isinstance(custom, dict):
        raise TypeError("Params of recursive_update should be dicts")
    for key in custom:
        if isinstance(custom[key], dict) and isinstance(default.get(key), dict):
            default[key] = recursive_dict_update(default[key], custom[key])
        else:
            default[key] = custom[key]
    return default


def load_config(path, depth=0, max_depth=5):
    """Load a YAML config, merging its ``include`` list recursively; the
    including file's keys override the included ones (parsing.py:30-60)."""
    if depth > max_depth:
        raise Exception(f"Maximum inclusion depth {max_depth} exceeded.")

    with open(path) as f:
        d = yaml.safe_load(f) or {}

    includes = d.pop("include", [])
    merged = {}
    for include in includes:
        sub_path = resolve_package_path(include)
        sub = load_config(sub_path, depth=depth + 1, max_depth=max_depth)
        if "key" in include:
            sub = {include["key"]: sub}
        merged = recursive_dict_update(merged, sub)
    return recursive_dict_update(merged, d)


def parse_number(x, dtype=float):
    """Parse a scalar; strings ending in ``pi`` are multiples of pi
    (parsing.py:63-71)."""
    if isinstance(x, str) and x.endswith("pi"):
        return dtype(float(x[:-2]) * np.pi)
    return dtype(x)


def parse_array_element(x):
    """One element of a config array: float, "<k>pi", or "<v>rep<n>"
    (parsing.py:74-83)."""
    try:
        return np.array([float(x)])
    except (TypeError, ValueError):
        pass
    if isinstance(x, str):
        if x.endswith("pi"):
            return np.array([float(x[:-2]) * np.pi])
        if "rep" in x:
            v, n = x.split("rep")
            return float(v) * np.ones(int(n))
    raise ValueError(f"Could not convert {x} to array element.")


def parse_array(a):
    """Parse a 1-D iterable with literal expansion (parsing.py:86-91)."""
    return np.concatenate([parse_array_element(x) for x in a])


def parse_diag_matrix_dict(d):
    """{scale, diag} dict -> scaled diagonal matrix (parsing.py:94-106)."""
    return parse_number(d["scale"]) * np.diag(parse_array(d["diag"]))


def parse_support_offset(d):
    """x/y (+ optional polar r, theta) offset dict -> [x, y]
    (parsing.py:132-151)."""
    x = d.get("x", 0)
    y = d.get("y", 0)
    has_r = "r" in d
    has_t = "θ" in d or "theta" in d
    if has_r and has_t:
        r = d["r"]
        theta = parse_number(d.get("θ", d.get("theta")))
        x += r * np.cos(theta)
        y += r * np.sin(theta)
    elif has_r or has_t:
        raise ValueError("Radius and angle must *both* be specified in support offset.")
    return np.array([x, y])
