"""Tests for the config system (mirrors upright_core/tests/test_parsing.py)."""

import numpy as np
import pytest
import yaml

import upright_tpu.config as cfg


def test_parse_number():
    assert cfg.parse_number(3) == 3.0
    assert cfg.parse_number("0.5pi") == pytest.approx(0.5 * np.pi)
    assert cfg.parse_number("-2pi") == pytest.approx(-2 * np.pi)
    assert cfg.parse_number("1.5") == 1.5


def test_parse_array():
    a = cfg.parse_array([1, 2, 3])
    assert np.allclose(a, [1, 2, 3])
    a = cfg.parse_array(["1pi", "0.5pi"])
    assert np.allclose(a, [np.pi, 0.5 * np.pi])
    a = cfg.parse_array(["0rep3", 1])
    assert np.allclose(a, [0, 0, 0, 1])
    a = cfg.parse_array(["2rep2", "1pi"])
    assert np.allclose(a, [2, 2, np.pi])
    with pytest.raises(ValueError):
        cfg.parse_array(["nonsense"])


def test_parse_diag_matrix_dict():
    M = cfg.parse_diag_matrix_dict({"scale": 2, "diag": [1, 2, 3]})
    assert np.allclose(M, np.diag([2.0, 4.0, 6.0]))
    M = cfg.parse_diag_matrix_dict({"scale": 0.5, "diag": ["1rep2", 4]})
    assert np.allclose(M, np.diag([0.5, 0.5, 2.0]))


def test_parse_support_offset():
    off = cfg.parse_support_offset({"x": 1.0, "y": -2.0})
    assert np.allclose(off, [1.0, -2.0])
    off = cfg.parse_support_offset({"r": 2.0, "θ": "0.5pi"})
    assert np.allclose(off, [0.0, 2.0], atol=1e-12)
    off = cfg.parse_support_offset({"x": 1.0, "r": 1.0, "θ": 0})
    assert np.allclose(off, [2.0, 0.0])
    with pytest.raises(ValueError):
        cfg.parse_support_offset({"r": 1.0})
    assert np.allclose(cfg.parse_support_offset({}), [0, 0])


def test_recursive_dict_update():
    d = cfg.recursive_dict_update({"a": {"b": 1, "c": 2}}, {"a": {"b": 3}, "d": 4})
    assert d == {"a": {"b": 3, "c": 2}, "d": 4}
    with pytest.raises(TypeError):
        cfg.recursive_dict_update([1], {})


def test_load_config_includes(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({"x": 1, "nested": {"a": 1, "b": 2}}))
    child = tmp_path / "child.yaml"
    child.write_text(
        yaml.safe_dump(
            {
                "include": [{"path": str(base)}],
                "nested": {"b": 20},
                "y": 2,
            }
        )
    )
    d = cfg.load_config(child)
    # includer overrides included
    assert d == {"x": 1, "nested": {"a": 1, "b": 20}, "y": 2}


def test_load_config_include_key(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({"v": 7}))
    child = tmp_path / "child.yaml"
    child.write_text(yaml.safe_dump({"include": [{"path": str(base), "key": "sub"}]}))
    d = cfg.load_config(child)
    assert d == {"sub": {"v": 7}}


def test_load_config_recursion_limit(tmp_path):
    f = tmp_path / "loop.yaml"
    f.write_text(yaml.safe_dump({"include": [{"path": str(f)}]}))
    with pytest.raises(Exception, match="inclusion depth"):
        cfg.load_config(f)


def test_arrangements_config_loads():
    """The shipped arrangement tree parses into balance models."""
    from upright_tpu.config import resolve_package_path

    path = resolve_package_path({"package": "configs", "path": "arrangements.yaml"})
    conf = cfg.load_config(path)
    conf["balancing"] = {"arrangement": "pink_bottle", "frictionless": True}
    model, names, objects, contacts = cfg.parse_control_objects(conf)
    assert names == ["bottle"]
    assert model.num_objects == 1
    # cylinder -> rotated box -> 4 contact corners on the tray
    assert model.num_contacts == 4
    np_normal = np.asarray(model.normal)
    # normal points into the first object (the tray, below) -> -z
    assert np.allclose(np_normal, np.tile([0, 0, -1.0], (4, 1)))
    assert np.allclose(np.asarray(model.mu), 0.26 - 0.026)
    # bottle mass and CoM height: reference position on the tray surface (z=0)
    # plus half the height
    mass = float(model.params[0, 0])
    com = np.asarray(model.params[0, 1:4]) / mass
    assert mass == pytest.approx(0.827)
    assert com[2] == pytest.approx(0.255 / 2)
    assert com[0] == pytest.approx(0.035)
    assert com[1] == pytest.approx(-0.035)
    # object-side contact points inset by 0.005 from the (rotated-box) corner
    # radius; the EE side is a fixture and is not inset
    r = 0.035  # cylinder radius
    for p in np.asarray(model.r2):
        d_xy = np.linalg.norm(p[:2] - com[:2])
        assert d_xy == pytest.approx(r - 0.005, abs=1e-6)
    for p in np.asarray(model.r1):
        d_xy = np.linalg.norm(p[:2] - com[:2])
        assert d_xy == pytest.approx(r, abs=1e-6)


def test_arrangement_stacking():
    """Stacked dice: die2 rests on die1, contact patch at the right height."""
    from upright_tpu.config import resolve_package_path

    path = resolve_package_path({"package": "configs", "path": "arrangements.yaml"})
    conf = cfg.load_config(path)
    conf["balancing"] = {"arrangement": "foam_die2", "frictionless": True}
    model, names, objects, contacts = cfg.parse_control_objects(conf)
    assert names == ["foam_die1", "foam_die2"]
    assert model.num_contacts == 8
    # second die's contacts at z = die height
    z_top = [c.r1[2] for c in contacts if c.first == "foam_die1"]
    assert np.allclose(z_top, 0.065)
    # incidence: die1 supports die2 (die1 is object-1 in the upper contacts)
    S1 = np.asarray(model.S1)
    S2 = np.asarray(model.S2)
    assert S1[0].sum() == 4  # die1 is first object of 4 contacts
    assert S2[0].sum() == 4  # die1 is second object of the tray contacts
    assert S2[1].sum() == 4  # die2 is second object of the upper contacts
    assert S1[1].sum() == 0


def test_fixture_objects_excluded():
    from upright_tpu.config import resolve_package_path

    path = resolve_package_path({"package": "configs", "path": "arrangements.yaml"})
    conf = cfg.load_config(path)
    conf["balancing"] = {"arrangement": "simulation_box_with_fixture", "frictionless": True}
    model, names, objects, contacts = cfg.parse_control_objects(conf)
    # the fixture is not a dynamic object
    assert names == ["bottle"]
    # but its contact with the box still exists (side contact)
    assert model.num_contacts == 8


def test_sphere_shape_parses():
    """Sphere objects parse with the reference's radius/2 box approximation
    (simulation.py:194-205) and solid-sphere inertia."""
    conf = {
        "objects": {
            "ee": {"shape": "cuboid", "side_lengths": [0.3, 0.3, 0.02],
                   "position": [0, 0, 0]},
            "ball": {"shape": "sphere", "radius": 0.04, "mass": 0.5},
        },
        "arrangements": {
            "ball_only": {
                "objects": [{"name": "ball1", "type": "ball", "parent": "ee"}],
                "contacts": [{"first": "ee", "second": "ball1", "mu": 0.5}],
            }
        },
        "balancing": {"arrangement": "ball_only", "frictionless": True},
    }
    model, names, objects, contacts = cfg.parse_control_objects(conf)
    assert names == ["ball1"]
    assert model.num_contacts == 4  # box-approximation corners
    mass = float(model.params[0, 0])
    com = np.asarray(model.params[0, 1:4]) / mass
    assert mass == pytest.approx(0.5)
    # the r/2 half-extent box rests on the tray surface (z=0.01 above origin
    # is the tray top): centroid at half-extent 0.02 above it
    assert com[2] == pytest.approx(0.01 + 0.02)
    # solid-sphere inertia about the CoM: 2/5 m r^2
    from upright_tpu.core.rigid_body import params_to_body

    _m, _c, inertia = params_to_body(model.params[0])
    assert np.allclose(np.asarray(inertia), 0.4 * 0.5 * 0.04**2 * np.eye(3), atol=1e-12)
