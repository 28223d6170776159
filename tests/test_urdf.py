import numpy as np
import pytest

from rapid_locomotion_rl_tpu import RLTPU_ROOT_DIR
from rapid_locomotion_rl_tpu.models import load_urdf

MC_URDF = f"{RLTPU_ROOT_DIR}/resources/robots/mini_cheetah/urdf/mini_cheetah.urdf"
GO1_URDF = f"{RLTPU_ROOT_DIR}/resources/robots/go1/urdf/go1.urdf"


@pytest.fixture(scope="module")
def mc():
    return load_urdf(MC_URDF)


@pytest.fixture(scope="module")
def go1():
    return load_urdf(GO1_URDF)


def test_mc_tree_shape(mc):
    # base + 4 * (hip, thigh, calf)
    assert mc.nb == 13
    assert mc.nv == 12
    assert mc.body_names[0] == "base"
    # 12 actuated joints in {FL,FR,RL,RR}_{hip,thigh,calf}_joint
    for leg in ("FR", "FL", "RR", "RL"):
        for part in ("hip", "thigh", "calf"):
            assert f"{leg}_{part}_joint" in mc.joint_names


def test_mc_total_mass(mc):
    # sum of URDF link masses: base 3.3 + imu 0.001 + 4*(0.54+0.634+0.064)
    expected = 3.3 + 0.001 + 4 * (0.54 + 0.634 + 0.064)
    np.testing.assert_allclose(mc.total_mass(), expected, rtol=1e-6)


def test_mc_limits(mc):
    i = mc.dof_index("FR_hip_joint")
    assert mc.dof_lower[i] == -1.6 and mc.dof_upper[i] == 1.6
    assert mc.dof_effort[i] == 18.0 and mc.dof_velocity[i] == 40.0
    j = mc.dof_index("FR_calf_joint")
    assert mc.dof_effort[j] == 26.0


def test_mc_feet_matching(mc):
    # foot_name="calf" (mini_cheetah_config.py:41) matches the 4 calves
    feet = mc.match_report_bodies(["calf"])
    assert len(feet) == 4
    term = mc.match_report_bodies(["base", "thigh"])
    # base (with merged trunk) + 4 thighs
    assert len(term) == 5


def test_mc_foot_geometry(mc):
    # calf tip sphere exists ~0.21 below the calf frame
    calf_bodies = [i for i, n in enumerate(mc.body_names) if "calf" in n]
    for b in calf_bodies:
        geoms = np.where(mc.geom_body == b)[0]
        assert len(geoms) >= 1
        z = mc.geom_offset[geoms, 2]
        assert z.min() < -0.2


def test_go1_structure(go1):
    assert go1.nb == 13  # feet merged into calves dynamically
    assert go1.nv == 12
    # but feet remain as contact-report bodies (dont_collapse="true")
    feet = go1.match_report_bodies(["foot"])
    assert len(feet) == 4
    # foot report bodies are distinct from calf report bodies
    calves = go1.match_report_bodies(["calf"])
    assert set(feet).isdisjoint(set(calves))


def test_go1_foot_sphere_radius(go1):
    feet = go1.match_report_bodies(["foot"])
    for f in feet:
        geoms = np.where(go1.geom_report_body == f)[0]
        assert len(geoms) == 1
        np.testing.assert_allclose(go1.geom_radius[geoms], 0.02)


def test_go1_mass(go1):
    # trunk 4.8 + imu .001 + 4*(0.510299+0.898919+0.158015+0.06)
    expected = 4.8 + 0.001 + 4 * (0.510299 + 0.898919 + 0.158015 + 0.06)
    np.testing.assert_allclose(go1.total_mass(), expected, rtol=1e-6)


def test_parent_ordering(mc, go1):
    for m in (mc, go1):
        m.validate()
        # every leg chain: hip parent = base, thigh parent = hip, ...
        for leg in ("FR", "FL", "RR", "RL"):
            hip = m.body_names.index(f"{leg}_hip")
            thigh = m.body_names.index(f"{leg}_thigh")
            calf = m.body_names.index(f"{leg}_calf")
            assert m.parent[hip] == 0
            assert m.parent[thigh] == hip
            assert m.parent[calf] == thigh


def test_mc_hull_sphere_fit():
    """mesh_sphere_fit="hull": calf covered by a chain fitted to the
    collision mesh PhysX hulls (mini_cheetah.urdf:176-181 mounts
    mini_lower_link.obj with rpy="0 pi 0"): foot ball bottoms out at link
    z=-0.193 (the legacy tip sphere overshoots to -0.2275) and the knee
    clevis knob (~2.1 cm) is covered at the knee origin."""
    m = load_urdf(MC_URDF, mesh_sphere_fit="hull")
    calf_bodies = [i for i, n in enumerate(m.body_names) if "calf" in n]
    assert len(calf_bodies) == 4
    for b in calf_bodies:
        geoms = np.where(m.geom_body == b)[0]
        assert len(geoms) == 5
        bottom = (m.geom_offset[geoms, 2] - m.geom_radius[geoms]).min()
        np.testing.assert_allclose(bottom, -0.193, atol=1e-6)
        # knee knob present at the link origin
        at_knee = np.isclose(m.geom_offset[geoms, 2], 0.0)
        assert m.geom_radius[geoms][at_knee].max() >= 0.02
    # everything else identical to the legacy fit
    legacy = load_urdf(MC_URDF)
    assert m.ng == legacy.ng + 4 * 3
    np.testing.assert_allclose(m.mass, legacy.mass)
