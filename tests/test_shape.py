import numpy as np
import pytest

from ngmix_tpu import shape
from ngmix_tpu.gexceptions import GMixRangeError


def test_shear_reduced_identity():
    g1, g2 = shape.shear_reduced(0.1, 0.2, 0.0, 0.0)
    assert np.allclose([g1, g2], [0.1, 0.2])


def test_shear_reduced_inverse():
    g1, g2 = shape.shear_reduced(0.1, -0.05, 0.03, 0.02)
    g1b, g2b = shape.shear_reduced(g1, g2, -0.03, -0.02)
    # reduced shear addition is not exactly invertible by negation,
    # but is to second order in s; use a direct complex-number oracle
    # instead: g_out = (g + s) / (1 + s* g)
    g = 0.1 - 0.05j
    s = 0.03 + 0.02j
    expected = (g + s) / (1 + np.conj(s) * g)
    assert np.allclose([float(g1), float(g2)], [expected.real, expected.imag])
    del g1b, g2b


@pytest.mark.parametrize("g1,g2", [(0.0, 0.0), (0.2, -0.1), (0.9, 0.0), (-0.3, 0.65)])
def test_g_e_roundtrip(g1, g2):
    e1, e2 = shape.g1g2_to_e1e2(g1, g2)
    g1b, g2b = shape.e1e2_to_g1g2(e1, e2)
    assert np.allclose([float(g1b), float(g2b)], [g1, g2], atol=1e-12)

    # oracle: |e| = tanh(2 atanh(|g|)), angle preserved
    g = np.hypot(g1, g2)
    e = np.hypot(float(e1), float(e2))
    assert np.allclose(e, np.tanh(2 * np.arctanh(g)), atol=1e-13)


@pytest.mark.parametrize("g1,g2", [(0.0, 0.0), (0.2, -0.1), (-0.3, 0.65)])
def test_g_eta_roundtrip(g1, g2):
    eta1, eta2 = shape.g1g2_to_eta1eta2(g1, g2)
    g1b, g2b = shape.eta1eta2_to_g1g2(eta1, eta2)
    assert np.allclose([float(g1b), float(g2b)], [g1, g2], atol=1e-12)


def test_e_eta():
    e1, e2 = 0.3, -0.2
    eta1, eta2 = shape.e1e2_to_eta1eta2(e1, e2)
    e = np.hypot(e1, e2)
    eta = np.hypot(float(eta1), float(eta2))
    assert np.allclose(eta, np.arctanh(e))


def test_batched():
    g1 = np.linspace(-0.5, 0.5, 11)
    g2 = np.linspace(0.0, 0.4, 11)
    e1, e2 = shape.g1g2_to_e1e2(g1, g2)
    assert e1.shape == (11,)
    for i in range(11):
        se1, se2 = shape.g1g2_to_e1e2(g1[i], g2[i])
        assert np.allclose([float(e1[i]), float(e2[i])], [float(se1), float(se2)])


def test_rotate_shape():
    g1, g2 = shape.rotate_shape(0.2, 0.0, np.pi / 4)
    assert np.allclose([float(g1), float(g2)], [0.0, -0.2], atol=1e-15)
    g1, g2 = shape.rotate_shape(0.2, 0.0, np.pi / 2)
    assert np.allclose([float(g1), float(g2)], [-0.2, 0.0], atol=1e-15)


def test_dgs_by_dgo_jacob():
    # at zero shear the jacobian is 1
    assert np.allclose(float(shape.dgs_by_dgo_jacob(0.1, 0.2, 0.0, 0.0)), 1.0)


def test_round_factor():
    assert np.allclose(float(shape.get_round_factor(0.0, 0.0)), 1.0)
    gsq = 0.3**2 + 0.1**2
    assert np.allclose(
        float(shape.get_round_factor(0.3, 0.1)), (1 - gsq) / (1 + gsq)
    )


def test_shape_class():
    s = Shape = shape.Shape(0.1, 0.2)
    assert np.allclose(s.g, np.hypot(0.1, 0.2))
    s2 = s.get_sheared(0.01, 0.0)
    assert s2.g1 != s.g1
    neg = -s
    assert neg.g1 == -0.1 and neg.g2 == -0.2
    rot = s.get_rotated(np.pi / 2)
    assert np.allclose([rot.g1, rot.g2], [-0.1, -0.2])
    with pytest.raises(GMixRangeError):
        shape.Shape(0.9, 0.9)
    del Shape


def test_g_range_flag():
    flags = shape.g_range_flag(np.array([0.1, 0.9]), np.array([0.1, 0.9]))
    assert int(flags[0]) == 0
    assert int(flags[1]) == 1
