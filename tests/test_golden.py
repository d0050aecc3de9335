"""Golden-file regression: every subsystem's output on a fixed seed
must stay bitwise-stable at the 1e-6 level across refactors
(the analog of the reference's mdet golden-catalog harness;
regenerate deliberately with `python tests/make_goldens.py`)."""
import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "data", "goldens.npz")


@pytest.fixture(scope="module")
def goldens():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("no goldens generated")
    with np.load(GOLDEN_PATH) as d:
        return {k: d[k] for k in d.files}


@pytest.fixture(scope="module")
def current():
    from make_goldens import compute_goldens

    return compute_goldens()


def test_golden_all(goldens, current):
    assert set(goldens) == set(current)
    for k in goldens:
        np.testing.assert_allclose(
            np.asarray(current[k]), goldens[k], rtol=1e-6, atol=1e-10,
            err_msg="golden mismatch for %s" % k,
        )
