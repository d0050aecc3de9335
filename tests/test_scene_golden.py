"""Frozen multi-object-scene regression: a fixed 120-object scene
(mixed stamp sizes and epoch counts, varied galaxies, per-object
anisotropic psfs, sheared WCS) runs ragged-pack -> metacal -> four
estimators (incl. bounded bdf-lm) and every catalog column must match
the frozen file at
rtol 1e-5 (the analog of mdet_tests/test_mdet_regression.py:233-269;
regenerate deliberately with `python tests/make_scene_golden.py`)."""
import os

import numpy as np
import pytest

from make_scene_golden import SCENE_PATH, compute_scene_catalog


@pytest.fixture(scope="module")
def frozen():
    if not os.path.exists(SCENE_PATH):
        pytest.skip("no scene golden generated")
    with np.load(SCENE_PATH) as d:
        return {k: d[k] for k in d.files}


def test_scene_catalog_matches_frozen(frozen):
    current = compute_scene_catalog()
    assert set(frozen) == set(current), (
        "catalog schema drifted: only-frozen %s / only-current %s"
        % (sorted(set(frozen) - set(current)),
           sorted(set(current) - set(frozen)))
    )
    for key in sorted(frozen):
        np.testing.assert_allclose(
            current[key], frozen[key], rtol=1e-5, atol=8e-6,
            err_msg="scene column drifted: %s" % key,
        )
