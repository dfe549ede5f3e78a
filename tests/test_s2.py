"""S2 cell-id invariants: determinism, hierarchy by bit truncation, level
arithmetic, spatial locality, face partition, token format."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from filda_spark import s2


@settings(max_examples=40, deadline=None)
@given(st.floats(-85, 85), st.floats(-179.9, 179.9), st.integers(1, 29))
def test_parent_containment_and_levels(lat, lon, level):
    child = s2.cell_id(np.array([lat]), np.array([lon]), level + 1)
    direct = s2.cell_id(np.array([lat]), np.array([lon]), level)
    assert s2.parent(child)[0] == direct[0]
    assert s2.level_of(child)[0] == level + 1
    assert s2.level_of(direct)[0] == level


def test_locality_and_separation():
    base = s2.cell_id(np.array([40.0]), np.array([-100.0]), 14)[0]
    near = s2.cell_id(np.array([40.00005]), np.array([-100.00005]), 14)[0]
    far = s2.cell_id(np.array([41.0]), np.array([-100.0]), 14)[0]
    assert base == near
    assert base != far


def test_faces_partition_sphere():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-89, 89, 500)
    lon = rng.uniform(-180, 180, 500)
    cid = s2.cell_id(lat, lon, 5)
    faces = (cid >> np.uint64(61)).astype(int)
    assert set(np.unique(faces)) <= {0, 1, 2, 3, 4, 5}
    assert len(set(np.unique(faces))) >= 5  # random cover hits most faces


def test_token_format():
    cid = s2.cell_id(np.array([0.0]), np.array([0.0]), 0)
    tok = s2.token(cid)[0]
    assert tok == format(int(cid[0]), "016x").rstrip("0")
    assert len(tok) <= 16
