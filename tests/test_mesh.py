"""Mesh construction: strict device-count checks and the 2-D data x space
mesh (`parallel/mesh.py`)."""
import numpy as np
import pytest

from difpan_tpu.parallel import make_mesh, make_mesh_2d


def test_make_mesh_strict_raises_on_too_few_devices():
    with pytest.raises(ValueError, match="requested 16 devices"):
        make_mesh(16)


def test_make_mesh_non_strict_warns_and_shrinks():
    with pytest.warns(UserWarning, match="requested 16 devices"):
        mesh = make_mesh(16, strict=False)
    assert mesh.size == 8


def test_make_mesh_exact():
    mesh = make_mesh(4, axis_name="sp")
    assert mesh.size == 4 and mesh.axis_names == ("sp",)


def test_make_mesh_2d_shape_and_axes():
    mesh = make_mesh_2d(4, 2)
    assert mesh.axis_names == ("data", "space")
    assert mesh.shape["data"] == 4 and mesh.shape["space"] == 2
    # row-major: the space axis is innermost (neighboring devices)
    devs = np.array(mesh.devices)
    assert devs.shape == (4, 2)


def test_make_mesh_2d_strict_raises():
    with pytest.raises(ValueError, match="8x2=16"):
        make_mesh_2d(8, 2)


def test_make_mesh_2d_non_strict_shrinks_data_axis():
    """strict=False keeps the space axis (H-sharding is budgeted for it)
    and shrinks the data axis to what exists."""
    with pytest.warns(UserWarning, match="shrinking to 4x2"):
        mesh = make_mesh_2d(8, 2, strict=False)
    assert mesh.shape["data"] == 4 and mesh.shape["space"] == 2

    with pytest.raises(ValueError, match="cannot even fit"):
        make_mesh_2d(4, 16, strict=False)
