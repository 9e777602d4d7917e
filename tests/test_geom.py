"""Geometry core tests: frustum spacing, plane math, Rodrigues, ida matrices,
and the full height-lift geometry against an independent per-point oracle."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from sgv3d_tpu import geom


def test_frustum_did_spacing():
    fr = geom.make_frustum((864, 1536), 16, (-2.0, 3.5, 90))
    assert fr.shape == (90, 54, 96, 4)
    d = fr[:, 0, 0, 2]
    # Power-law spacing: d_i = d0 + (i/D)^1.5 (d1 - d0)
    i = np.arange(90) / 90.0
    expect = -2.0 + i**1.5 * 5.5
    np.testing.assert_allclose(d, expect, rtol=1e-6)
    # Pixel coords span the original image
    assert fr[0, 0, 0, 0] == 0 and fr[0, 0, -1, 0] == 1535
    assert fr[0, 0, 0, 1] == 0 and fr[0, -1, 0, 1] == 863
    np.testing.assert_array_equal(fr[..., 3], 1.0)


def test_equation_plane_and_denorm():
    # Ground plane z=0 in ego; identity ego2sensor keeps it z=0.
    denorm = geom.get_denorm(np.eye(4))
    # Plane equation proportional to (0, 0, 1, 0): all ground points satisfy it
    pts = np.array([[0.5, 2.0, 0.0], [3.0, -1.0, 0.0]])
    for p in pts:
        assert abs(denorm[:3] @ p + denorm[3]) < 1e-9


def test_rodrigues_matches_closed_form():
    axis = np.array([0.0, 0.0, 1.0])
    theta = 0.3
    R = geom.rodrigues(axis * theta)
    expect = np.array(
        [[math.cos(theta), -math.sin(theta), 0],
         [math.sin(theta), math.cos(theta), 0],
         [0, 0, 1]]
    )
    np.testing.assert_allclose(R, expect, atol=1e-12)
    # Zero rotation
    np.testing.assert_allclose(geom.rodrigues(np.zeros(3)), np.eye(3))


def test_sensor2virtual_aligns_normal_with_y():
    # A tilted camera: ground normal in camera frame.
    denorm = np.array([0.1, -0.95, 0.3, 7.0])
    s2v = geom.get_sensor2virtual(denorm)
    target = -denorm[:3] / np.linalg.norm(denorm[:3])
    rotated = s2v[:3, :3] @ target
    np.testing.assert_allclose(rotated, [0.0, 1.0, 0.0], atol=1e-6)
    # Proper rotation
    np.testing.assert_allclose(s2v[:3, :3] @ s2v[:3, :3].T, np.eye(3), atol=1e-6)


@pytest.mark.parametrize("normal_y", [-1.0, 1.0])
def test_sensor2virtual_degenerate_normals(normal_y):
    """Parallel AND antiparallel ground normals must both align to +y.
    The antiparallel case (inverted mounting convention) needs a 180-degree
    rotation — returning identity there silently mirrors every lifted point
    below ground (code review r5; the reference's cv2.Rodrigues emits NaNs)."""
    denorm = np.array([0.0, normal_y, 0.0, 7.0])
    s2v = geom.get_sensor2virtual(denorm)
    target = -denorm[:3] / np.linalg.norm(denorm[:3])
    np.testing.assert_allclose(s2v[:3, :3] @ target, [0.0, 1.0, 0.0],
                               atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(s2v[:3, :3]), 1.0, atol=1e-6)


def test_reference_height():
    denorm = np.array([0.0, -2.0, 0.0, 14.0])
    assert abs(geom.get_reference_height(denorm) - 7.0) < 1e-6


def test_ida_matrix_resize_crop():
    resize = 0.8
    crop = (10.0, 20.0, 1546.0, 884.0)
    ida = geom.ida_matrix(resize, crop, flip=False, rotate_deg=0.0)
    # Point mapping: u' = u*resize - crop_x
    u, v = 100.0, 50.0
    out = ida @ np.array([u, v, 5.0, 1.0])
    np.testing.assert_allclose(out[:2], [u * resize - 10.0, v * resize - 20.0], atol=1e-5)
    assert out[2] == 5.0  # height-bin channel untouched


def test_ida_matrix_flip_rotate_invertible():
    ida = geom.ida_matrix(0.7, (5, 8, 1080, 700), flip=True, rotate_deg=3.0)
    assert abs(np.linalg.det(ida)) > 1e-6
    np.testing.assert_allclose(ida[2], [0, 0, 1, 0], atol=1e-9)


def _geometry_oracle(frustum, s2e, s2v, intrin, ida, ref_h, bda):
    """Independent per-point loop implementation of the height lift."""
    D, H, W, _ = frustum.shape
    out = np.zeros((D, H, W, 3))
    ida_inv = np.linalg.inv(ida)
    K_inv = np.linalg.inv(intrin)
    s2v_inv = np.linalg.inv(s2v)
    for d in range(D):
        for h in range(H):
            for w in range(W):
                p = ida_inv @ frustum[d, h, w]
                height = ref_h - p[2]
                ray = (s2v @ K_inv) @ np.array([p[0] * 10, p[1] * 10, 10.0, 1.0])
                ratio = height / ray[1]
                pt = ray * ratio
                pt[3] = 1.0
                pt = (s2e @ s2v_inv) @ pt
                pt = bda @ pt
                out[d, h, w] = pt[:3]
    return out


def test_get_geometry_matches_oracle():
    rng = np.random.default_rng(42)
    frustum = geom.make_frustum((64, 96), 16, (-1.0, 2.0, 5))
    intrin = np.eye(4)
    intrin[0, 0], intrin[1, 1] = 1000.0, 1000.0
    intrin[0, 2], intrin[1, 2] = 48.0, 32.0
    # Camera pitched down ~10deg, 7m above ground
    denorm = np.array([0.02, -np.cos(np.deg2rad(10)), np.sin(np.deg2rad(10)), 7.0])
    s2v = geom.get_sensor2virtual(denorm)
    ref_h = geom.get_reference_height(denorm)
    s2e = np.eye(4)
    s2e[:3, :3] = geom.rodrigues(np.array([0.3, 0.1, -0.2]))
    s2e[:3, 3] = [1.0, -2.0, 0.5]
    ida = geom.ida_matrix(0.8, (0, 25.6, 96, 89.6), False, 0.0)
    bda = np.eye(4)
    bda[:3, :3] = geom.rodrigues(np.array([0.0, 0.0, 0.05]))

    expect = _geometry_oracle(frustum, s2e, s2v, intrin, ida, ref_h, bda)

    out = geom.get_geometry(
        jnp.asarray(frustum),
        jnp.asarray(s2e, jnp.float32)[None, None],
        jnp.asarray(s2v, jnp.float32)[None, None],
        jnp.asarray(intrin, jnp.float32)[None, None],
        jnp.asarray(ida, jnp.float32)[None, None],
        jnp.asarray([[ref_h]], jnp.float32),
        jnp.asarray(bda, jnp.float32)[None],
    )
    assert out.shape == (1, 1, 5, 4, 6, 3)
    np.testing.assert_allclose(np.asarray(out[0, 0]), expect, rtol=2e-4, atol=2e-3)


def test_geometry_to_voxel_truncation():
    grid = geom.VoxelGrid((0.0, 102.4, 0.8), (-51.2, 51.2, 0.8), (-5.0, 3.0, 8.0))
    np.testing.assert_array_equal(grid.voxel_num, [128, 128, 1])
    pts = jnp.asarray([[0.0, -51.2, -5.0], [102.3, 51.1, 2.9], [-0.4, 0.0, 0.0]],
                      jnp.float32)
    vox = geom.geometry_to_voxel(pts, grid)
    np.testing.assert_array_equal(np.asarray(vox[0]), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(vox[1]), [127, 127, 0])
    # torch `.int()` truncates toward zero: -0.4/0.8 -> 0 (not -1)
    assert int(vox[2, 0]) == 0


def test_bev_transform_identity():
    boxes = np.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3, 1.0, 0.5]])
    out, rot = geom.bev_transform(boxes, 0.0, 1.0, False, False)
    np.testing.assert_allclose(out, boxes, atol=1e-6)
    np.testing.assert_allclose(rot, np.eye(3), atol=1e-6)


def test_bev_transform_rotation():
    boxes = np.array([[1.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 1.0, 0.0]])
    out, rot = geom.bev_transform(boxes, 90.0, 1.0, False, False)
    np.testing.assert_allclose(out[0, :3], [0.0, 1.0, 0.0], atol=1e-6)
    assert abs(out[0, 6] - math.pi / 2) < 1e-6
    np.testing.assert_allclose(out[0, 7:9], [0.0, 1.0], atol=1e-6)


def test_camera_mlp_input_layout():
    b, n = 2, 1
    intrin = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    intrin[:, :, 0, 0] = 2183.0
    ida = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    ida[:, :, 0, 3] = -5.0
    s2e = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    bda = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    out = geom.camera_mlp_input(
        jnp.asarray(intrin), jnp.asarray(ida), jnp.asarray(s2e), jnp.asarray(bda))
    assert out.shape == (2, 27)
    assert float(out[0, 0]) == 2183.0  # fx
    assert float(out[0, 6]) == -5.0    # ida[0,3]
    np.testing.assert_allclose(
        np.asarray(out[0, 15:27]), np.eye(4)[:3].reshape(-1), atol=1e-6)


def test_inv4x4_matches_linalg():
    """Adjugate inverse == LU inverse for calib-like matrices."""
    rng = np.random.RandomState(3)
    mats = []
    for _ in range(16):
        m = np.eye(4)
        m[:3, :3] = geom.rodrigues(rng.randn(3))
        m[:3, 3] = rng.randn(3) * 5
        mats.append(m)
    # plus an intrinsics-like and an ida-like matrix
    k = np.eye(4); k[0, 0], k[1, 1], k[0, 2], k[1, 2] = 2183.4, 2329.3, 940.3, 560.2
    mats.append(k)
    mats.append(np.asarray(geom.ida_matrix(0.8, (10, 20, 1546, 884), True, 2.0),
                           np.float64))
    m = jnp.asarray(np.stack(mats).astype(np.float32))
    got = geom.inv4x4(m)
    want = np.linalg.inv(np.stack(mats)).astype(np.float32)
    # relative tolerance: intrinsics inverses have entries ~1e-4
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-6)
