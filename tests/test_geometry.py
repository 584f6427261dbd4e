"""Golden-value tests for the geometry core.

The reference has no kernel-level tests (SURVEY §4); these pin the exact
semantics of the camera/voxel/SH math against hand-computed values.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mvsdet_tpu.geometry import cameras, rays, sh, transforms, voxels


def _look_at_c2w(eye, target, up=(0, 0, 1)):
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    # camera convention: +x right, +y down, +z forward
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return c2w


class TestIntrinsics:
    def test_scale_intrinsics_divides_first_two_rows(self):
        k = jnp.array([[100.0, 0, 160, 0], [0, 100, 120, 0],
                       [0, 0, 1, 0], [0, 0, 0, 1]])
        out = np.asarray(cameras.scale_intrinsics(k, 4.0))
        np.testing.assert_allclose(out[0], [25.0, 0, 40, 0])
        np.testing.assert_allclose(out[1], [0, 25.0, 30, 0])
        np.testing.assert_allclose(out[2:], np.asarray(k)[2:])

    def test_scale_intrinsics_batched(self):
        k = jnp.tile(jnp.eye(4)[None], (5, 1, 1)) * 8.0
        out = np.asarray(cameras.scale_intrinsics(k, 2.0))
        assert out.shape == (5, 4, 4)
        np.testing.assert_allclose(out[:, 0, 0], 4.0)
        np.testing.assert_allclose(out[:, 2, 2], 8.0)


class TestProjection:
    def test_identity_camera_projects_to_principal_point(self):
        k = np.eye(4)
        k[0, 0] = k[1, 1] = 50.0
        k[0, 2], k[1, 2] = 40.0, 30.0
        w2c = np.eye(4)[None]
        proj = cameras.compute_projection(jnp.asarray(w2c), jnp.asarray(k), 1.0)
        assert proj.shape == (1, 3, 4)
        # point on optical axis at z=2 -> principal point
        xy, z = cameras.world_to_image(jnp.array([0.0, 0.0, 2.0]), proj[0])
        np.testing.assert_allclose(np.asarray(xy), [40.0, 30.0], atol=1e-5)
        np.testing.assert_allclose(float(z), 2.0, atol=1e-6)

    def test_projection_matches_numpy_chain(self):
        rng = np.random.RandomState(0)
        k = np.eye(4)
        k[0, 0], k[1, 1], k[0, 2], k[1, 2] = 120.0, 118.0, 80.0, 60.0
        c2w = _look_at_c2w([2.0, 1.0, 1.5], [0, 0, 0.5])
        w2c = np.linalg.inv(c2w)
        ratio = 4.0
        proj = np.asarray(
            cameras.compute_projection(jnp.asarray(w2c[None]),
                                       jnp.asarray(k), ratio))[0]
        k_s = k.copy()
        k_s[:2] /= ratio
        expected = k_s[:3, :3] @ w2c[:3]
        np.testing.assert_allclose(proj, expected, rtol=1e-5, atol=1e-5)

        pts = rng.randn(10, 3)
        xy, z = cameras.world_to_image(jnp.asarray(pts, jnp.float32), jnp.asarray(proj, jnp.float32))
        homo = np.concatenate([pts, np.ones((10, 1))], -1)
        p = (expected @ homo.T).T
        np.testing.assert_allclose(np.asarray(z), p[:, 2], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(xy), p[:, :2] / p[:, 2:3],
                                   rtol=1e-3, atol=1e-3)


class TestNeighbors:
    def test_knn_masks_self_and_orders_by_distance(self):
        pos = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [3.0, 0, 0], [3.5, 0, 0]])
        idx = np.asarray(cameras.knn_camera_neighbors(pos, k=2))
        np.testing.assert_array_equal(idx[0], [1, 2])
        np.testing.assert_array_equal(idx[1], [0, 2])
        np.testing.assert_array_equal(idx[2], [3, 1])
        np.testing.assert_array_equal(idx[3], [2, 1])

    def test_nearest_pose_ids(self):
        ref = np.tile(np.eye(4), (4, 1, 1))
        ref[:, :3, 3] = [[0, 0, 0], [1, 0, 0], [2, 0, 0], [5, 0, 0]]
        tar = np.tile(np.eye(4), (1, 1, 1))
        tar[0, :3, 3] = [1.9, 0, 0]
        idx = np.asarray(
            cameras.nearest_pose_ids(jnp.asarray(tar), jnp.asarray(ref), 2))
        np.testing.assert_array_equal(idx[0], [2, 1])


class TestVoxels:
    def test_voxel_points_match_reference_formula(self):
        pts = np.asarray(
            voxels.voxel_points((4, 4, 2), (0.5, 0.5, 1.0),
                                jnp.array([0.0, 0.0, 0.5])))
        assert pts.shape == (3, 4, 4, 2)
        # new_origin = origin - n/2 * size = (-1, -1, -0.5)
        np.testing.assert_allclose(pts[:, 0, 0, 0], [-1.0, -1.0, -0.5])
        np.testing.assert_allclose(pts[:, 3, 0, 0], [0.5, -1.0, -0.5])
        np.testing.assert_allclose(pts[:, 0, 0, 1], [-1.0, -1.0, 0.5])

    def test_depth_planes(self):
        d = np.asarray(voxels.depth_plane_values(0.2, 5.0, 12))
        assert d.shape == (12,)
        np.testing.assert_allclose(d[0], 0.2, atol=1e-6)
        np.testing.assert_allclose(d[1] - d[0], 0.4, atol=1e-6)
        assert d[-1] < 5.0

    def test_multiscale_points_levels(self):
        pts = voxels.multiscale_voxel_points(
            [(8, 8, 4), (4, 4, 2)], (0.16, 0.16, 0.2),
            jnp.array([0.0, 0.0, 0.5]))
        assert pts[0].shape == (256, 3)
        assert pts[1].shape == (32, 3)
        # level-1 spacing is doubled
        l1 = np.asarray(pts[1]).reshape(4, 4, 2, 3)
        np.testing.assert_allclose(l1[1, 0, 0, 0] - l1[0, 0, 0, 0], 0.32,
                                   atol=1e-5)


class TestRays:
    def test_sample_image_grid_centres(self):
        xy, ij = rays.sample_image_grid((2, 4))
        xy = np.asarray(xy)
        assert xy.shape == (2, 4, 2)
        np.testing.assert_allclose(xy[0, 0], [0.5 / 4, 0.5 / 2])
        np.testing.assert_allclose(xy[1, 3], [3.5 / 4, 1.5 / 2])
        np.testing.assert_array_equal(np.asarray(ij)[1, 2], [1, 2])

    def test_world_rays_identity_camera(self):
        k = jnp.array([[2.0, 0, 0.5], [0, 2.0, 0.5], [0, 0, 1.0]])
        c2w = jnp.eye(4)
        o, d = rays.get_world_rays(jnp.array([0.5, 0.5]), c2w, k)
        np.testing.assert_allclose(np.asarray(o), [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(d), [0, 0, 1], atol=1e-6)

    def test_depth_scale_is_unit_ray_z(self):
        k = jnp.array([[50.0, 0, 20.0], [0, 50.0, 15.0], [0, 0, 1.0]])
        scale = np.asarray(rays.depth_scale_map(30, 40, k))
        assert scale.shape == (1200, 1)
        # principal-point pixel has a ray straight down the axis -> z = 1
        idx = 15 * 40 + 20
        np.testing.assert_allclose(scale[idx, 0], 1.0, atol=1e-6)
        assert np.all(scale > 0) and np.all(scale <= 1.0 + 1e-6)

    def test_pixel_ray_dirs_match_manual(self):
        k = np.eye(3)
        k[0, 0] = k[1, 1] = 10.0
        k[0, 2], k[1, 2] = 5.0, 5.0
        d = np.asarray(
            rays.pixel_ray_dirs(jnp.array([5.0, 5.0]), jnp.asarray(k),
                                jnp.eye(3)))
        np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)


class TestTransforms:
    def test_identity_quaternion(self):
        r = np.asarray(transforms.quaternion_to_matrix(jnp.array([0.0, 0, 0, 1])))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-6)

    def test_quaternion_90deg_z(self):
        q = jnp.array([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
        r = np.asarray(transforms.quaternion_to_matrix(q))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(r, expected, atol=1e-6)

    def test_covariance_psd_and_eigvals(self):
        q = jnp.array([0.0, 0.0, np.sin(0.3), np.cos(0.3)])
        s = jnp.array([1.0, 2.0, 3.0])
        cov = np.asarray(transforms.build_covariance(s, q))
        np.testing.assert_allclose(cov, cov.T, atol=1e-5)
        eig = np.sort(np.linalg.eigvalsh(cov))
        np.testing.assert_allclose(eig, [1.0, 4.0, 9.0], rtol=1e-4)


class TestSphericalHarmonics:
    def test_dc_only(self):
        shc = jnp.zeros((3, 1)).at[:, 0].set(1.0)
        col = np.asarray(sh.eval_sh_color(shc, jnp.array([0.0, 0, 1.0])))
        np.testing.assert_allclose(col, 0.28209479 + 0.5, rtol=1e-5)

    @pytest.mark.parametrize("degree", [1, 2, 3, 4])
    def test_rotation_consistency(self, degree):
        """eval(rotate(c, R), d) == eval(c, R^T d) — the defining property."""
        rng = np.random.RandomState(degree)
        n = (degree + 1) ** 2
        coeffs = jnp.asarray(rng.randn(n), jnp.float32)
        # random rotation
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        rot = transforms.quaternion_to_matrix(jnp.asarray(q, jnp.float32))
        rotated = sh.rotate_sh(coeffs, rot)
        dirs = rng.randn(20, 3)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = jnp.asarray(dirs, jnp.float32)
        basis = sh.eval_sh_basis(dirs, degree)
        lhs = np.asarray(basis @ rotated)
        back_dirs = jnp.einsum("ji,nj->ni", rot, dirs)
        rhs = np.asarray(sh.eval_sh_basis(back_dirs, degree) @ coeffs)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-3, atol=1e-4)

    def test_rotation_matrix_orthogonal(self):
        rng = np.random.RandomState(7)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        rot = transforms.quaternion_to_matrix(jnp.asarray(q, jnp.float32))
        d = np.asarray(sh.sh_rotation_matrix(rot, 3))
        np.testing.assert_allclose(d @ d.T, np.eye(16), atol=1e-3)

    def test_identity_rotation_is_identity(self):
        d = np.asarray(sh.sh_rotation_matrix(jnp.eye(3), 4))
        np.testing.assert_allclose(d, np.eye(25), atol=1e-4)
