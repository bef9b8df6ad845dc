"""Camera projection vs hand-computed values + project/backproject roundtrip."""
import jax.numpy as jnp
import numpy as np

from velo_tpu.geom import camera


def make_cam():
    P = jnp.asarray(
        [[200.0, 0.0, 320.0, 12.0], [0.0, 200.0, 96.0, 0.5], [0.0, 0.0, 1.0, 0.0]]
    )
    return camera.Camera(P=P, T_cam_velo=jnp.eye(4), width=640, height=192)


def test_project_hand_computed():
    cam = make_cam()
    pt = jnp.asarray([[1.0, -0.5, 4.0]])
    uv, valid = camera.project(cam.P, pt)
    # u = (200*1 + 320*4 + 12)/4, v = (200*-0.5 + 96*4 + 0.5)/4
    np.testing.assert_allclose(
        np.asarray(uv[0]), [(200 + 1280 + 12) / 4.0, (-100 + 384 + 0.5) / 4.0],
        rtol=1e-6,
    )
    assert bool(valid[0])


def test_behind_camera_masked():
    cam = make_cam()
    uv, valid = camera.project(cam.P, jnp.asarray([[0.0, 0.0, -1.0]]))
    assert not bool(valid[0])
    assert np.all(np.isfinite(np.asarray(uv)))


def test_backproject_roundtrip(rng):
    cam = make_cam()
    pts = rng.uniform([-5, -2, 2], [5, 2, 40], (200, 3)).astype(np.float32)
    uv, z, valid = camera.project_depth(cam.P, jnp.asarray(pts))
    back = camera.backproject(cam, uv, z)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-3)


def test_in_image():
    cam = make_cam()
    uv = jnp.asarray([[0.0, 0.0], [639.0, 191.0], [640.0, 10.0], [-1.0, 5.0]])
    m = np.asarray(camera.in_image(cam, uv))
    assert m.tolist() == [True, True, False, False]
