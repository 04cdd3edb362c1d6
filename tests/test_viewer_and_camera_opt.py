"""Camera optimizer math + HTTP viewer smoke tests."""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from gstk_tpu.core.camera_opt import (
    apply_to_camera,
    exp_map_se3,
    exp_map_so3xr3,
    init_camera_opt,
)
from gstk_tpu.core.cameras import Camera
from gstk_tpu.viewer.http_viewer import ViewerServer, orbit_pose


def test_exp_map_identity():
    out = exp_map_so3xr3(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(out), np.eye(4)[:3], atol=1e-7)
    out = exp_map_se3(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(out), np.eye(4)[:3], atol=1e-7)


def test_exp_map_rotation():
    # rotate pi/2 around z
    t = jnp.asarray([0, 0, 0, 0, 0, np.pi / 2], jnp.float32)
    R = np.asarray(exp_map_so3xr3(t))[:3, :3]
    np.testing.assert_allclose(
        R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
    )


def test_se3_translation_couples_rotation():
    rho = jnp.asarray([1.0, 0, 0, 0, 0, np.pi / 2], jnp.float32)
    t = np.asarray(exp_map_se3(rho))[:3, 3]
    # V @ rho for 90deg z-rotation: t = (2/pi)*[1, 1-... ] — just check it's
    # not the raw rho and has the right magnitude ballpark
    assert not np.allclose(t, [1, 0, 0])
    assert 0.5 < np.linalg.norm(t) < 1.5


def test_apply_to_camera_identity():
    cam = Camera(
        fx=jnp.float32(50), fy=jnp.float32(50),
        cx=jnp.float32(32), cy=jnp.float32(24),
        c2w=jnp.asarray(np.eye(4)[:3].astype(np.float32)),
    )
    adj = init_camera_opt(5)
    out = apply_to_camera(cam, adj[0])
    np.testing.assert_allclose(np.asarray(out.c2w), np.asarray(cam.c2w), atol=1e-7)
    assert apply_to_camera(cam, adj[0], mode="off") is cam


def test_apply_to_camera_gradients():
    cam = Camera(
        fx=jnp.float32(50), fy=jnp.float32(50),
        cx=jnp.float32(32), cy=jnp.float32(24),
        c2w=jnp.asarray(np.eye(4)[:3].astype(np.float32)),
    )

    def loss(adj):
        c = apply_to_camera(cam, adj)
        return jnp.sum(c.c2w**2)

    g = jax.grad(loss)(jnp.full((6,), 0.01))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_apply_to_camera_right_multiplies():
    # parity with the reference composition bmm(c2w, adj)
    # (camera_optimizers.py:110-123)
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )
    c2w = np.concatenate([R, rng.normal(size=(3, 1))], axis=1).astype(
        np.float32
    )
    cam = Camera(
        fx=jnp.float32(50), fy=jnp.float32(50),
        cx=jnp.float32(32), cy=jnp.float32(24), c2w=jnp.asarray(c2w),
    )
    tangent = jnp.asarray(rng.normal(scale=0.1, size=6), jnp.float32)
    for mode, exp_map in (("SO3xR3", exp_map_so3xr3), ("SE3", exp_map_se3)):
        got = np.asarray(apply_to_camera(cam, tangent, mode=mode).c2w)
        adj4 = np.eye(4, dtype=np.float32)
        adj4[:3] = np.asarray(exp_map(tangent))
        c2w4 = np.eye(4, dtype=np.float32)
        c2w4[:3] = c2w
        np.testing.assert_allclose(got, (c2w4 @ adj4)[:3], atol=1e-5)


def test_orbit_pose_looks_at_center():
    c2w = orbit_pose(0.7, 0.3, 2.0, (1.0, 0.5, -0.5))
    eye = c2w[:3, 3]
    forward = -c2w[:3, 2]
    to_center = np.array([1.0, 0.5, -0.5]) - eye
    to_center /= np.linalg.norm(to_center)
    np.testing.assert_allclose(forward, to_center, atol=1e-6)
    # orthonormal
    np.testing.assert_allclose(
        c2w[:3, :3].T @ c2w[:3, :3], np.eye(3), atol=1e-6
    )


def test_http_viewer_serves(rng):
    frames = []

    def render(c2w, h, w, settings):
        frames.append((c2w, settings))
        return (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)

    server = ViewerServer(render, host="127.0.0.1", port=0).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        html = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"gstk_tpu viewer" in html
        server.update_stats({"loss": 0.5})
        stats = json.loads(
            urllib.request.urlopen(base + "/stats", timeout=10).read()
        )
        assert stats == {"loss": 0.5}
        jpg = urllib.request.urlopen(
            base + "/render?az=0.3&el=0.1&r=2.5", timeout=10
        ).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic
        assert len(frames) == 1
    finally:
        server.stop()


def test_viewer_trajectory_editor(rng):
    """Keyframe endpoints emit a gs-render-compatible camera_path json
    (the reference render panel's functional core, render_panel.py)."""
    server = ViewerServer(
        lambda c2w, h, w, settings: np.zeros((h, w, 3), np.uint8),
        host="127.0.0.1", port=0,
    ).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        r = json.loads(urllib.request.urlopen(
            base + "/keyframe/add?az=0.0&el=0.2&r=3", timeout=10).read())
        assert r["num_keyframes"] == 1
        # raw pose POST
        c2w = np.eye(4)[:3].tolist()
        req = urllib.request.Request(
            base + "/keyframe/add",
            data=json.dumps({"c2w": c2w}).encode(),
            headers={"Content-Type": "application/json"},
        )
        r = json.loads(urllib.request.urlopen(req, timeout=10).read())
        assert r["num_keyframes"] == 2
        path = json.loads(urllib.request.urlopen(
            base + "/trajectory?steps=10&fov=60&w=640&h=480", timeout=10
        ).read())
        assert len(path["camera_path"]) == 11  # 10 interpolated + final
        assert path["render_width"] == 640
        assert len(path["camera_path"][0]["camera_to_world"]) == 16
        r = json.loads(urllib.request.urlopen(
            base + "/keyframe/clear", timeout=10).read())
        assert r["num_keyframes"] == 0
    finally:
        server.stop()


def test_viewer_control_panel_and_export(rng):
    """GUI endpoints: settings round-trip drives the renderer, keyframe
    list/reorder/delete, export-command generation (reference
    control_panel.py / export_panel.py / render_panel.py parity)."""
    seen = []

    def render(c2w, h, w, settings):
        seen.append((h, w, dict(settings)))
        return np.zeros((h, w, 3), np.uint8)

    server = ViewerServer(
        render, host="127.0.0.1", port=0,
        run_info={"config_path": "/runs/x/config.yml", "export_dir": "/exp"},
    ).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        # settings POST round-trip
        new = {
            "bg": [1.0, 0.0, 0.0], "output": "depth", "sh_degree": 1,
            "max_res": 64, "crop_enabled": True,
            "crop_min": [-1, -1, -1], "crop_max": [1, 1, 1],
        }
        req = urllib.request.Request(
            base + "/settings", data=json.dumps(new).encode()
        )
        got = json.loads(urllib.request.urlopen(req, timeout=10).read())
        assert got["sh_degree"] == 1 and got["crop_enabled"] is True
        got2 = json.loads(
            urllib.request.urlopen(base + "/settings", timeout=10).read()
        )
        assert got2 == got
        # render applies max_res and passes settings through
        urllib.request.urlopen(base + "/render?az=0", timeout=10).read()
        h, w, s = seen[-1]
        assert max(h, w) <= 64
        assert s["output"] == "depth" and s["bg"] == [1.0, 0.0, 0.0]

        # keyframe editor: add 3, reorder, delete, render one
        for az in (0.0, 1.0, 2.0):
            urllib.request.urlopen(
                base + f"/keyframe/add?az={az}&el=0.2&r=3", timeout=10
            ).read()
        kfs = json.loads(urllib.request.urlopen(
            base + "/keyframes", timeout=10).read())["keyframes"]
        assert len(kfs) == 3
        urllib.request.urlopen(
            base + "/keyframe/move?i=2&dir=-1", timeout=10).read()
        kfs2 = json.loads(urllib.request.urlopen(
            base + "/keyframes", timeout=10).read())["keyframes"]
        assert kfs2[1] == kfs[2] and kfs2[2] == kfs[1]
        r = json.loads(urllib.request.urlopen(
            base + "/keyframe/delete?i=0", timeout=10).read())
        assert r["num_keyframes"] == 2
        jpg = urllib.request.urlopen(
            base + "/render_pose?i=0", timeout=10).read()
        assert jpg[:2] == b"\xff\xd8"
        # trajectory preview frames
        json.loads(urllib.request.urlopen(
            base + "/trajectory?steps=4", timeout=10).read())
        jpg = urllib.request.urlopen(
            base + "/render_traj?i=2", timeout=10).read()
        assert jpg[:2] == b"\xff\xd8"

        # export command generation
        for kind, frag in [
            ("gaussian-splat", "gaussian-splat --load-config /runs/x/config.yml"),
            ("offline-tsdf", "--meshing poisson"),
            ("render-trajectory", "scripts.render trajectory"),
        ]:
            cmd = json.loads(urllib.request.urlopen(
                base + f"/export_cmd?type={kind}", timeout=10).read())["command"]
            assert frag in cmd, cmd
    finally:
        server.stop()
