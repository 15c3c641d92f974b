"""Loopback wire-protocol test: viewer client ↔ in-train GUI server.

Covers SURVEY §2.13 (network_gui.py:26-86): framing (4-byte LE length +
JSON), frame payload layout (H·W·3 raw RGB), verify-string trailer, and the
train-toggle handshake — end to end over a real socket, with the render
produced by the production render path on a tiny model.
"""

import math
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.models.gaussians import init_from_pcd
from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
from mvs_gaussian_splatting_tpu.train.config import ModelConfig
from mvs_gaussian_splatting_tpu.train.loop import _gui_pump
from mvs_gaussian_splatting_tpu.viewer import network_gui
from mvs_gaussian_splatting_tpu.viewer.client import ViewerClient, orbit_camera

W = H = 64


@pytest.fixture
def server_port():
    network_gui.init("127.0.0.1", 0)
    port = network_gui.listener.getsockname()[1]
    yield port
    if network_gui.conn is not None:
        network_gui.conn.close()
        network_gui.conn = None
    network_gui.listener.close()
    network_gui.listener = None


def _tiny_model(n=32, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return init_from_pcd(pts, cols, capacity=64, sh_degree=2)


def test_client_receives_frame_and_verify_string(server_port):
    params, aux = _tiny_model()
    model_cfg = ModelConfig(source_path="/data/scene42")
    raster_cfg = RasterConfig(tile_capacity=64, max_tiles_per_gaussian=16,
                              tile_batch=8, backend="jnp")

    result = {}

    def client_thread():
        with ViewerClient("127.0.0.1", server_port, timeout=900.0) as c:
            fovx = math.radians(60.0)
            R, T = orbit_camera(0.3)
            rgb, verify = c.request(W, H, R, T, fovx, fovx, train=True,
                                    keep_alive=False)
            result["rgb"] = rgb
            result["verify"] = verify

    t = threading.Thread(target=client_thread)
    t.start()
    # pump until the client finished (do_training breaks the pump per request)
    for it in range(200):
        _gui_pump(model_cfg, params, aux, raster_cfg, sh_degree=0,
                  iteration=it, max_iterations=100)
        if not t.is_alive():
            break
    t.join(timeout=900)
    assert not t.is_alive()

    assert result["verify"] == "/data/scene42"
    rgb = result["rgb"]
    assert rgb.shape == (H, W, 3) and rgb.dtype == np.uint8
    # the splats must actually appear (non-trivial frame)
    assert rgb.max() > 10
    assert rgb.min() == 0  # background


def test_sibr_convention_matches_direct_render(server_port):
    """A request carrying SIBR-convention (handedness-flipped) matrices —
    what the real C++ SIBR_remoteGaussian client sends, and what
    ViewerClient.request now emits — must render the same frame as calling
    the render path directly with the unflipped camera. Guards the column
    negations of gaussian_renderer/network_gui.py:76-79."""
    from mvs_gaussian_splatting_tpu.ops.preprocess import CameraView
    from mvs_gaussian_splatting_tpu.ops.render import render as render_fn
    from mvs_gaussian_splatting_tpu.utils import graphics

    params, aux = _tiny_model()
    model_cfg = ModelConfig(source_path="p")
    raster_cfg = RasterConfig(tile_capacity=64, max_tiles_per_gaussian=16,
                              tile_batch=8, backend="jnp")
    fovx = math.radians(60.0)
    R, T = orbit_camera(0.7)

    # direct render with the unflipped camera (no viewer wire)
    w2v = graphics.world_to_view(R, T)
    proj = graphics.projection_matrix(0.01, 100.0, fovx, fovx)
    view = CameraView(jnp.asarray(w2v.astype(np.float32)),
                      jnp.asarray((proj @ w2v).astype(np.float32)),
                      jnp.asarray(np.linalg.inv(w2v)[:3, 3].astype(np.float32)),
                      jnp.float32(math.tan(fovx / 2)),
                      jnp.float32(math.tan(fovx / 2)))
    direct = render_fn(view, W, H, params, jnp.zeros(3), sh_degree=0,
                       alive=aux.alive, raster_config=raster_cfg)["render"]
    direct_u8 = (np.clip(np.asarray(direct), 0, 1) * 255).astype(np.uint8)
    direct_u8 = direct_u8.transpose(1, 2, 0)

    result = {}

    def client_thread():
        with ViewerClient("127.0.0.1", server_port, timeout=900.0) as c:
            rgb, _ = c.request(W, H, R, T, fovx, fovx, train=True,
                               keep_alive=False)
            result["rgb"] = rgb

    t = threading.Thread(target=client_thread)
    t.start()
    for it in range(200):
        _gui_pump(model_cfg, params, aux, raster_cfg, sh_degree=0,
                  iteration=it, max_iterations=100)
        if not t.is_alive():
            break
    t.join(timeout=900)
    assert not t.is_alive()

    assert result["rgb"].max() > 10          # non-trivial frame
    # u8 quantization is the only tolerance; a flipped render would differ
    # almost everywhere
    diff = np.abs(result["rgb"].astype(int) - direct_u8.astype(int))
    assert diff.max() <= 1


def test_viewer_pipeline_toggles_plumb_into_render(server_port):
    """shs_python / rot_scale_python from the wire reach the render call
    (train.py:60): with both toggles on, the frame must match the default
    path (the python SH and cov paths are exact oracles)."""
    params, aux = _tiny_model()
    model_cfg = ModelConfig(source_path="p")
    raster_cfg = RasterConfig(tile_capacity=64, max_tiles_per_gaussian=16,
                              tile_batch=8, backend="jnp")
    fovx = math.radians(60.0)
    R, T = orbit_camera(0.7)

    result = {}

    def client_thread():
        with ViewerClient("127.0.0.1", server_port, timeout=900.0) as c:
            base, _ = c.request(W, H, R, T, fovx, fovx, train=False,
                                keep_alive=True)
            toggled, _ = c.request(W, H, R, T, fovx, fovx, train=True,
                                   keep_alive=False, shs_python=True,
                                   rot_scale_python=True)
            result["base"] = base
            result["toggled"] = toggled

    t = threading.Thread(target=client_thread)
    t.start()
    for it in range(400):
        _gui_pump(model_cfg, params, aux, raster_cfg, sh_degree=0,
                  iteration=it, max_iterations=100)
        if not t.is_alive():
            break
    t.join(timeout=900)
    assert not t.is_alive()
    assert result["base"].max() > 10
    diff = np.abs(result["base"].astype(int) - result["toggled"].astype(int))
    assert diff.max() <= 1


def test_zero_resolution_is_noop_and_connection_survives(server_port):
    params, aux = _tiny_model()
    model_cfg = ModelConfig(source_path="p")
    raster_cfg = RasterConfig(tile_capacity=64, max_tiles_per_gaussian=16,
                              tile_batch=8, backend="jnp")

    result = {}

    def client_thread():
        with ViewerClient("127.0.0.1", server_port, timeout=900.0) as c:
            c.disconnect_request()      # zero-res: server replies verify only
            fovx = math.radians(60.0)
            R, T = orbit_camera(1.1)
            rgb, _ = c.request(W, H, R, T, fovx, fovx, train=True,
                               keep_alive=False)
            result["rgb"] = rgb

    t = threading.Thread(target=client_thread)
    t.start()
    for it in range(200):
        _gui_pump(model_cfg, params, aux, raster_cfg, sh_degree=0,
                  iteration=it, max_iterations=100)
        if not t.is_alive():
            break
    t.join(timeout=900)
    assert not t.is_alive()
    assert result["rgb"].shape == (H, W, 3)
