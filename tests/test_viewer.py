import io
import json
import urllib.request

import numpy as np
import pytest
from PIL import Image

from g4splat_tpu.models.gaussians import GaussianScene
from g4splat_tpu.utils.viewer import ViewerServer


@pytest.fixture(scope="module")
def server():
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(-0.5, 0.5, (100, 2)), np.zeros((100, 1))], 1
    ).astype(np.float32)
    scene = GaussianScene.from_points(
        pts, rng.rand(100, 3).astype(np.float32),
        scales=np.full(100, 0.1, np.float32), initial_opacity=0.9,
    )
    s = ViewerServer(lambda: scene, port=0).start()
    yield s
    s.stop()


class TestViewer:
    def test_info(self, server):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/info", timeout=30
        ) as r:
            info = json.loads(r.read())
        assert info["n_alive"] == 100

    def test_render_png(self, server):
        url = (f"http://127.0.0.1:{server.port}/render"
               "?eye=0,0,-2.5&target=0,0,0&w=64&h=48&fov=60")
        with urllib.request.urlopen(url, timeout=120) as r:
            data = r.read()
        img = np.asarray(Image.open(io.BytesIO(data)))
        assert img.shape == (48, 64, 3)
        assert img.max() > 10  # something rendered

    def test_depth_mode(self, server):
        url = (f"http://127.0.0.1:{server.port}/render"
               "?eye=0,0,-2.5&target=0,0,0&w=32&h=32&mode=depth")
        with urllib.request.urlopen(url, timeout=120) as r:
            img = np.asarray(Image.open(io.BytesIO(r.read())))
        assert img.shape == (32, 32, 3)

    def test_404(self, server):
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/nope", timeout=30
            )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
