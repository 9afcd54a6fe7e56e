"""Live network viewer.

Counterpart of the reference's SIBR socket GUI (2d-gaussian-splatting/
gaussian_renderer/network_gui.py:12-97, polled from the train loop): a tiny
threaded HTTP server that renders the current GaussianScene on demand.

    GET /render?eye=x,y,z&target=x,y,z&w=512&h=384&fov=60&mode=rgb|depth|normal
    GET /info

`scene_provider()` is polled per request, so pointing it at a live Trainer
(`lambda: trainer.scene`) streams training progress. PNG over HTTP instead of
the SIBR byte protocol — any browser is the client.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


class ViewerServer:
    def __init__(self, scene_provider: Callable, port: int = 6009,
                 backend: str = "tiled"):
        self.scene_provider = scene_provider
        self.backend = backend
        self.port = port
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    def _render(self, q) -> bytes:
        import jax.numpy as jnp
        from PIL import Image

        from g4splat_tpu.core.cameras import lookat_camera
        from g4splat_tpu.ops.rasterize import render

        eye = [float(v) for v in q.get("eye", ["0,0,-3"])[0].split(",")]
        target = [float(v) for v in q.get("target", ["0,0,0"])[0].split(",")]
        w = int(q.get("w", ["512"])[0])
        h = int(q.get("h", ["384"])[0])
        fov = float(q.get("fov", ["60"])[0])
        mode = q.get("mode", ["rgb"])[0]
        f = h / (2.0 * np.tan(np.radians(fov) / 2.0))
        cam = lookat_camera(eye, target, [0, -1, 0], fx=f, fy=f,
                            width=w, height=h)
        out = render(cam, self.scene_provider(), backend=self.backend)
        if mode == "depth":
            d = np.asarray(out["surf_depth"])
            d = d / max(d.max(), 1e-6)
            img = np.repeat(d[..., None], 3, axis=-1)
        elif mode == "normal":
            img = np.asarray(out["rend_normal"]) * 0.5 + 0.5
        else:
            img = np.asarray(out["render"])
        buf = io.BytesIO()
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ).save(buf, format="PNG")
        return buf.getvalue()

    def _info(self) -> bytes:
        scene = self.scene_provider()
        return json.dumps({
            "n_alive": int(scene.num_alive),
            "capacity": int(scene.capacity),
            "sh_degree": int(scene.active_sh_degree),
        }).encode()

    def start(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def do_GET(self):
                try:
                    parsed = urlparse(self.path)
                    if parsed.path == "/render":
                        body = viewer._render(parse_qs(parsed.query))
                        ctype = "image/png"
                    elif parsed.path == "/info":
                        body = viewer._info()
                        ctype = "application/json"
                    else:
                        self.send_response(404)
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", ctype)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                except Exception as e:  # noqa: BLE001
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(str(e).encode())

        self._httpd = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        self.port = self._httpd.server_port
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        if self._httpd:
            self._httpd.shutdown()
            self._httpd = None
