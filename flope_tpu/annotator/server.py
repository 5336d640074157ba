"""Annotator backend: state + stdlib HTTP server.

Pose-edit semantics follow the reference annotator exactly
(pose_annotator/annotator.py):
* rotate: pose = pose @ R_delta (LOCAL axes, xyz Euler single-axis, degrees)
* translate: pose[:3, 3] += delta on a world axis
* add: identity rotation at the last clicked 3-D point (annotator.py:47-57)
* delete: mask out (kept in memory, dropped on save — annotator.py:43-45,59-60)
* step sizes multiply/divide by 10 (annotator.py:150-170)
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from flope_tpu.annotator.page import PAGE_HTML

__all__ = ["AnnotatorState", "serve"]


class AnnotatorState:
    def __init__(self, poses_file: str | Path, splats_file: str | Path | None = None,
                 max_points: int = 8000):
        self.poses_file = Path(poses_file)
        if self.poses_file.exists():
            self.poses = np.load(self.poses_file).astype(np.float64)
        else:
            self.poses = np.zeros((0, 4, 4))
        self.mask = np.ones(len(self.poses), bool)
        self.delta_trans = 0.01
        self.delta_rot = 10.0
        self.clicked = [0.0, 0.0, 0.0]
        self.points = np.zeros((0, 3))
        self.colors = np.zeros((0, 3))
        if splats_file and Path(splats_file).exists():
            from flope_tpu.utils.io import read_splats_ply
            pts, cols = read_splats_ply(splats_file)
            if len(pts) > max_points:
                sel = np.random.default_rng(0).choice(len(pts), max_points,
                                                      replace=False)
                pts, cols = pts[sel], cols[sel]
            self.points, self.colors = pts, cols
        self.lock = threading.Lock()

    # ------------------------- edit operations -------------------------

    def _rot_delta(self, axis: str, sign: int) -> np.ndarray:
        from scipy.spatial.transform import Rotation as sciR
        e = [0.0, 0.0, 0.0]
        e["xyz".index(axis)] = sign * self.delta_rot
        T = np.eye(4)
        T[:3, :3] = sciR.from_euler("xyz", e, degrees=True).as_matrix()
        return T

    def apply(self, action: dict) -> dict:
        with self.lock:
            kind = action.get("kind")
            idx = int(action.get("index", 0))
            if kind == "rotate" and 0 <= idx < len(self.poses):
                self.poses[idx] = self.poses[idx] @ self._rot_delta(
                    action["axis"], int(action["sign"]))
            elif kind == "translate" and 0 <= idx < len(self.poses):
                self.poses[idx, "xyz".index(action["axis"]), 3] += (
                    int(action["sign"]) * self.delta_trans)
            elif kind == "add":
                T = np.eye(4)
                T[:3, 3] = self.clicked
                self.poses = np.concatenate([self.poses, T[None]])
                self.mask = np.concatenate([self.mask, [True]])
            elif kind == "delete" and 0 <= idx < len(self.poses):
                self.mask[idx] = False
            elif kind == "click":
                self.clicked = [float(v) for v in action["point"]]
            elif kind == "step_trans":
                self.delta_trans *= 10.0 if int(action["sign"]) > 0 else 0.1
            elif kind == "step_rot":
                self.delta_rot *= 10.0 if int(action["sign"]) > 0 else 0.1
            elif kind == "save":
                np.save(self.poses_file, self.poses[self.mask])
                return {"saved": str(self.poses_file),
                        "count": int(self.mask.sum()), **self.snapshot()}
            return self.snapshot()

    def snapshot(self) -> dict:
        return {
            "poses": self.poses.tolist(),
            "mask": self.mask.tolist(),
            "delta_trans": self.delta_trans,
            "delta_rot": self.delta_rot,
            "clicked": self.clicked,
        }

    def scene(self) -> dict:
        return {"points": self.points.tolist(),
                "colors": self.colors.tolist(), **self.snapshot()}


def make_handler(state: AnnotatorState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, payload, code=200):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                body = PAGE_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/scene":
                self._json(state.scene())
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            if self.path == "/action":
                n = int(self.headers.get("Content-Length", 0))
                action = json.loads(self.rfile.read(n) or b"{}")
                self._json(state.apply(action))
            else:
                self._json({"error": "not found"}, 404)

    return Handler


def serve(state: AnnotatorState, host: str = "127.0.0.1", port: int = 8050,
          block: bool = True) -> ThreadingHTTPServer:
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    print(f"pose annotator at http://{host}:{httpd.server_address[1]}/")
    if block:
        httpd.serve_forever()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd
