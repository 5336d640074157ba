"""Live per-track state plots during streaming tracking.

Reference: FlowerModel's live matplotlib views (flower_model.py:47-143) redraw
per-flower translation/quaternion traces every frame while add_data runs. The
TPU rebuild keeps tracking on-device (fixed-slot table, tracking/tracker.py),
so the live view consumes tiny host copies of the track table each step.

Headless-friendly: with an interactive backend the figure updates in place
(`plt.pause`); otherwise every refresh atomically rewrites ``out_png`` so a
viewer (or the annotator's browser page) can poll it — the live-mode
equivalent for display-less robots.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

__all__ = ["LiveStatePlot"]

_LABELS = ["x", "y", "z", "qx", "qy", "qz", "qw"]


class LiveStatePlot:
    def __init__(self, max_tracks: int = 8, out_png: str | os.PathLike = "live_state.png",
                 redraw_every: int = 1, interactive: bool | None = None,
                 history_frames: int = 2000):
        import matplotlib

        self.out_png = Path(out_png)
        self.redraw_every = max(int(redraw_every), 1)
        if interactive is None:
            interactive = bool(os.environ.get("DISPLAY"))
        if not interactive:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from collections import deque

        self._plt = plt
        self.interactive = interactive
        self.max_tracks = max_tracks
        # Rolling window: unbounded history would grow memory and redraw
        # cost linearly in session length (long streaming runs).
        self.history: deque[np.ndarray] = deque(maxlen=history_frames)
        self.alive_hist: deque[np.ndarray] = deque(maxlen=history_frames)
        self.fig, self.axs = plt.subplots(1, 7, figsize=(21, 3))
        if interactive:
            plt.ion()
            self.fig.show()
        self._frames = 0

    def update(self, tracks) -> None:
        """Append the current track table (a tracking.TrackState pytree) and
        refresh the figure. States are [t3 | quat4] world-frame, exactly the
        reference's 7-D KF state (flower_model.py:18-26)."""
        state = np.asarray(tracks.x)[:, :7]
        alive = np.asarray(tracks.alive).astype(bool)
        self.history.append(state.copy())
        self.alive_hist.append(alive.copy())
        self._frames += 1
        if self._frames % self.redraw_every:
            return
        self._redraw()

    def _redraw(self) -> None:
        hist = np.stack(self.history)          # (T, S, 7) rolling window
        alive = np.stack(self.alive_hist)      # (T, S)
        t0 = self._frames - len(self.history)  # absolute frame of window[0]
        ever = np.where(alive.any(axis=0))[0][: self.max_tracks]
        for i, ax in enumerate(self.axs):
            ax.clear()
            ax.set_title(_LABELS[i])
            for s in ever:
                seen = alive[:, s]
                t = np.where(seen)[0] + t0
                ax.plot(t, hist[seen, s, i], label=f"track {s}")
        if len(ever):
            self.axs[0].legend(fontsize=6)
        self.fig.tight_layout()
        if self.interactive:
            self.fig.canvas.draw_idle()
            self._plt.pause(0.001)
        else:
            tmp = self.out_png.with_suffix(".tmp.png")
            self.fig.savefig(tmp, dpi=80)
            os.replace(tmp, self.out_png)

    def close(self) -> None:
        self._redraw()
        self._plt.close(self.fig)
