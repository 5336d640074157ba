"""Structured JSONL metrics logging (SURVEY.md §5.5 prescribed upgrade over
the reference's plain-text posenet.log)."""

from __future__ import annotations

import json
import time
from pathlib import Path

__all__ = ["JsonlLogger"]


class JsonlLogger:
    def __init__(self, path: str | Path, echo: bool = False):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.echo = echo

    def log(self, record: dict, **extra) -> None:
        rec = {"ts": round(time.time(), 3), **record, **extra}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.echo:
            print(json.dumps(rec))

    def read(self) -> list[dict]:
        if not self.path.exists():
            return []
        return [json.loads(line) for line in self.path.read_text().splitlines()
                if line.strip()]
