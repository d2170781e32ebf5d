"""Structured JSON logging for the serving stack.

The reference's observability is bare `print` calls behind a debug flag
(`modules/utils.py:109-111`) with Triton metrics disabled. This logger
emits one JSON object per line (timestamp, level, event, fields) so the
service's request flow is machine-parseable; /metrics covers aggregates.
"""

from __future__ import annotations

import json
import sys
import threading
import time
from typing import Any, TextIO

_LEVELS = {"debug": 10, "info": 20, "warning": 30, "error": 40}


class JsonLogger:
    def __init__(self, name: str, level: str = "info",
                 stream: TextIO | None = None):
        self.name = name
        self._level = _LEVELS[level]
        self._stream = stream or sys.stderr
        self._lock = threading.Lock()

    def _emit(self, level: str, event: str, **fields: Any):
        if _LEVELS[level] < self._level:
            return
        record = {
            "ts": round(time.time(), 6),
            "level": level,
            "logger": self.name,
            "event": event,
            **fields,
        }
        line = json.dumps(record, default=str)
        with self._lock:
            self._stream.write(line + "\n")
            self._stream.flush()

    def debug(self, event: str, **fields):
        self._emit("debug", event, **fields)

    def info(self, event: str, **fields):
        self._emit("info", event, **fields)

    def warning(self, event: str, **fields):
        self._emit("warning", event, **fields)

    def error(self, event: str, **fields):
        self._emit("error", event, **fields)


_loggers: dict[str, JsonLogger] = {}


def get_logger(name: str, level: str = "info") -> JsonLogger:
    if name not in _loggers:
        _loggers[name] = JsonLogger(name, level)
    return _loggers[name]
