"""Structured metrics logging (jsonl) + optional stdout echo.

The reference logs with ``print`` plus an optional TensorBoard writer
(``model/transfer.py:342-344``); here every record is one JSON line with a
timestamp, machine-parsable for dashboards and the bench harness.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional, TextIO


class MetricsLogger:
    def __init__(self, path: Optional[str], echo: bool = False):
        self._fh: Optional[TextIO] = open(path, "a") if path else None
        self.echo = echo

    def log(self, **record) -> None:
        record.setdefault("ts", time.time())
        line = json.dumps(record, default=float)
        if self._fh is not None:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line, file=sys.stderr)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
