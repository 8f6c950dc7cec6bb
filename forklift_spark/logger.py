"""Engine logger: stdout echo + in-memory message capture.

Parity with the reference logger (`base/logger.rb:15-46`): file/stdout
logging with a captured `messages` array used for the run report email
attachment, `debug` gating, and `emphatically` decoration.
"""

from __future__ import annotations

import logging
import sys
import time


class EngineLogger:
    def __init__(self, name: str = "forklift_spark", debug: bool = False, stdout: bool = True):
        self.messages: list[str] = []
        self._debug = debug
        self._log = logging.getLogger(name)
        self._log.setLevel(logging.DEBUG if debug else logging.INFO)
        if stdout and not self._log.handlers:
            h = logging.StreamHandler(sys.stdout)
            h.setFormatter(logging.Formatter("[%(asctime)s] %(levelname)s: %(message)s"))
            self._log.addHandler(h)

    def log(self, msg: str) -> None:
        self.messages.append(f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}")
        self._log.info(msg)

    def debug(self, msg: str) -> None:
        if self._debug:
            self.messages.append(f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] DEBUG {msg}")
            self._log.debug(msg)

    def error(self, msg: str) -> None:
        self.messages.append(f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] ERROR {msg}")
        self._log.error(msg)

    def emphatically(self, msg: str) -> None:
        banner = "*" * max(12, len(msg) + 8)
        for line in (banner, f"*** {msg} ***", banner):
            self.log(line)
