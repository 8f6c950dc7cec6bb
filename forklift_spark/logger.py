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
    def __init__(
        self,
        name: str = "forklift_spark",
        debug: bool = False,
        stdout: bool = True,
        file_path: str | None = None,
    ):
        self.messages: list[str] = []
        self._debug = debug
        self._log = logging.getLogger(name)
        self._log.setLevel(logging.DEBUG if debug else logging.INFO)
        fmt = logging.Formatter("[%(asctime)s] %(levelname)s: %(message)s")
        if stdout and not self._log.handlers:
            h = logging.StreamHandler(sys.stdout)
            h.setFormatter(fmt)
            self._log.addHandler(h)
        if file_path:
            # file log alongside stdout (`base/logger.rb:15-24` Lumberjack
            # file target); one handler per distinct path
            import os

            os.makedirs(os.path.dirname(file_path) or ".", exist_ok=True)
            have = {
                getattr(h, "baseFilename", None) for h in self._log.handlers
            }
            if os.path.abspath(file_path) not in have:
                fh = logging.FileHandler(file_path)
                fh.setFormatter(fmt)
                self._log.addHandler(fh)

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
