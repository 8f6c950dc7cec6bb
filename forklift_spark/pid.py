"""Single-instance lock via pidfile with liveness check.

Parity with the reference (`base/pid.rb:25-51`): a run refuses to start
while a live process holds the pidfile; a stale pidfile (dead pid) is
auto-cleared. Liveness uses os.kill(pid, 0) instead of shelling to `ps`.
"""

from __future__ import annotations

import os


class AlreadyRunning(RuntimeError):
    pass


class PidFile:
    def __init__(self, pid_dir: str):
        self.pid_dir = pid_dir
        self.path = os.path.join(pid_dir, "pidfile")

    def _read(self) -> int | None:
        try:
            with open(self.path) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    @staticmethod
    def _alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return False
        except PermissionError:
            return True
        return True

    def safe_to_run(self) -> bool:
        pid = self._read()
        if pid is None or pid == os.getpid():
            return True
        if self._alive(pid):
            return False
        os.remove(self.path)  # stale pidfile: holder is dead
        return True

    def store(self) -> None:
        if not self.safe_to_run():
            raise AlreadyRunning(f"pid {self._read()} holds {self.path}")
        os.makedirs(self.pid_dir, exist_ok=True)
        with open(self.path, "w") as f:
            f.write(str(os.getpid()))

    def release(self) -> None:
        if self._read() == os.getpid():
            os.remove(self.path)
