"""Plan/step orchestration (reference O2-O4, `plan.rb:58-141`).

- ``plan.step(name, error_handler=...)`` registers a named step; the
  default handler re-raises, a custom handler receives (name, exc) and
  may swallow to continue (`spec/unit/misc/error_spec.rb` semantics).
- ``plan.run(steps=...)``: no selection (or FORKLIFT_RUN_ALL_STEPS=true)
  runs all steps in registration order; otherwise only named steps run
  and an unknown name is an error. Steps run at-most-once per plan
  (`plan.rb:70-117` ``ran`` flag).
- The whole run is guarded by a single-instance pidfile lock
  (`base/pid.rb`) and bracketed by connect/disconnect + logging.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

from forklift_spark.engine import Engine
from forklift_spark.pid import PidFile


class UnknownStep(KeyError):
    pass


def _default_handler(name: str, exc: Exception) -> None:
    raise exc


class Step:
    def __init__(self, name: str, fn: Callable[[], Any], handler):
        self.name = name
        self.fn = fn
        self.handler = handler or _default_handler
        self.ran = False
        self.to_run = True


class Plan:
    def __init__(self, config: dict | None = None, engine: Engine | None = None):
        self.engine = engine or Engine(config)
        self.logger = self.engine.logger
        self.steps: dict[str, Step] = {}
        pid_dir = os.path.join(self.engine.project_root, "pids")
        self.pid = PidFile(pid_dir)

    # -- registration ------------------------------------------------------
    def step(
        self,
        name: str,
        error_handler: Callable[[str, Exception], None] | None = None,
    ):
        """Decorator/registrar: ``@plan.step("load")`` or
        ``plan.step("load")(fn)``."""

        def register(fn):
            self.steps[name] = Step(name, fn, error_handler)
            return fn

        return register

    # -- selection (O4) ----------------------------------------------------
    def _activate(self, selected: list[str] | None) -> None:
        run_all = not selected or os.environ.get(
            "FORKLIFT_RUN_ALL_STEPS", ""
        ).lower() in ("true", "1")
        if run_all:
            for s in self.steps.values():
                s.to_run = True
            return
        for s in self.steps.values():
            s.to_run = False
        for name in selected:
            if name not in self.steps:
                self.logger.error(f"unknown step {name!r}")
                raise UnknownStep(name)
            self.steps[name].to_run = True

    def _do_step(self, s: Step) -> None:
        if s.ran or not s.to_run:
            return
        self.logger.log(f"[step] {s.name} starting")
        try:
            s.fn()
            self.logger.log(f"[step] {s.name} done")
        except Exception as exc:
            self.logger.error(f"[step] {s.name} failed: {exc}")
            s.handler(s.name, exc)
        finally:
            s.ran = True  # at-most-once even on failure

    # -- run (O2 do!) ------------------------------------------------------
    def run(self, block: Callable[["Plan"], None] | None = None, steps: list[str] | None = None) -> None:
        self.logger.emphatically("forklift_spark starting")
        if not self.pid.safe_to_run():
            self.logger.error("another instance is running; exiting")
            raise SystemExit(1)
        self.pid.store()
        try:
            self.engine.connect_all()
            if block is not None:
                block(self)
            self._activate(steps)
            for s in self.steps.values():  # registration order
                self._do_step(s)
            self.logger.emphatically("forklift_spark completed")
        finally:
            self.pid.release()
            self.engine.disconnect_all()
