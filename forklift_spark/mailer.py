"""Run-report email (O7 parity).

Reference: `lib/forklift/base/mailer.rb:25-66` — Pony/SMTP mail with
defaults, an ERB template variant, and the run log attached as
`log.txt` (`base/mailer.rb:46-48`). Here: stdlib ``smtplib`` +
``string.Template`` ($var substitution instead of ERB), with the
transport injectable so tests (and dry runs) never need a live SMTP
server — the reference's `email_spec` interception strategy
(`spec/unit/misc/email_spec.rb:9-31`) without the gem.
"""

from __future__ import annotations

import smtplib
from email.message import EmailMessage
from string import Template
from typing import Any, Callable

DEFAULTS = {
    "via": "smtp",
    "host": "localhost",
    "port": 25,
    "from": "forklift_spark",
    "subject": "forklift_spark run report",
}


class Mailer:
    """``send(args, attachment_lines)`` / ``send_template(...)``.

    config keys: host, port, from, subject plus anything in DEFAULTS;
    ``transport`` may be a callable ``(EmailMessage) -> None`` replacing
    SMTP delivery (tests, dry-run, alternate backends).
    """

    def __init__(
        self,
        config: dict[str, Any] | None = None,
        logger=None,
        transport: Callable[[EmailMessage], None] | None = None,
    ):
        self.config = {**DEFAULTS, **(config or {})}
        self.logger = logger
        self.transport = transport

    # -- public API (mailer.rb:33-44) --------------------------------------
    def send(self, args: dict[str, Any], attachment_lines: list[str] | None = None) -> EmailMessage:
        msg = self._build(args, body=args.get("body", ""), attachment_lines=attachment_lines)
        self._deliver(msg)
        return msg

    def send_template(
        self,
        args: dict[str, Any],
        template: str,
        variables: dict[str, Any],
        attachment_lines: list[str] | None = None,
    ) -> EmailMessage:
        """Template is a FILE PATH to a ``string.Template`` body ($name
        placeholders) — the ERB-template-file parity path
        (`base/mailer.rb:50-55`, `template/email.erb`). An inline
        template string still works when the path doesn't resolve
        (back-compat). A default template ships at
        ``forklift_spark/templates/email.txt``."""
        import os

        text = template
        if os.path.isfile(template):
            with open(template, encoding="utf-8") as fh:
                text = fh.read()
        body = Template(text).safe_substitute({k: str(v) for k, v in variables.items()})
        msg = self._build(args, body=body, attachment_lines=attachment_lines)
        self._deliver(msg)
        return msg

    # -- internals ----------------------------------------------------------
    def _build(
        self, args: dict[str, Any], body: str, attachment_lines: list[str] | None
    ) -> EmailMessage:
        msg = EmailMessage()
        msg["From"] = args.get("from", self.config["from"])
        msg["To"] = args["to"]
        msg["Subject"] = args.get("subject", self.config["subject"])
        msg.set_content(body)
        if attachment_lines:
            # run log attached as log.txt (mailer.rb:46-48)
            msg.add_attachment(
                "\n".join(attachment_lines).encode("utf-8"),
                maintype="text",
                subtype="plain",
                filename="log.txt",
            )
        return msg

    def _deliver(self, msg: EmailMessage) -> None:
        if self.logger:
            self.logger.log(f"[email] to={msg['To']} subject={msg['Subject']!r}")
        if self.transport is not None:
            self.transport(msg)
            return
        with smtplib.SMTP(self.config["host"], int(self.config["port"])) as smtp:
            smtp.send_message(msg)
