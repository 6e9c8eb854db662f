"""Alert fan-out (SURVEY §2.11 G3).

Parity target: ``dagster/lakehouse/utils/alerting.py`` — dispatch to SNS
and/or a Slack webhook based on environment configuration, subject
truncated to 100 chars, failures logged but never raised (alerting must not
break the pipeline). Transports are injectable (and default to no-network
stubs here): a production deployment passes real boto3/requests senders.
"""

from __future__ import annotations

import json
import logging
import os
from collections.abc import Callable, Mapping

logger = logging.getLogger("lakehouse.alerting")

#: type of a transport: (destination, subject, message) -> None
Transport = Callable[[str, str, str], None]


def _log_transport(kind: str) -> Transport:
    def send(dest: str, subject: str, message: str) -> None:
        logger.info(json.dumps({"transport": kind, "dest": dest, "subject": subject, "message": message}))

    return send


def alert(
    subject: str,
    message: str,
    env: Mapping[str, str] | None = None,
    sns_transport: Transport | None = None,
    slack_transport: Transport | None = None,
) -> list[str]:
    """Send an alert to every configured channel; returns channels used.

    ``ALERT_SNS_TOPIC_ARN`` → SNS; ``ALERT_SLACK_WEBHOOK_URL`` → Slack.
    No channels configured → logged only. Transport errors are swallowed
    (logged) so a failing alert never fails the data pipeline.
    """
    env = env if env is not None else os.environ
    subject = subject[:100]
    sent: list[str] = []

    targets: list[tuple[str, str, Transport]] = []
    if env.get("ALERT_SNS_TOPIC_ARN"):
        targets.append(("sns", env["ALERT_SNS_TOPIC_ARN"], sns_transport or _log_transport("sns")))
    if env.get("ALERT_SLACK_WEBHOOK_URL"):
        targets.append(
            ("slack", env["ALERT_SLACK_WEBHOOK_URL"], slack_transport or _log_transport("slack"))
        )
    if not targets:
        logger.warning("No alert channels configured; alert logged only: %s — %s", subject, message)
        return sent

    for kind, dest, transport in targets:
        try:
            transport(dest, subject, message)
            sent.append(kind)
        except Exception:  # noqa: BLE001 — alerting must never break the pipeline
            logger.exception("Alert delivery via %s failed", kind)
    return sent
