"""Alert derivation + throttling (reference C19,
``monitoring/alerting.py:426-482``, throttle ``:212-250``).

Driver-side post-processing of collected metric/verdict rows — NOT a
Spark plan (the results tables are tiny).  Semantics mirrored:

- level: critical iff score >= critical_ratio * threshold (1.0),
  warning iff score >= warning_ratio * threshold (0.7), else suppressed
  (default_config.py:202-204).
- throttle: one alert per (column, detector, level) key per cooldown;
  critical alerts bypass at half the cooldown.

Delivery channels (email/Slack/webhook, alerting.py:252-424) are out of
engine scope; :meth:`AlertManager.derive` returns the alert records for
whatever notifier the deployment wires up.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta


@dataclass(frozen=True)
class Alert:
    level: str  # "warning" | "critical"
    detector_name: str
    column: str
    drift_score: float
    threshold: float
    timestamp: datetime
    message: str


def classify_level(
    score: float,
    threshold: float,
    warning_ratio: float = 0.7,
    critical_ratio: float = 1.0,
) -> str | None:
    if threshold <= 0:
        return None
    if score >= critical_ratio * threshold:
        return "critical"
    if score >= warning_ratio * threshold:
        return "warning"
    return None


@dataclass
class AlertManager:
    cooldown_minutes: float = 60.0
    warning_ratio: float = 0.7
    critical_ratio: float = 1.0
    _last_sent: dict[tuple, datetime] = field(default_factory=dict)

    # -- throttle-state persistence (streaming monitor restarts) --------
    #
    # The streaming monitor derives alerts per drained epoch; cooldown
    # must survive a monitor RESTART or the first epoch after every
    # restart re-alerts.  State is the (column, detector, level) ->
    # last-sent-ts map, JSON with ISO timestamps.

    def save_state(self, path: str) -> None:
        import json

        with open(path, "w") as f:
            json.dump(
                {"\x1f".join(map(str, k)): ts.isoformat() for k, ts in self._last_sent.items()},
                f,
            )

    def load_state(self, path: str) -> None:
        import json
        import os

        if not os.path.exists(path):
            return
        with open(path) as f:
            raw = json.load(f)
        self._last_sent = {
            tuple(k.split("\x1f")): datetime.fromisoformat(ts)
            for k, ts in raw.items()
        }

    def derive(self, metric_rows: list[dict], now: datetime | None = None) -> list[Alert]:
        """metric_rows: dicts with detector_name, column, drift_score,
        threshold, timestamp (FIXTURES metrics schema).  Returns alerts
        that survive classification + throttling, updating throttle
        state."""
        out: list[Alert] = []
        for r in metric_rows:
            ts = r.get("timestamp") or now or datetime.now()
            level = classify_level(
                r["drift_score"], r["threshold"], self.warning_ratio, self.critical_ratio
            )
            if level is None:
                continue
            key = (r.get("column"), r.get("detector_name"), level)
            cooldown = timedelta(minutes=self.cooldown_minutes)
            if level == "critical":
                cooldown = cooldown / 2  # critical bypass (alerting.py:236-244)
            last = self._last_sent.get(key)
            if last is not None and ts - last < cooldown:
                continue
            self._last_sent[key] = ts
            out.append(
                Alert(
                    level=level,
                    detector_name=r.get("detector_name", ""),
                    column=r.get("column", ""),
                    drift_score=float(r["drift_score"]),
                    threshold=float(r["threshold"]),
                    timestamp=ts,
                    message=(
                        f"{level.upper()}: {r.get('detector_name')} on "
                        f"{r.get('column')} score={r['drift_score']:.4f} "
                        f"threshold={r['threshold']:.4f}"
                    ),
                )
            )
        return out
