"""Per-team multi-tenancy (SURVEY §2.11 extension; reference
``docs/multi-tenancy.md``).

The reference layers team-scoped access on the global role tiers: one YAML
per team mapping table → access level, with missing tables defaulting to
``none`` (``docs/multi-tenancy.md:41-100``). The level matrix
(``docs/multi-tenancy.md:103-110``):

- ``none``   — no reads, no writes;
- ``reader`` — SELECT on public columns only (restricted/PII excluded);
- ``writer`` — SELECT on ALL columns (including PII) + writes;
- ``admin``  — writer + ALTER (schema evolution).

There the matrix compiles to per-team IAM roles + Lake Formation
column-level grants; here it compiles to the same Spark-native enforcement
``access.py`` provides for the global tiers — a ``reader`` team's frame is
column-pruned BEFORE any action so restricted bytes never leave the scan,
and write/alter gates raise ``PermissionError`` up front. Enforcement is
driver-side metadata work: nothing here touches data, so the layer is free
at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame

from iceberg_quickstart_iac_spark.governance.access import (
    AccessLevel,
    read_with_access_level,
)
from iceberg_quickstart_iac_spark.governance.audit import log_audit_event

#: valid per-table levels, in increasing privilege order
ACCESS_ORDER = ("none", "reader", "writer", "admin")


@dataclass(frozen=True)
class Team:
    name: str
    description: str = ""
    tables: dict[str, str] = field(default_factory=dict)

    def access_for(self, table: str) -> str:
        """Effective level for a table — missing tables default to 'none'
        (``docs/multi-tenancy.md:46`` — "Missing tables default to none")."""
        return self.tables.get(table, "none")


def parse_team_yaml(text: str) -> Team:
    """Parse one ``teams/*.yaml`` file (reference format verbatim:
    ``name`` / ``description`` / ``tables: {table: level}``)."""
    import yaml

    doc = yaml.safe_load(text)
    if not isinstance(doc, dict) or "name" not in doc:
        raise ValueError("Team config must be a mapping with a 'name' key")
    tables = doc.get("tables") or {}
    if not isinstance(tables, dict):
        raise ValueError(f"'tables' must map table -> access level, got {tables!r}")
    for table, level in tables.items():
        if level not in ACCESS_ORDER:
            raise ValueError(
                f"Unknown access level {level!r} for table {table!r} "
                f"(expected one of {ACCESS_ORDER})"
            )
    return Team(
        name=str(doc["name"]),
        description=str(doc.get("description", "")),
        tables={str(t): str(v) for t, v in tables.items()},
    )


def load_teams(teams_dir: str | Path) -> dict[str, Team]:
    """Load every ``*.yaml`` under ``teams_dir`` (the fileset() analog,
    ``docs/multi-tenancy.md:122-127``)."""
    out: dict[str, Team] = {}
    for path in sorted(Path(teams_dir).glob("*.yaml")):
        team = parse_team_yaml(path.read_text())
        out[team.name] = team
    return out


def team_grants(teams: dict[str, Team]) -> list[dict]:
    """The flat {team, table, access} grant list (skipping ``none``) the
    reference builds for Terraform's for_each (``multi-tenancy.md:128-140``)
    — here the auditable source of truth for what was provisioned."""
    return [
        {"team": team.name, "table": table, "access": level}
        for team in teams.values()
        for table, level in sorted(team.tables.items())
        if level != "none"
    ]


def read_table_for_team(df: DataFrame, template: dict, team: Team) -> DataFrame:
    """Team-scoped read: 'none' denies, 'reader' excludes restricted
    columns (column-pruned out of the scan), 'writer'/'admin' see all."""
    table = template.get("name", "?")
    level = team.access_for(table)
    if level == "none":
        raise PermissionError(
            f"Team {team.name!r} has no access to table {table!r}"
        )
    if level == "reader":
        return read_with_access_level(df, template, AccessLevel.READER, table=table)
    log_audit_event(
        "table_read", table, details={"team": team.name, "access": level}
    )
    return df


def authorize_write(team: Team, table: str) -> None:
    """INSERT/DELETE gate: writer or admin only."""
    if team.access_for(table) not in ("writer", "admin"):
        raise PermissionError(
            f"Team {team.name!r} (level {team.access_for(table)!r}) "
            f"cannot write to table {table!r}"
        )


def authorize_alter(team: Team, table: str) -> None:
    """ALTER (schema evolution) gate: admin only."""
    if team.access_for(table) != "admin":
        raise PermissionError(
            f"Team {team.name!r} (level {team.access_for(table)!r}) "
            f"cannot alter table {table!r}"
        )
