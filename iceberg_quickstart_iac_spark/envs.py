"""Environment profiles: dev / staging / prod separation (SURVEY §2 via
``docs/multi-environment.md``).

Parity target: the reference runs the SAME asset code against different
environments, with the environment decided entirely by configuration —
Terraform names every storage resource ``lakehouse-{environment}-lakehouse``
(``docs/multi-environment.md:57``: "Resource names include ${environment} …
so dev and prod never collide") and ships per-environment Dagster env files
(``dagster/.env.dev`` → admin access + alerting off, ``dagster/.env.prod``
→ reader access + alerting on).

Here the same contract produces an :class:`EnvProfile`: an env-keyed
warehouse root (the bucket-name convention mapped onto a path), the
environment's default access level and quality/alerting posture, and the
Iceberg catalog conf for that environment. ``staging`` is the one addition
beyond the reference's two files — its docs describe a three-tier rollout
(dev → staging → prod) and staging gets writer access with prod's gates on.

Profiles carry configuration only; all data-plane work stays in
:mod:`~iceberg_quickstart_iac_spark.pipeline`, which the convenience
methods below simply parameterize. Nothing here touches Spark.
"""

from __future__ import annotations

import os
from collections.abc import Mapping
from dataclasses import dataclass
from pathlib import Path

from iceberg_quickstart_iac_spark.tables.catalog_conf import spark_catalog_conf

#: environment → (default access level, alerting on, quality gate enforced)
_ENV_DEFAULTS: dict[str, tuple[str, bool, bool]] = {
    "dev": ("admin", False, False),
    "staging": ("writer", True, True),
    "prod": ("reader", True, True),
}


@dataclass(frozen=True)
class EnvProfile:
    """Resolved configuration for one environment."""

    name: str
    warehouse_root: Path
    access_level: str
    alerting_enabled: bool
    enforce_quality: bool
    backend: str

    @property
    def resource_prefix(self) -> str:
        """``lakehouse-{env}`` — the reference's Terraform naming scheme."""
        return f"lakehouse-{self.name}"

    def catalog_conf(self, env: Mapping[str, str] | None = None) -> dict[str, str]:
        """Spark conf for this environment's Iceberg catalog, with the
        warehouse pointed at the env-isolated root (local-hadoop backend)."""
        mapping = dict(env if env is not None else os.environ)
        if self.backend == "local-hadoop":
            mapping["LAKEHOUSE_WAREHOUSE"] = str(self.warehouse_root)
        return spark_catalog_conf(backend=self.backend, env=mapping)

    # -- pipeline conveniences: same entry points, env defaults applied --

    def materialize(self, spark, template: dict, **kwargs):
        from iceberg_quickstart_iac_spark.pipeline import materialize

        kwargs.setdefault("enforce_quality", self.enforce_quality)
        return materialize(spark, template, self.warehouse_root, **kwargs)

    def read_table(self, spark, template: dict, **kwargs):
        from iceberg_quickstart_iac_spark.pipeline import read_table

        kwargs.setdefault("access_level", self.access_level)
        return read_table(spark, template, self.warehouse_root, **kwargs)

    def alert(self, subject: str, message: str, **kwargs) -> list[str]:
        """Environment-gated alert fan-out: a no-op (empty channel list)
        where the profile disables alerting — the reference's dev env file
        simply leaves every channel unset, same observable behavior."""
        if not self.alerting_enabled:
            return []
        from iceberg_quickstart_iac_spark.governance.alerting import alert

        return alert(subject, message, **kwargs)


def load_env_profile(
    name: str | None = None,
    env: Mapping[str, str] | None = None,
    base_root: str | Path | None = None,
) -> EnvProfile:
    """Resolve the active environment profile.

    ``name`` defaults to ``$LAKEHOUSE_ENV`` then ``dev`` (the reference's
    local-first posture). Unknown environments are rejected — a typo must
    not silently invent a new isolated warehouse. Explicit env vars
    override the tier defaults: ``LAKEHOUSE_ACCESS_LEVEL`` (as in the
    reference's env files) and ``LAKEHOUSE_ALERTING`` (``on``/``off``).
    """
    mapping = env if env is not None else os.environ
    name = name or mapping.get("LAKEHOUSE_ENV", "dev")
    if name not in _ENV_DEFAULTS:
        raise ValueError(
            f"Unknown environment {name!r}; expected one of {sorted(_ENV_DEFAULTS)}"
        )
    access, alerting, quality = _ENV_DEFAULTS[name]
    access = mapping.get("LAKEHOUSE_ACCESS_LEVEL", access)
    if "LAKEHOUSE_ALERTING" in mapping:
        alerting = mapping["LAKEHOUSE_ALERTING"] == "on"
    base = Path(
        base_root
        or mapping.get("LAKEHOUSE_WAREHOUSE_BASE", "spark-warehouse/environments")
    )
    return EnvProfile(
        name=name,
        # one root per env, named like the reference's buckets: state under
        # lakehouse-dev-lakehouse can never collide with prod's
        warehouse_root=base / f"lakehouse-{name}-lakehouse",
        access_level=access,
        alerting_enabled=alerting,
        enforce_quality=quality,
        backend=mapping.get("LAKEHOUSE_BACKEND", "local-hadoop"),
    )
