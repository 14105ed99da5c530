"""Devkit CLI config: profile, default organization, local auth token.

Behavioral spec: `/root/reference/patterns/cli/config.py` (config path
resolution via env var, JSON file, partial updates with an _UNCHANGED
sentinel). The reference authenticates against a hosted OAuth server
(`cli/services/login.py`) and stores the bearer token here; this engine is
local, so ``login`` issues an opaque local token and stores the profile —
the same config file contract without the network round-trip.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field, replace
from pathlib import Path

DEVKIT_CONFIG_ENV_VAR = "BASIS_DEVKIT_SPARK_CONFIG"
DEVKIT_HOME_ENV_VAR = "BASIS_DEVKIT_SPARK_HOME"
DEVKIT_CONFIG_NAME = "config.json"

_UNCHANGED = object()


@dataclass
class CliConfig:
    organization_id: str | None = None
    username: str | None = None
    email: str | None = None
    token: str | None = None
    extra: dict = field(default_factory=dict)

    @property
    def logged_in(self) -> bool:
        return self.token is not None


def devkit_home() -> Path:
    home = os.environ.get(DEVKIT_HOME_ENV_VAR)
    if home:
        return Path(home)
    return Path.home() / ".basis_devkit_spark"


def get_devkit_config_path() -> Path:
    path = os.environ.get(DEVKIT_CONFIG_ENV_VAR)
    if path:
        return Path(path)
    return devkit_home() / DEVKIT_CONFIG_NAME


def read_devkit_config() -> CliConfig:
    path = get_devkit_config_path()
    if path.exists():
        raw = json.loads(path.read_text())
        known = {k: raw.pop(k, None) for k in ("organization_id", "username", "email", "token")}
        return CliConfig(**known, extra=raw)  # unknown keys preserved (extra=ignore)
    return CliConfig()


def write_devkit_config(config: CliConfig) -> None:
    path = get_devkit_config_path()
    path.parent.mkdir(parents=True, exist_ok=True)
    data = asdict(config)
    data.update(data.pop("extra"))
    path.write_text(json.dumps(data, indent=2))
    os.chmod(path, 0o600)  # holds the auth token


def known_organizations() -> set[str]:
    """Every organization known locally — the configured default, orgs
    holding secrets, and registry publisher orgs (the local analogue of
    the hosted ``paginated_organizations()`` listing)."""
    import glob

    from basis_devkit_spark.graph.components import default_registry

    orgs: set[str] = set()
    cfg = read_devkit_config()
    if cfg.organization_id:
        orgs.add(cfg.organization_id)
    sdir = devkit_home() / "secrets"
    if sdir.is_dir():
        orgs.update(p.stem for p in sdir.glob("*.json"))
    for p in glob.glob(str(Path(default_registry()) / "*")):
        if Path(p).is_dir():
            orgs.add(Path(p).name)
    return orgs


def resolve_organization(explicit: str | None = None) -> str:
    """Resolution order of the reference's ``IdLookup.organization_uid``
    (cli/services/lookup.py:73-100): (1) an explicitly given org wins;
    (2) the configured default; (3) enumerate known orgs — exactly one →
    adopt it AND persist it as the default (the reference does the same
    ``update_devkit_config`` after resolving); several → the caller must
    choose (the reference prompts interactively; this CLI raises with the
    choices listed); none → error directing to ``login``."""
    if explicit:
        return explicit
    cfg = read_devkit_config()
    if cfg.organization_id:
        return cfg.organization_id
    orgs = sorted(known_organizations())
    if len(orgs) == 1:
        update_devkit_config(organization_id=orgs[0])
        return orgs[0]
    if orgs:
        raise ValueError(
            "multiple organizations available, pass -o/--organization: "
            + ", ".join(orgs)
        )
    raise ValueError("no organization: pass one or `login` first")


def update_devkit_config(
    organization_id=_UNCHANGED,
    username=_UNCHANGED,
    email=_UNCHANGED,
    token=_UNCHANGED,
) -> CliConfig:
    cfg = read_devkit_config()
    update = {
        k: v
        for k, v in (
            ("organization_id", organization_id),
            ("username", username),
            ("email", email),
            ("token", token),
        )
        if v is not _UNCHANGED
    }
    cfg = replace(cfg, **update)
    write_devkit_config(cfg)
    return cfg
