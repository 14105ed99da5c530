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
