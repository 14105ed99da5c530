"""Org-scoped secrets service.

Behavioral spec: `/root/reference/patterns/cli/services/secrets.py`
(create_secret(org, name, value, description, sensitive) + paginated
listing against the hosted org-secrets endpoint). Locally the store is one
0600 JSON file per organization under the devkit home; listings mask
sensitive values the way the hosted UI does.

Secrets are FUNCTIONAL, not just CRUD: a node parameter whose value is
``secret://<name>`` resolves through this service at bind time
(node/params.py), the local analogue of the server injecting org secrets
into graph parameters.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

from basis_devkit_spark.cli_config import devkit_home, resolve_organization

_NAME_RE = re.compile(r"^[A-Za-z0-9_.-]{1,128}$")
MASK = "••••••"


def _org(organization: str | None) -> str:
    """Full multi-org resolution (cli_config.resolve_organization):
    explicit → configured default → sole known org (adopted+persisted)."""
    return resolve_organization(organization)


def _secrets_path(organization: str) -> Path:
    return devkit_home() / "secrets" / f"{organization}.json"


def _read(organization: str) -> dict[str, dict]:
    p = _secrets_path(organization)
    if p.exists():
        return json.loads(p.read_text())
    return {}


def _write(organization: str, data: dict[str, dict]) -> None:
    p = _secrets_path(organization)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(data, indent=2))
    os.chmod(p, 0o600)


def create_secret(
    name: str,
    value,
    description: str = "",
    sensitive: bool = False,
    organization: str | None = None,
    type: str | None = None,
) -> dict:
    """Create or replace a secret (the hosted endpoint upserts by name).

    ``value`` keeps its JSON type (str/int/float/bool) through resolution —
    a ``secret://`` ref in a SQL-node parameter renders as a literal of
    that type, so e.g. an int secret works in a LIMIT clause. ``type``
    coerces a string value at create time (the CLI path)."""
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid secret name: {name!r}")
    if type and type != "str":
        coerce = {"int": int, "float": float}.get(type)
        if coerce:
            value = coerce(value)
        elif type == "bool":
            value = str(value).strip().lower() in ("1", "true", "yes", "on")
        else:
            raise ValueError(f"unknown secret type {type!r}")
    org = _org(organization)
    data = _read(org)
    data[name] = {
        "name": name,
        "value": value,
        "description": description,
        "sensitive": bool(sensitive),
    }
    _write(org, data)
    return {k: v for k, v in data[name].items() if k != "value"}


def list_secrets(
    organization: str | None = None, reveal: bool = False
) -> list[dict]:
    """Secrets sorted by name; sensitive values masked unless ``reveal``."""
    org = _org(organization)
    out = []
    for name in sorted(_read(org)):
        s = dict(_read(org)[name])
        if s["sensitive"] and not reveal:
            s["value"] = MASK
        out.append(s)
    return out


def delete_secret(name: str, organization: str | None = None) -> bool:
    org = _org(organization)
    data = _read(org)
    if name not in data:
        return False
    del data[name]
    _write(org, data)
    return True


def resolve_secret(name: str, organization: str | None = None):
    org = _org(organization)
    data = _read(org)
    if name not in data:
        raise KeyError(f"no secret {name!r} in organization {org!r}")
    return data[name]["value"]


SECRET_REF_PREFIX = "secret://"


def maybe_resolve_ref(value):
    """Resolve ``secret://name`` string values; pass everything else through."""
    if isinstance(value, str) and value.startswith(SECRET_REF_PREFIX):
        return resolve_secret(value[len(SECRET_REF_PREFIX) :])
    return value
