"""Server configuration files.

Analog of the reference's ConfigProcessor (src/Common/Config/
ConfigProcessor.h:37): YAML or XML server config declaring default query
settings (profiles), users, named disks, the durable data path, the
coordination address, and listener ports.  `apply_config` is idempotent so
re-invoking it on a live session is the hot-reload path
(SYSTEM RELOAD CONFIG).

YAML shape (XML with the same element names is accepted too):

    path: /var/lib/chtpu              # durable catalog root
    keeper: 127.0.0.1:9181            # networked coordination ("" = local)
    tcp_port: 9000
    http_port: 8123
    listen_host: 0.0.0.0
    profiles:
      default: {max_groups: 4194304, max_memory_usage: 0}
    users:
      alice: {password: secret, readonly: 1}
    disks:
      backups: {type: local, path: /backups}
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

from .errors import EngineError

__all__ = ["load_config", "apply_config", "reload_config"]


def _xml_to_dict(elem) -> Any:
    kids = list(elem)
    if not kids:
        text = (elem.text or "").strip()
        return text
    out: Dict[str, Any] = {}
    for k in kids:
        v = _xml_to_dict(k)
        if k.tag in out:                  # repeated tags -> list
            if not isinstance(out[k.tag], list):
                out[k.tag] = [out[k.tag]]
            out[k.tag].append(v)
        else:
            out[k.tag] = v
    return out


def load_config(path: str) -> Dict[str, Any]:
    if not os.path.exists(path):
        raise EngineError(f"Config file '{path}' not found")
    text = open(path).read()
    if path.endswith((".xml",)):
        import xml.etree.ElementTree as ET
        root = ET.fromstring(text)
        cfg = _xml_to_dict(root)
        return cfg if isinstance(cfg, dict) else {}
    import yaml
    cfg = yaml.safe_load(text) or {}
    # the reference wraps everything in <clickhouse>; tolerate that in YAML
    if set(cfg.keys()) == {"clickhouse"}:
        cfg = cfg["clickhouse"]
    return cfg


def apply_config(session, cfg: Dict[str, Any]) -> None:
    """Apply a parsed config to a session (idempotent = hot reload)."""
    # -- default settings profile ------------------------------------------
    profile = {}
    profiles = cfg.get("profiles") or {}
    if isinstance(profiles, dict):
        profile.update(profiles.get("default") or {})
    profile.update(cfg.get("settings") or {})
    if cfg.get("keeper"):
        profile["keeper_address"] = str(cfg["keeper"])
    if profile:
        session.settings = session.settings.copy_with(
            {k: v for k, v in profile.items()})

    # -- macros (<macros> analog; getMacro() + {replica}/{shard} DDL) ------
    macros = cfg.get("macros")
    if isinstance(macros, dict):
        session.macros = {str(k): str(v) for k, v in macros.items()}

    # -- interserver credentials (shared secret for part exchange; the
    # reference's <interserver_http_credentials>) ---------------------------
    ic = cfg.get("interserver_credentials") or cfg.get(
        "interserver_http_credentials")
    if ic:
        if isinstance(ic, dict):     # {user, password} like the reference
            ic = f"{ic.get('user', '')}:{ic.get('password', '')}"
        session.interserver_secret = str(ic)

    # -- durable catalog -----------------------------------------------------
    data_path = cfg.get("path") or cfg.get("data_path")
    if data_path:
        from ..storage.disks import DiskRegistry, LocalDisk
        disk = LocalDisk("default", str(data_path))
        if session.catalog.disks is None:
            session.catalog.disks = DiskRegistry()
        session.catalog.disks.register(disk)
        if session.catalog.store is None:
            session.catalog.enable_persistence(disk)

    # -- named disks -----------------------------------------------------------
    disks = cfg.get("disks") or {}
    if isinstance(disks, dict) and disks:
        from ..storage.disks import (DiskRegistry, LocalDisk,
                                     LocalObjectStorage, ObjectStorageDisk)
        if session.catalog.disks is None:
            session.catalog.disks = DiskRegistry()
        for name, spec in disks.items():
            spec = spec or {}
            kind = str(spec.get("type", "local"))
            root = str(spec.get("path", name))
            if kind == "s3":
                # S3-backed disk (ref: src/Disks/ObjectStorages/S3/):
                # endpoint + bucket + SigV4 credentials
                from ..storage.s3 import S3ObjectStorage
                store = S3ObjectStorage(
                    str(spec.get("endpoint", "")),
                    str(spec.get("bucket", name)),
                    access_key_id=str(spec.get("access_key_id", "")),
                    secret_access_key=str(
                        spec.get("secret_access_key", "")),
                    region=str(spec.get("region", "us-east-1")),
                    prefix=str(spec.get("prefix", "")))
                session.catalog.disks.register(
                    ObjectStorageDisk(name, store))
            elif kind == "object_storage":
                session.catalog.disks.register(
                    ObjectStorageDisk(name, LocalObjectStorage(root)))
            else:
                session.catalog.disks.register(LocalDisk(name, root))

    # -- users -----------------------------------------------------------------
    users = cfg.get("users") or {}
    if isinstance(users, dict):
        acc = session.catalog.access
        for name, spec in users.items():
            spec = spec or {}
            if name not in acc.users:
                acc.create_user(name, str(spec.get("password", "")),
                                if_not_exists=True)
            grants = spec.get("grants") or []
            if isinstance(grants, str):
                grants = [grants]
            for g in grants:
                acc.grant(name, str(g).lower(), "*")


def reload_config(session, path: str) -> None:
    apply_config(session, load_config(path))


def listener_ports(cfg: Dict[str, Any]):
    """(host, tcp_port, http_port) with reference defaults."""
    host = str(cfg.get("listen_host", "127.0.0.1"))
    return (host, int(cfg.get("tcp_port", 9000)),
            int(cfg.get("http_port", 8123)))
