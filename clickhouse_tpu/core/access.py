"""Minimal access control (reference: src/Access/ RBAC, 25k LoC — this is
the round-1 skeleton: users, password check, coarse grants, readonly)."""
from __future__ import annotations

import dataclasses
import hashlib
from typing import Dict, Optional, Set, Tuple

from .errors import AnalysisError

__all__ = ["User", "AccessControl", "AccessDenied"]

PRIVILEGES = {"select", "insert", "create", "drop", "alter", "all"}


class AccessDenied(AnalysisError):
    code = 497  # ACCESS_DENIED


@dataclasses.dataclass
class User:
    name: str
    password_sha256: Optional[str] = None
    # privilege -> set of "db.table" patterns ("*.*", "db.*", "db.t")
    grants: Dict[str, Set[str]] = dataclasses.field(default_factory=dict)
    readonly: bool = False


class AccessControl:
    def __init__(self):
        default = User("default")
        default.grants["all"] = {"*.*"}
        self.users: Dict[str, User] = {"default": default}

    def create_user(self, name: str, password: Optional[str] = None,
                    if_not_exists: bool = False):
        if name in self.users:
            if if_not_exists:
                return
            raise AnalysisError(f"User '{name}' already exists")
        sha = hashlib.sha256(password.encode()).hexdigest() \
            if password else None
        self.users[name] = User(name, sha)

    def drop_user(self, name: str, if_exists: bool = False):
        if name == "default":
            raise AnalysisError("Cannot drop the default user")
        if name not in self.users:
            if if_exists:
                return
            raise AnalysisError(f"Unknown user '{name}'")
        del self.users[name]

    def authenticate(self, name: str, password: str = "") -> User:
        u = self.users.get(name)
        if u is None:
            raise AccessDenied(f"Unknown user '{name}'")
        if u.password_sha256 is not None:
            if hashlib.sha256(password.encode()).hexdigest() \
                    != u.password_sha256:
                raise AccessDenied(f"Wrong password for user '{name}'")
        return u

    def grant(self, user: str, privilege: str, target: str):
        priv = privilege.lower()
        if priv not in PRIVILEGES:
            raise AnalysisError(f"Unknown privilege '{privilege}'")
        u = self.users.get(user)
        if u is None:
            raise AnalysisError(f"Unknown user '{user}'")
        u.grants.setdefault(priv, set()).add(target)

    def revoke(self, user: str, privilege: str, target: str):
        u = self.users.get(user)
        if u is None:
            raise AnalysisError(f"Unknown user '{user}'")
        u.grants.get(privilege.lower(), set()).discard(target)

    def check(self, user: User, privilege: str, db: str, table: str = "*"):
        priv = privilege.lower()
        for p in (priv, "all"):
            pats = user.grants.get(p, set())
            for pat in pats:
                pdb, _, pt = pat.partition(".")
                if pdb in ("*", db) and pt in ("*", table):
                    return
        raise AccessDenied(
            f"user '{user.name}' lacks {privilege.upper()} on {db}.{table}")
