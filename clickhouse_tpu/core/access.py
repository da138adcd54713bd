"""Access control (reference: src/Access/ RBAC).

Users + password auth + coarse grants (round 1), extended with the
reference's remaining RBAC surface:

  * roles        -- named grant bundles, grantable to users and other roles
                    (src/Access/Role.h); check() resolves transitively
  * quotas       -- windowed resource limits per user
                    (src/Access/Quota.h: queries / result_rows per interval)
  * row policies -- per-table USING predicates injected into every scan for
                    matching users (src/Access/RowPolicy.h)
"""
from __future__ import annotations

import dataclasses
import hashlib
from typing import Dict, Optional, Set, Tuple

from .errors import AnalysisError

__all__ = ["User", "Role", "Quota", "RowPolicy", "AccessControl",
           "AccessDenied", "QuotaExceeded"]

PRIVILEGES = {"select", "insert", "create", "drop", "alter", "all"}


class AccessDenied(AnalysisError):
    code = 497  # ACCESS_DENIED


class QuotaExceeded(AnalysisError):
    code = 201  # QUOTA_EXceeded


@dataclasses.dataclass
class User:
    name: str
    password_sha256: Optional[str] = None
    # privilege -> set of "db.table" patterns ("*.*", "db.*", "db.t")
    grants: Dict[str, Set[str]] = dataclasses.field(default_factory=dict)
    readonly: bool = False
    roles: Set[str] = dataclasses.field(default_factory=set)


@dataclasses.dataclass
class Role:
    name: str
    grants: Dict[str, Set[str]] = dataclasses.field(default_factory=dict)
    roles: Set[str] = dataclasses.field(default_factory=set)  # nested


@dataclasses.dataclass
class Quota:
    name: str
    duration_s: int = 3600
    max_queries: Optional[int] = None
    max_result_rows: Optional[int] = None
    users: Set[str] = dataclasses.field(default_factory=set)  # empty = all


@dataclasses.dataclass
class RowPolicy:
    name: str
    database: str
    table: str
    using_text: str                      # predicate SQL text
    users: Set[str] = dataclasses.field(default_factory=set)  # empty = all


class AccessControl:
    def __init__(self):
        default = User("default")
        default.grants["all"] = {"*.*"}
        self.users: Dict[str, User] = {"default": default}
        self.roles: Dict[str, Role] = {}
        self.quotas: Dict[str, Quota] = {}
        self.row_policies: Dict[str, RowPolicy] = {}
        # quota usage: (quota, user) -> [window_start, queries, result_rows]
        self._quota_usage: Dict[Tuple[str, str], list] = {}

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
            if privilege in self.roles:   # GRANT <role> TO <user/role>
                return self.grant_role(user, privilege)
            raise AnalysisError(f"Unknown privilege '{privilege}'")
        obj = self.users.get(user) or self.roles.get(user)
        if obj is None:
            raise AnalysisError(f"Unknown user or role '{user}'")
        obj.grants.setdefault(priv, set()).add(target)

    def revoke(self, user: str, privilege: str, target: str):
        obj = self.users.get(user) or self.roles.get(user)
        if obj is None:
            raise AnalysisError(f"Unknown user or role '{user}'")
        if privilege in self.roles:
            obj.roles.discard(privilege)
            return
        obj.grants.get(privilege.lower(), set()).discard(target)

    # -- roles ---------------------------------------------------------------
    def create_role(self, name: str, if_not_exists: bool = False):
        if name in self.roles:
            if if_not_exists:
                return
            raise AnalysisError(f"Role '{name}' already exists")
        self.roles[name] = Role(name)

    def drop_role(self, name: str, if_exists: bool = False):
        if name not in self.roles:
            if if_exists:
                return
            raise AnalysisError(f"Unknown role '{name}'")
        del self.roles[name]
        for u in self.users.values():
            u.roles.discard(name)
        for r in self.roles.values():
            r.roles.discard(name)

    def grant_role(self, grantee: str, role: str):
        if role not in self.roles:
            raise AnalysisError(f"Unknown role '{role}'")
        obj = self.users.get(grantee) or self.roles.get(grantee)
        if obj is None:
            raise AnalysisError(f"Unknown user or role '{grantee}'")
        obj.roles.add(role)

    def _effective_grants(self, user: User) -> Dict[str, Set[str]]:
        out: Dict[str, Set[str]] = {}
        seen: Set[str] = set()

        def add(grants: Dict[str, Set[str]]):
            for k, v in grants.items():
                out.setdefault(k, set()).update(v)

        def walk(role_names):
            for rn in role_names:
                if rn in seen:
                    continue
                seen.add(rn)
                r = self.roles.get(rn)
                if r is not None:
                    add(r.grants)
                    walk(r.roles)

        add(user.grants)
        walk(user.roles)
        return out

    # -- quotas --------------------------------------------------------------
    def create_quota(self, q: Quota, if_not_exists: bool = False):
        if q.name in self.quotas and not if_not_exists:
            raise AnalysisError(f"Quota '{q.name}' already exists")
        self.quotas.setdefault(q.name, q)

    def drop_quota(self, name: str, if_exists: bool = False):
        if name not in self.quotas and not if_exists:
            raise AnalysisError(f"Unknown quota '{name}'")
        self.quotas.pop(name, None)

    def check_quota(self, user: User, now: float) -> None:
        """Raise QuotaExceeded if another query would break a limit."""
        for q in self.quotas.values():
            if q.users and user.name not in q.users:
                continue
            key = (q.name, user.name)
            st = self._quota_usage.setdefault(key, [now, 0, 0])
            if now - st[0] >= q.duration_s:
                st[0], st[1], st[2] = now, 0, 0
            if q.max_queries is not None and st[1] >= q.max_queries:
                raise QuotaExceeded(
                    f"Quota '{q.name}' exceeded for user '{user.name}': "
                    f"{st[1]} queries in the current {q.duration_s}s window")
            if q.max_result_rows is not None \
                    and st[2] > q.max_result_rows:
                raise QuotaExceeded(
                    f"Quota '{q.name}' exceeded for user '{user.name}': "
                    f"{st[2]} result rows in the current window")

    def account_query(self, user: User, now: float, result_rows: int = 0):
        for q in self.quotas.values():
            if q.users and user.name not in q.users:
                continue
            st = self._quota_usage.setdefault((q.name, user.name),
                                              [now, 0, 0])
            st[1] += 1
            st[2] += result_rows

    # -- row policies --------------------------------------------------------
    def create_row_policy(self, p: RowPolicy, if_not_exists: bool = False):
        if p.name in self.row_policies and not if_not_exists:
            raise AnalysisError(f"Row policy '{p.name}' already exists")
        self.row_policies.setdefault(p.name, p)

    def drop_row_policy(self, name: str, if_exists: bool = False):
        if name not in self.row_policies and not if_exists:
            raise AnalysisError(f"Unknown row policy '{name}'")
        self.row_policies.pop(name, None)

    def policies_for(self, user_name: str, db: str, table: str):
        out = []
        for p in self.row_policies.values():
            if p.database in ("*", db) and p.table in ("*", table) \
                    and (not p.users or user_name in p.users):
                out.append(p)
        return out

    def check(self, user: User, privilege: str, db: str, table: str = "*"):
        priv = privilege.lower()
        grants = self._effective_grants(user)
        for p in (priv, "all"):
            pats = grants.get(p, set())
            for pat in pats:
                pdb, _, pt = pat.partition(".")
                if pdb in ("*", db) and pt in ("*", table):
                    return
        raise AccessDenied(
            f"user '{user.name}' lacks {privilege.upper()} on {db}.{table}")
