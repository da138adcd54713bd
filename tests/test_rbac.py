"""Roles / quotas / row policies (reference: src/Access/Role.h, Quota.h,
RowPolicy.h)."""
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.core.access import AccessDenied, QuotaExceeded


@pytest.fixture()
def s():
    sess = ch.connect()
    sess.execute("CREATE TABLE t (k Int64, owner String)")
    sess.execute("INSERT INTO t VALUES (1, 'alice'), (2, 'bob'), (3, 'alice')")
    return sess


class TestRoles:
    def test_role_grant_resolution(self, s):
        s.execute("CREATE USER u1")
        s.execute("CREATE ROLE reader")
        s.execute("GRANT select ON *.* TO reader")
        s.execute("GRANT reader TO u1")
        s.login("u1")
        assert s.execute("SELECT count() FROM t").scalar() == 3
        with pytest.raises(AccessDenied):
            s.execute("INSERT INTO t VALUES (9, 'x')")

    def test_nested_roles(self, s):
        s.execute("CREATE USER u2")
        s.execute("CREATE ROLE base")
        s.execute("CREATE ROLE derived")
        s.execute("GRANT select ON *.* TO base")
        s.execute("GRANT base TO derived")
        s.execute("GRANT derived TO u2")
        s.login("u2")
        assert s.execute("SELECT count() FROM t").scalar() == 3

    def test_drop_role_revokes(self, s):
        s.execute("CREATE USER u3")
        s.execute("CREATE ROLE r3")
        s.execute("GRANT select ON *.* TO r3")
        s.execute("GRANT r3 TO u3")
        s.execute("DROP ROLE r3")
        s.login("u3")
        with pytest.raises(AccessDenied):
            s.execute("SELECT count() FROM t")


class TestRowPolicies:
    def test_policy_filters_rows_per_user(self, s):
        s.execute("CREATE USER alice")
        s.execute("GRANT select ON *.* TO alice")
        s.execute("CREATE ROW POLICY ap ON t USING owner = 'alice' TO alice")
        assert s.execute("SELECT count() FROM t").scalar() == 3
        s.login("alice")
        assert s.execute("SELECT count() FROM t").scalar() == 2
        assert [r[0] for r in
                s.execute("SELECT k FROM t ORDER BY k").rows()] == [1, 3]
        s.login("default")
        assert s.execute("SELECT count() FROM t").scalar() == 3

    def test_policy_applies_in_joins(self, s):
        s.execute("CREATE USER bob")
        s.execute("GRANT select ON *.* TO bob")
        s.execute("CREATE ROW POLICY bp ON t USING owner = 'bob' TO bob")
        s.execute("CREATE TABLE d (k Int64)")
        s.execute("INSERT INTO d VALUES (1), (2), (3)")
        s.login("bob")
        assert s.execute("SELECT count() FROM t INNER JOIN d "
                         "ON t.k = d.k").scalar() == 1

    def test_drop_policy(self, s):
        s.execute("CREATE USER carol")
        s.execute("GRANT select ON *.* TO carol")
        s.execute("CREATE ROW POLICY cp ON t USING k = 1 TO carol")
        s.execute("DROP ROW POLICY cp ON t")
        s.login("carol")
        assert s.execute("SELECT count() FROM t").scalar() == 3


class TestQuotas:
    def test_max_queries_window(self, s):
        s.execute("CREATE USER q1u")
        s.execute("GRANT select ON *.* TO q1u")
        s.execute("CREATE QUOTA q1 FOR INTERVAL 1 hour MAX queries = 2 "
                  "TO q1u")
        s.login("q1u")
        s.execute("SELECT 1")
        s.execute("SELECT 2")
        with pytest.raises(QuotaExceeded):
            s.execute("SELECT 3")
        s.login("default")          # other users unaffected
        s.execute("SELECT 4")

    def test_quota_window_reset(self, s):
        s.execute("CREATE USER q2u")
        s.execute("GRANT select ON *.* TO q2u")
        s.execute("CREATE QUOTA q2 FOR INTERVAL 1 second MAX queries = 1 "
                  "TO q2u")
        s.login("q2u")
        s.execute("SELECT 1")
        with pytest.raises(QuotaExceeded):
            s.execute("SELECT 2")
        import time
        time.sleep(1.1)
        s.execute("SELECT 3")       # new window
