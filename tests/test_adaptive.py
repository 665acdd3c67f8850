"""Adaptive re-optimization: runtime join-strategy corrections (expansion
overflow / duplicate-key fallback, the HashTableBase kOutOfSpace retry analog)
are learned per plan shape, so repeated executions take the corrected
single-pass plan."""

from quickstep_tpu import Database


def _setup():
    db = Database()
    db.execute("CREATE TABLE probe (k INT NOT NULL, pv INT NOT NULL)")
    # runs > default K=8 on BOTH sides so either build orientation overflows
    db.execute("INSERT INTO probe VALUES " + ", ".join(
        f"({k}, {k * 100 + r})" for k in range(1, 9) for r in range(10)))
    db.execute("CREATE TABLE build (k INT NOT NULL, bv INT NOT NULL)")
    # key 3 appears 20 times: exceeds the default expansion K=8 -> overflow
    # flag -> retry with a larger K
    vals = [f"(3, {i})" for i in range(20)] + ["(1, 100)", "(2, 200)"]
    db.execute("INSERT INTO build VALUES " + ", ".join(vals))
    return db


def test_overflow_retry_is_learned():
    db = _setup()
    sql = ("SELECT p.k, COUNT(*) AS c FROM probe p, build b "
           "WHERE p.k = b.k GROUP BY p.k ORDER BY p.k")
    r1 = db.execute(sql)
    assert r1.rows == [(1, 10), (2, 10), (3, 200)]
    first_attempts = db.executor.last_attempts
    assert first_attempts >= 2          # overflow forced at least one retry
    assert db.executor._learned_overrides

    r2 = db.execute(sql)
    assert r2.rows == r1.rows
    assert db.executor.last_attempts == 1   # corrected plan on first pass

    # equivalent SQL text (different alias spelling) shares the learned plan
    sql2 = ("SELECT q.k, COUNT(*) AS c FROM probe q, build bb "
            "WHERE q.k = bb.k GROUP BY q.k ORDER BY q.k")
    r3 = db.execute(sql2)
    assert r3.rows == r1.rows
    assert db.executor.last_attempts == 1


def test_learning_reset_on_data_change():
    db = _setup()
    sql = ("SELECT p.k, COUNT(*) AS c FROM probe p, build b "
           "WHERE p.k = b.k GROUP BY p.k ORDER BY p.k")
    db.execute(sql)
    # data version bump invalidates the learned entry (keyed on versions);
    # results stay correct
    db.execute("INSERT INTO build VALUES (4, 1), (4, 2)")
    r = db.execute(sql)
    assert r.rows == [(1, 10), (2, 10), (3, 200), (4, 20)]


def test_conjunct_ordering_by_selectivity():
    """Plan-time conjunct ordering (LIPFilterAdaptiveProber.hpp:51 analog):
    AND conjuncts sort most-selective-first by the cost model."""
    import jax; jax.config.update("jax_platforms", "cpu")
    from quickstep_tpu import Database
    from quickstep_tpu.parser import parse_one
    from quickstep_tpu.optimizer.resolver import Resolver
    from quickstep_tpu.optimizer.rules import optimize_plan
    from quickstep_tpu.optimizer import logical as L
    from quickstep_tpu.expressions.scalar import Cmp, Logical

    db = Database()
    db.execute("CREATE TABLE t (a INT NOT NULL, b INT NOT NULL)")
    db.execute("INSERT INTO t VALUES " + ", ".join(
        f"({i % 1000}, {i % 3})" for i in range(2000)))
    db.execute("\\analyze")
    # a = 5 (sel ~1/1000) is more selective than b <> 2 (sel ~0.9)
    ast = parse_one("SELECT a FROM t WHERE b <> 2 AND a = 5")
    plan = optimize_plan(Resolver(db.catalog.default_database)
                         .resolve_select(ast),
                         db.config, db.catalog.default_database)

    filt = None

    def walk(n):
        nonlocal filt
        if isinstance(n, L.Filter):
            filt = n
        for c in n.children():
            walk(c)
    walk(plan)
    assert filt is not None and isinstance(filt.predicate, Logical)
    first = filt.predicate.operands[0]
    assert isinstance(first, Cmp) and first.op == "="
    assert db.execute("SELECT a FROM t WHERE b <> 2 AND a = 5").num_rows == 1


def test_learned_overrides_persist_with_store(tmp_path):
    """Learned overrides are written to the store (learned_overrides.json) so
    a FRESH process/instance runs the corrected plan on its first attempt —
    no re-paying the overflow retry (reference analog: making the
    ExecutionStats feedback durable)."""
    db = _setup()
    db.config.storage_path = str(tmp_path / "store")
    db.save()
    sql = ("SELECT p.k, COUNT(*) AS c FROM probe p, build b "
           "WHERE p.k = b.k GROUP BY p.k ORDER BY p.k")
    r1 = db.execute(sql)
    assert db.executor.last_attempts >= 2

    db2 = Database(storage_path=str(tmp_path / "store"))
    r2 = db2.execute(sql)
    assert r2.rows == r1.rows
    assert db2.executor.last_attempts == 1   # learned override loaded cold
