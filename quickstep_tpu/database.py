"""Top-level Database facade: the embedded-engine public API.

The equivalent of the reference CLI's engine assembly (cli/QuickstepCli.cpp:159-420:
StorageManager + QueryProcessor + Foreman + workers), minus the REPL. Users (and the
CLI/REPL in cli/) construct a Database and call .query() / .execute().
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from quickstep_tpu.config import Config, DEFAULT
from quickstep_tpu.catalog import Catalog


class Database:
    def __init__(self, config: Optional[Config] = None, storage_path: Optional[str] = None):
        # Per-instance copy of the defaults: callers routinely tune
        # db.config after construction (bench.py, tests), and a shared
        # DEFAULT singleton would leak one instance's knobs (e.g. a tiny
        # hbm_budget_bytes forcing streamed execution) into every other
        # Database in the process — observed as silent wrong results.
        self.config = config if config is not None \
            else dataclasses.replace(DEFAULT)
        if storage_path is not None:
            self.config.storage_path = storage_path
        self.catalog = Catalog.load(self.config.storage_path) \
            if storage_path else Catalog()
        # Executor is constructed lazily to keep import cost low.
        self._executor = None
        if self.config.preload_buffer_pool:
            self.executor.preload()

    @property
    def executor(self):
        if self._executor is None:
            from quickstep_tpu.exec.executor import Executor
            self._executor = Executor(self.catalog, self.config)
        return self._executor

    @property
    def policy_enforcer(self):
        """Admission/fair-dispatch layer. EVERY query — embedded, REPL, or
        network — routes through it, matching the reference where the Foreman/
        PolicyEnforcer sees every AdmitRequestMessage
        (query_execution/PolicyEnforcerSingleNode.cpp:42-56)."""
        if getattr(self, "_enforcer", None) is None:
            from quickstep_tpu.exec.scheduler import PolicyEnforcer
            self._enforcer = PolicyEnforcer(
                self._execute_one,
                max_concurrent_queries=self.config.max_concurrent_queries,
                executor=self.executor)
        return self._enforcer

    def _execute_one(self, stmt):
        return self.executor.execute_statement(stmt)

    # ---- public API ----
    def execute(self, sql: str, session: str = "default",
                priority: Optional[int] = None):
        """Execute one or more SQL statements; returns the last statement's
        result. Statements are admitted through the PolicyEnforcer (concurrent
        callers get fair, priority-aware dispatch; a WITH PRIORITY clause on a
        SELECT overrides the call-level priority)."""
        from quickstep_tpu.parser import parse_statements
        result = None
        for stmt in parse_statements(sql):
            prio = getattr(stmt, "priority", None)
            if prio is None:
                prio = priority if priority is not None else 0
            result = self.policy_enforcer.submit(stmt, session=session,
                                                 priority=prio)
        return result

    def query(self, sql: str) -> List[tuple]:
        """Execute a single query and return rows as Python tuples."""
        res = self.execute(sql)
        return res.rows if res is not None and hasattr(res, "rows") else []

    def save(self) -> None:
        self.catalog.save(self.config.storage_path)
