"""The Executor: statement dispatch, whole-query compilation, materialization.

Role parity with the reference's QueryProcessor + ExecutionGenerator + Foreman driver
loop (query_optimizer/QueryProcessor.cpp:38 generateQueryHandle -> admit ->
ForemanSingleNode event loop): a SELECT is resolved to a logical plan, traced by
PlanRunner into one jitted XLA program (cached by structural plan fingerprint +
input capacities), run on device, and materialized/printed. DDL/DML execute host-side
against the catalog, mirroring CreateTableOperator / InsertOperator / UpdateOperator /
DeleteOperator / TextScanOperator / TableExportOperator / DropTableOperator.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quickstep_tpu.config import Config
from quickstep_tpu.errors import ExecutionError, ResolutionError, SqlError
from quickstep_tpu.catalog import (
    Catalog, CatalogAttribute, CatalogRelation, PartitionScheme,
)
from quickstep_tpu.parser import ast_nodes as A
from quickstep_tpu.types import Type, TypeID, TypeFactory
from quickstep_tpu.storage.column import Column, _decode_scalar
from quickstep_tpu.storage.table import TableData
from quickstep_tpu.storage import csv_io
from quickstep_tpu.optimizer import logical as L
from quickstep_tpu.optimizer.resolver import Resolver, Scope
from quickstep_tpu.optimizer.rules import optimize_plan
from quickstep_tpu.exec.chunk import Chunk
from quickstep_tpu.exec.runner import PlanRunner, JoinOverride
from quickstep_tpu.exec.result import QueryResult
from quickstep_tpu.ops import kernels as K
from quickstep_tpu.expressions.scalar import EvalContext, Lit


class Executor:
    def __init__(self, catalog: Catalog, config: Config):
        self.catalog = catalog
        self.config = config
        self._device_cache: Dict[Tuple[str, int], Tuple[dict, dict]] = {}
        self._compile_cache: Dict[tuple, object] = {}
        self._learned_overrides: Dict[tuple, Dict[int, JoinOverride]] = {}
        self.last_profile: Optional[dict] = None
        self.last_stream_info: Optional[dict] = None
        self.last_attempts = 0
        self._sort_programs: Dict[tuple, object] = {}
        # streamed-segment device cache (LRU under half the HBM budget):
        # (rel, version, col, seg, seg_rows) -> (data, valid, nbytes)
        from collections import OrderedDict
        self._seg_cache: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._seg_cache_bytes = 0
        self._seg_cache_hits = 0
        self._seg_cache_misses = 0
        # segment-boundary yield hook (PolicyEnforcer interleave): called
        # between streamed segments so other sessions' queries can run
        self.segment_yield = None
        # per-compiled-plan trace-time op counts (gather count = the unit of
        # join-path cost on TPU; surfaced by \explain_analyze)
        self._plan_op_stats: Dict[tuple, dict] = {}
        self.last_sort_path: Optional[str] = None
        # bound the per-plan caches: DML bumps table versions and strands old
        # entries, so long-lived multi-query sessions would otherwise leak
        # (dicts are insertion-ordered -> FIFO eviction of the oldest plan)
        self._plan_cache_limit = 256
        # Optimized-logical-plan cache (prepared-statement analog): repeated
        # SELECTs skip resolve+optimize entirely. Resolve embeds data-derived
        # state (dictionary LIKE bitmaps, SMA constant folds, stats-driven
        # join orders), so ANY mutating statement clears it via
        # _bump_catalog_epoch. Keyed by the stmt's structural repr plus the
        # planning-relevant config (measured: Q13's resolve+optimize was
        # 10x its device time per execution — VERDICT r5 #6).
        self._logical_plan_cache: Dict[str, object] = {}
        self.mesh = None
        from quickstep_tpu.storage.eviction import make_policy
        self._eviction = make_policy(config.eviction_policy,
                                     k=config.eviction_lru_k)
        if config.distributed:
            from quickstep_tpu.parallel.mesh import make_mesh
            if len(jax.devices()) > 1:
                self.mesh = make_mesh(axis=config.default_mesh_axis)
        # Learned join-strategy/capacity overrides persist with the store
        # (the ExecutionStats feedback made durable): a fresh process re-runs
        # a previously-corrected plan in one pass instead of re-paying the
        # failed-attempt retries — which also de-risks large-scale retries
        # whose first attempt can exhaust HBM.
        if config.storage_path:
            self._load_overrides()

    @property
    def _overrides_path(self):
        import os
        if not self.config.storage_path:
            return None
        return os.path.join(self.config.storage_path,
                            "learned_overrides.json")

    def _load_overrides(self):
        import ast, json, os
        if not self._overrides_path or \
                not os.path.exists(self._overrides_path):
            return
        try:
            with open(self._overrides_path) as f:
                raw = json.load(f)
            for key_repr, ovs in raw.items():
                key = ast.literal_eval(key_repr)
                self._learned_overrides[key] = {
                    int(nid): JoinOverride(**fields)
                    for nid, fields in ovs.items()}
        except Exception:
            pass  # stale/corrupt cache: regenerate by re-learning

    def _save_overrides(self):
        import json
        if not self._overrides_path:
            return
        try:
            raw = {repr(key): {str(nid): dataclasses.asdict(ov)
                               for nid, ov in ovs.items()}
                   for key, ovs in self._learned_overrides.items()}
            with open(self._overrides_path, "w") as f:
                json.dump(raw, f)
        except OSError:
            pass

    def _table_bytes(self, rel: CatalogRelation) -> int:
        total = 0
        for c in rel.data.columns.values():
            total += np.asarray(c.data).nbytes
            if c.valid is not None:
                total += np.asarray(c.valid).nbytes
        return total

    def _evict_for(self, incoming_key, need: int) -> None:
        """HBM buffer management (StorageManager::makeRoomForBlock +
        EvictionPolicy analog): keep resident device tables under the budget
        by dropping victims chosen by the configured policy (LRU-K default;
        re-faulted on next use). Residency is column-granular: an entry's cost
        is the bytes of the columns actually transferred."""
        budget = self.config.hbm_budget_bytes
        if not budget:
            return
        resident = {k: m.get("bytes", 0)
                    for k, (_, m) in self._device_cache.items()
                    if k != incoming_key}
        held = self._device_cache.get(incoming_key)
        held_bytes = held[1].get("bytes", 0) if held else 0
        while resident and sum(resident.values()) + held_bytes + need > budget:
            victim = self._eviction.choose_victim(resident)
            del self._device_cache[victim]
            self._eviction.block_evicted(victim)
            del resident[victim]

    def preload(self) -> None:
        """Warm the device cache for every relation (PreloaderThread analog,
        flag preload_buffer_pool)."""
        for rel in self.db.relations.values():
            self._device_table(rel, None)

    @property
    def db(self):
        return self.catalog.default_database

    # ================================================================
    # statement dispatch
    # ================================================================
    def execute_statement(self, stmt: A.Statement) -> QueryResult:
        t0 = time.perf_counter()
        # per-statement device dispatch counter (the wall/dev ratio scales
        # with dispatch count x tunnel RTT; printed by the bench per query)
        self.dispatches = 0
        if not isinstance(stmt, A.SelectStmt):
            # any DDL/DML/command invalidates cached plans (they embed
            # dictionary bitmaps, stats-chosen join orders, SMA folds;
            # \analyze changes stats, so commands clear too)
            self._logical_plan_cache.clear()
        if isinstance(stmt, A.SelectStmt):
            res = self._run_select(stmt)
        elif isinstance(stmt, A.CreateTableStmt):
            res = self._create_table(stmt)
        elif isinstance(stmt, A.CreateIndexStmt):
            res = self._create_index(stmt)
        elif isinstance(stmt, A.DropTableStmt):
            self.db.drop_relation(stmt.name)
            res = QueryResult([], [], [], message=f"Table {stmt.name} dropped.")
        elif isinstance(stmt, A.InsertStmt):
            res = self._insert(stmt)
        elif isinstance(stmt, A.UpdateStmt):
            res = self._update(stmt)
        elif isinstance(stmt, A.DeleteStmt):
            res = self._delete(stmt)
        elif isinstance(stmt, A.CopyStmt):
            res = self._copy(stmt)
        elif isinstance(stmt, A.CommandStmt):
            res = self._command(stmt)
        else:
            raise ExecutionError(f"unsupported statement {type(stmt).__name__}")
        res.execution_time = time.perf_counter() - t0
        return res

    # ================================================================
    # SELECT
    # ================================================================
    def _run_select(self, stmt: A.SelectStmt) -> QueryResult:
        # Structural key: AST dataclass repr + planning-relevant config.
        # profile_device_reps is excluded (bench toggles it between runs and
        # it never reaches the planner).
        cfg = dataclasses.replace(self.config, profile_device_reps=0)
        key = f"{cfg!r}\x00{stmt!r}"
        plan = self._logical_plan_cache.get(key)
        if plan is None:
            resolver = Resolver(self.db)
            plan = resolver.resolve_select(stmt)
            plan = optimize_plan(plan, self.config, self.db)
            while len(self._logical_plan_cache) >= self._plan_cache_limit:
                self._logical_plan_cache.pop(
                    next(iter(self._logical_plan_cache)))
            self._logical_plan_cache[key] = plan
        rows, names, types = self.run_plan(plan)
        return QueryResult(names, types, rows)

    def run_plan(self, plan: L.LogicalNode):
        """Execute a logical plan; returns (rows, names, types)."""
        # Out-of-core: when the dominant table exceeds the HBM budget, stream
        # it segment-by-segment through the plan's aggregate prefix
        # (StorageManager buffer-pool analog; see exec/streaming.py).
        from quickstep_tpu.exec.streaming import plan_streaming
        self.last_stream_info = None
        sp = plan_streaming(plan, self.db, self.config, self.mesh)
        if sp is not None:
            return self._run_streamed(sp)
        if self.config.hbm_budget_bytes > 0 and self.mesh is None:
            # No streamable shape: either proceed resident (risking device
            # OOM) or fail loudly, per config — never fail silently later
            from quickstep_tpu.exec import streaming as S
            needed = S._needed_columns(plan)
            over = []
            for name, cols in needed.items():
                rel = self.db.get_relation(name)
                if rel is not None and rel.data is not None and \
                        S._table_bytes(rel, cols) > \
                        self.config.hbm_budget_bytes // 2:
                    over.append(name)
            if over and self.config.strict_hbm_budget:
                raise ExecutionError(
                    f"table(s) {', '.join(sorted(over))} exceed half the HBM "
                    f"budget ({self.config.hbm_budget_bytes} bytes) and the "
                    "plan has no streamable shape (the big table must be "
                    "reachable through Filter/Project/Distinct/probe-side "
                    "join edges and be scanned exactly once); raise "
                    "hbm_budget_bytes, set strict_hbm_budget=False to "
                    "attempt resident execution, or restructure the query")
        return self._run_plan_resident(plan)

    def _run_plan_resident(self, plan: L.LogicalNode):
        # Peel a root-level presentation Sort off the device plan: the result is
        # materialized to the host anyway, and encoded column values (dict codes,
        # packed dates) are order-preserving, so a stable numpy lexsort on the
        # host is exact — and avoids XLA:TPU's extremely expensive sort compiles
        # for every ad-hoc query shape.
        from quickstep_tpu.expressions.scalar import Attr as _Attr
        host_sort: Optional[L.Sort] = None
        device_plan = plan
        if isinstance(device_plan, L.Project) and \
                isinstance(device_plan.input, L.Sort) and \
                all(isinstance(e, _Attr) for e in device_plan.exprs):
            # trim-Project over Sort (hidden sort keys below)
            host_sort = device_plan.input
            final_attrs = device_plan.attrs
            trim_ids = [e.expr_id for e in device_plan.exprs]
            device_plan = device_plan.input.input
        elif isinstance(device_plan, L.Sort):
            host_sort = device_plan
            final_attrs = list(device_plan.output)
            trim_ids = [a.expr_id for a in final_attrs]
            device_plan = device_plan.input

        # Hoist uncorrelated scalar subqueries into their own compiled
        # programs and feed the scalars in as inputs — the reference
        # evaluates subquery expressions once ahead of the outer plan too
        # (query_optimizer/expressions/SubqueryExpression.hpp). Besides the
        # structural fit (the value is data-, not trace-dependent), fusing a
        # grouped aggregate pipeline and its HAVING subquery's join pipeline
        # into ONE program reproducibly SIGSEGVs the XLA:TPU compiler on
        # Q11's shape.
        sub_inputs = self._hoist_scalar_subqueries(device_plan)
        inputs, meta = self._collect_inputs(device_plan)
        if sub_inputs:
            inputs["__subqueries__"] = sub_inputs
        # Adaptive re-optimization (ExecutionStats-feedback analog): join
        # strategy corrections discovered at runtime (duplicate build keys,
        # expansion overflow) are remembered per plan shape + table versions,
        # so warm re-runs take the corrected single-pass plan instead of
        # re-paying the failed attempt every execution.
        learn_key = (_fingerprint(device_plan),
                     tuple(sorted((k, m["version"]) for k, m in meta.items())))
        overrides: Dict[int, JoinOverride] = {
            k: dataclasses.replace(v)
            for k, v in self._learned_overrides.get(learn_key, {}).items()}
        for _attempt in range(8):
            self.last_attempts = _attempt + 1
            try:
                outs, flags, out_attrs = self._compile_and_run(
                    device_plan, inputs, meta, overrides)
            except jax.errors.JaxRuntimeError as e:
                # Remote XLA:TPU AOT compiler crash fallback: certain
                # SF10-width uncompacted plan shapes reproducibly SIGSEGV
                # the tpu_compile_helper in this environment; a tighter
                # compaction cushion (2x) changes the fused shapes and is
                # known to compile. Install a PLAN-WIDE cushion override
                # (learned, so warm re-runs of this plan go straight to the
                # working shape; other plans keep their warmed programs).
                msg = str(e)
                prev = overrides.get(-1) or JoinOverride()
                if "remote_compile" not in msg and "SIGSEGV" not in msg:
                    raise
                if prev.compact_factor is None:
                    prev.compact_factor = 2.0        # rung 1
                elif prev.chain_depth is None:
                    prev.chain_depth = 99            # rung 2: uncapped chains
                else:
                    raise
                overrides[-1] = prev
                retry = True
            else:
                retry = self._check_flags(device_plan, flags, overrides)
            if not retry:
                # Materialization may compile the full-output overflow twin
                # (full_thunk) — also subject to the AOT compiler's
                # shape-specific crashes, so it lives INSIDE the fallback
                # loop: a crash here ladders the plan-wide override and
                # re-runs the whole plan (observed: Q2 SF10's twin).
                try:
                    if host_sort is None:
                        result = self._materialize(outs, out_attrs)
                    else:
                        result = self._materialize_sorted(
                            outs, out_attrs, host_sort, final_attrs,
                            trim_ids)
                except jax.errors.JaxRuntimeError as e:
                    msg = str(e)
                    prev = overrides.get(-1) or JoinOverride()
                    if "remote_compile" not in msg and "SIGSEGV" not in msg:
                        raise
                    if prev.compact_factor is None:
                        prev.compact_factor = 2.0
                    elif prev.chain_depth is None:
                        prev.chain_depth = 99
                    else:
                        raise
                    overrides[-1] = prev
                    retry = True
            if not retry:
                break
            while len(self._learned_overrides) >= self._plan_cache_limit:
                self._learned_overrides.pop(
                    next(iter(self._learned_overrides)))
            self._learned_overrides[learn_key] = {
                k: dataclasses.replace(v) for k, v in overrides.items()}
            self._save_overrides()
        else:
            raise ExecutionError("join fallback did not converge")

        return result

    def _hoist_scalar_subqueries(self, plan) -> Dict[str, tuple]:
        """Execute every uncorrelated scalar subquery under `plan` as its own
        program (recursively — a subquery's subqueries hoist first) and
        return {traversal position: (value, ok)} for the runner to bind
        without tracing the subplan into the outer program. Keyed by the
        deterministic enumeration shared with the runner
        (runner.iter_scalar_subplans), NOT id()."""
        from quickstep_tpu.exec.runner import iter_scalar_subplans
        out: Dict[str, tuple] = {}
        for i, sub in enumerate(iter_scalar_subplans(plan)):
            out[str(i)] = self._run_scalar_plan(sub)
        return out

    def _run_scalar_plan(self, sub):
        """(raw first-row value, present) of a scalar subquery plan — raw
        device encoding (dict codes / decimal units), exactly what the
        in-trace execution produced before hoisting."""
        nested = self._hoist_scalar_subqueries(sub)
        inputs, meta = self._collect_inputs(sub)
        if nested:
            inputs["__subqueries__"] = nested
        overrides: Dict[int, JoinOverride] = {}
        for _attempt in range(8):
            outs, flags, _attrs = self._compile_and_run(
                sub, inputs, meta, overrides)
            if not self._check_flags(sub, flags, overrides):
                break
        else:
            raise ExecutionError("subquery join fallback did not converge")
        _thunk, n, (ds, vs) = outs
        val = np.asarray(ds[0])[0]
        ok = bool(n > 0)
        if vs[0] is not None:
            ok = ok and bool(np.asarray(vs[0])[0])
        return (val, ok)

    # ----------------------------------------------------------------
    # out-of-core segment streaming (see exec/streaming.py)
    # ----------------------------------------------------------------
    def _run_streamed(self, sp):
        from quickstep_tpu.exec import streaming as S
        rel = self.db.get_relation(sp.big_table)
        n = rel.data.num_rows
        segcap = K.round_up(sp.seg_rows, 8)
        needed = S._needed_columns(sp.partial_plan)
        big_cols = sorted(needed[sp.big_table])

        # resident (build-side) tables: normal cached path
        res_inputs, res_meta = {}, {}
        for name, cols in needed.items():
            if name == sp.big_table:
                continue
            r = self.db.get_relation(name)
            c, m = self._device_table(r, cols)
            sub = {x: c[x] for x in cols}
            sub["__num_rows__"] = c["__num_rows__"]
            res_inputs[name], res_meta[name] = sub, m

        seg_meta = self._segment_meta(rel, big_cols, segcap)
        overrides: Dict[int, JoinOverride] = {}
        partial_np: List[List[np.ndarray]] = []   # per attr: list of segments
        partial_valid: List[List[Optional[np.ndarray]]] = []
        nattrs = len(sp.partial_attrs)
        partial_np = [[] for _ in range(nattrs)]
        partial_valid = [[] for _ in range(nattrs)]
        bytes_streamed = 0
        segments_run = 0
        prober = S.AdaptiveProber(len(sp.scan_filters))
        for seg in range(sp.n_segments):
            if self.segment_yield is not None:
                # multi-query interleave point: pending queries from other
                # sessions run between segments (WorkOrder-granular fairness,
                # PolicyEnforcerSingleNode.cpp:42-56)
                self.segment_yield()
            if not S.segment_survives(sp.scan_filters, sp.scan_attr_cols, rel,
                                      seg, sp.seg_rows, sp.n_segments,
                                      prober=prober):
                continue   # SMA skip: bytes never leave the host
            segments_run += 1
            seg_inputs, seg_bytes = self._segment_inputs(
                rel, big_cols, seg, sp.seg_rows, segcap)
            bytes_streamed += seg_bytes
            inputs = dict(res_inputs)
            inputs[sp.big_table] = seg_inputs
            meta = dict(res_meta)
            meta[sp.big_table] = seg_meta
            for _attempt in range(8):
                outs, flags, out_attrs = self._compile_and_run(
                    sp.partial_plan, inputs, meta, overrides)
                if not self._check_flags(sp.partial_plan, flags, overrides):
                    break
            else:
                raise ExecutionError("streamed join fallback did not converge")
            datas, valids, pn = self._pull_outputs(outs)
            for i in range(nattrs):
                partial_np[i].append(np.asarray(datas[i])[:pn])
                v = valids[i]
                partial_valid[i].append(
                    None if v is None else np.asarray(v)[:pn])

        # sort-only merge: host merge-sort of the streamed runs (the
        # external-sort path — no device program at full-table capacity)
        sorted_out = self._try_stream_sort(sp, partial_np, partial_valid)
        if sorted_out is not None:
            self.last_scan_bytes = bytes_streamed
            self.last_stream_info = {"segments": sp.n_segments,
                                     "segments_run": segments_run,
                                     "seg_rows": sp.seg_rows,
                                     "bytes_streamed": bytes_streamed,
                                     "mode": "stream_sort"}
            return sorted_out

        # materialize the concatenated partials as a temp relation and run
        # the merge plan through the normal (resident) path
        cols = {}
        for a, segs, vsegs in zip(sp.partial_attrs, partial_np, partial_valid):
            if segs:
                data = np.concatenate(segs)
                if any(v is not None for v in vsegs):
                    valid = np.concatenate([
                        v if v is not None else np.ones(len(d), bool)
                        for d, v in zip(segs, vsegs)])
                else:
                    valid = None
            else:
                data = np.zeros((0,), a.type.device_dtype)
                valid = None
            cols[a.name] = Column(a.type, data, valid, a.dictionary)
        tmp = CatalogRelation(S.PARTIALS_REL, [
            CatalogAttribute(a.name, a.type) for a in sp.partial_attrs])
        tmp.set_data(TableData(cols))
        if self.db.get_relation(S.PARTIALS_REL) is not None:
            self.db.drop_relation(S.PARTIALS_REL)
        self.db.add_relation(tmp)
        try:
            result = self._run_plan_resident(sp.merge_plan)
        finally:
            self.db.drop_relation(S.PARTIALS_REL)
            for k in [k for k in self._device_cache
                      if k[0] == S.PARTIALS_REL]:
                del self._device_cache[k]
        # roofline accounting: bytes actually streamed + resident tables
        self.last_scan_bytes = bytes_streamed + sum(
            S._table_bytes(self.db.get_relation(nm), cs)
            for nm, cs in needed.items() if nm != sp.big_table)
        self.last_stream_info = {"segments": sp.n_segments,
                                 "segments_run": segments_run,
                                 "seg_rows": sp.seg_rows,
                                 "bytes_streamed": bytes_streamed,
                                 "seg_cache_hits": self._seg_cache_hits,
                                 "seg_cache_misses": self._seg_cache_misses,
                                 "probe_order": prober.order(),
                                 "probe_evaluations": prober.evaluations,
                                 "probe_rejects": list(prober.rejects)}
        return result

    def _segment_meta(self, rel, colnames, segcap):
        """Per-segment meta must be IDENTICAL across segments so one compiled
        program serves the whole stream: global ranges/uniqueness (sound for
        any subset of rows), capacity = the segment bucket."""
        st = rel.statistics
        ranges = {}
        unique_cols = set()
        for cname in colnames:
            col = rel.data.columns[cname]
            arr = np.asarray(col.data)
            attr = rel.attribute_by_name(cname)
            if np.issubdtype(arr.dtype, np.integer):
                if st.exact and cname in st.min_values and \
                        not col.type.is_string:
                    ranges[cname] = (int(st.min_values[cname]),
                                     int(st.max_values[cname]))
                elif col.type.is_string and col.dictionary is not None:
                    ranges[cname] = (0, max(len(col.dictionary) - 1, 0))
                elif arr.size:
                    lv = arr if col.valid is None else arr[np.asarray(col.valid)]
                    if lv.size:
                        ranges[cname] = (int(lv.min()), int(lv.max()))
            if attr.unique or (st.exact and st.num_tuples and
                               st.num_distinct.get(cname) == st.num_tuples):
                unique_cols.add(cname)
        return {"capacity": segcap, "ranges": ranges,
                "unique_cols": unique_cols, "version": rel.version,
                "bytes": 0,
                "unique_pairs": [tuple(p) for p in st.unique_pairs]
                if st.exact else [],
                "max_counts": dict(st.max_counts) if st.exact else {}}

    def _segment_inputs(self, rel, colnames, seg, seg_rows, segcap):
        """Host->device transfer of one row segment (the out-of-core block
        fault). Per-(column, segment) device arrays are LRU-cached under
        half the HBM budget, so repeated executions over the same >HBM
        table stop re-uploading the whole store (VERDICT r4 weak #5: SF100
        warm wall was ~entirely tunnel re-upload) — the buffer-pool page
        cache analog (storage/StorageManager.hpp:84) one tier up."""
        start = seg * seg_rows
        end = min(start + seg_rows, rel.data.num_rows)
        m = end - start
        cache = self._seg_cache
        cap = self.config.hbm_budget_bytes // 2 \
            if self.config.hbm_budget_bytes else 0
        dev = {}
        nbytes = 0
        for c in colnames:
            key = (rel.name, rel.version, c, seg, seg_rows)
            hit = cache.get(key) if cap else None
            if hit is not None:
                cache.pop(key)
                cache[key] = hit           # LRU refresh
                dev[c] = (hit[0], hit[1])
                self._seg_cache_hits += 1
                continue
            col = rel.data.columns[c]
            arr = np.asarray(col.data)[start:end]
            nbytes += arr.nbytes
            data = np.pad(arr, (0, segcap - m))
            valid = None
            if col.valid is not None:
                valid = np.pad(np.asarray(col.valid)[start:end],
                               (0, segcap - m))
                nbytes += valid.nbytes
            d = jax.device_put((data, valid))
            dev[c] = d
            self._seg_cache_misses += 1
            if cap:
                # streamed access is cyclic, where plain LRU thrashes (run 2
                # revisits segment 0 first — exactly the entry LRU evicted
                # last run): pin the FIRST segments that fit and leave the
                # tail streaming, so every warm run starts with cache hits.
                # Stale versions are purged on insert.
                stale = [k for k in cache
                         if k[0] == rel.name and k[2] == c and
                         k[1] != rel.version]
                for k in stale:
                    self._seg_cache_bytes -= cache.pop(k)[2]
                entry_bytes = data.nbytes + (valid.nbytes if valid is not None
                                             else 0)
                if self._seg_cache_bytes + entry_bytes <= cap:
                    cache[key] = (d[0], d[1], entry_bytes)
                    self._seg_cache_bytes += entry_bytes
        dev["__num_rows__"] = jnp.asarray(m, jnp.int32)
        return dev, nbytes

    def _result_prefix(self, plan, capacity: int) -> int:
        """Static prefix of compacted output rows returned by the jitted program
        itself, so a single D2H pull covers (count, flags, result) in one
        round-trip — the tunnel RTT (~25ms) otherwise dominates small queries.
        Sized from the cost model with 4x headroom; overflow falls back to a
        second pull of the full arrays."""
        try:
            from quickstep_tpu.optimizer.rules import (
                collect_attr_stats, estimate_cardinality)
            env = collect_attr_stats(plan, self.db)
            est = estimate_cardinality(plan, self.db, env)
        except Exception:
            est = float("inf")
        # Since only the prefix is materialized/shipped by the fast program,
        # a generous prefix is cheap (128k rows x 10 cols x 8B ~ 10MB) while
        # an overflow costs a full re-execution — size up.
        want = K.next_pow2(int(min(max(8 * est, 4096), 1 << 17)))
        return min(capacity, want)

    def _compile_and_run(self, plan, inputs, meta, overrides):
        # plan-wide chain-depth override (compiler-crash fallback rung 2):
        # applied at trace time; the fingerprint below includes overrides,
        # so each cap traces/caches its own program
        from quickstep_tpu.exec import chunk as CH
        ovg = overrides.get(-1)
        CH.set_chain_depth(ovg.chain_depth if ovg is not None and
                           ovg.chain_depth is not None
                           else CH.default_chain_depth())
        # Row-packed gathers allocate a lane-padded transient (n x 128 x 4B);
        # under an explicit HBM budget, keep that transient to a fraction of
        # the budget so streamed plans retain their working-set headroom.
        K.PACK_PAD_LIMIT = min(5 << 30, self.config.hbm_budget_bytes // 3) \
            if self.config.hbm_budget_bytes else (5 << 30)
        fp = (_fingerprint(plan),
              tuple(sorted((k, m["capacity"], m["version"])
                           for k, m in meta.items())),
              tuple(sorted((k, dataclasses.astuple(v))
                           for k, v in overrides.items())))
        out_attrs = plan.output
        cached = self._compile_cache.get(fp)
        if cached is None:
            def make_fn(out_rows):
                """out_rows=None: the fast program — materialize/ship ONLY
                the compacted result prefix. Returning full-capacity arrays
                makes the runtime ship them per-execution (~3s for a
                6M-row x 8-col result over the tunnel) — that, not compute,
                dominated join-heavy query "device" time through round 3.
                out_rows=m: an overflow twin compiled per next_pow2(n)
                bucket, run only when the prefix was too small or for the
                on-device presentation sort."""
                def fn(dev_inputs):
                    runner = PlanRunner(plan, dev_inputs, meta, self.config,
                                        overrides, mesh=self.mesh)
                    chunk = runner.exec(plan)
                    count = jnp.sum(chunk.alive.astype(jnp.int32))
                    # gather-based stable compaction: ONE payload sort + ONE
                    # row-packed gather instead of a scatter per column (TPU
                    # scatters are ~5x slower than gathers)
                    order = K.compact_order(chunk.alive)
                    rows = self._result_prefix(plan, chunk.capacity) \
                        if out_rows is None else min(out_rows, chunk.capacity)
                    ds, vs = chunk.take_columns(
                        order[:rows], [a.expr_id for a in out_attrs])
                    if out_rows is not None:
                        return tuple(ds), tuple(vs)
                    sliced = (tuple(ds), tuple(vs))
                    flags = dict(runner.flags)
                    if self.mesh is not None and jax.process_count() > 1:
                        # multi-host: the result prefix + control scalars must
                        # be fetchable on every process -> replicate
                        from jax.sharding import (NamedSharding,
                                                  PartitionSpec as P)
                        rep = NamedSharding(self.mesh, P())
                        sliced = jax.lax.with_sharding_constraint(sliced, rep)
                        count = jax.lax.with_sharding_constraint(count, rep)
                        flags = jax.lax.with_sharding_constraint(flags, rep)
                    return sliced, count, flags
                return fn
            hlo_dir = os.environ.get("QSTPU_HLO_DUMP")
            if hlo_dir:
                # profiling path (tools/op_profile.py): AOT-compile so the
                # optimized HLO (with named_scope op metadata) can be saved —
                # compiled.as_text() fetches it even under the axon tunnel
                os.makedirs(hlo_dir, exist_ok=True)
                compiled = jax.jit(make_fn(None)).lower(inputs).compile()
                try:
                    with open(os.path.join(
                            hlo_dir, f"plan_{abs(hash(fp))}.txt"), "w") as f:
                        f.write(compiled.as_text())
                except Exception:
                    pass
                cached = (compiled, make_fn, {})
            else:
                cached = (jax.jit(make_fn(None)), make_fn, {})
            while len(self._compile_cache) >= self._plan_cache_limit:
                self._compile_cache.pop(next(iter(self._compile_cache)))
            self._compile_cache[fp] = cached
        p_fast, p_make, p_fulls = cached
        t0 = time.perf_counter()
        K.reset_trace()
        self.dispatches = getattr(self, "dispatches", 0) + 1
        sliced, count, flags = p_fast(inputs)
        jax.block_until_ready(count)
        if K.TRACE["gathers"]:   # first call traced the plan: snapshot counts
            while len(self._plan_op_stats) >= self._plan_cache_limit:
                self._plan_op_stats.pop(next(iter(self._plan_op_stats)))
            self._plan_op_stats[fp] = dict(K.TRACE)
        t1 = time.perf_counter()
        dev_ms = None
        reps = int(getattr(self.config, "profile_device_reps", 0))
        if reps > 1:
            # pipelined re-issues amortize the dispatch/tunnel RTT: device
            # time ~ (T_k - T_1) / (k - 1)
            last = count
            tp0 = time.perf_counter()
            self.dispatches += reps
            for _ in range(reps):
                _sl, last, _fl = p_fast(inputs)
            jax.block_until_ready(last)
            tp1 = time.perf_counter()
            dev_ms = (tp1 - tp0) / reps * 1000
        # ONE batched D2H round-trip for count + runtime flags + result prefix
        n, host_flags, host_sliced = jax.device_get((count, flags, sliced))
        self.last_flags = host_flags   # introspection (tests / \explain_analyze)
        t2 = time.perf_counter()
        # per-query phase profile (Worker steady_clock timing analog,
        # query_execution/Worker.cpp:136): device-program time vs D2H pull
        self.last_profile = {"exec_ms": (t1 - t0) * 1000,
                             "pull_ms": (t2 - t1) * 1000,
                             "scan_bytes": getattr(self, "last_scan_bytes", 0),
                             "op_stats": self._plan_op_stats.get(fp)}
        if dev_ms is not None:
            self.last_profile["device_ms"] = dev_ms

        def full_thunk(m):
            # prefix overflow / device presentation sort: re-run the plan
            # through an overflow twin returning m compacted rows (compiled
            # per next_pow2 bucket on first need)
            self.dispatches = getattr(self, "dispatches", 0) + 1
            fn = p_fulls.get(m)
            if fn is None:
                fn = jax.jit(p_make(m))
                p_fulls[m] = fn
            return fn(inputs)
        outs = (full_thunk, int(n), host_sliced)
        return outs, host_flags, out_attrs

    def _check_flags(self, plan, flags, overrides) -> bool:
        """Inspect runtime flags (duplicate build keys / expansion overflow);
        install overrides and request a retry when needed — the kOutOfSpace
        retry loop analog."""
        retry = False
        for key, val in flags.items():
            if not bool(val):
                continue
            kind, node_id = key.rsplit("_", 1)
            node_id = int(node_id)
            if kind == "join_dup":
                prev = overrides.get(node_id) or JoinOverride()
                prev.strategy = "expand"
                overrides[node_id] = prev
                retry = True
            elif kind in ("compact_probe", "compact_build"):
                # pre-join compaction under-estimated the live rows: re-run
                # this node at full capacity (learned for future executions).
                # A SECOND compaction overflow in the same plan means the
                # estimate chain is systematically off — disable compaction
                # for the whole plan (override id -1) instead of paying one
                # expensive retry per join.
                already = any(v.no_compact_probe or v.no_compact_build
                              for v in overrides.values())
                prev = overrides.get(node_id) or JoinOverride()
                if kind == "compact_probe":
                    prev.no_compact_probe = True
                else:
                    prev.no_compact_build = True
                overrides[node_id] = prev
                if already:
                    overrides[-1] = JoinOverride(no_compact_probe=True,
                                                 no_compact_build=True)
                retry = True
            elif kind == "join_overflow":
                prev = overrides.get(node_id) or JoinOverride(strategy="expand")
                prev.strategy = "expand"
                prev.max_matches = (prev.max_matches or 8) * 4
                overrides[node_id] = prev
                retry = True
            elif kind == "shuffle_overflow":
                # radix-exchange bucket overflow (skewed partition): escalate
                # the per-partition bucket capacity and re-run
                prev = overrides.get(node_id) or JoinOverride()
                prev.shuffle_factor = max(prev.shuffle_factor, 1) * 4
                overrides[node_id] = prev
                retry = True
        return retry

    def _materialize_sorted(self, outs, out_attrs, sort_node: L.Sort,
                            final_attrs, trim_ids):
        """Presentation sort. Small results: stable numpy lexsort on the host
        (encoded values are order-preserving; avoids an XLA:TPU sort compile
        per ad-hoc query shape). Large results (>= device_sort_threshold_rows):
        an on-device payload-carrying lax.sort + top-limit slice, so only the
        presented rows ever cross the host link — the single-pass analog of
        the reference's SortRunGeneration + SortMergeRun pipeline
        (relational_operators/SortMergeRunOperator.hpp:72-129; one TPU sort
        replaces run generation + k-way merge)."""
        n_result = outs[1]
        self.last_sort_path = "host"
        if (n_result >= self.config.device_sort_threshold_rows
                and jax.process_count() == 1):
            pulled = self._device_sort_pull(outs, out_attrs, sort_node)
            if pulled is not None:
                self.last_sort_path = "device"
                datas, valids, n = pulled
                by_id = {a.expr_id: (a, d, v)
                         for a, d, v in zip(out_attrs, datas, valids)}
                order = np.arange(n)
                if sort_node.limit is not None:
                    order = order[:sort_node.limit]
                return self._trim_rows(by_id, order, final_attrs, trim_ids)
        datas, valids, n = self._pull_outputs(outs)
        by_id = {a.expr_id: (a, d, v)
                 for a, d, v in zip(out_attrs, datas, valids)}
        order = _host_sort_order(sort_node, by_id, n)
        return self._trim_rows(by_id, order, final_attrs, trim_ids)

    def _try_stream_sort(self, sp, partial_np, partial_valid):
        """Out-of-core ORDER BY (SortMergeRunOperator analog,
        relational_operators/SortMergeRunOperator.hpp:72-129): when a
        row-streamed plan's merge phase is nothing but Sort (+ a trim
        Project) over the streamed partials, sort the already-host-resident
        partial rows with the presentation lexsort instead of materializing
        a temp relation and compiling a device plan at full-table capacity
        (which a >HBM result cannot do). The streamed per-segment programs
        are the run generation; the host lexsort is the k-way merge — runs
        live in host RAM, the tier below HBM, exactly where the reference's
        merge reads its runs from disk below RAM. Returns (rows, names,
        types) or None when the merge phase is not sort-only."""
        from quickstep_tpu.exec import streaming as S
        from quickstep_tpu.expressions.scalar import Attr
        plan = sp.merge_plan
        trim = None
        if isinstance(plan, L.Project) and isinstance(plan.input, L.Sort) \
                and all(isinstance(e, Attr) for e in plan.exprs):
            trim = plan
            plan = plan.input
        if not isinstance(plan, L.Sort):
            return None
        restore = plan.input
        if not (isinstance(restore, L.Project) and
                isinstance(restore.input, L.TableScan) and
                restore.input.relation_name == S.PARTIALS_REL and
                all(isinstance(e, Attr) for e in restore.exprs)):
            return None
        if not all(isinstance(k, Attr) for k in plan.keys):
            return None
        by_id = {}
        for a, segs, vsegs in zip(sp.partial_attrs, partial_np,
                                  partial_valid):
            data = np.concatenate(segs) if segs else \
                np.zeros((0,), a.type.device_dtype)
            if segs and any(v is not None for v in vsegs):
                valid = np.concatenate([
                    v if v is not None else np.ones(len(d), bool)
                    for d, v in zip(segs, vsegs)])
            else:
                valid = None
            by_id[a.expr_id] = (a, data, valid)
        # restore's attrs carry the display names/dictionaries under the
        # same expr_ids as the partials
        for ra, re in zip(restore.attrs, restore.exprs):
            if re.expr_id in by_id:
                _, d, v = by_id[re.expr_id]
                by_id[ra.expr_id] = (ra, d, v)
        n = next((len(d) for _, d, _ in by_id.values()), 0)
        order = _host_sort_order(plan, by_id, n)
        if trim is not None:
            final_attrs = trim.attrs
            trim_ids = [e.expr_id for e in trim.exprs]
        else:
            final_attrs = list(plan.output)
            trim_ids = [a.expr_id for a in final_attrs]
        return self._trim_rows(by_id, order, final_attrs, trim_ids)

    def _trim_rows(self, by_id, order, final_attrs, trim_ids):
        names = [a.name for a in final_attrs]
        types = [a.type for a in final_attrs]
        cols = []
        for fa, tid in zip(final_attrs, trim_ids):
            a, d, v = by_id[tid]
            arr = d[order]
            va = None if v is None else v[order]
            if fa.dictionary is not None:
                vals = fa.dictionary.decode(arr)
            else:
                vals = [_decode_scalar(fa.type, x) for x in arr]
            if va is not None:
                vals = [x if ok else None for x, ok in zip(vals, va)]
            cols.append(vals)
        rows = list(zip(*cols)) if cols else []
        return rows, names, types

    def _device_sort_pull(self, outs, out_attrs, sort_node: L.Sort):
        """Sort the (still-on-device, live-prefix-compacted) result arrays with
        one payload-carrying lax.sort, slice the top limit rows, and pull only
        those. Compiled once per (shape bucket, dtypes, key spec) — a tiny
        standalone program, so no per-query compile churn. Returns
        (host_datas, host_valids, n_pulled) or None when a key is unsortable
        here (falls back to the host lexsort)."""
        full_thunk, n, (pref_d, _pv) = outs
        if not pref_d:
            return None
        datas, valids = full_thunk(K.next_pow2(max(n, 8)))
        capacity = int(jnp.shape(datas[0])[0])
        m = min(capacity, K.next_pow2(max(n, 8)))
        idx_of = {a.expr_id: i for i, a in enumerate(out_attrs)}
        keyspec = []
        for key, asc, nf in zip(sort_node.keys, sort_node.ascending,
                                sort_node.nulls_first):
            if key.expr_id not in idx_of:
                return None
            keyspec.append((idx_of[key.expr_id], bool(asc), nf))
        keyspec = tuple(keyspec)
        k_out = m if sort_node.limit is None else min(
            K.round_up(max(sort_node.limit, 8), 8), m)
        has_valid = tuple(v is not None for v in valids)
        sig = (m, k_out, keyspec, has_valid,
               tuple(str(jnp.asarray(d).dtype) for d in datas))
        fn = self._sort_programs.get(sig)
        if fn is None:
            def sort_fn(ds, vs, nn):
                iota = jnp.arange(m)
                alive = iota < nn
                key_ops = [(~alive).astype(jnp.int8)]  # dead rows last
                for ki, asc, nf in keyspec:
                    col = ds[ki]
                    v = vs[ki]
                    floating = jnp.issubdtype(col.dtype, jnp.floating)
                    if not asc:
                        col = -col if floating else ~col
                    if v is not None:
                        first = nf if nf is not None else (not asc)
                        if floating:
                            sent = -jnp.inf if first else jnp.inf
                        else:
                            info = jnp.iinfo(col.dtype)
                            sent = info.min if first else info.max
                        col = jnp.where(v, col, jnp.asarray(sent, col.dtype))
                    key_ops.append(col)
                payloads = [d for d in ds] + \
                    [v.astype(jnp.int8) for v in vs if v is not None]
                sorted_ops = jax.lax.sort(
                    tuple(key_ops) + tuple(payloads),
                    num_keys=len(key_ops), is_stable=True)
                body = sorted_ops[len(key_ops):]
                return tuple(x[:k_out] for x in body)
            fn = jax.jit(sort_fn)
            while len(self._sort_programs) >= self._plan_cache_limit:
                self._sort_programs.pop(next(iter(self._sort_programs)))
            self._sort_programs[sig] = fn
        ds = [jnp.asarray(d)[:m] for d in datas]
        vs = [None if v is None else jnp.asarray(v)[:m] for v in valids]
        self.dispatches = getattr(self, "dispatches", 0) + 1
        out = jax.device_get(fn(ds, vs, jnp.asarray(n, jnp.int32)))
        n_pull = min(n, k_out)
        host_d = [np.asarray(x)[:n_pull] for x in out[:len(ds)]]
        host_v = []
        vi = len(ds)
        for hv in has_valid:
            if hv:
                host_v.append(np.asarray(out[vi]).astype(bool)[:n_pull])
                vi += 1
            else:
                host_v.append(None)
        return host_d, host_v, n_pull

    def _pull_outputs(self, outs):
        """Device->host. The jitted program already returned a compacted result
        prefix in the single batched pull; only prefix overflow pays a second
        transfer of the full arrays."""
        full_thunk, n, (pref_d, pref_v) = outs
        prefix = int(np.shape(pref_d[0])[0]) if pref_d else 0
        if n <= prefix or not pref_d:
            host_d = [np.asarray(d)[:n] for d in pref_d]
            host_v = [None if v is None else np.asarray(v)[:n]
                      for v in pref_v]
            return host_d, host_v, n
        datas, valids = full_thunk(K.next_pow2(max(n, 8)))
        capacity = int(jnp.shape(datas[0])[0])
        m = min(capacity, K.next_pow2(max(n, 8)))
        sliced_d = [d[:m] for d in datas]
        sliced_v = [None if v is None else v[:m] for v in valids]
        if jax.process_count() > 1:
            from quickstep_tpu.parallel.multihost import all_gather_to_host
            host_d, host_v = all_gather_to_host((sliced_d, sliced_v))
        else:
            host_d, host_v = jax.device_get((sliced_d, sliced_v))
        host_d = [np.asarray(d)[:n] for d in host_d]
        host_v = [None if v is None else np.asarray(v)[:n] for v in host_v]
        return host_d, host_v, n

    def _materialize(self, outs, out_attrs):
        datas, valids, n = self._pull_outputs(outs)
        names = [a.name for a in out_attrs]
        types = [a.type for a in out_attrs]
        cols = []
        for a, d, v in zip(out_attrs, datas, valids):
            arr = d
            va = v
            if a.dictionary is not None:
                vals = a.dictionary.decode(arr)
            else:
                vals = [_decode_scalar(a.type, x) for x in arr]
            if va is not None:
                vals = [x if ok else None for x, ok in zip(vals, va)]
            cols.append(vals)
        rows = list(zip(*cols)) if cols else []
        return rows, names, types

    # ----------------------------------------------------------------
    # input preparation (StorageManager role: host->HBM with padding)
    # ----------------------------------------------------------------
    def _collect_inputs(self, plan: L.LogicalNode):
        needed: Dict[str, set] = {}

        def walk(node):
            if isinstance(node, L.TableScan):
                s = needed.setdefault(node.relation_name, set())
                s.update(a.name for a in node.attrs)
            for c in node.children():
                walk(c)
            # joins/subplans hold nested plans in expressions too
            for e in _node_exprs(node):
                from quickstep_tpu.expressions.subquery import SubqueryScalar
                stack = [e]
                while stack:
                    x = stack.pop()
                    if isinstance(x, SubqueryScalar):
                        walk(x.plan)
                    stack.extend(x.children())
        walk(plan)
        inputs = {}
        meta = {}
        scan_bytes = 0
        for name, colnames in needed.items():
            rel = self.db.get_relation(name)
            cols, m = self._device_table(rel, colnames)
            # pass only this query's columns into the jitted program (stable
            # pytree shape per plan fingerprint even as the cache grows)
            sub = {c: cols[c] for c in colnames}
            sub["__num_rows__"] = cols["__num_rows__"]
            inputs[name] = sub
            meta[name] = m
            for c in colnames:
                col = rel.data.columns[c]
                scan_bytes += np.asarray(col.data).nbytes
                if col.valid is not None:
                    scan_bytes += np.asarray(col.valid).nbytes
        # roofline accounting: unpadded bytes of every column the plan reads
        self.last_scan_bytes = scan_bytes
        return inputs, meta

    def _device_table(self, rel: CatalogRelation, needed):
        """Column-granular HBM residency (buffer-pool analog at column rather
        than table granularity): only the plan-referenced columns are padded,
        transferred, and kept resident; later queries fault in just their
        missing columns. needed=None means all columns (preload)."""
        key = (rel.name, rel.version)
        names = [a.name for a in rel.attributes
                 if needed is None or a.name in needed]
        hit = self._device_cache.get(key)
        if hit is not None:
            cols, m = hit
            missing = [c for c in names if c not in cols]
            if not missing:
                self._eviction.block_referenced(key)
                return cols, m
        else:
            # drop stale versions of this relation
            for k in [k for k in self._device_cache if k[0] == rel.name]:
                del self._device_cache[k]
                self._eviction.block_evicted(k)
            cols, m = None, None
            missing = names

        n = rel.data.num_rows
        capacity = m["capacity"] if m is not None else self._bucket(n)
        st = rel.statistics
        host_cols = {}
        new_bytes = 0
        ranges = dict(m["ranges"]) if m is not None else {}
        unique_cols = set(m["unique_cols"]) if m is not None else set()
        for cname in missing:
            attr = rel.attribute_by_name(cname)
            col = rel.data.columns[cname]
            arr = np.asarray(col.data)
            new_bytes += arr.nbytes + (0 if col.valid is None else n)
            pad = capacity - arr.shape[0]
            data = np.pad(arr, (0, pad))
            valid = None
            if col.valid is not None:
                valid = np.pad(np.asarray(col.valid), (0, pad))
            host_cols[cname] = (data, valid)
            if np.issubdtype(arr.dtype, np.integer):
                if st.exact and cname in st.min_values and \
                        not col.type.is_string:
                    ranges[cname] = (int(st.min_values[cname]),
                                     int(st.max_values[cname]))
                elif col.type.is_string and col.dictionary is not None:
                    # dict codes live in [0, |dict|): a conservative range
                    ranges[cname] = (0, max(len(col.dictionary) - 1, 0))
                elif arr.size:
                    lv = arr if col.valid is None else arr[np.asarray(col.valid)]
                    if lv.size:
                        ranges[cname] = (int(lv.min()), int(lv.max()))
            if attr.unique or (st.exact and st.num_tuples and
                               st.num_distinct.get(cname) == st.num_tuples):
                unique_cols.add(cname)
        self._evict_for(key, new_bytes)
        # One batched transfer for all missing columns (the tunnel's per-call
        # latency dominates column-at-a-time device_put)
        if self.mesh is not None:
            # Distributed placement (GSPMD): big tables row-sharded over the
            # mesh, small tables replicated (broadcast-join layout). XLA's SPMD
            # partitioner then inserts the collectives at pipeline breakers —
            # the ForemanDistributed/Shiftboss routing analog (SURVEY.md §2.15).
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = self.config.default_mesh_axis
            spec = P(axis) if n >= self.config.replicate_threshold_rows else P()
            sharding = NamedSharding(self.mesh, spec)
            if jax.process_count() > 1:
                # multi-host: every process holds the full host table (the
                # CatalogDatabaseCache analog) but transfers only the rows its
                # local devices own (block locality)
                from quickstep_tpu.parallel.multihost import make_global_array
                new_cols = jax.tree_util.tree_map(
                    lambda a: make_global_array(np.asarray(a), sharding),
                    host_cols)
                num_rows = make_global_array(
                    np.asarray(n, np.int32), NamedSharding(self.mesh, P()))
            else:
                new_cols = jax.device_put(host_cols, sharding)
                num_rows = jax.device_put(
                    jnp.asarray(n, jnp.int32), NamedSharding(self.mesh, P()))
        else:
            new_cols = jax.device_put(host_cols)
            num_rows = jnp.asarray(n, jnp.int32)

        if cols is None:
            cols = {"__num_rows__": num_rows}
            m = {"capacity": capacity, "rows": n, "ranges": ranges,
                 "unique_cols": unique_cols, "version": rel.version,
                 "bytes": 0,
                 "unique_pairs": [tuple(p) for p in st.unique_pairs]
                 if st.exact else [],
                 "max_counts": dict(st.max_counts) if st.exact else {}}
            self._device_cache[key] = (cols, m)
        cols.update(new_cols)
        m["ranges"] = ranges
        m["unique_cols"] = unique_cols
        m["bytes"] = m.get("bytes", 0) + new_bytes
        self._eviction.block_referenced(key)
        return cols, m

    def _bucket(self, n: int) -> int:
        b = self.config.row_capacity_bucket
        if n <= b:
            cap = b
        elif self.config.geometric_buckets:
            cap = K.next_pow2(n)
        else:
            cap = K.round_up(n, b)
        if self.mesh is not None:
            cap = K.round_up(cap, int(self.mesh.devices.size))
        return cap

    # ================================================================
    # DDL
    # ================================================================
    def _create_table(self, stmt: A.CreateTableStmt) -> QueryResult:
        attrs = []
        for cd in stmt.columns:
            t = TypeFactory.from_name(cd.type_name, cd.type_length,
                                      nullable=cd.nullable and not cd.not_null,
                                      scale=cd.type_scale)
            attrs.append(CatalogAttribute(cd.name, t, unique=cd.unique))
        rel = CatalogRelation(stmt.name, attrs)
        if stmt.partition_kind:
            seen = set()
            for i, pa in enumerate(stmt.partition_attrs):
                if pa.lower() in seen:
                    pos = (stmt.partition_attr_pos[i]
                           if i < len(stmt.partition_attr_pos) else (None, None))
                    raise ResolutionError(
                        "A duplicate partition attribute was found.",
                        pos[0], pos[1])
                seen.add(pa.lower())
            rel.partition_scheme = PartitionScheme(
                kind=stmt.partition_kind, attributes=stmt.partition_attrs,
                num_partitions=stmt.partition_count)
        # BLOCKPROPERTIES validated for parity (StorageBlockLayout::
        # DescriptionIsValid); the layouts themselves have no TPU analog —
        # columns are always struct-of-arrays in HBM.
        bp = stmt.block_properties
        if bp:
            btype = str(bp.get("type", "split_rowstore")).lower()
            known = {"rowstore", "split_rowstore", "columnstore",
                     "compressed_rowstore", "compressed_columnstore"}
            valid = btype in known
            if btype in ("columnstore", "compressed_columnstore"):
                # BasicColumnStore requires all-fixed-width attributes
                # (storage/BasicColumnStoreTupleStorageSubBlock.cpp
                # DescriptionIsValid)
                if any(a.type.type_id == TypeID.VARCHAR for a in attrs):
                    valid = False
                sort_col = bp.get("sort")
                if sort_col is not None and not any(
                        a.name.lower() == str(sort_col).lower() for a in attrs):
                    valid = False
            if not valid:
                raise ExecutionError("BLOCKPROPERTIES is invalid.")
        self.db.add_relation(rel)
        return QueryResult([], [], [], message=f"Table {stmt.name} created.")

    def _create_index(self, stmt: A.CreateIndexStmt) -> QueryResult:
        rel = self._rel(stmt.table_name)
        for idx in rel.indices:
            if idx["attrs"] == stmt.attrs and idx["type"] == stmt.index_type:
                raise ExecutionError(
                    f"The relation {rel.name} already defines this index on "
                    f"the given attribute(s).")
        for aname in stmt.attrs:
            if rel.attribute_by_name(aname) is None:
                raise ExecutionError(
                    f"no attribute {aname} in relation {rel.name}")
        rel.indices.append({"name": stmt.index_name, "attrs": stmt.attrs,
                            "type": stmt.index_type})
        # Build the block min/max summary eagerly (SMAIndexSubBlock analog;
        # for CSB-tree requests the same summary provides the range-pruning
        # benefit this engine's scan architecture can exploit). DML bumps
        # rel.version; the summary self-refreshes on next use.
        from quickstep_tpu.catalog.catalog import build_sma_blocks
        for aname in stmt.attrs:
            build_sma_blocks(rel, rel.attribute_by_name(aname).name)
        return QueryResult([], [], [],
                           message=f"Index {stmt.index_name} created.")

    def _rel(self, name: str) -> CatalogRelation:
        rel = self.db.get_relation(name)
        if rel is None:
            raise ExecutionError(f"Unrecognized relation {name}")
        return rel

    # ================================================================
    # DML
    # ================================================================
    def _insert(self, stmt: A.InsertStmt) -> QueryResult:
        rel = self._rel(stmt.table_name)
        schema = [(a.name, a.type) for a in rel.attributes]
        if stmt.select is not None:
            sub = self._run_select(stmt.select)
            rows = sub.rows
        else:
            resolver = Resolver(self.db)
            rows = []
            for row_exprs in stmt.rows:
                vals = []
                for ast_e, attr in zip(row_exprs, rel.attributes):
                    e = resolver._resolve_expr(ast_e, Scope(), _EMPTY_STATE)
                    if not isinstance(e, Lit):
                        raise ExecutionError("INSERT VALUES must be literals")
                    vals.append(self._literal_for(attr.type, e))
                rows.append(tuple(vals))
        rel.append_data(TableData.from_rows(schema, rows))
        return QueryResult([], [], [], rows_affected=len(rows))

    def _literal_for(self, t: Type, e: Lit):
        if e.value is None:
            return None
        if t.is_string:
            return str(e.value)
        if t.type_id in (TypeID.DATE, TypeID.DATETIME):
            # literals already parsed into device encoding at resolve time if typed;
            # bare strings parsed here
            if isinstance(e.value, str):
                from quickstep_tpu.types.datetime_util import (
                    parse_date_literal, parse_datetime_literal)
                return (parse_date_literal(e.value)
                        if t.type_id == TypeID.DATE
                        else parse_datetime_literal(e.value))
            return int(e.value)
        if t.is_floating or t.is_decimal:
            # decimal values encode to scaled units in Column.from_values
            return float(e.value)
        return int(e.value)

    def _eval_on_relation(self, rel: CatalogRelation, expr_ast: A.Expr):
        """Host-side eager evaluation of an expression over a full relation
        (UpdateOperator / DeleteOperator per-block predicate path)."""
        resolver = Resolver(self.db)
        scope = Scope()
        from quickstep_tpu.optimizer.logical import OutAttr, next_expr_id
        slot_map = {}
        for a in rel.attributes:
            col = rel.data.columns[a.name]
            oa = OutAttr(next_expr_id(), a.name, a.type, col.dictionary)
            scope.add(rel.name, oa)
            valid = None if col.valid is None else jnp.asarray(col.valid)
            slot_map[oa.expr_id] = (jnp.asarray(np.asarray(col.data)), valid)
        e = resolver._resolve_expr(expr_ast, scope, _EMPTY_STATE)
        d, v = e.eval(EvalContext(slot_map))
        return e, np.asarray(jnp.broadcast_to(jnp.asarray(d),
                                              (rel.data.num_rows,))), \
            None if v is None else np.asarray(
                jnp.broadcast_to(v, (rel.data.num_rows,)))

    def _delete(self, stmt: A.DeleteStmt) -> QueryResult:
        rel = self._rel(stmt.table_name)
        n = rel.data.num_rows
        if stmt.where is None:
            rel.set_data(TableData.empty(
                [(a.name, a.type) for a in rel.attributes]))
            return QueryResult([], [], [], rows_affected=n)
        _, d, v = self._eval_on_relation(rel, stmt.where)
        mask = d.astype(bool)
        if v is not None:
            mask &= v
        keep = ~mask
        rel.set_data(rel.data.select_rows(np.nonzero(keep)[0]))
        return QueryResult([], [], [], rows_affected=int(mask.sum()))

    def _update(self, stmt: A.UpdateStmt) -> QueryResult:
        rel = self._rel(stmt.table_name)
        n = rel.data.num_rows
        if stmt.where is not None:
            _, d, v = self._eval_on_relation(rel, stmt.where)
            mask = d.astype(bool)
            if v is not None:
                mask &= v
        else:
            mask = np.ones(n, dtype=bool)
        new_cols = dict(rel.data.columns)
        for col_name, expr_ast in stmt.assignments:
            attr = rel.attribute_by_name(col_name)
            if attr is None:
                raise ExecutionError(f"unknown column {col_name}")
            e, d, v = self._eval_on_relation(rel, expr_ast)
            old = rel.data.columns[attr.name]
            if attr.type.is_string:
                # decode new values through the expression's dictionary, then
                # rebuild the column dictionary over updated data
                from quickstep_tpu.optimizer.resolver import _expr_dictionary
                ed = _expr_dictionary(e)
                vals = old.to_pylist()
                new_vals = ed.decode(d) if ed is not None else [str(x) for x in d]
                for i in np.nonzero(mask)[0]:
                    vals[int(i)] = new_vals[int(i)]
                new_cols[attr.name] = Column.from_values(attr.type, vals)
            else:
                data = np.asarray(old.data).copy()
                data[mask] = d[mask].astype(data.dtype)
                valid = old.valid
                if v is not None:
                    valid = (np.ones(n, bool) if valid is None
                             else np.asarray(valid).copy())
                    valid[mask] = v[mask]
                new_cols[attr.name] = Column(attr.type, data, valid, None)
        rel.set_data(TableData(new_cols))
        return QueryResult([], [], [], rows_affected=int(mask.sum()))

    def _copy(self, stmt: A.CopyStmt) -> QueryResult:
        if stmt.direction == "from":
            rel = self._rel(stmt.table_name)
            delim = str(stmt.options.get("delimiter", "\t"))
            header = bool(stmt.options.get("header", False))
            schema = [(a.name, a.type) for a in rel.attributes]
            data = csv_io.load_csv(stmt.path, schema, delimiter=delim,
                                   header=header)
            rel.append_data(data)
            rel.analyze()
            return QueryResult([], [], [], rows_affected=data.num_rows)
        # COPY {table | <query>} TO {path | stdout | stderr} WITH (...)
        # (relational_operators/TableExportOperator.hpp:61)
        if stmt.select is not None:
            sel = self._run_select(stmt.select)
            names, types, rows = sel.column_names, sel.types, sel.rows
        else:
            rel = self._rel(stmt.table_name)
            names = [a.name for a in rel.attributes]
            types = [a.type for a in rel.attributes]
            rows = rel.data.to_rows()
        text = csv_io.export_csv(stmt.path, names, types, rows, stmt.options)
        res = QueryResult([], [], [], rows_affected=len(rows),
                          message=text.rstrip("\n") if text else None)
        return res

    # ================================================================
    # CLI commands (reference cli/CommandExecutor.cpp)
    # ================================================================
    def _command(self, stmt: A.CommandStmt) -> QueryResult:
        cmd = stmt.command
        if cmd == "\\dt":
            rows = [(r.name,) for r in self.db.relations.values()]
            from quickstep_tpu.types import VarChar
            return QueryResult(["Table"], [VarChar(64)], rows)
        if cmd == "\\d":
            if not stmt.args:
                return self._command(A.CommandStmt(command="\\dt"))
            rel = self._rel(stmt.args[0])
            from quickstep_tpu.types import VarChar
            rows = [(a.name, a.type.name()) for a in rel.attributes]
            return QueryResult(["Column", "Type"], [VarChar(64), VarChar(64)],
                               rows)
        if cmd == "\\analyze":
            # message parity with cli/CommandExecutor.cpp:218-310 (\analyze
            # prints one "Analyzing <rel> ... done" line per relation)
            targets = stmt.args or list(self.db.relations.keys())
            lines = []
            for t in targets:
                rel = self._rel(t)
                rel.analyze()
                lines.append(f"Analyzing {rel.name} ... done")
            return QueryResult([], [], [], message="\n".join(lines))
        if cmd in ("\\explain", "\\viz", "\\explain_analyze"):
            # plan tree + DOT (+ per-operator timing for \explain_analyze) —
            # visualize_plan / visualize_execution_dag flag analogs
            from quickstep_tpu.utils.visualize import explain
            from quickstep_tpu.database import Database
            sql = " ".join(stmt.args).rstrip(";")
            shim = Database.__new__(Database)
            shim.catalog = self.catalog
            shim.config = self.config
            shim._executor = self
            text = explain(shim, sql, analyze=cmd == "\\explain_analyze")
            return QueryResult([], [], [], message=text)
        raise ExecutionError(f"unknown command {cmd}")


class _EmptyState:
    def __init__(self):
        self.pending_joins = []
        self.uncorrelated_scalar_subplans = []


_EMPTY_STATE = _EmptyState()


def _host_sort_order(sort_node: L.Sort, by_id, n: int) -> np.ndarray:
    """Stable host lexsort order for a presentation Sort over host arrays
    keyed by expr_id (encoded values are order-preserving; shared by the
    resident host-sort path and the streamed external-sort merge)."""
    sort_cols = []
    for key, asc, nf in zip(sort_node.keys, sort_node.ascending,
                            sort_node.nulls_first):
        # _resolve_order_by guarantees keys are Attr refs into the pre-sort
        # projection (hidden keys included)
        a, d, v = by_id[key.expr_id]
        col = d.copy()
        if not asc:
            if np.issubdtype(col.dtype, np.floating):
                col = -col
            else:
                col = ~col
        if v is not None:
            first = nf if nf is not None else (not asc)
            if np.issubdtype(col.dtype, np.floating):
                sentinel = -np.inf if first else np.inf
            else:
                info = np.iinfo(col.dtype)
                sentinel = info.min if first else info.max
            col = np.where(v, col, sentinel)
        sort_cols.append(col)
    if sort_cols:
        order = np.lexsort(tuple(reversed(sort_cols)))
    else:
        order = np.arange(n)
    if sort_node.limit is not None:
        order = order[:sort_node.limit]
    return order


# =====================================================================
# plan fingerprinting (compile-cache key)
#
# ExprIds are fresh on every resolve, so fingerprints canonicalize them by
# first-encounter order — identical SQL over identical schema fingerprints
# identically across re-resolves and hits the compiled-plan cache.
# =====================================================================

def _node_exprs(node: L.LogicalNode):
    out = []
    if isinstance(node, L.Filter):
        out.append(node.predicate)
    elif isinstance(node, L.Project):
        out.extend(node.exprs)
    elif isinstance(node, L.Join):
        out.extend(node.left_keys + node.right_keys)
        if node.residual is not None:
            out.append(node.residual)
    elif isinstance(node, L.Aggregate):
        out.extend(node.group_by)
        for s in node.aggregates:
            if s.arg is not None:
                out.append(s.arg)
    elif isinstance(node, L.Sort):
        out.extend(node.keys)
    elif isinstance(node, L.WindowAggregate):
        out.extend(node.partition_by)
        out.extend(node.order_by)
        if node.spec is not None and node.spec.arg is not None:
            out.append(node.spec.arg)
    return out


def _fingerprint(node: L.LogicalNode, canon: Optional[dict] = None) -> tuple:
    if canon is None:
        canon = {}

    def cid(expr_id: int) -> int:
        if expr_id not in canon:
            canon[expr_id] = len(canon)
        return canon[expr_id]

    parts = [type(node).__name__]
    if isinstance(node, L.TableScan):
        parts.append(node.relation_name)
        parts.append(tuple((a.name, cid(a.expr_id)) for a in node.attrs))
    if isinstance(node, L.Generator):
        parts.append((node.start, node.end, node.step))
        parts.append(tuple(cid(a.expr_id) for a in node.attrs))
    if isinstance(node, L.SharedSubplan):
        parts.append(tuple(cid(a.expr_id) for a in node.attrs))
    if isinstance(node, L.Join):
        parts.append(node.kind)
    if isinstance(node, L.Aggregate):
        parts.append(tuple((s.fn, s.distinct) for s in node.aggregates))
    if isinstance(node, L.Sort):
        parts.append((tuple(node.ascending), tuple(node.nulls_first),
                      node.limit))
    if isinstance(node, L.Limit):
        parts.append(node.limit)
    if isinstance(node, L.SetOperation):
        parts.append(node.kind)
    if isinstance(node, L.WindowAggregate):
        parts.append((node.spec.fn, tuple(node.order_ascending), node.frame))
    for e in _node_exprs(node):
        parts.append(_expr_fp(e, canon, cid))
    for c in node.children():
        parts.append(_fingerprint(c, canon))
    # output ids last (Aggregate/Project attr ids referenced above)
    if isinstance(node, (L.Project, L.Aggregate, L.WindowAggregate,
                         L.RowNumber)):
        parts.append(tuple(cid(a.expr_id) for a in node.output))
    return tuple(parts)


def _expr_fp(e, canon: dict, cid) -> tuple:
    from quickstep_tpu.expressions.subquery import SubqueryScalar
    from quickstep_tpu.expressions import scalar as E
    if e is None:
        return ("none",)
    if isinstance(e, E.Attr):
        return ("attr", cid(e.expr_id))
    if isinstance(e, SubqueryScalar):
        return ("subquery", _fingerprint(e.plan, canon))
    if isinstance(e, E.Lit):
        return ("lit", e.value, int(e.type.type_id))
    if isinstance(e, E.Arith):
        return ("arith", e.op, _expr_fp(e.lhs, canon, cid),
                _expr_fp(e.rhs, canon, cid))
    if isinstance(e, E.Cmp):
        return ("cmp", e.op, _expr_fp(e.lhs, canon, cid),
                _expr_fp(e.rhs, canon, cid))
    if isinstance(e, E.Logical):
        return ("logical", e.op) + tuple(_expr_fp(o, canon, cid)
                                         for o in e.operands)
    if isinstance(e, E.Not):
        return ("not", _expr_fp(e.operand, canon, cid))
    if isinstance(e, E.IsNull):
        return ("isnull", e.negated, _expr_fp(e.operand, canon, cid))
    if isinstance(e, E.Case):
        return ("case",) + tuple(
            (_expr_fp(c, canon, cid), _expr_fp(r, canon, cid))
            for c, r in e.when_clauses) + (
            _expr_fp(e.else_result, canon, cid),)
    if isinstance(e, E.Cast):
        return ("cast", int(e.type.type_id), _expr_fp(e.operand, canon, cid))
    if isinstance(e, E.ExtractDate):
        return ("extract", e.field, _expr_fp(e.operand, canon, cid))
    if isinstance(e, E.InSet):
        return ("inset", e.values, e.negated, _expr_fp(e.operand, canon, cid))
    if isinstance(e, E.DictBitmapProbe):
        bm = np.asarray(e.bitmap)
        return ("dictbitmap", hash(bm.tobytes()), e.negated,
                _expr_fp(e.operand, canon, cid))
    if isinstance(e, E.Substr):
        rm = np.asarray(e.remap)
        return ("substr", hash(rm.tobytes()), _expr_fp(e.operand, canon, cid))
    return (type(e).__name__,)
