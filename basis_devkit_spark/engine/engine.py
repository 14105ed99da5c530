"""Engine — loads a graph and executes its nodes on Spark.

Replaces the reference's server side (opaque in the devkit): node
execution protocol per SURVEY §3.3, signal-driven DAG scheduling per
`node.py:387-397`, cron triggers per `trigger:` fields.

Node kinds:
- **SQL node** (`.sql` file): Jinja-rendered (``{{ table }}`` → temp view
  name, ``{{ param }}`` → SQL literal), run via ``spark.sql``, result
  committed as a new version of the node's single output store
  (`create.py:239-244` template semantics).
- **Python node** (`.py` file): module executed with an active
  ExecutionContext so module-level ``Table/Parameter/State`` declarations
  bind live (class-style SDK, the documented contract).
- **Webhook**: an ingestion port — ``engine.webhook_receive(name, payload)``
  appends the payload to the webhook's auto-created table
  (`create.py:177-197`).
- **Component** (`uses:`): resolved from a local registry of Python
  factory functions (inline expansion at parse time is handled for
  subgraph files; components resolve to callables registered via
  ``engine.register_component``).
"""

from __future__ import annotations

import os
import re
import runpy
import time
from collections import defaultdict, deque
from datetime import datetime
from typing import Any, Callable

import jinja2
from pyspark.sql import DataFrame, SparkSession

from basis_devkit_spark.engine.context import ExecutionContext
from basis_devkit_spark.engine.cron import cron_matches
from basis_devkit_spark.graph.loader import load_graph
from basis_devkit_spark.graph.spec import GraphSpec, NodeSpec
from basis_devkit_spark.storage.state import StateStore
from basis_devkit_spark.storage.store import TableStore


def _sql_literal(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


class _SqlParam(str):
    """Renders as a SQL literal in templates but still str-usable."""

    def __new__(cls, value: Any):
        return super().__new__(cls, _sql_literal(value))


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        storage_root: str,
        execution_limit_s: float = 600.0,
    ):
        self.spark = spark
        self.storage_root = storage_root
        os.makedirs(storage_root, exist_ok=True)
        self.state_store = StateStore(storage_root)
        self.execution_limit_s = execution_limit_s
        self.graph: GraphSpec | None = None
        self._stores: dict[str, TableStore] = {}
        self._components: dict[str, Callable[..., None]] = {}
        self._run_log: list[dict[str, Any]] = []
        # HTTP request/response bridge: responses posted by node code via
        # respond_to_request, consumed by the webhook HTTP server.
        self._request_responses: dict[str, Any] = {}

    # ---------------- graph ----------------
    def load_graph(self, path: str) -> GraphSpec:
        self.graph = load_graph(path)
        return self.graph

    def graph_store_names(self) -> set[str]:
        return self.graph.store_names() if self.graph else set()

    # ---------------- build-once artifacts ----------------
    def artifact_store_names(self) -> set[str]:
        """Stores declared ``artifact: true`` in graph.yml — build-once
        operator artifacts (merge tables, vocabularies, centroids,
        quantizer stats, codebooks, index cells)."""
        if self.graph is None:
            return set()
        return {s.name for s in self.graph.stores if s.artifact}

    def _is_fit_node(self, node) -> bool:
        """A FIT node writes ONLY artifact stores — the build-once
        producer run_graph skips once its artifacts exist. A node that
        also writes a regular table is NOT a fit node (its table output
        must stay fresh)."""
        arts = self.artifact_store_names()
        outs = set(node.outputs.values())
        return bool(outs) and outs <= arts

    def _artifacts_built(self, node) -> bool:
        return all(
            self.store(s).has_active_version()
            for s in node.outputs.values()
        )

    def artifact_usage(self) -> dict[str, list[str]]:
        """node id -> the artifact stores it READS (graph wiring, no
        plan compilation) — the inspection surface that shows which
        queries consume which build-once artifact; producers appear via
        their outputs in ``graph.yml`` itself."""
        arts = self.artifact_store_names()
        out: dict[str, list[str]] = {}
        for n in self.graph.functions if self.graph else []:
            used = sorted(set(n.inputs.values()) & arts)
            if used:
                out[n.id] = used
        return out

    # ---------------- stores ----------------
    def store(self, name: str) -> TableStore:
        if name not in self._stores:
            st = TableStore(self.storage_root, name, self.spark)
            spec = None
            if self.graph is not None:
                spec = next(
                    (s for s in self.graph.stores if s.name == name), None
                )
            if spec is not None:
                cfg = {
                    k: getattr(spec, k)
                    for k in (
                        "unique_on",
                        "partition_by",
                        "cluster_by",
                        "zorder_by",
                        "bucket_by",
                        "num_buckets",
                        "stats_columns",
                        "expectations",
                        "expectations_mode",
                        "strictly_monotonic_ordering",
                        "created_ordering",
                        "strict_schema",
                    )
                    if getattr(spec, k, None) is not None
                }
                if cfg:
                    st.configure(**cfg)
            self._stores[name] = st
        return self._stores[name]

    def seed_store(self, name: str, df: DataFrame) -> None:
        """Register external data (e.g. a testdata parquet) as the active
        version of a store."""
        self.store(name).write_replace(df)

    def table_df(self, name: str) -> DataFrame:
        return self.store(name).read()

    def run_sql(self, sql: str, tables: list[str] | None = None) -> DataFrame:
        """Arbitrary SQL over the managed catalog: registers the named
        stores (default: every store with data) as temp views and runs the
        statement — the engine-level equivalent of ``Table.read_sql``
        (node.py:168-189) across tables."""
        names = tables if tables is not None else sorted(
            set(self._stores) | self.graph_store_names()
        )
        for name in names:
            st = self.store(name)
            if st.exists:
                st.read().createOrReplaceTempView(name)
        return self.spark.sql(sql)

    def vacuum_all(self, keep_last: int = 2) -> None:
        """Retention GC over every materialized store (node.py:403-404)."""
        for st in self._stores.values():
            st.vacuum(keep_last=keep_last)

    # ---------------- components ----------------
    def register_component(self, key: str, fn: Callable[..., None]) -> None:
        """`uses: org/component@v1` → a Python callable(engine, node_spec)."""
        self._components[key] = fn

    # ---------------- node execution ----------------
    def run_node(self, node: NodeSpec | str) -> ExecutionContext:
        if isinstance(node, str):
            node = self._node_by_id_or_name(node)
        ctx = ExecutionContext(self, node)
        started = time.monotonic()
        kind = node.kind
        with ctx:
            if kind == "sql":
                self._run_sql_node(ctx, node)
            elif kind == "python":
                self._run_python_node(ctx, node)
            elif kind == "webhook":
                pass  # push-driven; nothing to do on a scheduled run
            elif kind == "component":
                fn = self._components.get(node.uses or "")
                if fn is None:
                    raise KeyError(f"component not registered: {node.uses}")
                fn(self, node)
                # components write through the engine API directly; mark
                # their declared outputs dirty for downstream propagation
                for s in node.outputs.values():
                    ctx.signals.setdefault(s, []).append("update")
            else:
                raise ValueError(f"cannot run node kind {kind}")
        ctx.commit()
        self._run_log.append(
            {
                "node": node.id,
                "kind": kind,
                "seconds": time.monotonic() - started,
                "signals": dict(ctx.signals),
            }
        )
        return ctx

    def _node_by_id_or_name(self, key: str) -> NodeSpec:
        assert self.graph is not None, "load_graph first"
        for n in self.graph.functions:
            if key in (n.id, n.node_file, n.webhook, n.title):
                return n
        raise KeyError(f"no node {key!r} in graph")

    def _node_dir(self) -> str:
        return (self.graph.path if self.graph and self.graph.path else ".")

    def _render_sql_node(self, node: NodeSpec) -> str:
        """Render a SQL node's template against the current stores and
        parameters (inputs registered as temp views; secret:// refs
        resolved) and return the final SQL text."""
        sql_path = os.path.join(self._node_dir(), node.node_file)
        with open(sql_path) as f:
            template = f.read()
        # Register each connected input store as a temp view under both its
        # port name and store name; {{ port }} renders to the view name.
        tpl_ctx: dict[str, Any] = {}
        for port, store_name in node.inputs.items():
            st = self.store(store_name)
            if st.exists:
                df = st.read()
                df.createOrReplaceTempView(store_name)
                if port != store_name:
                    df.createOrReplaceTempView(port)
            tpl_ctx[port] = store_name
            tpl_ctx[store_name] = store_name
        for name, value in (node.parameters or {}).items():
            # secret://name refs resolve here for SQL nodes, same as the
            # Parameter bind path does for python nodes (node/params.py).
            from basis_devkit_spark.secrets import maybe_resolve_ref

            tpl_ctx[name] = _SqlParam(maybe_resolve_ref(value))
        rendered = jinja2.Template(template).render(**tpl_ctx)
        return rendered.strip().rstrip(";")

    def explain_node(self, key: str, mode: str = "formatted") -> dict[str, str]:
        """Rendered SQL + Spark physical plan for a SQL node — the
        plan-inspection surface (``cli explain``). Python nodes have no
        static plan; returns their file path instead."""
        node = self._node_by_id_or_name(key)
        arts = sorted(
            set(node.inputs.values()) & self.artifact_store_names()
        )
        extra = {"artifacts": ", ".join(arts)} if arts else {}
        if not (node.node_file or "").endswith(".sql"):
            return {
                "node": node.id or key,
                "kind": "python" if node.node_file else (node.kind or "other"),
                "note": "no static plan (not a SQL node)",
                **extra,
            }
        rendered = self._render_sql_node(node)
        df = self.spark.sql(rendered)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), mode
        )
        return {"node": node.id or key, "sql": rendered, "plan": plan, **extra}

    def _run_sql_node(self, ctx: ExecutionContext, node: NodeSpec) -> None:
        rendered = self._render_sql_node(node)
        result = self.spark.sql(rendered)
        if len(node.outputs) > 1:
            raise ValueError(
                f"SQL node '{node.display_name}' has {len(node.outputs)} outputs; "
                "a SQL node writes its SELECT result to exactly one output store"
            )
        if node.outputs:
            out_store = self.store(next(iter(node.outputs.values())))
            created = not out_store.exists
            out_store.write_replace(result)
            ctx.signals.setdefault(out_store.name, []).append(
                "create" if created else "update"
            )

    def _run_python_node(self, ctx: ExecutionContext, node: NodeSpec) -> None:
        py_path = os.path.join(self._node_dir(), node.node_file)
        # run the module with the context active: Table/Parameter/State
        # constructors bind against ctx (bind-at-declaration)
        ns = runpy.run_path(py_path, run_name=f"__node_{node.id}__")
        # decorator-style nodes: module exec only *defines* @node functions;
        # invoke each with ports injected (port name = argument name)
        from basis_devkit_spark.node.decorator import build_node_kwargs

        for obj in ns.values():
            if callable(obj) and getattr(obj, "__is_node__", False):
                obj(**build_node_kwargs(obj))

    # ---------------- webhooks (A22) ----------------
    def webhook_receive(self, webhook_name: str, payload: dict | list[dict]) -> None:
        """HTTP-ingest equivalent: append payload record(s) to the webhook's
        auto-created output table (`create.py:177-197`)."""
        import pandas as pd

        records = payload if isinstance(payload, list) else [payload]
        store = self.store(webhook_name)
        df = self.spark.createDataFrame(pd.DataFrame.from_records(records))
        store.append(df)
        self._propagate_from_stores({webhook_name})

    def respond_to_request(self, request_key: str, payload: Any) -> None:
        """Answer a waiting webhook request (node.py:544-553): the payload
        becomes the HTTP response body for the POST whose rows carry this
        ``patterns_request_key``. Outside an HTTP context the payload is
        just recorded (log-visible no-op, as in the devkit)."""
        self._run_log.append(
            {"respond_to_request": request_key, "payload_type": type(payload).__name__}
        )
        self._request_responses[request_key] = payload
        # Bound the buffer: responses are popped only by waiting HTTP
        # requests, so unconsumed ones (fire-and-forget posts) would
        # accumulate for the process lifetime. FIFO-evict beyond a cap.
        while len(self._request_responses) > 1000:
            self._request_responses.pop(next(iter(self._request_responses)))

    def take_request_response(self, request_key: str) -> Any | None:
        """Pop the response recorded for ``request_key`` (webhook server
        hook); None if no node responded during propagation."""
        return self._request_responses.pop(request_key, None)

    # ---------------- DAG scheduling (A10, A23) ----------------
    def _downstream_of(self, stores: set[str]) -> list[NodeSpec]:
        assert self.graph is not None
        return [
            n
            for n in self.graph.functions
            if any(s in stores for s in n.inputs.values())
        ]

    def _propagate_from_stores(self, dirty: set[str], max_waves: int = 100) -> None:
        """Signal propagation: updated stores enqueue consumer nodes, to
        fixpoint (node.py:387-397 semantics)."""
        waves = 0
        while dirty and waves < max_waves:
            waves += 1
            next_dirty: set[str] = set()
            for n in self._downstream_of(dirty):
                ctx = self.run_node(n)
                for store_name, sigs in ctx.signals.items():
                    if sigs:
                        next_dirty.add(store_name)
            dirty = next_dirty

    def topo_order(self) -> list[NodeSpec]:
        """Topological order of function nodes via store wiring."""
        assert self.graph is not None
        producers: dict[str, list[NodeSpec]] = defaultdict(list)
        for n in self.graph.functions:
            for s in n.outputs.values():
                producers[s].append(n)
            if n.webhook:
                producers[n.webhook].append(n)
        indeg: dict[str, int] = {}
        edges: dict[str, list[NodeSpec]] = defaultdict(list)
        by_id = {n.id: n for n in self.graph.functions}
        for n in self.graph.functions:
            indeg.setdefault(n.id, 0)
            for s in n.inputs.values():
                for p in producers.get(s, []):
                    if p.id != n.id:
                        edges[p.id].append(n)
                        indeg[n.id] = indeg.get(n.id, 0) + 1
        q = deque(sorted((nid for nid, d in indeg.items() if d == 0)))
        out: list[NodeSpec] = []
        while q:
            nid = q.popleft()
            out.append(by_id[nid])
            for m in edges[nid]:
                indeg[m.id] -= 1
                if indeg[m.id] == 0:
                    q.append(m.id)
        if len(out) != len(self.graph.functions):
            # cycle: fall back to declaration order for the remainder
            done = {n.id for n in out}
            out.extend(n for n in self.graph.functions if n.id not in done)
        return out

    def topo_levels(self) -> list[list["NodeSpec"]]:
        """Topological LEVELS of function nodes: level k holds nodes whose
        producers all sit in levels < k, so everything within one level is
        mutually independent — the unit of safe concurrent submission."""
        assert self.graph is not None
        producers: dict[str, list[NodeSpec]] = defaultdict(list)
        for n in self.graph.functions:
            for s in n.outputs.values():
                producers[s].append(n)
            if n.webhook:
                producers[n.webhook].append(n)
        indeg: dict[str, int] = {}
        edges: dict[str, list[NodeSpec]] = defaultdict(list)
        by_id = {n.id: n for n in self.graph.functions}
        for n in self.graph.functions:
            indeg.setdefault(n.id, 0)
            for s in n.inputs.values():
                for p in producers.get(s, []):
                    if p.id != n.id:
                        edges[p.id].append(n)
                        indeg[n.id] = indeg.get(n.id, 0) + 1
        frontier = sorted(nid for nid, d in indeg.items() if d == 0)
        levels: list[list[NodeSpec]] = []
        seen: set[str] = set()
        while frontier:
            levels.append([by_id[nid] for nid in frontier])
            seen.update(frontier)
            nxt: set[str] = set()
            for nid in frontier:
                for m in edges[nid]:
                    indeg[m.id] -= 1
                    if indeg[m.id] == 0:
                        nxt.add(m.id)
            frontier = sorted(nxt)
        if len(seen) != len(self.graph.functions):
            # cycle: declaration order for the remainder, one per level
            for n in self.graph.functions:
                if n.id not in seen:
                    levels.append([n])
        return levels

    def run_graph(
        self, max_reruns: int = 10, parallelism: int = 1
    ) -> list[dict[str, Any]]:
        """One full batch pass: every node once in topo order, honoring
        request_new_run re-enqueues (bounded).

        ``parallelism > 1`` submits each topological level's nodes
        concurrently from a thread pool — on a real cluster the driver is
        otherwise idle between job waves, and independent nodes' Spark
        jobs schedule side-by-side (Spark's scheduler is thread-safe; FAIR
        pools apply if configured). Within a level, nodes sharing an
        OUTPUT store are serialized into successive waves (manifest
        commits are per-store read-modify-write). SQL nodes are safe by
        construction (temp views register under store names, which map
        1:1 to content); Python nodes run user code — keep
        ``parallelism=1`` if yours mutate shared state."""
        assert self.graph is not None, "load_graph first"
        reruns: dict[str, int] = defaultdict(int)
        rerun_queue: deque[NodeSpec] = deque()

        def _after(node: NodeSpec, ctx) -> None:
            if ctx.new_run_requested and reruns[node.id] < max_reruns:
                reruns[node.id] += 1
                rerun_queue.append(node)

        def _skip_built_fit(node: NodeSpec) -> bool:
            # build-once artifact producer with all artifacts present:
            # skipped — the refit-free run never rescans raw history.
            # Refit paths: explicit run_node()/trigger(), or a streaming
            # maintainer (c21-style) keeping the artifact fresh.
            if self._is_fit_node(node) and self._artifacts_built(node):
                self._run_log.append(
                    {
                        "node": node.id,
                        "kind": node.kind,
                        "seconds": 0.0,
                        "signals": {},
                        "skipped": "artifact built",
                    }
                )
                return True
            return False

        if parallelism <= 1:
            queue = deque(self.topo_order())
            while queue:
                node = queue.popleft()
                if node.kind == "webhook" or _skip_built_fit(node):
                    continue
                ctx = self.run_node(node)
                _after(node, ctx)
                if rerun_queue:
                    queue.append(rerun_queue.popleft())
            return self._run_log

        from concurrent.futures import ThreadPoolExecutor

        for level in self.topo_levels():
            runnable = [
                n
                for n in level
                if n.kind != "webhook" and not _skip_built_fit(n)
            ]
            # Split into waves with disjoint output stores.
            waves: list[list[NodeSpec]] = []
            for n in runnable:
                outs = set(n.outputs.values())
                placed = False
                for w in waves:
                    taken = {s for m in w for s in m.outputs.values()}
                    if not (outs & taken):
                        w.append(n)
                        placed = True
                        break
                if not placed:
                    waves.append([n])
            for w in waves:
                if len(w) == 1:
                    _after(w[0], self.run_node(w[0]))
                    continue
                with ThreadPoolExecutor(max_workers=parallelism) as ex:
                    for node, ctx in zip(w, ex.map(self.run_node, w)):
                        _after(node, ctx)
        while rerun_queue:  # re-runs execute sequentially after the pass
            node = rerun_queue.popleft()
            _after(node, self.run_node(node))
        return self._run_log

    def trigger(self, node_key: str) -> None:
        """Manual trigger (`patterns trigger` equivalent): run the node and
        propagate signals downstream to fixpoint."""
        node = self._node_by_id_or_name(node_key)
        ctx = self.run_node(node)
        dirty = {s for s, sigs in ctx.signals.items() if sigs}
        self._propagate_from_stores(dirty)

    def due_nodes(self, at: datetime) -> list[NodeSpec]:
        """Nodes whose cron `trigger:` matches the given minute (A23)."""
        assert self.graph is not None
        return [
            n
            for n in self.graph.functions
            if n.trigger and cron_matches(n.trigger, at)
        ]

    def tick(self, at: datetime | None = None) -> list[str]:
        """One scheduler tick: run all cron-due nodes + propagate."""
        at = at or datetime.now()
        ran = []
        for n in self.due_nodes(at):
            self.trigger(n.id)
            ran.append(n.id)
        return ran

    def run_scheduler(
        self,
        poll_seconds: float = 30.0,
        max_ticks: int | None = None,
        now_fn: Callable[[], datetime] | None = None,
    ) -> int:
        """Cron scheduler loop (A23): evaluate every node's ``trigger:``
        each minute boundary, run due nodes + propagate. ``max_ticks``
        bounds the loop (None = run until interrupted); ``now_fn`` is
        injectable for tests. Returns total nodes run."""
        now_fn = now_fn or datetime.now
        ran_total = 0
        ticks = 0
        last_minute: str | None = None
        while max_ticks is None or ticks < max_ticks:
            now = now_fn()
            minute = now.strftime("%Y-%m-%dT%H:%M")
            if minute != last_minute:
                last_minute = minute
                ran_total += len(self.tick(now))
                ticks += 1
            if max_ticks is not None and ticks >= max_ticks:
                break
            time.sleep(poll_seconds)
        return ran_total

    @property
    def run_log(self) -> list[dict[str, Any]]:
        return self._run_log
