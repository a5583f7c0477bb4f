"""Physical-plan inspection helpers.

The scale contract of every operator ("filter is pushed down", "this join
broadcasts", "only one shuffle") is enforceable, not aspirational: these
helpers parse `.explain("formatted")` output so tests can pin plan shapes
and fail when a refactor silently introduces an extra Exchange or loses
parquet pushdown.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", explain_str(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from parquet (one per scan) — the
    column-pruning evidence."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", explain_str(df)):
        cols = [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]
        schemas.append(cols)
    return schemas


def executed_plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """Execute the query, then explain the FINAL adaptive plan.

    Under AQE the pre-execution ``explain`` prints ``AdaptiveSparkPlan
    isFinalPlan=false`` — a placeholder with no whole-stage-codegen
    annotations and pre-coalesce exchange counts, so auditing that string
    measures nothing about what actually ran. Collecting first forces AQE
    to finalize; the same DataFrame's ``explain`` then shows
    ``isFinalPlan=true`` with per-node ``[codegen id : N]`` tags,
    ``AQEShuffleRead`` coalescing, and any runtime join-strategy switches.
    """
    df.collect()
    return explain_str(df, mode)


def has_codegen(plan: str) -> bool:
    """True if the plan string shows whole-stage-codegen participation.

    Formatted FINAL plans tag nodes with ``[codegen id : N]``; simple-mode
    plans show ``WholeStageCodegen`` spans. Accept either spelling.
    """
    return ("codegen id" in plan) or ("WholeStageCodegen" in plan)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the plan (BroadcastExchange excluded —
    broadcasts are the cheap kind)."""
    return len(re.findall(r"\(\d+\) Exchange\b", explain_str(df)))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def _walk_exchange_nodes(jnode, acc: list, in_cache: bool, seen_caches: set) -> None:
    """Recursive descent over the EXECUTED plan, tagging each shuffle
    Exchange as query-time or cache-build.

    The keyed working-set cache repartitions tables once at population
    (`__spark_entry__._t`); those Exchanges live INSIDE the
    InMemoryRelation's cached plan and amortize to zero across queries,
    while Exchanges above the InMemoryTableScan are paid on EVERY run.
    A text regex over `.explain` cannot tell them apart (the formatted
    string prints the cache subtree inline and repeats it in the
    un-executed Initial Plan), so this walks the JVM plan tree: crossing
    AQE stage wrappers like :func:`_walk_scan_nodes` and descending into
    each cached relation's ``cachedPlan`` exactly once (a cache scanned
    from both join sides would otherwise double-count its build).
    """
    cls = jnode.getClass().getName()
    name = jnode.nodeName()
    if name.startswith("Exchange") or "ShuffleExchangeExec" in cls:
        acc.append(("cache_build" if in_cache else "query", jnode))
    ch = jnode.children()
    for i in range(ch.size()):
        _walk_exchange_nodes(ch.apply(i), acc, in_cache, seen_caches)
    if "QueryStageExec" in cls and "TableCacheQueryStage" not in cls:
        _walk_exchange_nodes(jnode.plan(), acc, in_cache, seen_caches)
    elif "TableCacheQueryStageExec" in cls:
        _walk_exchange_nodes(jnode.plan(), acc, in_cache, seen_caches)
    elif "AdaptiveSparkPlanExec" in cls:
        _walk_exchange_nodes(jnode.executedPlan(), acc, in_cache, seen_caches)
    elif "InMemoryTableScanExec" in cls:
        cached = jnode.relation().cachedPlan()
        cid = cached.id()
        if cid not in seen_caches:
            seen_caches.add(cid)
            _walk_exchange_nodes(cached, acc, True, seen_caches)


def count_exchanges_split(df: DataFrame, run: bool = True) -> dict:
    """Shuffle-exchange counts of the EXECUTED plan, attributed to where
    the cost is paid: ``query`` (every run) vs ``cache_build`` (once, at
    working-set-cache population). Runs the query unless ``run=False``.
    Broadcast exchanges are excluded from both (the cheap kind)."""
    if run:
        df.collect()
    acc: list = []
    _walk_exchange_nodes(
        df._jdf.queryExecution().executedPlan(), acc, False, set()
    )
    return {
        "query": sum(1 for kind, _ in acc if kind == "query"),
        "cache_build": sum(1 for kind, _ in acc if kind == "cache_build"),
    }


def _walk_scan_nodes(jnode, acc: list) -> None:
    """Recursive descent over the EXECUTED physical plan, crossing AQE
    stage boundaries (Spark 4 wraps every materialized stage in a
    ``*QueryStageExec`` whose subtree hangs off ``.plan()``, so a naive
    ``collectLeaves`` sees only the opaque stage wrapper)."""
    cls = jnode.getClass().getName()
    if jnode.nodeName().startswith("Scan"):
        acc.append(jnode)
    ch = jnode.children()
    for i in range(ch.size()):
        _walk_scan_nodes(ch.apply(i), acc)
    if "QueryStageExec" in cls:
        _walk_scan_nodes(jnode.plan(), acc)
    elif "AdaptiveSparkPlanExec" in cls:
        _walk_scan_nodes(jnode.executedPlan(), acc)


def executed_scan_metrics(df: DataFrame, run: bool = True) -> list[dict]:
    """Per-scan runtime metrics of the EXECUTED plan — the ground truth
    for partition/file pruning ("did the scan actually skip files?"),
    which no explain string carries. Runs the query unless the caller
    already has (``run=False``). Keys of interest: ``numFiles``,
    ``filesSize``, ``numPartitions`` (plus whatever else the scan node
    reports).
    """
    if run:
        df.collect()
    acc: list = []
    _walk_scan_nodes(df._jdf.queryExecution().executedPlan(), acc)
    out = []
    for n in acc:
        d = {"node": n.nodeName()}
        it = n.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            d[kv._1()] = kv._2().value()
        out.append(d)
    return out


_WINDOWSPEC = re.compile(r"windowspecdefinition\(((?:[^()]|\([^()]*\))*)\)")


def unpartitioned_window_specs(plan: str) -> list[str]:
    """``windowspecdefinition(...)`` instances with an EMPTY partition list.

    Spark prints a window spec's arguments as partition columns, then order
    columns (each tagged ``ASC``/``DESC``), then the frame. A spec whose
    FIRST argument is already an order column or the frame itself partitions
    by nothing: every input row is shuffled to a single task. That is the
    documented-correct idiom only for the O(ticks) v3 frames; on a
    data-sized table it is a scale bug, so tests pin the offender set.
    """
    out = []
    for m in _WINDOWSPEC.finditer(plan):
        first = m.group(1).split(",")[0].strip()
        if (
            " ASC" in first
            or " DESC" in first
            or first.startswith("specifiedwindowframe")
        ):
            out.append(m.group(0)[:120])
    return out
