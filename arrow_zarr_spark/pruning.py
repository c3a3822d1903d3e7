"""Automatic projection pruning for SQL over zarr stores — the A4
gap closed at the API surface.

The reference hands ``scan(projection)`` to every query for free
(DataFusion ``table_provider.rs:114-117``, ``config.rs:67-90``).
PySpark 4.1's python DataSourceReader exposes no column-pruning hook
(re-checked every round: ``partitions`` / ``pushFilters`` / ``read``
only), so ``spark.sql("SELECT one_col FROM zarr_view")`` decodes all
64 arrays of a wide store — a ~64x I/O+decode waste measured every
round as the ``zarr_narrow_*`` bench pair. :func:`read_zarr`'s
``columns=`` option prunes at the scan, but until now the USER had to
thread the projection by hand.

:func:`zarr_sql` closes the loop with the optimizer Spark already
ran:

1. register every store as a FULL-width temp view and analyze the
   query — Catalyst resolves, dedups self-join instances, inlines
   views, and column-prunes JVM-side (the decode waste is python-side
   in the DataSource worker, which never hears about it);
2. read the OPTIMIZED logical plan back over py4j and collect every
   ``AttributeReference`` by ``exprId`` — from the plan tree walk
   (children + subqueries) AND from ``TreeNode.toJSON`` (which
   flattens expression trees the walk cannot see into), unioned:
   over-collection only loses pruning, under-collection would lose
   CORRECTNESS, so both sources vote;
3. for each scan relation whose output column names sit inside a
   registered view's schema, keep exactly the output attributes whose
   exprId is referenced anywhere else in the plan (or by the plan's
   own root output — the ``SELECT *`` case);
4. re-register each prunable view via ``read_zarr(columns=...)`` and
   re-run the SQL. The second analysis resolves identically: a column
   is dropped only when NO instance of that relation references it
   anywhere (ambiguous references would have failed analysis in step
   1, so dropping an unreferenced name cannot re-bind anything).

A query that needs no columns at all (``SELECT COUNT(*)``) keeps the
cheapest column by dtype width — the scan must still produce row
counts. When the plan cannot be matched confidently (no scan
name-matches a view) the view is left FULL width: the failure mode is
"no pruning", never a wrong answer.

Driver cost is one extra analysis pass (milliseconds, no job); the
win at 100 TB is the difference between fetching one array's chunks
and fetching all of them — per query, with no API change beyond
naming the stores.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["clear_plan_cache", "required_view_columns", "zarr_sql"]

#: dtype byte-widths for the keep-one-column fallback (COUNT(*)-class
#: queries): prefer the narrowest fixed-width array — on a wide store
#: the difference between decoding an int8 column and a string column
#: is the whole point of pruning.
_DTYPE_WIDTH = {
    "boolean": 1,
    "byte": 1,
    "short": 2,
    "integer": 4,
    "float": 4,
    "date": 4,
    "long": 8,
    "double": 8,
    "timestamp": 8,
    "timestamp_ntz": 8,
}


def _cheapest_field(schema) -> str:
    return min(
        schema.fields,
        key=lambda f: (
            _DTYPE_WIDTH.get(f.dataType.typeName(), 64),
            f.name,
        ),
    ).name


def _jseq(seq):
    """Materialize a scala Seq of py4j objects."""
    return [seq.apply(i) for i in range(seq.size())]


def _attr_ids(jattrs) -> Dict[int, str]:
    """{exprId: name} for a list of java Attribute objects."""
    out = {}
    for a in jattrs:
        try:
            out[int(a.exprId().id())] = a.name()
        except Exception:
            pass  # non-attribute in an output list: ignore
    return out


def _walk_jplan(jplan):
    """Yield every plan node reachable through children() and
    subqueries() — the py4j half of the two-source reference scan."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        yield node
        try:
            stack.extend(_jseq(node.children()))
        except Exception:
            pass
        try:
            stack.extend(_jseq(node.subqueries()))
        except Exception:
            pass  # subqueries is best-effort: toJSON covers the rest


_SCAN_CLASSES = ("DataSourceV2ScanRelation", "DataSourceV2Relation")


def _json_attr_refs(obj, refs: set) -> None:
    """Collect every AttributeReference exprId in a parsed toJSON
    tree (nodes, expression fields, nested subquery plans alike) —
    EXCEPT inside scan-relation nodes, whose fields (``output``, the
    nested ``relation``) are column DECLARATIONS, not references;
    counting them would mark every store column as needed."""
    if isinstance(obj, dict):
        cls = obj.get("class", "")
        if isinstance(cls, str):
            if cls.rsplit(".", 1)[-1] in _SCAN_CLASSES:
                return
            if cls.endswith(".AttributeReference"):
                eid = obj.get("exprId")
                if isinstance(eid, dict) and "id" in eid:
                    refs.add(int(eid["id"]))
        for v in obj.values():
            _json_attr_refs(v, refs)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            _json_attr_refs(v, refs)


def required_view_columns(
    df: DataFrame, view_columns: Mapping[str, Sequence[str]]
) -> Dict[str, Optional[Sequence[str]]]:
    """Per-view required column names for an analyzed DataFrame.

    ``view_columns`` maps view name -> that view's full column list.
    Returns view name -> sorted needed columns, or ``None`` when no
    scan in the plan matched the view (caller keeps it full width —
    the safe direction).

    A scan is attributed to a view when its output column NAMES all
    belong to the view's schema (exprIds are per-instance, so a
    self-join's deduplicated copies each match and their requirements
    union). A column is needed when its exprId is referenced by any
    OTHER part of the plan than scan output declarations, or appears
    in the plan's root output."""
    jplan = df._jdf.queryExecution().optimizedPlan()

    scans = []  # [{exprId: name}] one per scan relation instance
    walk_ref_ids = set()
    for node in _walk_jplan(jplan):
        try:
            cls = node.getClass().getSimpleName()
        except Exception:
            continue
        if cls in _SCAN_CLASSES:
            scans.append(_attr_ids(_jseq(node.output())))
        else:
            try:
                walk_ref_ids.update(
                    _attr_ids(_jseq(node.references().toSeq()))
                )
            except Exception:
                pass

    root_ids = set(_attr_ids(_jseq(jplan.output())))

    # toJSON half: every AttributeReference occurrence outside scan
    # declarations, including expression trees and nested subquery
    # plans the walk may not reach. Union with the walk: an attr
    # either source sees as referenced is kept (over-collection loses
    # pruning; under-collection would lose correctness).
    json_ref_ids: set = set()
    try:
        import json as _json

        _json_attr_refs(_json.loads(jplan.toJSON()), json_ref_ids)
    except Exception:
        json_ref_ids = set()

    ref_ids = walk_ref_ids | json_ref_ids | root_ids

    out: Dict[str, Optional[Sequence[str]]] = {}
    for vname, vcols in view_columns.items():
        vset = {c.lower() for c in vcols}
        needed = set()
        matched = False
        for s in scans:
            if not s:
                continue
            if {n.lower() for n in s.values()} <= vset:
                matched = True
                needed.update(
                    n for eid, n in s.items() if eid in ref_ids
                )
        out[vname] = sorted(needed) if matched else None
    return out


#: Driver-side memo of store SCHEMAS and rewrite decisions, keyed per
#: Spark application. Schemas are frozen at first sight of a store —
#: the SAME staleness contract as any registered DataFrame (Spark
#: freezes a python-DataSource schema at load()); an ALTERed store
#: needs :func:`clear_plan_cache` (or a new session) either way.
#: DataFrame OBJECTS are deliberately NOT cached: the Spark 4.1
#: planned-read-per-relation cache (pinned in tests/test_datasource
#: .py::TestPushdownPlanReuse) makes re-using one scan relation
#: across differently-filtered queries return the EARLIER query's
#: pruned partitions — every registration here builds a fresh
#: relation, and the cached schema keeps that cheap (~7ms, vs ~140ms
#: with the python-worker inference round trip).
_SCHEMA_CACHE: Dict[tuple, object] = {}
_DECISION_CACHE: Dict[tuple, Dict[str, Optional[Sequence[str]]]] = {}
#: (sql, tables, options) -> (result DataFrame, view DataFrames).
#: Safe to reuse relations HERE because the key pins the sql text:
#: identical sql pushes identical filters, so the relation's memoized
#: planned read is exactly the right one — the caveat above only
#: bites when DIFFERENT filter sets share a relation, and different
#: sql means a different key and fresh relations by construction.
_RESULT_CACHE: Dict[tuple, tuple] = {}
_CACHE_MAX = 512


def clear_plan_cache() -> None:
    """Forget cached store schemas and rewrite decisions (after an
    ALTER/add-column on a store a previous :func:`zarr_sql` call
    touched)."""
    _SCHEMA_CACHE.clear()
    _DECISION_CACHE.clear()
    _RESULT_CACHE.clear()


def _bound(cache: dict) -> None:
    while len(cache) > _CACHE_MAX:
        cache.pop(next(iter(cache)))


def _fresh_scan(spark, path, schema, columns, options) -> DataFrame:
    """A NEW scan relation over ``path`` with the given (sub)schema —
    fresh per registration so the planned-read cache of one query can
    never serve another (the TestPushdownPlanReuse caveat), and
    inference-free because the schema is handed in."""
    reader = spark.read.format("zarr").schema(schema)
    if columns is not None:
        reader = reader.option("columns", ",".join(columns))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def zarr_sql(
    spark: SparkSession,
    sql: str,
    tables: Mapping[str, str],
    **options,
) -> DataFrame:
    """Run ``sql`` over zarr stores with AUTOMATIC projection pruning.

    ``tables`` maps view name -> store path. Each store is registered
    as a temp view; the query is analyzed once full-width, each
    view's truly-referenced columns are read off the optimized plan
    (see :func:`required_view_columns`), prunable views are
    re-registered through the scan's ``columns`` option so unwanted
    arrays are never fetched or decoded, and the SQL re-runs against
    the pruned views. Extra keywords become reader options for every
    store (``num_partitions``, ``io_threads``, ...).

    The pruned views stay registered after the call — inspecting
    ``spark.table(name).columns`` shows exactly what the scan will
    read (and is what tests/test_pruning.py pins). Repeated calls
    with the same (sql, tables, options) return the memoized result
    DataFrame — correct to reuse because an identical sql pushes
    identical filters into its relations (see the ``_RESULT_CACHE``
    note and :func:`clear_plan_cache` for the invalidation
    contract)."""
    from .datasource import read_zarr

    app = spark.sparkContext.applicationId
    opts_key = tuple(sorted((k, str(v)) for k, v in options.items()))
    tables_key = tuple(sorted(tables.items()))
    dkey = (app, sql, tables_key, opts_key)

    hit = _RESULT_CACHE.get(dkey)
    if hit is not None:
        result, view_dfs = hit
        for name, vdf in view_dfs.items():
            vdf.createOrReplaceTempView(name)
        return result

    schemas: Dict[str, object] = {}
    for name, path in tables.items():
        skey = (app, path, opts_key)
        schema = _SCHEMA_CACHE.get(skey)
        if schema is None:
            schema = read_zarr(spark, path, **options).schema
            _SCHEMA_CACHE[skey] = schema
            _bound(_SCHEMA_CACHE)
        schemas[name] = schema

    decision = _DECISION_CACHE.get(dkey)
    if decision is None:
        for name, path in tables.items():
            _fresh_scan(
                spark, path, schemas[name], None, options
            ).createOrReplaceTempView(name)
        wide = spark.sql(sql)
        decision = required_view_columns(
            wide,
            {n: [f.name for f in s.fields] for n, s in schemas.items()},
        )
        _DECISION_CACHE[dkey] = decision
        _bound(_DECISION_CACHE)

    from pyspark.sql.types import StructType

    view_dfs: Dict[str, DataFrame] = {}
    for name, path in tables.items():
        cols = decision.get(name)
        have = [f.name for f in schemas[name].fields]
        if cols is not None and set(cols) < set(have):
            if not cols:
                cols = [_cheapest_field(schemas[name])]
            keep = set(cols)
            ordered = [c for c in have if c in keep]
            sub = StructType(
                [f for f in schemas[name].fields if f.name in keep]
            )
            view = _fresh_scan(spark, path, sub, ordered, options)
        else:
            # unmatched (keep full width — never mis-prune) or needs
            # everything anyway; still a FRESH relation, so this
            # query's pushdown cannot poison a reused plan
            view = _fresh_scan(
                spark, path, schemas[name], None, options
            )
        view.createOrReplaceTempView(name)
        view_dfs[name] = view

    result = spark.sql(sql)
    _RESULT_CACHE[dkey] = (result, view_dfs)
    _bound(_RESULT_CACHE)
    return result
