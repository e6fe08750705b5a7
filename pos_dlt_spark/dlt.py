"""Module-level DLT-compatible authoring facade: ``import
pos_dlt_spark.dlt as dlt``.

The reference notebooks author their pipeline against the ``dlt``
MODULE, not a pipeline object (`03_Bronze-to-Silver ETL.py:124-135`:
``@dlt.table(name=..., comment=..., table_properties=..., spark_conf=
{'pipelines.trigger.interval': ...})`` over a ZERO-argument function
that uses the ambient ``spark``; `03:306` ``dlt.read_stream(...)``;
`03:376-385` ``dlt.create_target_table`` + ``dlt.apply_changes``). This
module reproduces that surface 1:1 on top of :class:`~pos_dlt_spark.
pipeline.Pipeline`, so reference-style notebook code ports with an
import swap and an explicit ``with dlt.pipeline(...)`` scope (the one
thing a library cannot inherit from a managed notebook runtime).

Ambient context:

- ``dlt.pipeline(name, storage, **kw)`` — context manager establishing
  the ACTIVE pipeline every module-level call registers against
  (nesting allowed; innermost wins). Pass ``pipeline=`` to adopt an
  existing Pipeline instead of creating one.
- ``dlt.spark`` — a proxy for the session of the refresh currently
  materializing a table, so ported code's ``spark.read...`` works
  unchanged inside a 0-arg table function (``from pos_dlt_spark.dlt
  import spark``).

Decorated functions may take zero arguments (the reference's shape) or
one (this engine's native ``fn(spark)``) — both register identically.
Kind is DLT-inferred: the returned DataFrame's ``isStreaming`` decides
(``TableKind 'auto'``), exactly like DLT's decorator, which has no kind
parameter.

Both API generations are exposed: the classic names the reference uses
(``apply_changes``, ``apply_changes_from_snapshot``,
``create_target_table``) and the current DLT names
(``create_auto_cdc_flow``, ``create_auto_cdc_from_snapshot_flow``,
``create_streaming_table``, ``append_flow``, ``create_sink``).
"""

from __future__ import annotations

import functools
import inspect
from contextlib import contextmanager
from typing import TYPE_CHECKING, Any, Callable

from pos_dlt_spark.pipeline import Pipeline

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

_ACTIVE: list[Pipeline] = []
_SPARK: list["SparkSession"] = []


class DltContextError(RuntimeError):
    """A module-level dlt call ran outside its required context."""


@contextmanager
def pipeline(
    name: str | None = None,
    storage: str | None = None,
    *,
    pipeline: Pipeline | None = None,
    **kwargs: Any,
):
    """Establish the active pipeline for module-level registration."""
    if pipeline is None:
        if name is None or storage is None:
            raise DltContextError(
                "dlt.pipeline(...) needs name and storage (or pipeline=)"
            )
        pipeline = Pipeline(name, storage, **kwargs)
    _ACTIVE.append(pipeline)
    try:
        yield pipeline
    except BaseException:
        _ACTIVE.pop()
        raise
    else:
        _ACTIVE.pop()
        # a create_target_table declaration whose apply_changes never
        # arrived is a broken pipeline in DLT too — fail at scope exit,
        # not at first refresh
        leftover = pipeline.__dict__.get("_dlt_pending_targets", {})
        if leftover:
            raise DltContextError(
                f"create_target_table declared {sorted(leftover)} but no "
                "apply_changes/apply_changes_from_snapshot flow targeted "
                "them"
            )


def current_pipeline() -> Pipeline:
    if not _ACTIVE:
        raise DltContextError(
            "no active pipeline — wrap declarations in `with dlt.pipeline"
            "(name, storage):` (the notebook runtime's implicit pipeline "
            "scope, made explicit)"
        )
    return _ACTIVE[-1]


def _current_spark() -> "SparkSession":
    if not _SPARK:
        raise DltContextError(
            "dlt.spark / dlt.read / dlt.read_stream are only available "
            "inside a table function while the pipeline refreshes it"
        )
    return _SPARK[-1]


class _SparkProxy:
    """``dlt.spark`` — the ambient session of the refresh currently
    materializing a table (the notebook global the reference's 0-arg
    table functions close over)."""

    def __getattr__(self, item: str) -> Any:
        return getattr(_current_spark(), item)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<dlt.spark proxy -> {_current_spark()!r}>"


spark = _SparkProxy()


def _adapt(fn: Callable) -> Callable[["SparkSession"], "DataFrame"]:
    """Bridge a 0-arg (reference-style) or 1-arg (engine-style) table
    function to the engine's ``fn(spark)`` contract. The DECLARING
    pipeline is captured here and re-activated for the duration of each
    materialization — the function body runs at refresh time, long after
    the ``with dlt.pipeline(...)`` scope closed, and its ``dlt.read`` /
    ``dlt.read_stream`` / ``dlt.spark`` calls must resolve against the
    pipeline that registered it."""
    declaring = current_pipeline()
    n_params = len(inspect.signature(fn).parameters)
    if n_params > 1:
        raise TypeError(
            f"table function {fn.__name__} takes {n_params} parameters; "
            "DLT table functions take zero (ambient spark) or one (spark)"
        )

    @functools.wraps(fn)
    def run(session: "SparkSession") -> "DataFrame":
        _ACTIVE.append(declaring)
        _SPARK.append(session)
        try:
            return fn(session) if n_params else fn()
        finally:
            _SPARK.pop()
            _ACTIVE.pop()

    return run


def _split_spark_conf(spark_conf: dict[str, str] | None) -> str | None:
    """The reference sets the refresh cadence through ``spark_conf``
    (`03:127` ``{'pipelines.trigger.interval': '24 hours'}``); that is
    the one conf with engine semantics here. Others are refused loudly
    rather than silently dropped."""
    if not spark_conf:
        return None
    conf = dict(spark_conf)
    interval = conf.pop("pipelines.trigger.interval", None)
    if conf:
        raise ValueError(
            f"unsupported spark_conf keys {sorted(conf)} — only "
            "pipelines.trigger.interval carries engine semantics in this "
            "runtime (set session confs on the SparkSession you refresh "
            "with)"
        )
    return interval


def table(
    fn: Callable | None = None,
    *,
    name: str | None = None,
    comment: str = "",
    table_properties: dict[str, str] | None = None,
    partition_cols: list[str] | None = None,
    spark_conf: dict[str, str] | None = None,
    temporary: bool = False,
):
    """``@dlt.table`` — streaming-ness inferred from the returned frame,
    exactly like DLT (no kind parameter exists there)."""
    if temporary:
        raise ValueError(
            "temporary tables are a managed-catalog lifecycle feature; "
            "use @dlt.view for an unmaterialized intermediate"
        )

    def deco(f: Callable):
        current_pipeline().table(
            name or f.__name__,
            kind="auto",
            comment=comment,
            interval=_split_spark_conf(spark_conf),
            partition_by=partition_cols,
            table_properties=table_properties,
        )(_adapt(f))
        return f

    return deco(fn) if fn is not None else deco


def view(fn: Callable | None = None, *, name: str | None = None, comment: str = ""):
    """``@dlt.view`` — an UNMATERIALIZED intermediate: the function's
    plan is inlined into every consumer at read time (no storage, no
    refresh of its own), which is DLT's view semantics. Dependency
    edges land on the consuming table because the view body executes
    during its materialization."""

    def deco(f: Callable):
        p = current_pipeline()
        views = p.__dict__.setdefault("_dlt_module_views", {})
        vname = name or f.__name__
        if vname in views or vname in p.tables:
            raise ValueError(f"view {vname!r} already declared")
        views[vname] = _adapt(f)
        return f

    return deco(fn) if fn is not None else deco


def _resolve_view(p: Pipeline, name: str) -> Callable | None:
    return p.__dict__.get("_dlt_module_views", {}).get(name)


def read(name: str) -> "DataFrame":
    """``dlt.read`` — batch read of another pipeline dataset (table or
    python view) from inside a table function."""
    p = current_pipeline()
    v = _resolve_view(p, name)
    if v is not None:
        return v(_current_spark())
    return p.read(_current_spark(), name)


def read_stream(name: str) -> "DataFrame":
    """``dlt.read_stream`` (`03:306`) — streaming read of another
    pipeline dataset from inside a table function."""
    p = current_pipeline()
    v = _resolve_view(p, name)
    if v is not None:
        df = v(_current_spark())
        if not df.isStreaming:
            raise ValueError(
                f"read_stream({name!r}): the view's plan is a batch frame"
            )
        return df
    return p.read_stream(_current_spark(), name)


# historical alias some DLT examples use
readStream = read_stream


# -- expectations (delegate to the active pipeline's decorators) -----------


def expect(name: str, condition: str):
    return current_pipeline().expect(name, condition)


def expect_or_drop(name: str, condition: str):
    return current_pipeline().expect_or_drop(name, condition)


def expect_or_fail(name: str, condition: str):
    return current_pipeline().expect_or_fail(name, condition)


def expect_all(conds: dict[str, str]):
    return current_pipeline().expect_all(conds)


def expect_all_or_drop(conds: dict[str, str]):
    return current_pipeline().expect_all_or_drop(conds)


def expect_all_or_fail(conds: dict[str, str]):
    return current_pipeline().expect_all_or_fail(conds)


# -- CDC / targets / flows / sinks -----------------------------------------


def create_target_table(name: str, **kwargs: Any) -> None:
    """``dlt.create_target_table`` (`03:376`) — the classic declaration
    of an apply_changes target. In this engine the CDC flow itself
    creates and owns the target storage, so the declaration is recorded
    for API faithfulness and validated when the flow arrives."""
    pending = current_pipeline().__dict__.setdefault(
        "_dlt_pending_targets", {}
    )
    pending[name] = dict(kwargs)


# current DLT name for the same declaration
create_streaming_live_table = create_target_table


def apply_changes(**kwargs: Any) -> None:
    """``dlt.apply_changes`` (`03:379-384`) / current-DLT
    ``create_auto_cdc_flow``."""
    p = current_pipeline()
    p.__dict__.setdefault("_dlt_pending_targets", {}).pop(
        kwargs.get("target"), None
    )
    p.apply_changes(**kwargs)


def create_auto_cdc_flow(**kwargs: Any) -> None:
    apply_changes(**kwargs)


def apply_changes_from_snapshot(**kwargs: Any) -> None:
    p = current_pipeline()
    p.__dict__.setdefault("_dlt_pending_targets", {}).pop(
        kwargs.get("target"), None
    )
    p.apply_changes_from_snapshot(**kwargs)


def create_auto_cdc_from_snapshot_flow(**kwargs: Any) -> None:
    apply_changes_from_snapshot(**kwargs)


def create_streaming_table(name: str, **kwargs: Any) -> None:
    current_pipeline().create_streaming_table(name, **kwargs)


def append_flow(
    fn: Callable | None = None,
    *,
    target: str,
    name: str | None = None,
    once: bool = False,
):
    """``@dlt.append_flow`` — the flow function may be 0- or 1-arg like
    table functions."""

    def deco(f: Callable):
        current_pipeline().append_flow(
            target=target, name=name or f.__name__, once=once
        )(_adapt(f))
        return f

    return deco(fn) if fn is not None else deco


def create_sink(
    name: str, format: str, options: dict[str, str] | None = None
) -> None:
    current_pipeline().create_sink(name, format, options)
