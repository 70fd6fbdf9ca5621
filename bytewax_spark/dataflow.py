"""Dataflow graph handles: ``Dataflow``, ``Stream``, ``KeyedStream``.

Semantics mirror the reference's graph builder
(``/root/reference/pysrc/bytewax/dataflow.py:177-310``): a ``Dataflow``
is a named DAG assembled eagerly by operator calls; a ``Stream`` is a
handle to flowing data; step ids must be unique within the flow and
nest hierarchically (``parent.child``) when operators are composed
from other operators.

The Spark-first difference: a ``Stream`` *wraps a DataFrame*, so the
"IR" is the DataFrame's own unresolved logical plan and every operator
is a lineage extension Catalyst can optimize end-to-end (predicate
pushdown, column pruning, join planning). The ``Dataflow`` object only
records step metadata — for id validation, introspection and mermaid
rendering — it never schedules anything itself.

A ``KeyedStream`` is a ``Stream`` whose DataFrame carries a designated
routing-key column (reference: ``KeyedStream[V] = Stream[Tuple[str,V]]``
with enforced ``str`` keys, ``pysrc/bytewax/operators/__init__.py:77``).
We keep the key as a real column (default name ``key``, StringType) so
keyed stateful operators become ``groupBy(key)`` — Spark's hash
exchange is the reference's key-routed worker exchange.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

__all__ = ["Dataflow", "Stream", "KeyedStream", "Step", "DEFAULT_KEY_COL"]

DEFAULT_KEY_COL = "key"

_STEP_ID_RE = re.compile(r"^[\w\-.]+$")


@dataclass(frozen=True)
class Step:
    """Metadata record for one operator invocation in the DAG."""

    step_id: str
    op_name: str
    upstream_steps: tuple[str, ...]
    params: dict[str, Any] = field(default_factory=dict)


class Dataflow:
    """A named dataflow: a growing DAG of operator steps.

    >>> flow = Dataflow("wordcount")
    """

    def __init__(self, flow_id: str) -> None:
        if not flow_id or not _STEP_ID_RE.match(flow_id):
            raise ValueError(f"flow_id must match [\\w\\-.]+, got {flow_id!r}")
        self.flow_id = flow_id
        self.steps: dict[str, Step] = {}
        self._scope_stack: list[str] = []
        self.sinks: list[Any] = []  # (step_id, Stream, Sink) triples queued by op.output
        self.observations: dict[str, Any] = {}  # step_id -> pyspark Observation (batch metrics)

    # -- step bookkeeping ------------------------------------------------
    def _qualify(self, step_id: str) -> str:
        if not step_id or not _STEP_ID_RE.match(step_id):
            raise ValueError(f"step_id must match [\\w\\-.]+, got {step_id!r}")
        prefix = ".".join(self._scope_stack)
        return f"{prefix}.{step_id}" if prefix else step_id

    def register(self, step_id: str, op_name: str, upstreams: tuple[str, ...], **params: Any) -> str:
        """Validate + record a step; returns the fully-qualified id.

        Raises ``ValueError`` on duplicate ids, matching the reference's
        step-id-clash error (``pysrc/bytewax/dataflow.py:550-566``).
        """
        fq = self._qualify(step_id)
        if fq in self.steps:
            raise ValueError(f"step {fq!r} already exists in flow {self.flow_id!r}; step ids must be unique")
        self.steps[fq] = Step(fq, op_name, upstreams, dict(params))
        return fq

    class _Scope:
        def __init__(self, flow: Dataflow, name: str) -> None:
            self.flow, self.name = flow, name

        def __enter__(self) -> None:
            self.flow._scope_stack.append(self.name)

        def __exit__(self, *exc: object) -> None:
            self.flow._scope_stack.pop()

    def scope(self, name: str) -> Dataflow._Scope:
        """Nested naming scope for composed operators (``parent.child``)."""
        return Dataflow._Scope(self, name)

    # -- introspection ---------------------------------------------------
    def to_mermaid(self) -> str:
        """Render the step DAG as a mermaid flowchart (reference:
        ``pysrc/bytewax/visualize.py:119-347``)."""
        lines = ["flowchart TD"]
        ids = {sid: f"n{i}" for i, sid in enumerate(self.steps)}
        for sid, step in self.steps.items():
            lines.append(f'  {ids[sid]}["{sid}<br/>({step.op_name})"]')
            for up in step.upstream_steps:
                if up in ids:
                    lines.append(f"  {ids[up]} --> {ids[sid]}")
        return "\n".join(lines)

    def to_json(self) -> str:
        """Serialize the step DAG (reference ``visualize.py`` to_json)."""
        import json

        return json.dumps(
            {
                "flow_id": self.flow_id,
                "steps": [
                    {
                        "step_id": s.step_id,
                        "op": s.op_name,
                        "upstreams": list(s.upstream_steps),
                    }
                    for s in self.steps.values()
                ],
            },
            indent=2,
        )

    def to_plantuml(self) -> str:
        """Render the step DAG as PlantUML (reference ``visualize.py``)."""
        lines = ["@startuml", "skinparam componentStyle rectangle"]
        for sid, step in self.steps.items():
            lines.append(f'component "{sid}\\n({step.op_name})" as {sid.replace(".", "_").replace("-", "_")}')
        for sid, step in self.steps.items():
            dst = sid.replace(".", "_").replace("-", "_")
            for up in step.upstream_steps:
                if up in self.steps:
                    lines.append(f'{up.replace(".", "_").replace("-", "_")} --> {dst}')
        lines.append("@enduml")
        return "\n".join(lines)

    def __repr__(self) -> str:
        return f"Dataflow({self.flow_id!r}, steps={len(self.steps)})"


class Stream:
    """Handle to a (bounded or unbounded) stream of rows.

    Wraps a DataFrame; referencing the same ``Stream`` in two operator
    calls fans the data out to both branches, exactly like the
    reference (Catalyst reuses the shared subplan; add ``.cache()``
    upstream for an explicit materialization point).
    """

    __slots__ = ("flow", "step_id", "_df")

    def __init__(self, flow: Dataflow, step_id: str, df: DataFrame) -> None:
        self.flow = flow
        self.step_id = step_id
        self._df = df

    @property
    def df(self) -> DataFrame:
        """The underlying DataFrame (lineage = logical plan)."""
        return self._df

    @property
    def is_streaming(self) -> bool:
        return bool(self._df.isStreaming)

    def _with(self, step_id: str, df: DataFrame) -> Stream:
        return Stream(self.flow, step_id, df)

    def __repr__(self) -> str:
        return f"Stream({self.step_id!r})"


class KeyedStream(Stream):
    """A ``Stream`` with a designated routing-key column.

    All keyed stateful operators (``*_final``, ``join``, windowing,
    ``stateful_*``) require one; ``op.key_on`` creates it. The key
    keeps its natural column type (hashing/shuffling doesn't need a
    string); pass ``cast="string"`` to ``op.key_on`` to reproduce the
    reference's enforced ``str`` keys (``src/operators.rs:363-416``).
    """

    __slots__ = ("key_col",)

    def __init__(self, flow: Dataflow, step_id: str, df: DataFrame, key_col: str = DEFAULT_KEY_COL) -> None:
        super().__init__(flow, step_id, df)
        if key_col not in df.columns:
            raise ValueError(f"key column {key_col!r} not in stream columns {df.columns}")
        self.key_col = key_col

    def _with_keyed(self, step_id: str, df: DataFrame) -> KeyedStream:
        return KeyedStream(self.flow, step_id, df, self.key_col)

    def __repr__(self) -> str:
        return f"KeyedStream({self.step_id!r}, key={self.key_col!r})"
