"""Stage protocol — the engine's user-extension surface (SURVEY.md §2.9).

The reference's only extension points are CLI knobs (model choice,
thresholds, zoom — /root/reference/src/main.py:84-90, 463-522); this
engine's idiomatic extension point is a declared list of ``Stage``s
compiled onto a ``ray.data.Dataset``:

- a Stage names its boundary schemas (checked when ``validate=True``),
- a plain function compiles to stateless task ``map_batches``,
- a callable class compiles to an actor pool with ``concurrency`` /
  ``num_cpus`` / ``batch_size`` resources.

Example::

    pipeline = [
        Stage("strip", fn=my_strip_fn, schema_out=DOCS),
        Stage("score", fn=ScorerCls, concurrency=(2, 8), batch_size=256),
    ]
    ds = compile_stages(ray.data.read_parquet(path), pipeline)
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Optional

import pyarrow as pa
import ray.data

from ..schemas import check_schema


@dataclass
class Stage:
    name: str
    fn: Any  # plain function (task stage) or callable class (actor pool)
    schema_in: Optional[pa.Schema] = None
    schema_out: Optional[pa.Schema] = None
    batch_format: str = "pyarrow"
    batch_size: Optional[int] = None
    concurrency: Any = None
    num_cpus: Optional[float] = None
    fn_constructor_kwargs: dict = field(default_factory=dict)

    @property
    def is_actor(self) -> bool:
        return inspect.isclass(self.fn)


def _wrap_validating(stage: Stage):
    inner = stage.fn

    def validating(batch):
        if stage.schema_in is not None and isinstance(batch, pa.Table):
            check_schema(batch, stage.schema_in, where=f"{stage.name}:in")
        out = inner(batch)
        if stage.schema_out is not None and isinstance(out, pa.Table):
            check_schema(out, stage.schema_out, where=f"{stage.name}:out")
        return out

    validating.__name__ = stage.name
    return validating


def compile_stages(
    ds: ray.data.Dataset, stages: list[Stage], *, validate: bool = False
) -> ray.data.Dataset:
    """Compile a declared stage list onto a Dataset."""
    from .. import ensure_picklable

    ensure_picklable()
    for stage in stages:
        kwargs: dict[str, Any] = {"batch_format": stage.batch_format}
        if stage.batch_size is not None:
            kwargs["batch_size"] = stage.batch_size
        if stage.num_cpus is not None:
            kwargs["num_cpus"] = stage.num_cpus
        if stage.is_actor:
            kwargs["concurrency"] = stage.concurrency or (1, 4)
            kwargs["fn_constructor_kwargs"] = stage.fn_constructor_kwargs
            if validate and (stage.schema_in is not None or stage.schema_out is not None):
                raise ValueError(
                    f"stage {stage.name}: schema validation wraps plain "
                    "functions only; validate actor stages in their __call__"
                )
            ds = ds.map_batches(stage.fn, **kwargs)
        else:
            fn = _wrap_validating(stage) if validate else stage.fn
            ds = ds.map_batches(fn, **kwargs)
    return ds
