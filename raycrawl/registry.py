"""Stage registry — the user-extension surface (SURVEY.md §2.11).

The reference's one real plugin API is the converter registry
(converter_factory.py:6-41, ported in convert.py) plus chunker selection by
request param (chunk_service.py:95). This generalizes both: a named registry
of pipeline stages, each described by the callable (function or actor
class), its preferred batch format, and default resources — so pipelines
can be assembled by name:

    ds = apply_stage(ds, "extract", concurrency=8)
    ds = apply_stage(ds, "chunk", chunker="sentence")
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Union


@dataclasses.dataclass
class StageSpec:
    name: str
    fn: Union[Callable, type]
    batch_format: str = "pyarrow"
    batch_size: Optional[int] = 64
    default_concurrency: Optional[int] = None  # None → stateless task
    num_cpus: float = 1.0
    description: str = ""

    @property
    def is_actor(self) -> bool:
        return isinstance(self.fn, type)


_STAGES: dict[str, StageSpec] = {}


def register_stage(spec: StageSpec) -> None:
    _STAGES[spec.name] = spec


def get_stage(name: str) -> StageSpec:
    try:
        return _STAGES[name]
    except KeyError:
        raise KeyError(f"unknown stage '{name}'; known: {sorted(_STAGES)}")


def list_stages() -> list[str]:
    return sorted(_STAGES)


def apply_stage(ds, name: str, concurrency: Optional[int] = None,
                batch_size: Optional[int] = None, **ctor_kwargs: Any):
    """``ds.map_batches`` with the registered stage's defaults."""
    spec = get_stage(name)
    kwargs: dict[str, Any] = {"batch_format": spec.batch_format}
    bs = batch_size or spec.batch_size
    if bs:
        kwargs["batch_size"] = bs
    if spec.is_actor:
        kwargs["concurrency"] = concurrency or spec.default_concurrency or 4
        if ctor_kwargs:
            kwargs["fn_constructor_kwargs"] = ctor_kwargs
        if spec.num_cpus != 1.0:
            kwargs["num_cpus"] = spec.num_cpus
        return ds.map_batches(spec.fn, **kwargs)
    fn = spec.fn if not ctor_kwargs else (lambda b: spec.fn(b, **ctor_kwargs))
    return ds.map_batches(fn, **kwargs)


def _register_builtins() -> None:
    from .chunker import ChunkStage
    from .convert import ConvertStage
    from .extract import PageExtractor
    from .ops.multimodal import FrameSampleStage, ImageFeatureStage

    register_stage(StageSpec("extract", PageExtractor, "pyarrow", 32, 4,
                             description="pages → ScrapeData columns (M1-M18)"))
    register_stage(StageSpec("chunk", ChunkStage, "pyarrow", 64, 4,
                             description="markdown → chunk rows (C1-C3)"))
    register_stage(StageSpec("convert", ConvertStage, "pyarrow", 16, 4,
                             description="binary files → markdown (S7, M20-M25)"))
    register_stage(StageSpec("image_features", ImageFeatureStage, "pyarrow",
                             16, 4, description="image decode/resize/features"))
    register_stage(StageSpec("frame_sample", FrameSampleStage, "pyarrow",
                             16, 4, description="video frame sampling stub"))


_register_builtins()
