"""YAML-declared stage pipelines (the fast-flow analogue).

WHAT (reference): a processing config declares an ordered ``stages`` list
of ``{name: ImportableClass}`` entries plus one section per stage whose
key-values are splatted into the class constructor
(``docs/processing_config.rst:20-33``; ``__main__.py:66-73`` drives
``fast_flow.read_sequence_yaml``).  Custom user stages are importable
dotted paths with the same contract (``processing_config.rst:94-140``).

HOW: each stage class exposes ``apply(ds) -> ds`` (map-shaped) and
optionally ``aggregate(ds)`` / ``cutflow(ds)`` (terminal summaries).  A
``Sequence`` chains the map-shaped stages lazily over one
``ray.data.Dataset`` and exposes the terminal stages' results — the whole
YAML pipeline stays a single streaming plan.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, List, Optional, Tuple

__all__ = ["Sequence", "load_pipeline", "register_stage", "STAGE_REGISTRY"]

#: short names usable in configs, mirroring the reference's known_stages
#: (fast_carpenter/__init__.py:21-23)
STAGE_REGISTRY: Dict[str, str] = {
    "Alias": "fast_carpenter_ray.stages.Alias",
    "Define": "fast_carpenter_ray.stages.Define",
    "SystematicWeights": "fast_carpenter_ray.stages.SystematicWeights",
    "CutFlow": "fast_carpenter_ray.stages.CutFlow",
    "SelectPhaseSpace": "fast_carpenter_ray.stages.SelectPhaseSpace",
    "BinnedDataframe": "fast_carpenter_ray.stages.BinnedDataframe",
    "EventByEventDataframe": "fast_carpenter_ray.stages.EventByEventDataframe",
    "ExtractText": "fast_carpenter_ray.stages.ExtractText",
    "CellEncode": "fast_carpenter_ray.stages.CellEncode",
    "ZonalAggregate": "fast_carpenter_ray.stages.ZonalAggregate",
    "TokenCount": "fast_carpenter_ray.stages.TokenCount",
    "QualityScore": "fast_carpenter_ray.stages.QualityScore",
    "LangId": "fast_carpenter_ray.stages.LangId",
    "Fingerprint": "fast_carpenter_ray.stages.Fingerprint",
    "ParseURL": "fast_carpenter_ray.stages.ParseURL",
    "BlocklistFilter": "fast_carpenter_ray.stages.BlocklistFilter",
    "CanonicalizeURL": "fast_carpenter_ray.stages.CanonicalizeURL",
    "RobotsRules": "fast_carpenter_ray.stages.RobotsRules",
    "ExactDedup": "fast_carpenter_ray.stages.ExactDedup",
    "MinHashDedup": "fast_carpenter_ray.stages.MinHashDedup",
    "SimHashDedup": "fast_carpenter_ray.stages.SimHashDedup",
    "TextClean": "fast_carpenter_ray.stages.TextClean",
    "ImageDecode": "fast_carpenter_ray.stages.ImageDecode",
    "AudioResample": "fast_carpenter_ray.stages.AudioResample",
    "FrameSample": "fast_carpenter_ray.stages.FrameSample",
}


def register_stage(name: str, dotted_path: str) -> None:
    STAGE_REGISTRY[name] = dotted_path


def _import_class(path: str):
    module, _, cls = path.rpartition(".")
    return getattr(importlib.import_module(module), cls)


class BadPipelineConfig(Exception):
    pass


class Sequence:
    """An ordered list of instantiated stage objects."""

    def __init__(self, stages: List[Tuple[str, Any]]):
        self.stages = stages

    def apply(self, ds):
        """Chain all map-shaped stages over the dataset (lazy)."""
        for _, stage in self.stages:
            if hasattr(stage, "apply"):
                ds = stage.apply(ds)
        return ds

    def terminals(self) -> Dict[str, Any]:
        """Stages with summary outputs (aggregate/cutflow)."""
        return {name: s for name, s in self.stages
                if hasattr(s, "aggregate") or hasattr(s, "cutflow")}

    def __iter__(self):
        return iter(self.stages)

    def __getitem__(self, name: str):
        for n, s in self.stages:
            if n == name:
                return s
        raise KeyError(name)


def load_pipeline(config, extra_kwargs: Optional[Dict[str, Dict]] = None) -> Sequence:
    """Build a Sequence from a parsed-YAML dict (or a YAML string/path).

    Config shape (same contract as the reference's processing config):

    .. code-block:: yaml

        stages:
          - derive: Define
          - sel: CutFlow
        derive:
          variables:
            - abs_lat: "abs(lat)"
        sel:
          selection: "abs_lat < 60"
    """
    if isinstance(config, str):
        import yaml

        if "\n" not in config and config.endswith((".yml", ".yaml")):
            with open(config) as f:
                config = yaml.safe_load(f)
        else:
            config = yaml.safe_load(config)
    if not isinstance(config, dict) or "stages" not in config:
        raise BadPipelineConfig("pipeline config needs a 'stages' list")

    extra_kwargs = extra_kwargs or {}
    stages: List[Tuple[str, Any]] = []
    for entry in config["stages"]:
        if not isinstance(entry, dict) or len(entry) != 1:
            raise BadPipelineConfig(
                "each stages entry must be a single {name: Class} dict")
        name, cls_name = next(iter(entry.items()))
        path = STAGE_REGISTRY.get(cls_name, cls_name)
        try:
            cls = _import_class(path)
        except (ImportError, AttributeError, ValueError) as err:
            raise BadPipelineConfig(f"cannot import stage class {cls_name!r}: {err}")
        section = dict(config.get(name, {}))
        section.update(extra_kwargs.get(name, {}))
        # Decide name-passing from the constructor SIGNATURE, not by
        # catching TypeError — a TypeError raised *inside* a stage
        # constructor from a bad config must surface as-is, not trigger a
        # confusing retry with different arguments.
        import inspect

        try:
            params = inspect.signature(cls).parameters
            takes_name = "name" in params or any(
                p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values())
        except (TypeError, ValueError):  # builtins / C extensions
            takes_name = False
        if takes_name and "name" not in section:
            stage = cls(name=name, **section)
        else:
            stage = cls(**section)
        stages.append((name, stage))
    return Sequence(stages)
